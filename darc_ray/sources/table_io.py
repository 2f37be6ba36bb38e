"""Lance-or-Parquet table IO shim.

The north rule stores tables as Lance; ``pylance`` is not installed in
this environment, so every read/write goes through this shim: Lance
when importable, Parquet (identical schema) otherwise.  Datasets are
directories of part files — never one giant file — so a failed run can
skip finished partitions (resumable output).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - not installed here
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def write_table(table: pa.Table, path: str) -> str:
    """Write one Arrow table to ``path`` (dataset dir for Lance, single
    part file for Parquet).  Returns the written path."""
    if HAVE_LANCE:
        lance.write_dataset(table, path, mode="overwrite")
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if not path.endswith(".parquet"):
        path = path + ".parquet"
    pq.write_table(table, path)
    return path


def read_table(path: str) -> pa.Table:
    if HAVE_LANCE and os.path.isdir(path):
        return lance.dataset(path).to_table()
    if not os.path.exists(path) and os.path.exists(path + ".parquet"):
        path = path + ".parquet"
    return pq.read_table(path)


def ray_read(path: str, **kwargs):
    """``ray.data.read_parquet``/``read_lance`` behind one call."""
    import ray.data as rd

    if HAVE_LANCE and os.path.isdir(path):
        return rd.read_lance(path, **kwargs)
    if not os.path.exists(path) and os.path.exists(path + ".parquet"):
        path = path + ".parquet"
    return rd.read_parquet(path, **kwargs)


def ray_write(ds, path: str, **kwargs) -> None:
    """Write a Dataset as a partitioned table directory."""
    if HAVE_LANCE:
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
