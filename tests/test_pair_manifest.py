"""Planted-property tests for the manifest-vs-payload QA gate
(`pair_manifest_qa`) and the frame-extraction seek plan
(`video_frame_manifest`): fixture flavors carry their ground truth in
the id suffix, and the seek plan is re-derived against the container
index and by actually range-reading the sampled frames.  SQL parity
vs DuckDB is covered by `test_queries.py`'s ORACLE_SQL
parametrization."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from darc_ray.stages.multimodal import (ensure_pair_manifest_fixture,
                                        ensure_video_meta_fixture,
                                        pair_manifest_qa_batch,
                                        video_frame_manifest_batch)


# ---------------------------------------------------------------------------
# pair_manifest_qa
# ---------------------------------------------------------------------------

def test_pair_manifest_flavors_by_suffix():
    path = ensure_pair_manifest_fixture()
    out = pair_manifest_qa_batch(pq.read_table(path)).to_pandas()
    assert len(out) == 17
    for _, r in out.iterrows():
        iid = r["image_id"]
        if iid.endswith("-clean"):
            assert (r.dims_ok, r.complete, r.keep) == (1, 1, 1), iid
        elif iid.endswith("-swap") or iid == "man-badw":
            assert (r.dims_ok, r.keep) == (0, 0), iid
            assert r.complete == 1, iid       # payload itself intact
        elif iid.endswith("-trunc"):
            assert (r.dims_ok, r.complete, r.keep) == (1, 0, 0), iid
            assert r.payload_bytes == r.expected_bytes - 5, iid
        elif iid.endswith("-pad"):
            assert (r.dims_ok, r.complete, r.keep) == (1, 0, 0), iid
            assert r.payload_bytes == r.expected_bytes + 7, iid
    # swap rows: header dims are the manifest dims transposed
    swaps = out[out["image_id"].str.endswith("-swap")]
    assert (swaps["decl_w"] == swaps["hdr_h"]).all()
    assert (swaps["decl_h"] == swaps["hdr_w"]).all()


def test_pair_manifest_rejects_non_rawi():
    t = pa.table({"image_id": pa.array(["x"]),
                  "bytes": pa.array([b"NOPE1234"], type=pa.binary()),
                  "w": pa.array([4], pa.int32()),
                  "h": pa.array([4], pa.int32())})
    with pytest.raises(ValueError):
        pair_manifest_qa_batch(t)


# ---------------------------------------------------------------------------
# video_frame_manifest
# ---------------------------------------------------------------------------

def test_frame_manifest_matches_container_index():
    from darc_ray.functions.video import video_index

    path = ensure_video_meta_fixture()
    t = pq.read_table(path)
    out = video_frame_manifest_batch(t).to_pandas()
    spans = {vid: video_index(payload)[1]
             for vid, payload in zip(t.column("video_id").to_pylist(),
                                     t.column("bytes").to_pylist())}
    # one row per stride-3 frame, offsets/lengths straight from the index
    want_rows = sum((len(s) + 2) // 3 for s in spans.values())
    assert len(out) == want_rows
    for _, r in out.iterrows():
        off, length = spans[r["video_id"]][r["frame_idx"]]
        assert (r["byte_off"], r["frame_bytes"]) == (off, length)
        assert r["frame_idx"] % 3 == 0
        assert r["sample_rank"] == r["frame_idx"] // 3


def test_frame_manifest_byte_ranges_decode():
    # the whole point of the seek plan: slicing [off, off+len) out of
    # the payload yields a decodable PNG frame
    from darc_ray.functions.image import png_decode

    path = ensure_video_meta_fixture()
    t = pq.read_table(path)
    payloads = dict(zip(t.column("video_id").to_pylist(),
                        t.column("bytes").to_pylist()))
    out = video_frame_manifest_batch(t).to_pandas()
    picked = out.groupby("video_id").head(1)
    for _, r in picked.iterrows():
        blob = payloads[r["video_id"]]
        frame = png_decode(blob[r["byte_off"]:
                                r["byte_off"] + r["frame_bytes"]])
        assert frame.ndim == 3 and frame.shape[2] == 3
        assert frame.dtype == np.uint8
