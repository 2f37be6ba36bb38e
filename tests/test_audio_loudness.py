"""Planted-property tests for the sample-level `audio_loudness`
family; SQL parity vs DuckDB is covered by `test_queries.py`'s
ORACLE_SQL parametrization."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from darc_ray.functions.audio import wav_encode
from darc_ray.stages.multimodal import (audio_loudness_batch,
                                        ensure_audio_pcm_fixture)


def _one(aid: str, samples: np.ndarray, sr: int = 8000) -> pa.Table:
    return pa.table({"audio_id": pa.array([aid]),
                     "bytes": pa.array([wav_encode(samples, sr)],
                                       type=pa.binary())})


def test_loudness_exact_handbuilt():
    s = np.array([0, 100, -100, 32767, -32768], np.int16)
    row = audio_loudness_batch(_one("x", s)).to_pandas().iloc[0]
    assert row.n_int16 == 5
    assert row.mean_square == (100**2 + 100**2 + 32767**2 + 32768**2) // 5
    assert row.peak == 32768          # int64 abs — no int16 wrap
    assert row.clip_count == 2 and row.silent == 0


def test_loudness_stereo_flattens_channels():
    s = np.stack([np.full(10, 1000, np.int16),
                  np.zeros(10, np.int16)], axis=1)
    row = audio_loudness_batch(_one("st", s)).to_pandas().iloc[0]
    assert row.n_int16 == 20 and row.mean_square == 1000**2 * 10 // 20


def test_fixture_planted_rows():
    t = pq.read_table(ensure_audio_pcm_fixture())
    g = audio_loudness_batch(t).to_pandas().set_index("audio_id")
    assert g.loc["pcm-silent",
                 ["mean_square", "peak", "clip_count", "silent"]
                 ].tolist() == [0, 0, 0, 1]
    assert g.loc["pcm-clip", "clip_count"] == g.loc["pcm-clip", "n_int16"]
    assert (g.loc[g.index.str.match(r"pcm-\d+"), "silent"] == 0).all()
    # the odd-LIST row proves offset discovery (800 samples planted)
    assert g.loc["pcm-list", "n_int16"] == 800
