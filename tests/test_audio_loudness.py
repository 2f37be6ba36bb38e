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


def _spans(v, sr=8000):
    import pyarrow as pa

    from darc_ray.functions.audio import wav_encode
    from darc_ray.stages.multimodal import audio_silence_spans_batch

    t = pa.Table.from_pydict({"audio_id": ["x"],
                              "bytes": [wav_encode(v, sr)]})
    df = audio_silence_spans_batch(t).to_pandas()
    return df.iloc[0] if len(df) else None


def test_spans_all_silent():
    import numpy as np

    row = _spans(np.zeros(1200, np.int16))
    assert row["n_windows"] == 3
    assert row["silent_windows"] == 3
    assert row["leading_silent"] == 3
    assert row["trailing_silent"] == 3
    assert row["max_silent_run"] == 3
    assert row["active_milli"] == 0
    assert row["trimmed"] == 1


def test_spans_planted_leading_interior_trailing():
    import numpy as np

    tone = (9000 * np.sin(np.arange(800) / 7.0)).astype(np.int16)
    v = np.concatenate([np.zeros(400, np.int16), tone,
                        np.zeros(400, np.int16), tone,
                        np.zeros(800, np.int16)])
    row = _spans(v)
    assert row["n_windows"] == 8
    assert row["silent_windows"] == 4
    assert row["leading_silent"] == 1
    assert row["trailing_silent"] == 2
    assert row["max_silent_run"] == 2
    assert row["active_milli"] == 500
    assert row["trimmed"] == 1


def test_spans_partial_window_dropped():
    import numpy as np

    # 399 samples: no full window → no output row (SQL parity)
    assert _spans(np.zeros(399, np.int16)) is None
    # 401 samples: exactly one window; the 1 extra sample is ignored
    row = _spans(np.full(401, 20000, np.int16))
    assert row["n_windows"] == 1
    assert row["silent_windows"] == 0
    assert row["trimmed"] == 0


def test_spans_floor_boundary():
    import numpy as np

    # constant 100 → mean square 10000 == floor → NOT silent
    row = _spans(np.full(400, 100, np.int16))
    assert row["silent_windows"] == 0
    # constant 99 → 9801 < floor → silent
    row = _spans(np.full(400, 99, np.int16))
    assert row["silent_windows"] == 1
