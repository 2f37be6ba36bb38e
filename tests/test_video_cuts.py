"""Planted-property tests for `video_cut_candidates` (frame-size-delta
scene-cut proxy, index-only); DuckDB parity via test_queries.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from darc_ray.functions.video import video_encode
from darc_ray.stages.multimodal import video_cut_candidates_batch


def _one(frames, fps=8):
    t = pa.Table.from_pydict({"video_id": ["x"],
                              "bytes": [video_encode(frames, fps)]})
    return video_cut_candidates_batch(t).to_pandas().iloc[0]


def _smooth(hh, ww, f):
    yy, xx = np.mgrid[0:hh, 0:ww]
    return np.repeat(((xx + yy + f) % 5).astype(np.uint8)[..., None] * 40,
                     3, axis=2)


def test_planted_cut_detected_at_exact_index():
    rng = np.random.default_rng(7)
    frames = [_smooth(20, 24, f) for f in range(3)]
    frames += [rng.integers(0, 256, (20, 24, 3)).astype(np.uint8)
               for _ in range(3)]
    row = _one(frames)
    assert row["n_frames"] == 6
    assert row["n_cuts"] == 1
    assert row["first_cut_idx"] == 3      # later frame of the jump
    assert row["max_delta_milli"] >= 300
    assert row["has_cut"] == 1


def test_identical_frames_zero_deltas():
    still = np.full((16, 16, 3), 90, np.uint8)
    row = _one([still] * 5)
    assert row["n_cuts"] == 0
    assert row["first_cut_idx"] == -1
    assert row["max_delta_milli"] == 0
    assert row["has_cut"] == 0


def test_single_frame_clip():
    row = _one([_smooth(16, 16, 0)])
    assert row["n_frames"] == 1
    assert row["n_cuts"] == 0
    assert row["first_cut_idx"] == -1
    assert row["max_delta_milli"] == 0


def test_two_cuts_counted():
    rng = np.random.default_rng(11)
    noise = [rng.integers(0, 256, (18, 18, 3)).astype(np.uint8)
             for _ in range(2)]
    frames = [_smooth(18, 18, 0), _smooth(18, 18, 1),
              noise[0], noise[1],
              _smooth(18, 18, 2), _smooth(18, 18, 3)]
    row = _one(frames)
    # smooth→noise at idx 2 and noise→smooth at idx 4
    assert row["n_cuts"] == 2
    assert row["first_cut_idx"] == 2


def test_kernel_never_decodes_frames(monkeypatch):
    """Index-only contract: the kernel must not call the PNG decoder."""
    import darc_ray.functions.image as img

    def boom(*a, **k):
        raise AssertionError("decode called")

    monkeypatch.setattr(img, "png_decode", boom)
    row = _one([_smooth(16, 16, f) for f in range(3)])
    assert row["n_frames"] == 3
