"""Multimodal kernels + stages: WAV codec exactness, audio features,
video container/sampling, and the actor-pool stages over synthetic
rows (brief: multimodal columns as opaque binary + typed metadata)."""

from __future__ import annotations

import numpy as np
import pytest

from darc_ray.functions import audio as aud
from darc_ray.functions import video as vid
from darc_ray.functions.image import png_encode


# ---------------------------------------------------------------- audio
def test_wav_roundtrip_bit_exact():
    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32767, 4000, dtype=np.int16)
    stereo = rng.integers(-32768, 32767, (4000, 2), dtype=np.int16)
    got, sr = aud.wav_decode(aud.wav_encode(mono, 8000))
    assert sr == 8000 and np.array_equal(got[:, 0], mono)
    got2, sr2 = aud.wav_decode(aud.wav_encode(stereo, 44100))
    assert sr2 == 44100 and np.array_equal(got2, stereo)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        aud.wav_decode(b"RIFFxxxxJUNK")
    with pytest.raises(ValueError):
        aud.wav_decode(b"not a wav at all")


def test_audio_features_known_signal():
    sr = 8000
    t = np.arange(sr) / sr                      # 1 s
    pure = (np.sin(2 * np.pi * 1000 * t) * 20000).astype(np.int16)
    # RMS of a sine = amplitude/sqrt(2)
    assert abs(aud.rms(pure) - (20000 / 32768) / np.sqrt(2)) < 1e-3
    # 1 kHz sine crosses zero 2000x per second
    assert abs(aud.zero_crossing_rate(pure) - 2000 / sr) < 1e-3
    # centroid of a pure tone = its frequency
    assert abs(aud.spectral_centroid(pure, sr) - 1000) < 15
    silent = np.zeros(100, dtype=np.int16)
    assert aud.rms(silent) == 0.0
    assert aud.spectral_centroid(silent, sr) == 0.0


# ---------------------------------------------------------------- video
def _frames(n, h=20, w=24, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_video_container_roundtrip():
    frames = _frames(6)
    data = vid.video_encode(frames, fps=10)
    fps, spans = vid.video_index(data)
    assert fps == 10 and len(spans) == 6
    for i, span in enumerate(spans):
        assert np.array_equal(vid.decode_frame_at(data, span), frames[i])


def test_frame_sampling_skips_decode():
    frames = _frames(9)
    data = vid.video_encode(frames, fps=5)
    got = vid.sample_frames(data, every_n=3)
    assert [i for i, _ in got] == [0, 3, 6]
    assert all(np.array_equal(p, frames[i]) for i, p in got)
    capped = vid.sample_frames(data, every_n=1, max_frames=2)
    assert [i for i, _ in capped] == [0, 1]


def test_video_rejects_garbage():
    with pytest.raises(ValueError):
        vid.video_index(b"NOPE" + b"\x00" * 16)
    # a PNG alone is not a video container
    with pytest.raises(ValueError):
        vid.video_index(png_encode(np.zeros((4, 4, 3), dtype=np.uint8)))


# ---------------------------------------------------------------- stages
def test_audio_stage_over_dataset(ray_session):
    import ray.data as rd

    from darc_ray.stages.multimodal import AudioFeatureStage, synth_audio_rows

    table = synth_audio_rows(list(range(12)))
    out = (rd.from_arrow(table)
           .map_batches(AudioFeatureStage, batch_format="pyarrow",
                        batch_size=4, concurrency=2)
           .to_pandas())
    assert len(out) == 12
    assert (out["duration_s"] > 0).all()
    assert (out["rms"] > 0.1).all()             # tones, not silence
    assert (out["spectral_centroid_hz"] > 50).all()


def test_video_stage_explodes_frames(ray_session):
    import ray.data as rd

    from darc_ray.stages.multimodal import VideoFrameStage, synth_video_rows

    table = synth_video_rows(list(range(8)))
    out = (rd.from_arrow(table)
           .map_batches(VideoFrameStage, fn_constructor_args=(2, 4),
                        batch_format="pyarrow", batch_size=4, concurrency=2)
           .to_pandas())
    n_frames = dict(zip(table.column("video_id").to_pylist(),
                        table.column("n_frames").to_pylist()))
    for vid_id, g in out.groupby("video_id"):
        want = min(4, -(-n_frames[vid_id] // 2))    # every 2nd, capped at 4
        assert len(g) == want
        assert list(g["frame_idx"]) == [2 * i for i in range(want)]
    assert (out["phash"] != 0).any()
