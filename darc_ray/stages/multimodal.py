"""Multimodal column stages: opaque binary payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

The decode kernels are the engine's own codecs: PNG is a real codec
(``darc_ray.functions.image``), and JPEG is a real ITU-T T.81
decoder/encoder (``darc_ray.functions.jpeg`` — ``FF D8`` payloads
route through it via ``image.decode``; baseline validated against
libjpeg-encoded files, progressive SOF2 decoded with spectral
selection + successive approximation and validated against a
real-world progressive file + a baseline-equal round trip).  Audio is
a real RIFF/WAVE PCM16 codec; video is the FVID frame container with
real PNG frames.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from darc_ray.functions import image as img


class ImageFeatureStage:
    """Actor stage: decode → (phash, psnr-vs-reencode, dims).

    Stateful setup (DCT basis warm-up) happens once per actor; each
    batch is decoded row-at-a-time (decode is inherently per-payload)
    with numpy-vectorized per-image kernels.  Batches should be small —
    wide binary rows (ray_guide: memory-aware)."""

    def __init__(self) -> None:
        from darc_ray.functions.image import _dct_matrix

        _dct_matrix(32)                       # warm the DCT basis once

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        phash, w, h, psnr_ok = [], [], [], []
        for payload, fmt in zip(payloads, fmts):
            pix = img.decode(payload, fmt)
            phash.append(img.phash64(pix))
            h.append(pix.shape[0])
            w.append(pix.shape[1])
            # re-encode with the codec family the payload actually used
            # (FF D8 → the real T.81 codec) — the input_hint PSNR gate
            rt = img.lossy_roundtrip(pix, payload, fmt)
            p = img.psnr(pix, rt)
            psnr_ok.append(bool(p == float("inf") or p >= 40.0))
        return pa.Table.from_pydict({
            "image_id": pa.array(ids),
            "w": pa.array(w, type=pa.int32()),
            "h": pa.array(h, type=pa.int32()),
            "fmt": pa.array(fmts),
            "phash": pa.array(phash, type=pa.int64()),
            "psnr_ok": pa.array(psnr_ok)})


class AudioFeatureStage:
    """Actor stage over opaque audio ``binary`` columns: WAV decode →
    (duration, RMS, zero-crossing rate, spectral centroid).  The WAV
    codec is real (functions/audio.py); decode happens once per row,
    features are numpy-vectorized per clip.  Small batches — wide
    binary rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from darc_ray.functions import audio as aud

        ids = batch.column("audio_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        dur, level, zcr, cent, srs = [], [], [], [], []
        for payload in payloads:
            samples, sr = aud.wav_decode(payload)
            srs.append(sr)
            dur.append(round(samples.shape[0] / sr, 6))
            level.append(round(aud.rms(samples), 6))
            zcr.append(round(aud.zero_crossing_rate(samples), 6))
            cent.append(round(aud.spectral_centroid(samples, sr), 2))
        return pa.Table.from_pydict({
            "audio_id": pa.array(ids),
            "sample_rate": pa.array(srs, type=pa.int32()),
            "duration_s": pa.array(dur, type=pa.float64()),
            "rms": pa.array(level, type=pa.float64()),
            "zcr": pa.array(zcr, type=pa.float64()),
            "spectral_centroid_hz": pa.array(cent, type=pa.float64())})


class VideoFrameStage:
    """Actor stage over opaque video ``binary`` columns: container
    index → sample every Nth frame (unsampled frames never
    decompressed) → per-frame phash.  One input row explodes to
    ≤ max_frames output rows (flat_map shape)."""

    def __init__(self, every_n: int = 2, max_frames: int = 4) -> None:
        from darc_ray.functions.image import _dct_matrix

        _dct_matrix(32)
        self.every_n = every_n
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from darc_ray.functions import video as vid

        ids = batch.column("video_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        out_id, out_idx, out_ph, out_w, out_h = [], [], [], [], []
        for vid_id, payload in zip(ids, payloads):
            for idx, pix in vid.sample_frames(payload, self.every_n,
                                              self.max_frames):
                out_id.append(vid_id)
                out_idx.append(idx)
                out_ph.append(img.phash64(pix))
                out_h.append(pix.shape[0])
                out_w.append(pix.shape[1])
        return pa.Table.from_pydict({
            "video_id": pa.array(out_id),
            "frame_idx": pa.array(out_idx, type=pa.int32()),
            "w": pa.array(out_w, type=pa.int32()),
            "h": pa.array(out_h, type=pa.int32()),
            "phash": pa.array(out_ph, type=pa.int64())})


def synth_audio_rows(seed_ids: list[int], sample_rate: int = 8000) -> pa.Table:
    """Deterministic audio+caption rows: seeded sine mixtures + noise,
    real PCM16 WAV bytes."""
    from darc_ray.functions import audio as aud

    rows: dict[str, list] = {"audio_id": [], "bytes": [], "sample_rate": [],
                             "n_samples": [], "caption": []}
    for sid in seed_ids:
        rng = np.random.default_rng(int(sid) + 11)
        n = int(rng.integers(sample_rate // 4, sample_rate))
        t = np.arange(n) / sample_rate
        f0 = float(rng.uniform(100, 1500))
        x = (0.5 * np.sin(2 * np.pi * f0 * t)
             + 0.2 * np.sin(2 * np.pi * 2.5 * f0 * t)
             + 0.05 * rng.standard_normal(n))
        samples = np.clip(x * 20000, -32768, 32767).astype(np.int16)
        rows["audio_id"].append(f"aud-{sid}")
        rows["bytes"].append(aud.wav_encode(samples, sample_rate))
        rows["sample_rate"].append(sample_rate)
        rows["n_samples"].append(n)
        rows["caption"].append(f"aud-{sid}: tone {int(f0)} Hz")
    return pa.Table.from_pydict({
        "audio_id": pa.array(rows["audio_id"]),
        "bytes": pa.array(rows["bytes"], type=pa.large_binary()),
        "sample_rate": pa.array(rows["sample_rate"], type=pa.int32()),
        "n_samples": pa.array(rows["n_samples"], type=pa.int32()),
        "caption": pa.array(rows["caption"])})


def synth_video_rows(seed_ids: list[int], fps: int = 8) -> pa.Table:
    """Deterministic video+caption rows: seeded moving-gradient frames
    in the FVID container (real PNG frames)."""
    from darc_ray.functions import video as vid

    rows: dict[str, list] = {"video_id": [], "bytes": [], "fps": [],
                             "n_frames": [], "caption": []}
    for sid in seed_ids:
        rng = np.random.default_rng(int(sid) + 23)
        n_frames = int(rng.integers(4, 9))
        hh, ww = int(rng.integers(16, 33)), int(rng.integers(16, 33))
        frames = []
        for f in range(n_frames):
            yy, xx = np.mgrid[0:hh, 0:ww]
            base = 128 + 90 * np.sin(2 * np.pi * (xx + 3 * f + int(sid)) / ww)
            frames.append(np.clip(base[..., None]
                                  + rng.integers(-8, 9, (hh, ww, 3)),
                                  0, 255).astype(np.uint8))
        rows["video_id"].append(f"vid-{sid}")
        rows["bytes"].append(vid.video_encode(frames, fps))
        rows["fps"].append(fps)
        rows["n_frames"].append(n_frames)
        rows["caption"].append(f"vid-{sid}: {n_frames} frames")
    return pa.Table.from_pydict({
        "video_id": pa.array(rows["video_id"]),
        "bytes": pa.array(rows["bytes"], type=pa.large_binary()),
        "fps": pa.array(rows["fps"], type=pa.int32()),
        "n_frames": pa.array(rows["n_frames"], type=pa.int32()),
        "caption": pa.array(rows["caption"])})


def synth_image_rows(seed_ids: list[int], caption_words: list[str],
                     fmt_cycle: tuple[str, ...] = ("png", "jpeg")) -> pa.Table:
    """Deterministic image+caption rows in the input_hint schema, one
    per seed id (used to exercise multimodal stages over driver tables
    that carry no real images)."""
    rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": [],
            "caption": [], "phash": []}
    for i, sid in enumerate(seed_ids):
        rng = np.random.default_rng(int(sid) + 1)
        hh = int(rng.integers(24, 56))
        ww = int(rng.integers(24, 56))
        yy, xx = np.mgrid[0:hh, 0:ww]
        base = 128 + 80 * np.sin(2 * np.pi * (xx + int(sid)) / ww)
        pix = np.clip(base[..., None] + rng.integers(-10, 11, (hh, ww, 3)),
                      0, 255).astype(np.uint8)
        fmt = fmt_cycle[i % len(fmt_cycle)]
        data = img.encode(pix, fmt)
        rows["image_id"].append(f"doc-{sid}")
        rows["bytes"].append(data)
        rows["w"].append(ww)
        rows["h"].append(hh)
        rows["fmt"].append(fmt)
        rows["caption"].append(f"doc-{sid}: " + " ".join(caption_words[:6]))
        rows["phash"].append(img.phash64(img.decode(data, fmt)))
    from darc_ray.schemas import IMAGES

    return pa.Table.from_pydict(rows, schema=IMAGES)
