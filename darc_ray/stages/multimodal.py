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


class ImageTransformStage:
    """Actor stage: decode → center-crop to the short side → bilinear
    resize to ``size``×``size`` → re-encode PNG (lossless sink) — the
    standard vision-training thumbnail prep.  Output rows carry the
    thumbnail payload plus its phash so downstream dedup never
    re-decodes.  DCT basis warms once per actor; resample/resize are
    fully vectorized numpy."""

    def __init__(self, size: int = 32) -> None:
        from darc_ray.functions.image import _dct_matrix

        _dct_matrix(32)
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        out_bytes, out_ph, src_w, src_h = [], [], [], []
        for payload, fmt in zip(payloads, fmts):
            pix = img.decode(payload, fmt)
            src_h.append(pix.shape[0])
            src_w.append(pix.shape[1])
            thumb = img.thumbnail(pix, self.size)
            out_bytes.append(img.png_encode(thumb))
            out_ph.append(img.phash64(thumb))
        return pa.Table.from_pydict({
            "image_id": pa.array(ids),
            "src_w": pa.array(src_w, type=pa.int32()),
            "src_h": pa.array(src_h, type=pa.int32()),
            "thumb_w": pa.array([self.size] * len(ids), type=pa.int32()),
            "thumb_bytes": pa.array(out_bytes, type=pa.large_binary()),
            "thumb_phash": pa.array(out_ph, type=pa.int64())})


class ImageTranscodeStage:
    """Actor stage: decode any payload → re-encode with the REAL T.81
    baseline JPEG encoder (4:4:4, quality knob) → size ratio + PSNR of
    the round trip — the storage-tiering transcode of an image corpus
    (keep originals cold, serve compact JPEGs hot)."""

    def __init__(self, quality: int = 85) -> None:
        self.quality = quality

    def __call__(self, batch: pa.Table) -> pa.Table:
        from darc_ray.functions.jpeg import jpeg_decode, jpeg_encode

        ids = batch.column("image_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        out_size, ratio, out_psnr = [], [], []
        for payload, fmt in zip(payloads, fmts):
            pix = img.decode(payload, fmt)
            data = jpeg_encode(pix, quality=self.quality)
            rt = jpeg_decode(data)
            out_size.append(len(data))
            ratio.append(round(len(data) / max(1, len(payload)), 6))
            p = img.psnr(pix, rt)
            out_psnr.append(round(p, 4) if p != float("inf") else -1.0)
        return pa.Table.from_pydict({
            "image_id": pa.array(ids),
            "jpeg_bytes": pa.array(out_size, type=pa.int64()),
            "size_ratio": pa.array(ratio, type=pa.float64()),
            "psnr_db": pa.array(out_psnr, type=pa.float64())})


class ImageQualityStage:
    """Actor stage: decode → LAION-style quality gate columns — min-dim
    / aspect-ratio bounds, brightness window, near-solid (contrast)
    detection — plus the raw statistics, so the filter itself is a
    cheap vectorized predicate over this stage's output."""

    def __init__(self, min_dim: int = 16, max_aspect: float = 2.5,
                 min_brightness: float = 20.0, max_brightness: float = 235.0) -> None:
        self.min_dim = min_dim
        self.max_aspect = max_aspect
        self.lo = min_brightness
        self.hi = max_brightness

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        w, h, bright, contrast, sat, keep = [], [], [], [], [], []
        for payload, fmt in zip(payloads, fmts):
            pix = img.decode(payload, fmt)
            stats = img.channel_stats(pix)
            hh, ww = pix.shape[:2]
            h.append(hh)
            w.append(ww)
            bright.append(round(stats["brightness"], 4))
            contrast.append(round(stats["contrast"], 4))
            sat.append(round(stats["saturation"], 4))
            aspect = max(hh, ww) / max(1, min(hh, ww))
            keep.append(bool(
                min(hh, ww) >= self.min_dim
                and aspect <= self.max_aspect
                and self.lo <= stats["brightness"] <= self.hi
                and not stats["near_solid"]))
        return pa.Table.from_pydict({
            "image_id": pa.array(ids),
            "w": pa.array(w, type=pa.int32()),
            "h": pa.array(h, type=pa.int32()),
            "brightness": pa.array(bright, type=pa.float64()),
            "contrast": pa.array(contrast, type=pa.float64()),
            "saturation": pa.array(sat, type=pa.float64()),
            "keep": pa.array(keep)})


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


def synth_image_variants(seed_ids: list[int], caption_words: list[str],
                         dup_every: int = 5, bad_every: int = 7) -> pa.Table:
    """Deterministic image corpus with planted NEAR-DUPLICATES (every
    ``dup_every``-th row gets a pixel-perturbed re-encoded copy, id
    suffixed ``-dup``) and QUALITY-FAIL rows (every ``bad_every``-th
    row also gets a near-solid / tiny / extreme-aspect sibling, id
    suffixed ``-bad``) — the fixture for image dedup + quality-gate
    operators."""
    base = synth_image_rows(seed_ids, caption_words)
    rows = base.to_pylist()
    extra = []
    for i, (sid, row) in enumerate(zip(seed_ids, rows)):
        rng = np.random.default_rng(int(sid) + 7001)
        if dup_every and i % dup_every == 0:
            pix = img.decode(row["bytes"], row["fmt"])
            noisy = np.clip(pix.astype(np.int16)
                            + rng.integers(-1, 2, pix.shape), 0, 255).astype(np.uint8)
            data = img.encode(noisy, row["fmt"])
            extra.append({**row, "image_id": row["image_id"] + "-dup",
                          "bytes": data,
                          "phash": img.phash64(img.decode(data, row["fmt"]))})
        if bad_every and i % bad_every == 0:
            kind = i // bad_every % 3
            if kind == 0:       # near-solid
                pix = np.full((40, 40, 3), int(rng.integers(0, 256)), np.uint8)
            elif kind == 1:     # tiny
                pix = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
            else:               # extreme aspect
                pix = rng.integers(0, 256, (10, 64, 3)).astype(np.uint8)
            data = img.encode(pix, "png")
            extra.append({"image_id": row["image_id"] + "-bad", "bytes": data,
                          "w": pix.shape[1], "h": pix.shape[0], "fmt": "png",
                          "caption": row["caption"] + " (bad)",
                          "phash": img.phash64(pix)})
    from darc_ray.schemas import IMAGES

    return pa.concat_tables([base, pa.Table.from_pylist(extra, schema=IMAGES)])


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


META_FIXTURE = "/tmp/darc_ray_fixtures/image_meta.parquet"


def ensure_image_meta_fixture(path: str = META_FIXTURE) -> str:
    """Deterministic mixed-container corpus for the header-scan family
    (PNG, FJPG, real T.81 baseline AND progressive JPEG), written
    atomically to a FIXED path so the Ray query and the DuckDB oracle
    read bit-identical bytes regardless of which side runs first.
    Content depends only on constants (never sf_dir — the header scan
    exercises container parsing, not corpus data), so concurrent
    writers converge on the same file."""
    import os
    import tempfile

    from darc_ray.functions.jpeg import jpeg_encode, jpeg_encode_progressive

    rows = {"image_id": [], "bytes": []}
    for i in range(16):
        rng = np.random.default_rng(9000 + i)
        hh, ww = int(rng.integers(16, 48)), int(rng.integers(16, 48))
        yy, xx = np.mgrid[0:hh, 0:ww]
        base = 120 + 70 * np.sin(2 * np.pi * (xx + 3 * i) / ww)
        pix = np.clip(base[..., None] + rng.integers(-9, 10, (hh, ww, 3)),
                      0, 255).astype(np.uint8)
        rows["image_id"].append(f"img-{i:02d}-png")
        rows["bytes"].append(img.png_encode(pix))
        rows["image_id"].append(f"img-{i:02d}-fjpg")
        rows["bytes"].append(img.fake_jpeg_encode(pix))
        rows["image_id"].append(f"img-{i:02d}-jpg")
        rows["bytes"].append(jpeg_encode(pix, quality=88))
        if i % 4 == 0:
            rows["image_id"].append(f"img-{i:02d}-prog")
            rows["bytes"].append(jpeg_encode_progressive(pix, quality=88))
        if i % 4 == 1:
            # WebP trio (real container headers over stub payloads —
            # the metadata family is header-only by design): lossy
            # VP8, lossless VP8L w/ alpha, extended VP8X canvas
            flavor, alpha = (("vp8", False), ("vp8l", True),
                             ("vp8x", i % 8 == 5))[(i // 4) % 3]
            rows["image_id"].append(f"img-{i:02d}-webp")
            rows["bytes"].append(img.make_webp(ww, hh, flavor, alpha))
    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


def image_meta_batch(batch: "pa.Table") -> "pa.Table":
    """Header-only metadata scan over a binary image column — per-row
    dispatch on magic bytes (``functions.image.image_meta``); O(header
    segments) per row, no pixel decode, so the 100 TB pass reads
    ``header_bytes`` per object, not the object.  Stateless → plain
    task ``map_batches``, no actor pool needed."""
    from darc_ray.functions.image import image_meta

    ids = batch.column("image_id").to_pylist()
    out: dict[str, list] = {"image_id": [], "fmt_detected": [], "width": [],
                            "height": [], "depth": [], "components": [],
                            "progressive": [], "header_bytes": []}
    for iid, payload in zip(ids, batch.column("bytes").to_pylist()):
        m = image_meta(payload)
        out["image_id"].append(iid)
        for k in ("fmt_detected", "width", "height", "depth",
                  "components", "progressive", "header_bytes"):
            out[k].append(m[k])
    return pa.Table.from_pydict(out)


PIXELS_FIXTURE = "/tmp/darc_ray_fixtures/image_pixels.parquet"


def ensure_image_pixels_fixture(path: str = PIXELS_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus (uncompressed ``RAWI`` containers
    — the BMP-class payload) with planted near-dup (``-dup``, ±1 pixel
    noise) and quality-fail (``-bad``: near-solid / tiny / extreme-
    aspect) rows, plus the stored 64-bit phash column.  Fixed path +
    atomic write + sf-independence, same contract as
    ``ensure_image_meta_fixture``: the DuckDB oracles for the
    quality-gate and pooled-thumbnail families re-derive their integer
    kernels from these BYTES via hex arithmetic, which is why the
    payload is uncompressed."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": [], "w": [], "h": [], "phash": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(pix))
        rows["w"].append(pix.shape[1])
        rows["h"].append(pix.shape[0])
        rows["phash"].append(img.phash64(pix))

    for i in range(32):
        rng = np.random.default_rng(8200 + i)
        hh, ww = int(rng.integers(24, 56)), int(rng.integers(24, 56))
        yy, xx = np.mgrid[0:hh, 0:ww]
        base = 128 + 80 * np.sin(2 * np.pi * (xx + 2 * i) / ww)
        pix = np.clip(base[..., None] + rng.integers(-10, 11, (hh, ww, 3)),
                      0, 255).astype(np.uint8)
        add(f"pix-{i:02d}", pix)
        if i % 5 == 0:
            noisy = np.clip(pix.astype(np.int16)
                            + rng.integers(-1, 2, pix.shape),
                            0, 255).astype(np.uint8)
            add(f"pix-{i:02d}-dup", noisy)
        if i % 7 == 0:
            kind = i // 7 % 3
            if kind == 0:       # near-solid
                bad = np.full((40, 40, 3), int(rng.integers(60, 200)),
                              np.uint8)
            elif kind == 1:     # tiny
                bad = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
            else:               # extreme aspect
                bad = rng.integers(0, 256, (10, 64, 3)).astype(np.uint8)
            add(f"pix-{i:02d}-bad", bad)
    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary()),
                                ("w", pa.int32()), ("h", pa.int32()),
                                ("phash", pa.int64())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_quality_gate_batch(batch: "pa.Table") -> "pa.Table":
    """INTEGER quality gate over raw-pixel payloads — the bit-
    reproducible twin of ``ImageQualityStage`` (which keeps the float
    LAION-style stats): BT.601 luma in milli-units (299r+587g+114b),
    brightness = Σ//n, contrast as the exact integer variance
    (n·Σg²−(Σg)²)//n², saturation = channel-spread mean.  Every
    operation is integer floor-division on non-negative values, so the
    DuckDB hex-walk oracle reproduces it bit-for-bit."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "brightness_milli", "contrast_var",
        "saturation_milli", "keep")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        h, w = pix.shape[:2]
        n = h * w
        gm = 299 * pix[..., 0] + 587 * pix[..., 1] + 114 * pix[..., 2]
        s1, s2 = int(gm.sum()), int((gm * gm).sum())
        spread = int((pix.max(axis=-1) - pix.min(axis=-1)).sum())
        brightness = s1 // n
        contrast_var = (n * s2 - s1 * s1) // (n * n)
        saturation = spread * 1000 // n
        keep = int(30_000 <= brightness <= 225_000
                   and contrast_var >= 25_000_000
                   and min(h, w) >= 12 and max(h, w) * 10 <= min(h, w) * 30)
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["brightness_milli"].append(brightness)
        out["contrast_var"].append(contrast_var)
        out["saturation_milli"].append(saturation)
        out["keep"].append(keep)
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string()),
                               ("width", pa.int64()), ("height", pa.int64()),
                               ("brightness_milli", pa.int64()),
                               ("contrast_var", pa.int64()),
                               ("saturation_milli", pa.int64()),
                               ("keep", pa.int64())]))


def image_thumbs_pooled_batch(batch: "pa.Table") -> "pa.Table":
    """INTEGER 8×8 pooled thumbnail over raw-pixel payloads: center-
    crop to the inscribed square (side s = min(h, w)), assign each
    crop pixel to cell (y·8//s, x·8//s), then per-cell mean of the
    milli-luma as exact integer floor division — one output row per
    (image, cell).  The SQL oracle re-derives the same 64 cells from
    the hex bytes; the float bilinear thumbnail stage
    (``ImageTransformStage``) stays the production path."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {"image_id": [], "by": [], "bx": [],
                            "mean_milli": []}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        h, w = pix.shape[:2]
        s = min(h, w)
        if s < 8:
            # below 8px the 8×8 grid has empty cells (cnt=0 → //0),
            # and the SQL oracle's GROUP BY would drop those rows —
            # reject loudly instead of silently diverging from it
            raise ValueError(
                f"image {iid}: min(h, w) = {s} < 8; pooled 8x8 "
                "thumbnails need at least an 8px inscribed square")
        y0, x0 = (h - s) // 2, (w - s) // 2
        crop = pix[y0:y0 + s, x0:x0 + s]
        gm = 299 * crop[..., 0] + 587 * crop[..., 1] + 114 * crop[..., 2]
        idx = np.arange(s) * 8 // s
        sums = np.zeros((8, 8), dtype=np.int64)
        cnts = np.zeros((8, 8), dtype=np.int64)
        np.add.at(sums, (idx[:, None].repeat(s, 1), idx[None, :].repeat(s, 0)), gm)
        np.add.at(cnts, (idx[:, None].repeat(s, 1), idx[None, :].repeat(s, 0)), 1)
        mean = sums // cnts
        for by in range(8):
            for bx in range(8):
                out["image_id"].append(iid)
                out["by"].append(by)
                out["bx"].append(bx)
                out["mean_milli"].append(int(mean[by, bx]))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string()),
                               ("by", pa.int64()), ("bx", pa.int64()),
                               ("mean_milli", pa.int64())]))


BORDERS_FIXTURE = "/tmp/darc_ray_fixtures/image_borders.parquet"


def ensure_image_borders_fixture(path: str = BORDERS_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the border/color families:
    textured RGB content (an integer gradient varying along BOTH axes,
    so every content row and column is non-uniform) with planted
    letterbox (``-lb``), pillarbox (``-pb``), boxed (``-box``),
    grayscale (``-gray``), posterized-palette (``-poster``) and
    fully-solid (``-solid``) rows.  All pixel values are exact
    integers (no float, no clipping ambiguity) so the DuckDB hex-walk
    oracles re-derive the kernels bit-for-bit.  Fixed path + atomic
    write + ALWAYS rewritten (no stale-exists early return),
    sf-independent — same contract as ``ensure_image_pixels_fixture``."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def content(hh: int, ww: int, i: int, gray: bool = False) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        v = (40 + (31 * xx + 17 * yy + 7 * i) % 160).astype(np.uint8)
        if gray:
            return np.repeat(v[..., None], 3, axis=2)
        g = (40 + (31 * xx + 17 * yy + 7 * i + 35) % 160).astype(np.uint8)
        b = (40 + (31 * xx + 17 * yy + 7 * i + 70) % 160).astype(np.uint8)
        return np.stack([v, g, b], axis=2)

    for i in range(16):
        hh, ww = 20 + (5 * i) % 21, 22 + (7 * i) % 19
        flavor = i % 5
        if flavor == 0:
            add(f"bdr-{i:02d}-plain", content(hh, ww, i))
        elif flavor == 1:
            pix = content(hh, ww, i)
            t, b = 2 + i % 4, 1 + i % 3
            pix[:t] = (8 + i) % 40
            pix[hh - b:] = (8 + i) % 40
            add(f"bdr-{i:02d}-lb", pix)
        elif flavor == 2:
            pix = content(hh, ww, i)
            l, r = 1 + i % 4, 2 + i % 3
            pix[:, :l] = 245 - i
            pix[:, ww - r:] = 245 - i
            add(f"bdr-{i:02d}-pb", pix)
        elif flavor == 3:
            pix = content(hh, ww, i)
            t, b, l, r = 1 + i % 3, 2 + i % 2, 2 + i % 3, 1 + i % 2
            pix[:t] = 0
            pix[hh - b:] = 0
            pix[:, :l] = 0
            pix[:, ww - r:] = 0
            add(f"bdr-{i:02d}-box", pix)
        else:
            add(f"bdr-{i:02d}-gray", content(hh, ww, i, gray=True))
    # ≤16-distinct-color palette rows (low-complexity junk) + a solid
    palette = np.array([[200, 30, 30], [30, 200, 30], [30, 30, 200],
                        [220, 220, 40], [40, 220, 220], [220, 40, 220],
                        [120, 60, 20], [20, 120, 60]], dtype=np.uint8)
    for j, (hh, ww) in enumerate(((24, 30), (27, 25))):
        yy, xx = np.mgrid[0:hh, 0:ww]
        idx = (7 * xx + 13 * yy + j) % len(palette)
        add(f"bdr-poster-{j}", palette[idx])
    add("bdr-solid", np.full((24, 24, 3), 77, np.uint8))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_letterbox_batch(batch: "pa.Table") -> "pa.Table":
    """Uniform-border (letterbox/pillarbox) detection over raw-pixel
    payloads — the LAION-style bar-crop pass: a border row/column is
    one whose pixels are ALL a single color; ``bar_top`` = count of
    consecutive single-color rows from the top edge (= index of the
    first non-uniform row), likewise bottom/left/right; a fully
    uniform image crops to 0×0 (top = h, left = w by convention, so
    the four bars never double-count).  Pure integer comparisons →
    the DuckDB hex-walk oracle (min=max per channel per row/column)
    is bit-exact.  Stateless vectorized ``map_batches`` — no shuffle,
    embarrassingly parallel at 100 TB."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "bar_top", "bar_bottom",
        "bar_left", "bar_right", "crop_w", "crop_h", "bars")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload)
        h, w = pix.shape[:2]
        row_uni = (pix == pix[:, :1, :]).all(axis=(1, 2))
        col_uni = (pix == pix[:1, :, :]).all(axis=(0, 2))
        ri = np.flatnonzero(~row_uni)
        ci = np.flatnonzero(~col_uni)
        top, bottom = (h, 0) if len(ri) == 0 else (int(ri[0]),
                                                   h - 1 - int(ri[-1]))
        left, right = (w, 0) if len(ci) == 0 else (int(ci[0]),
                                                   w - 1 - int(ci[-1]))
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["bar_top"].append(top)
        out["bar_bottom"].append(bottom)
        out["bar_left"].append(left)
        out["bar_right"].append(right)
        out["crop_w"].append(w - left - right)
        out["crop_h"].append(h - top - bottom)
        out["bars"].append(int(top + bottom + left + right > 0))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "bar_top",
                                  "bar_bottom", "bar_left", "bar_right",
                                  "crop_w", "crop_h", "bars")]))


def image_color_stats_batch(batch: "pa.Table") -> "pa.Table":
    """Grayscale / low-color-complexity gate over raw-pixel payloads
    (the DataComp-style monochrome + solid/posterized junk filter):
    ``gray`` = exact r=g=b everywhere, ``near_gray_milli`` =
    Σ(|r−g|+|g−b|)·1000//n, ``distinct_colors`` = exact distinct
    (r,g,b) count, ``low_complexity`` = ≤16 distinct colors, ``keep``
    = colorful AND complex.  All-integer → bit-exact vs the DuckDB
    hex-walk oracle.  Stateless ``map_batches``, no shuffle."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "gray", "near_gray_milli",
        "distinct_colors", "low_complexity", "keep")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        h, w = pix.shape[:2]
        n = h * w
        sd = int((np.abs(pix[..., 0] - pix[..., 1])
                  + np.abs(pix[..., 1] - pix[..., 2])).sum())
        key = (pix[..., 0] << 16) | (pix[..., 1] << 8) | pix[..., 2]
        dc = int(np.unique(key).size)
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["gray"].append(int(sd == 0))
        out["near_gray_milli"].append(sd * 1000 // n)
        out["distinct_colors"].append(dc)
        out["low_complexity"].append(int(dc <= 16))
        out["keep"].append(int(sd > 0 and dc > 16))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "gray",
                                  "near_gray_milli", "distinct_colors",
                                  "low_complexity", "keep")]))


def image_entropy_batch(batch: "pa.Table") -> "pa.Table":
    """Luma-histogram ENTROPY gate over raw-pixel payloads — the
    information-content complement of `image_edge_density` (a smooth
    full-range gradient is edge-flat but entropy-rich; a two-tone
    checkerboard is edge-dense but entropy-poor): per image, bucket
    BT.601 milli-luma (299r+587g+114b) into 256 levels (//1000), then
    H = Σ (c/N)·ln(N/c) with every class term floored to integer
    MICRO-NATS before the sum (the `char_entropy` quantization rule —
    order-independent, bit-matched by the SQL hex-walk oracle).
    Output: n_px, distinct levels, entropy micro-nats, and `textured`
    (≥ 3 nats — the planted posterized flavors sit at ln(8)≈2.08 nats,
    real textures ≥ 3.7; flat/posterized junk falls below).  Stateless
    ``map_batches``, no shuffle."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "n_px", "n_levels", "entropy_unats", "textured")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        gm = (299 * pix[..., 0] + 587 * pix[..., 1]
              + 114 * pix[..., 2]) // 1000
        n = gm.size
        _, counts = np.unique(gm, return_counts=True)
        c = counts.astype(np.float64)
        term = np.floor((c / n) * np.log(n / c) * 1e6).astype(np.int64)
        ent = int(term.sum())
        out["image_id"].append(iid)
        out["n_px"].append(n)
        out["n_levels"].append(len(counts))
        out["entropy_unats"].append(ent)
        out["textured"].append(int(ent >= 3_000_000))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("n_px", "n_levels", "entropy_unats",
                                  "textured")]))


def image_edge_density_batch(batch: "pa.Table") -> "pa.Table":
    """Integer sharpness/blur gate over raw-pixel payloads: per pixel,
    milli-luma gradient = |gm(y,x)−gm(y,x+1)| + |gm(y,x)−gm(y+1,x)|
    over the (h−1)×(w−1) interior, ``edge_milli`` = Σgrad·1000 //
    interior-count, ``sharp`` = edge_milli above a flat-content
    threshold.  All-integer (abs/diff/floor-div) → bit-exact vs the
    DuckDB hex-walk oracle, which reads the right/down neighbors at
    byte offsets i+1 and i+w.  Stateless ``map_batches``, no shuffle —
    the DataComp-style blur/flat filter."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "edge_milli", "sharp")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        h, w = pix.shape[:2]
        gm = 299 * pix[..., 0] + 587 * pix[..., 1] + 114 * pix[..., 2]
        gx = np.abs(gm[:h - 1, :w - 1] - gm[:h - 1, 1:])
        gy = np.abs(gm[:h - 1, :w - 1] - gm[1:, :w - 1])
        n = (h - 1) * (w - 1)
        edge = int((gx + gy).sum()) * 1000 // n if n else 0
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["edge_milli"].append(edge)
        out["sharp"].append(int(edge >= 8_000_000))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "edge_milli",
                                  "sharp")]))


def image_dominant_color_batch(batch: "pa.Table") -> "pa.Table":
    """Dominant-color share over raw-pixel payloads: the most frequent
    exact (r,g,b) (ties → smallest packed key) and its per-mille share
    — the banner/solid-background junk signal.  Exact counts +
    deterministic tie-break → bit-exact vs the DuckDB oracle's
    ``row_number() OVER (ORDER BY cnt DESC, key ASC)``."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "dom_r", "dom_g", "dom_b", "share_milli",
        "dominant_heavy")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        n = pix.shape[0] * pix.shape[1]
        key = ((pix[..., 0] << 16) | (pix[..., 1] << 8)
               | pix[..., 2]).reshape(-1)
        uniq, cnt = np.unique(key, return_counts=True)
        # np.unique sorts keys ascending, argmax takes the FIRST max →
        # ties break to the smallest key, matching the SQL ORDER BY
        top = int(uniq[int(np.argmax(cnt))])
        share = int(cnt.max()) * 1000 // n
        out["image_id"].append(iid)
        out["dom_r"].append(top >> 16)
        out["dom_g"].append((top >> 8) & 255)
        out["dom_b"].append(top & 255)
        out["share_milli"].append(share)
        out["dominant_heavy"].append(int(share >= 400))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("dom_r", "dom_g", "dom_b",
                                  "share_milli", "dominant_heavy")]))


def image_palette_topk_batch(batch: "pa.Table") -> "pa.Table":
    """Top-3 exact (r,g,b) palette per image with exact counts and
    per-mille shares — the poster/banner palette profile (a LAION-style
    synthetic-graphic signal: photos spread mass across thousands of
    colors, rendered graphics concentrate it in a handful).  Rank order
    is (count desc, packed key asc) — a total order, so ties are
    deterministic and the result is bit-exact vs the DuckDB oracle's
    ``row_number() OVER (... ORDER BY c DESC, key ASC) <= 3``; images
    with fewer than 3 distinct colors emit fewer rows on BOTH sides."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "rank", "r", "g", "b", "cnt", "share_milli")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        n = pix.shape[0] * pix.shape[1]
        key = ((pix[..., 0] << 16) | (pix[..., 1] << 8)
               | pix[..., 2]).reshape(-1)
        uniq, cnt = np.unique(key, return_counts=True)
        # lexsort's LAST key is primary: count desc, then packed asc
        # (np.unique already yields ascending keys, and lexsort is
        # stable, so `-cnt` alone would also tie-break correctly; the
        # explicit pair states the contract)
        order = np.lexsort((uniq, -cnt))[:3]
        for rk, idx in enumerate(order, start=1):
            out["image_id"].append(iid)
            out["rank"].append(rk)
            out["r"].append(int(uniq[idx]) >> 16)
            out["g"].append((int(uniq[idx]) >> 8) & 255)
            out["b"].append(int(uniq[idx]) & 255)
            out["cnt"].append(int(cnt[idx]))
            out["share_milli"].append(int(cnt[idx]) * 1000 // n)
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("rank", "r", "g", "b", "cnt",
                                  "share_milli")]))


AUDIO_META_FIXTURE = "/tmp/darc_ray_fixtures/audio_meta.parquet"


def ensure_audio_meta_fixture(path: str = AUDIO_META_FIXTURE) -> str:
    """Deterministic WAV corpus for the header-scan family: mono and
    stereo rows at several sample rates, plus rows with an extra
    odd-length LIST chunk before ``data`` (exercises RIFF word-align
    padding in BOTH the Python walk and the SQL recursive walk).
    Fixed path + atomic write, sf-independent — same contract as
    ``ensure_image_meta_fixture``."""
    import os
    import struct
    import tempfile

    from darc_ray.functions.audio import wav_encode

    rows = {"audio_id": [], "bytes": []}
    for i in range(12):
        rng = np.random.default_rng(7100 + i)
        sr = (8000, 16000, 22050)[i % 3]
        n = int(rng.integers(800, 4000))
        t = np.arange(n)
        s = (2800 * np.sin(2 * np.pi * (110 + 13 * i) * t / sr)
             + rng.integers(-250, 251, n)).astype(np.int16)
        if i % 2:
            s = np.stack([s, (s // 2).astype(np.int16)], axis=1)
        data = wav_encode(s, sr)
        rows["audio_id"].append(f"aud-{i:02d}")
        rows["bytes"].append(data)
        if i % 4 == 0:
            # inject an odd-length LIST chunk between fmt and data
            # (RIFF pads odd chunks to word boundaries)
            info = b"INFOdarc-ray fixture?"          # 21 bytes, odd
            extra = b"LIST" + struct.pack("<I", len(info)) + info + b"\x00"
            head, rest = data[:36], data[36:]
            body_len = len(data) - 8 + len(extra)
            patched = (b"RIFF" + struct.pack("<I", body_len)
                       + head[8:] + extra + rest)
            rows["audio_id"].append(f"aud-{i:02d}-list")
            rows["bytes"].append(patched)
    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("audio_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


AUDIO_PCM_FIXTURE = "/tmp/darc_ray_fixtures/audio_pcm.parquet"


def ensure_audio_pcm_fixture(path: str = AUDIO_PCM_FIXTURE) -> str:
    """Deterministic PCM16 WAV corpus for the sample-level loudness
    family: mono and stereo tones at several amplitudes, a planted
    all-zero silence row (``-silent``), a planted near-full-scale row
    (``-clip``), and one row with an odd-length LIST chunk before
    ``data`` (the PCM offset differs, proving the SQL walk finds it).
    Fixed path + atomic write + always rewritten, sf-independent —
    same contract as ``ensure_audio_meta_fixture``."""
    import os
    import struct
    import tempfile

    from darc_ray.functions.audio import wav_encode

    rows = {"audio_id": [], "bytes": []}
    for i in range(8):
        rng = np.random.default_rng(9300 + i)
        sr = (8000, 16000)[i % 2]
        n = int(rng.integers(600, 2400))
        t = np.arange(n)
        amp = 700 + 400 * i
        s = (amp * np.sin(2 * np.pi * (130 + 11 * i) * t / sr)
             + rng.integers(-120, 121, n)).astype(np.int16)
        if i % 3 == 2:
            s = np.stack([s, (s // 3).astype(np.int16)], axis=1)
        rows["audio_id"].append(f"pcm-{i:02d}")
        rows["bytes"].append(wav_encode(s, sr))
    rows["audio_id"].append("pcm-silent")
    rows["bytes"].append(wav_encode(np.zeros(1500, np.int16), 8000))
    sq = (np.where(np.arange(1200) % 50 < 25, 32760, -32760)
          .astype(np.int16))
    rows["audio_id"].append("pcm-clip")
    rows["bytes"].append(wav_encode(sq, 16000))
    # odd LIST chunk between fmt and data (shifts the PCM offset)
    base = wav_encode((900 * np.sin(np.arange(800) / 9)).astype(np.int16),
                      8000)
    info = b"INFOpcm fixture padding?"            # 24 bytes... make odd
    info = info[:-1]                              # 23, odd
    extra = b"LIST" + struct.pack("<I", len(info)) + info + b"\x00"
    patched = (b"RIFF" + struct.pack("<I", len(base) - 8 + len(extra))
               + base[8:36] + extra + base[36:])
    rows["audio_id"].append("pcm-list")
    rows["bytes"].append(patched)
    # planted silence SPANS: 1 silent window, 2 loud, 1 silent-ish gap,
    # 2 loud, 2 silent (window = 400 samples) — exercises leading /
    # trailing / interior runs in the windowed family
    tone = (9000 * np.sin(2 * np.pi * 170 * np.arange(800) / 8000)
            ).astype(np.int16)
    spans = np.concatenate([np.zeros(400, np.int16), tone,
                            np.full(400, 40, np.int16), tone,
                            np.zeros(800, np.int16)])
    rows["audio_id"].append("pcm-spans")
    rows["bytes"].append(wav_encode(spans, 8000))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("audio_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def audio_loudness_batch(batch: "pa.Table") -> "pa.Table":
    """Sample-level integer loudness scan over PCM16 WAV payloads:
    ``mean_square`` = Σv²//n (the exact-integer RMS² twin), ``peak`` =
    max|v|, ``clip_count`` = samples at ≥32000 absolute, ``silent`` =
    mean-square below a floor — the silence/clipping junk gate of an
    audio curation pass.  Channel-interleaved order is irrelevant to
    these aggregates, so the kernel flattens; all-integer → bit-exact
    vs the DuckDB oracle's little-endian hex sample walk.  Stateless
    ``map_batches``, no shuffle."""
    from darc_ray.functions.audio import wav_decode

    out: dict[str, list] = {k: [] for k in (
        "audio_id", "n_int16", "mean_square", "peak", "clip_count",
        "silent")}
    for aid, payload in zip(batch.column("audio_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        samples, _sr = wav_decode(payload)
        v = samples.reshape(-1).astype(np.int64)   # cast BEFORE abs:
        n = len(v)                                  # |int16 -32768| wraps
        ms = int((v * v).sum()) // n
        out["audio_id"].append(aid)
        out["n_int16"].append(n)
        out["mean_square"].append(ms)
        out["peak"].append(int(np.abs(v).max()))
        out["clip_count"].append(int((np.abs(v) >= 32000).sum()))
        out["silent"].append(int(ms < 10000))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("audio_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("n_int16", "mean_square", "peak",
                                  "clip_count", "silent")]))


def audio_meta_batch(batch: "pa.Table") -> "pa.Table":
    """Header-only WAV metadata over a binary column (no PCM decode);
    stateless task ``map_batches``."""
    from darc_ray.functions.audio import wav_info

    out: dict[str, list] = {"audio_id": [], "channels": [], "sample_rate": [],
                            "bits": [], "n_samples": [], "duration_ms": [],
                            "data_bytes": [], "header_bytes": []}
    for aid, payload in zip(batch.column("audio_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        m = wav_info(payload)
        out["audio_id"].append(aid)
        for k in ("channels", "sample_rate", "bits", "n_samples",
                  "duration_ms", "data_bytes", "header_bytes"):
            out[k].append(m[k])
    return pa.Table.from_pydict(out)


VIDEO_META_FIXTURE = "/tmp/darc_ray_fixtures/video_meta.parquet"


def ensure_video_meta_fixture(path: str = VIDEO_META_FIXTURE) -> str:
    """Deterministic FVID corpus for the header-scan family: varying
    fps / frame counts / dims (PNG frame sizes differ per frame, so
    the oracle's frame walk is non-trivial).  Fixed path + atomic
    write, sf-independent — same contract as the image/audio meta
    fixtures."""
    import os
    import tempfile

    from darc_ray.functions.video import video_encode

    rows = {"video_id": [], "bytes": []}
    for i in range(10):
        rng = np.random.default_rng(8200 + i)
        fps = (4, 8, 12)[i % 3]
        n = int(rng.integers(3, 9))
        hh, ww = int(rng.integers(12, 33)), int(rng.integers(12, 33))
        frames = []
        for f in range(n):
            yy, xx = np.mgrid[0:hh, 0:ww]
            base = 110 + 80 * np.sin(2 * np.pi * (xx + 5 * f + i) / ww)
            frames.append(np.clip(base[..., None]
                                  + rng.integers(-8, 9, (hh, ww, 3)),
                                  0, 255).astype(np.uint8))
        rows["video_id"].append(f"vid-{i:02d}")
        rows["bytes"].append(video_encode(frames, fps))
    # planted SCENE CUTS for the frame-size-delta family: smooth
    # gradient frames (tiny PNGs) switch to dense noise (large PNGs)
    # at a known index — the compressed-size jump IS the cut signal
    for j in range(3):
        rng = np.random.default_rng(8700 + j)
        hh, ww = 20 + 2 * j, 24 + 3 * j
        cut_at = 2 + j
        frames = []
        for f in range(6):
            if f < cut_at:
                yy, xx = np.mgrid[0:hh, 0:ww]
                frames.append(np.repeat(
                    ((xx + yy + f) % 7).astype(np.uint8)[..., None] * 30,
                    3, axis=2))
            else:
                frames.append(rng.integers(0, 256, (hh, ww, 3))
                              .astype(np.uint8))
        rows["video_id"].append(f"vid-cut-{j}")
        rows["bytes"].append(video_encode(frames, 8))
    # flat clip: every frame byte-identical → zero deltas
    still = np.full((16, 16, 3), 90, np.uint8)
    rows["video_id"].append("vid-flat")
    rows["bytes"].append(video_encode([still] * 4, 4))
    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("video_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def video_meta_batch(batch: "pa.Table") -> "pa.Table":
    """Header+index-only FVID metadata: container header, frame-span
    walk (`video_index` — offsets/lengths only, no PNG decompression),
    dims from the FIRST frame's PNG IHDR bytes (a 33-byte peek, not a
    decode).  Stateless task ``map_batches``."""
    import struct

    from darc_ray.functions.video import video_index

    out: dict[str, list] = {"video_id": [], "fps": [], "n_frames": [],
                            "duration_ms": [], "width": [], "height": [],
                            "frame_bytes": [], "max_frame_bytes": []}
    for vid, payload in zip(batch.column("video_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        fps, spans = video_index(payload)
        first_off = spans[0][0]
        w, h = struct.unpack_from(">II", payload, first_off + 16)
        out["video_id"].append(vid)
        out["fps"].append(fps)
        out["n_frames"].append(len(spans))
        out["duration_ms"].append(len(spans) * 1000 // fps)
        out["width"].append(w)
        out["height"].append(h)
        out["frame_bytes"].append(sum(ln for _, ln in spans))
        out["max_frame_bytes"].append(max(ln for _, ln in spans))
    return pa.Table.from_pydict(out)


CAPTION_FIXTURE = "/tmp/darc_ray_fixtures/image_caption.parquet"


def ensure_image_caption_fixture(path: str = CAPTION_FIXTURE) -> str:
    """Deterministic image+caption PAIR corpus in the full input_hint
    schema ``(image_id, bytes, w, h, fmt, caption, phash)`` for the
    caption-axis families (the LAION/DataComp text-side filters and
    the cross-modal pair-consistency dedup).  Planted flavors, cycling
    ``i % 8``: clean caption / URL spam / too-short / ALL-CAPS shout /
    low-alpha junk / SAME-CAPTION-different-image / same-image-
    DIFFERENT-CAPTION / 40-word overlong — plus two exact full-pair
    duplicates of row 0.  All captions are ASCII (char-count semantics
    identical between pyarrow and DuckDB).  Fixed path + atomic write
    + ALWAYS rewritten, sf-independent — same contract as
    ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    nouns = ["harbor", "meadow", "bridge", "lantern", "orchard", "dune",
             "plaza", "glacier"]
    places = ["river bend", "old town", "north shore", "market square",
              "pine ridge", "salt flat", "stone pier", "fern valley"]

    def content(i: int) -> np.ndarray:
        hh, ww = 12 + i % 5, 12 + (3 * i) % 7
        yy, xx = np.mgrid[0:hh, 0:ww]
        v = (30 + (29 * xx + 13 * yy + 11 * i) % 180).astype(np.uint8)
        g = (30 + (29 * xx + 13 * yy + 11 * i + 41) % 180).astype(np.uint8)
        b = (30 + (29 * xx + 13 * yy + 11 * i + 82) % 180).astype(np.uint8)
        return np.stack([v, g, b], axis=2)

    rows: dict[str, list] = {k: [] for k in
                             ("image_id", "bytes", "w", "h", "fmt",
                              "caption", "phash")}
    caps: list[str] = []
    pixes: list[np.ndarray] = []

    def add(iid: str, pix: np.ndarray, caption: str) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))
        rows["w"].append(pix.shape[1])
        rows["h"].append(pix.shape[0])
        # declared source format (metadata label, the payload itself is
        # the engine's RAWI container): varied so the format-mix report
        # family has a non-trivial fmt axis
        rows["fmt"].append(("raw", "png", "jpeg", "webp")[len(caps) % 4])
        rows["caption"].append(caption)
        rows["phash"].append(img.phash64(pix))

    for i in range(40):
        flavor = i % 8
        pix = content(i)
        cap = (f"Photo {i:02d} of a {nouns[i % 8]} beside the "
               f"{places[(i // 8) % 8]} after rain")
        if flavor == 1:
            cap = f"download now at http://img{i}.example.test/full size"
        elif flavor == 2:
            cap = "img"
        elif flavor == 3:
            cap = f"STOCK PHOTO {i:02d} SALE BANNER BUY NOW"
        elif flavor == 4:
            cap = f"$$$ 12345 --- 999 !!! {i} ### 777"
        elif flavor == 5 and i >= 5:
            cap = caps[i - 5]               # same caption, new pixels
        elif flavor == 6 and i >= 6:
            pix = pixes[i - 6]              # same pixels, new caption
            cap = f"alternate crop {i:02d} of the {nouns[(i + 3) % 8]}"
        elif flavor == 7:
            cap = " ".join(f"tag{k}" for k in range(40))
        caps.append(cap)
        pixes.append(pix)
        add(f"cap-{i:02d}", pix, cap)
    # exact full-pair duplicates (same caption AND same pixels as row 0)
    add("cap-99-pairdup-a", pixes[0], caps[0])
    add("cap-99-pairdup-b", pixes[0], caps[0])
    # near-dup with DIFFERENT bytes but the SAME phash (one blue LSB
    # flipped — below the DCT hash's threshold margins): the row the
    # byte-level md5 pass canNOT catch but the perceptual keep-one
    # must.  Asserted here so fixture drift fails loudly at build time.
    near = pixes[8].copy()          # cap-08: clean caption, passes gates
    near[-1, -1, 2] ^= 1
    assert not np.array_equal(near, pixes[8])
    assert img.phash64(near) == img.phash64(pixes[8])
    add("cap-98-neardup", near,
        "weathered footbridge crossing the fern valley stream")

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary()),
                                ("w", pa.int32()), ("h", pa.int32()),
                                ("fmt", pa.string()),
                                ("caption", pa.string()),
                                ("phash", pa.int64())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def caption_gate_batch(batch: "pa.Table") -> "pa.Table":
    """LAION/DataComp-style caption filters as ONE stateless vectorized
    pass (pyarrow regex-count kernels + numpy integer ratios, no
    per-row Python): char/word counts, alpha and uppercase per-mille,
    URL-spam flag, and the composed ``keep`` gate (2–32 words, no URL,
    ≥50% letters, ≤70% of letters uppercase).  All-integer so the
    DuckDB oracle (regexp_extract_all lengths) agrees bit-for-bit."""
    import pyarrow.compute as pc

    cap = batch.column("caption")
    n_chars = pc.utf8_length(cap).to_numpy(zero_copy_only=False).astype(np.int64)
    n_words = pc.count_substring_regex(cap, r"\S+").to_numpy(
        zero_copy_only=False).astype(np.int64)
    alpha = pc.count_substring_regex(cap, "[A-Za-z]").to_numpy(
        zero_copy_only=False).astype(np.int64)
    upper = pc.count_substring_regex(cap, "[A-Z]").to_numpy(
        zero_copy_only=False).astype(np.int64)
    has_url = pc.match_substring_regex(
        cap, r"(http://|https://|www\.)").to_numpy(
        zero_copy_only=False).astype(np.int64)
    alpha_milli = np.where(n_chars > 0,
                           alpha * 1000 // np.maximum(n_chars, 1), 0)
    upper_milli = np.where(alpha > 0,
                           upper * 1000 // np.maximum(alpha, 1), 0)
    keep = ((n_words >= 2) & (n_words <= 32) & (has_url == 0)
            & (alpha_milli >= 500) & (upper_milli <= 700)).astype(np.int64)
    return pa.Table.from_pydict({
        "image_id": batch.column("image_id"),
        "n_chars": n_chars, "n_words": n_words,
        "alpha_milli": alpha_milli.astype(np.int64),
        "upper_milli": upper_milli.astype(np.int64),
        "has_url": has_url, "keep": keep})


TILES_FIXTURE = "/tmp/darc_ray_fixtures/image_tiles.parquet"


def ensure_image_tiles_fixture(path: str = TILES_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the within-image tile-
    repetition family: textured rows (every 8×8 tile unique), planted
    COLLAGE rows (one tile repeated in a grid), banded screenshot-like
    rows (tiles repeat along each band row), and a half-collage.  All
    pixel values exact integers; fixed path + atomic write + ALWAYS
    rewritten, sf-independent — same contract as
    ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def texture(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        # xx*yy term breaks tile-translation symmetry → unique tiles
        v = (20 + (23 * xx + 41 * yy + (xx * yy) % 97 + 5 * i) % 200)
        g = (20 + (23 * xx + 41 * yy + (xx * yy) % 89 + 5 * i + 31) % 200)
        b = (20 + (23 * xx + 41 * yy + (xx * yy) % 83 + 5 * i + 62) % 200)
        return np.stack([v, g, b], axis=2).astype(np.uint8)

    for i in range(6):
        hh, ww = 24 + (8 * i) % 17, 26 + (5 * i) % 15
        add(f"tile-{i}-tex", texture(hh, ww, i))
    for i in range(4):
        # pure collage: one 8x8 tile repeated 3x4 (plus ragged margins)
        t = texture(8, 8, 100 + i)
        pix = np.tile(t, (3, 4, 1))
        pad = texture(3 + i, pix.shape[1], 200 + i)
        pix = np.concatenate([pix, pad], axis=0)
        add(f"tile-{i}-collage", pix)
    for i in range(3):
        # banded: each 8-row band is one tile repeated horizontally,
        # bands differ → distinct == n_tile_rows
        bands = [np.tile(texture(8, 8, 300 + 7 * i + k), (1, 5, 1))
                 for k in range(3)]
        add(f"tile-{i}-banded", np.concatenate(bands, axis=0))
    # half-collage: left half repeated tile, right half texture
    t = texture(8, 8, 400)
    left = np.tile(t, (3, 2, 1))
    right = texture(24, 16, 401)
    add("tile-half", np.concatenate([left, right], axis=1))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_tile_dups_batch(batch: "pa.Table") -> "pa.Table":
    """Within-image 8×8 tile repetition — the collage / tiled-
    background / screenshot junk signal: exact tile-content counts
    (full tiles only; ragged margins ignored), distinct-tile ratio and
    top-tile share in per-mille, and the composed ``tiled`` flag
    (≤50% distinct or one tile ≥25%).  numpy reshape + void-view
    grouping per image (no per-pixel Python); the DuckDB oracle
    re-derives tile keys by string-agg'ing the hex pixel walk in
    tile-local order, so counts match bit-for-bit."""
    out: dict[str, list] = {"image_id": [], "n_tiles": [],
                            "distinct_tiles": [], "top_tile_count": [],
                            "distinct_milli": [], "top_share_milli": [],
                            "tiled": []}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = img.raw_decode(payload)
        hh, ww = pix.shape[0], pix.shape[1]
        th, tw = hh // 8, ww // 8
        n = th * tw
        if n == 0:
            out["image_id"].append(iid)
            out["n_tiles"].append(0)
            out["distinct_tiles"].append(0)
            out["top_tile_count"].append(0)
            out["distinct_milli"].append(0)
            out["top_share_milli"].append(0)
            out["tiled"].append(0)
            continue
        tiles = (pix[:th * 8, :tw * 8]
                 .reshape(th, 8, tw, 8, 3).transpose(0, 2, 1, 3, 4)
                 .reshape(n, 8 * 8 * 3))
        keys = np.ascontiguousarray(tiles).view(
            np.dtype((np.void, tiles.shape[1]))).ravel()
        _, counts = np.unique(keys, return_counts=True)
        distinct = int(len(counts))
        top = int(counts.max())
        dm = distinct * 1000 // n
        ts = top * 1000 // n
        out["image_id"].append(iid)
        out["n_tiles"].append(n)
        out["distinct_tiles"].append(distinct)
        out["top_tile_count"].append(top)
        out["distinct_milli"].append(dm)
        out["top_share_milli"].append(ts)
        out["tiled"].append(int(dm <= 500 or ts >= 250))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("n_tiles", "distinct_tiles",
                                  "top_tile_count", "distinct_milli",
                                  "top_share_milli", "tiled")]))


def audio_silence_spans_batch(batch: "pa.Table") -> "pa.Table":
    """Windowed silence-span scan over PCM16 WAV payloads — the
    VAD-style trim/junk pass of an audio curation pipeline: the
    flattened int16 stream is cut into FULL 400-sample windows, each
    window's exact integer mean-square (Σv²//400) is flagged silent
    below the loudness family's floor (10 000), and the span report is
    (n_windows, silent_windows, leading/trailing silent runs, max
    silent run, active per-mille, trimmed flag).  All-integer →
    bit-exact vs the DuckDB oracle's hex sample walk + gaps-and-islands
    run aggregation.  Stateless ``map_batches``, no shuffle."""
    from darc_ray.functions.audio import wav_decode

    W, FLOOR = 400, 10000
    out: dict[str, list] = {k: [] for k in (
        "audio_id", "n_windows", "silent_windows", "leading_silent",
        "trailing_silent", "max_silent_run", "active_milli", "trimmed")}
    for aid, payload in zip(batch.column("audio_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        v = wav_decode(payload)[0].reshape(-1).astype(np.int64)
        nw = len(v) // W
        if nw == 0:
            continue                       # no full window: no row (the
        w = v[:nw * W].reshape(nw, W)      # SQL GROUP BY emits none too)
        s = ((w * w).sum(axis=1) // W < FLOOR)
        nz = np.flatnonzero(~s)
        if len(nz) == 0:
            lead, trail, mx = nw, nw, nw
        else:
            lead, trail = int(nz[0]), int(nw - 1 - nz[-1])
            # max consecutive run of silent windows
            mx, run = 0, 0
            for flag in s:
                run = run + 1 if flag else 0
                mx = max(mx, run)
        out["audio_id"].append(aid)
        out["n_windows"].append(nw)
        out["silent_windows"].append(int(s.sum()))
        out["leading_silent"].append(lead)
        out["trailing_silent"].append(trail)
        out["max_silent_run"].append(int(mx))
        out["active_milli"].append(int((nw - int(s.sum())) * 1000 // nw))
        out["trimmed"].append(int(lead > 0 or trail > 0))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("audio_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("n_windows", "silent_windows",
                                  "leading_silent", "trailing_silent",
                                  "max_silent_run", "active_milli",
                                  "trimmed")]))


def audio_clipping_batch(batch: "pa.Table") -> "pa.Table":
    """Clipped-sample QA scan over PCM16 WAV payloads — the broken-
    limiter / hot-mic gate of an audio curation pipeline: a sample is
    clipped when |v| ≥ 32000 (near full scale for int16); the report is
    (n_samples, peak |v|, clipped count + per-mille, longest
    consecutive clipped run over the interleaved sample stream,
    composed ``clipping`` flag: ≥5‰ clipped or a run ≥ 16).
    All-integer → bit-exact vs the DuckDB oracle's hex sample walk +
    gaps-and-islands run aggregation.  Stateless ``map_batches``, no
    shuffle."""
    from darc_ray.functions.audio import wav_decode

    CLIP = 32000
    out: dict[str, list] = {k: [] for k in (
        "audio_id", "n_samples", "peak", "clipped", "clipped_milli",
        "max_clip_run", "clipping")}
    for aid, payload in zip(batch.column("audio_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        v = wav_decode(payload)[0].reshape(-1).astype(np.int64)
        n = len(v)
        if n == 0:
            continue                       # no samples: no row (the SQL
        m = np.abs(v) >= CLIP              # GROUP BY emits none either)
        nc = int(m.sum())
        if nc:
            idx = np.flatnonzero(m)
            brk = np.flatnonzero(np.diff(idx) > 1)
            bounds = np.concatenate([[-1], brk, [len(idx) - 1]])
            mx = int(np.diff(bounds).max())
        else:
            mx = 0
        out["audio_id"].append(aid)
        out["n_samples"].append(n)
        out["peak"].append(int(np.abs(v).max()))
        out["clipped"].append(nc)
        out["clipped_milli"].append(nc * 1000 // n)
        out["max_clip_run"].append(mx)
        out["clipping"].append(int(nc * 1000 // n >= 5 or mx >= 16))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("audio_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("n_samples", "peak", "clipped",
                                  "clipped_milli", "max_clip_run",
                                  "clipping")]))


def video_cut_candidates_batch(batch: "pa.Table") -> "pa.Table":
    """Compressed-domain scene-cut proxy over the FVID frame INDEX —
    zero frame decode: per-frame byte length from the span walk, cut
    candidate where the size delta vs the previous frame is ≥ 300‰ of
    the larger of the two (PNG/real-codec frame sizes jump at content
    changes; the classic cheap shot-detection pass a sampling stage
    runs before spending any decode budget).  All-integer; the DuckDB
    oracle re-walks the index with a recursive CTE and lag()."""
    from darc_ray.functions.video import video_index

    out: dict[str, list] = {k: [] for k in (
        "video_id", "n_frames", "mean_frame_bytes", "n_cuts",
        "first_cut_idx", "max_delta_milli", "has_cut")}
    for vid, payload in zip(batch.column("video_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        _fps, spans = video_index(payload)
        lens = np.array([ln for _off, ln in spans], dtype=np.int64)
        n = len(lens)
        if n >= 2:
            prev, cur = lens[:-1], lens[1:]
            dm = np.abs(cur - prev) * 1000 // np.maximum(prev, cur)
            cuts = np.flatnonzero(dm >= 300)
            n_cuts = int(len(cuts))
            first = int(cuts[0] + 1) if n_cuts else -1
            mx = int(dm.max())
        else:
            n_cuts, first, mx = 0, -1, 0
        out["video_id"].append(vid)
        out["n_frames"].append(n)
        out["mean_frame_bytes"].append(int(lens.sum()) // n)
        out["n_cuts"].append(n_cuts)
        out["first_cut_idx"].append(first)
        out["max_delta_milli"].append(mx)
        out["has_cut"].append(int(n_cuts > 0))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("video_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("n_frames", "mean_frame_bytes", "n_cuts",
                                  "first_cut_idx", "max_delta_milli",
                                  "has_cut")]))


DHASH_FIXTURE = "/tmp/darc_ray_fixtures/image_dhash.parquet"


def ensure_image_dhash_fixture(path: str = DHASH_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the dHash (gradient-hash)
    near-dup family: six distinct textures (``xx*yy`` terms break
    translational symmetry), two planted NEAR-dups (+60 luma bump on
    exactly the top-left 8×9-grid cell → hamming ≤ 1 vs the base),
    and one exact pixel copy (hamming 0).  Base pixel values stay
    ≤ 190 so the bump never clips.  Fixed path + atomic write +
    ALWAYS rewritten, sf-independent — same contract as
    ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows: dict[str, list] = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def texture(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (15 + (23 * xx + 41 * yy + (xx * yy) % 97 + 9 * i) % 175)
        g = (15 + (31 * xx + 17 * yy + (xx * yy) % 89 + 9 * i + 37) % 175)
        b = (15 + (13 * xx + 29 * yy + (xx * yy) % 83 + 9 * i + 74) % 175)
        return np.stack([r, g, b], axis=2).astype(np.uint8)

    bases: list[np.ndarray] = []
    for i in range(6):
        hh, ww = 16 + (5 * i) % 9, 18 + (7 * i) % 13
        pix = texture(hh, ww, i)
        bases.append(pix)
        add(f"dh-{i}-tex", pix)
    for i in range(2):
        # near-dup: bump the region pooled into grid cell (0,0) — only
        # bit 0's comparison can flip, so hamming(base, near) ≤ 1
        pix = bases[i].copy().astype(np.int64)
        hh, ww = pix.shape[0], pix.shape[1]
        r1 = int(np.searchsorted((np.arange(hh) * 8) // hh, 1))
        c1 = int(np.searchsorted((np.arange(ww) * 9) // ww, 1))
        pix[:r1, :c1, :] += 60
        add(f"dh-{i}-near", pix.astype(np.uint8))
    add("dh-2-copy", bases[2])

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_dhash_batch(batch: "pa.Table") -> "pa.Table":
    """Per-image 64-bit difference hash (``functions.image.dhash64``):
    decode the RAWI payload, integer 8×9 box-pool, gradient bit-pack.
    Per-pixel work is vectorized numpy inside the hash; the loop is
    per-IMAGE (decode boundary), same shape as the other pixel
    kernels."""
    ids, hashes = [], []
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        ids.append(iid)
        hashes.append(img.dhash64(img.raw_decode(payload)))
    return pa.Table.from_pydict(
        {"image_id": ids, "dhash": hashes},
        schema=pa.schema([("image_id", pa.string()),
                          ("dhash", pa.int64())]))


class ClipAlignStub:
    """Deterministic stand-in for a CLIP-style cross-modal alignment
    scorer — the LAION core filter's SHAPE (batched two-tower scoring
    in a stateful actor-pool ``map_batches`` stage) with the model
    replaced by a hashing-trick text tower so the score is exactly
    reproducible in SQL (real CLIP weights can't load in this
    sandbox; swap :meth:`_token_hash` + the phash tower for real
    encoders on a GPU cluster and the Ray plumbing is unchanged).

    Text tower: caption tokens (``\\S+``) → md5-prefix uint64 per
    token → per-dimension ±1 votes from the 64 hash bits → sign
    vector.  Image tower: the precomputed ``phash`` bits as ±1.
    Score = integer dot product in {-64..64}; ``aligned = score > 0``.
    The token-hash cache is BUILT ONCE PER ACTOR in ``__init__`` and
    warms across batches — the model-load / tokenizer-load pattern."""

    def __init__(self) -> None:
        import re

        self._re = re.compile(r"\S+")
        self._cache: dict[str, int] = {}
        self._shifts = np.arange(64, dtype=np.uint64)

    def _token_hash(self, tok: str) -> int:
        hv = self._cache.get(tok)
        if hv is None:
            import hashlib

            hv = int.from_bytes(
                hashlib.md5(tok.encode()).digest()[:8], "big")
            self._cache[tok] = hv
        return hv

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        caps = batch.column("caption").to_pylist()
        ph = (batch.column("phash").to_numpy(zero_copy_only=False)
              .astype(np.int64).view(np.uint64))
        img_pm = (((ph[:, None] >> self._shifts[None, :])
                   & np.uint64(1)).astype(np.int64) * 2 - 1)
        n = len(caps)
        n_tokens = np.zeros(n, dtype=np.int64)
        scores = np.zeros(n, dtype=np.int64)
        for i, cap in enumerate(caps):
            toks = self._re.findall(cap)
            n_tokens[i] = len(toks)
            if not toks:
                continue
            hv = np.array([self._token_hash(t) for t in toks],
                          dtype=np.uint64)
            bits = ((hv[:, None] >> self._shifts[None, :])
                    & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            scores[i] = int((np.sign(votes) * img_pm[i]).sum())
        return pa.Table.from_pydict({
            "image_id": batch.column("image_id"),
            "n_tokens": n_tokens, "score": scores,
            "aligned": (scores > 0).astype(np.int64)})


LOGO_FIXTURE = "/tmp/darc_ray_fixtures/image_logo.parquet"


def ensure_image_logo_fixture(path: str = LOGO_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the corner-logo / watermark
    gate: dark textured rows (luma well below 128 000 milli), planted
    rows with a SOLID bright 8×8 box in one corner (uniform + high
    contrast vs the global mean — the stock-photo corner-logo
    signature), a two-corner row, and a low-contrast uniform corner
    that must NOT trip the gate (uniform but close to the global
    mean).  All dims ≥ 16×16 so the four corner blocks are disjoint.
    Fixed path + atomic write + ALWAYS rewritten, sf-independent."""
    import os
    import tempfile

    rows: dict[str, list] = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def texture(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (10 + (19 * xx + 37 * yy + (xx * yy) % 61 + 7 * i) % 110)
        g = (10 + (29 * xx + 11 * yy + (xx * yy) % 53 + 7 * i + 23) % 110)
        b = (10 + (17 * xx + 31 * yy + (xx * yy) % 47 + 7 * i + 46) % 110)
        return np.stack([r, g, b], axis=2).astype(np.uint8)

    for i in range(4):
        hh, ww = 18 + (5 * i) % 9, 20 + (7 * i) % 11
        add(f"logo-{i}-clean", texture(hh, ww, i))
    corners = {"tl": (slice(0, 8), slice(0, 8)),
               "tr": (slice(0, 8), slice(-8, None)),
               "bl": (slice(-8, None), slice(0, 8)),
               "br": (slice(-8, None), slice(-8, None))}
    for j, cname in enumerate(corners):
        pix = texture(19 + j, 22 + j, 10 + j)
        pix[corners[cname]] = (240, 235, 230)
        add(f"logo-{j}-{cname}", pix)
    pix = texture(24, 24, 20)
    pix[corners["tl"]] = (245, 245, 245)
    pix[corners["br"]] = (250, 240, 235)
    add("logo-two-corners", pix)
    # uniform corner NEAR the global mean: must not flag (contrast
    # gate, not just uniformity)
    pix = texture(20, 20, 30)
    mean_rgb = tuple(int(v) for v in pix.reshape(-1, 3).mean(axis=0))
    pix[corners["tr"]] = mean_rgb
    add("logo-lowcontrast", pix)

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_corner_logo_batch(batch: "pa.Table") -> "pa.Table":
    """Corner-logo / watermark gate — the stock-photo overlay junk
    signal: each of the four 8×8 corner blocks is flagged a LOGO
    corner iff it is exactly uniform (min = max per channel) AND its
    integer milli-luma mean contrasts with the whole image's mean by
    ≥ 50 000 (so uniform-but-blended corners pass).  All-integer
    (luma = 299r+587g+114b, means are floor divisions) → bit-exact vs
    the DuckDB hex-walk oracle."""
    names = ("tl", "tr", "bl", "br")
    out: dict[str, list] = {"image_id": []}
    for k in names:
        out[f"{k}_logo"] = []
    for k in ("global_mluma", "n_logo_corners", "has_corner_logo"):
        out[k] = []
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = img.raw_decode(payload).astype(np.int64)
        hh, ww = pix.shape[0], pix.shape[1]
        luma = 299 * pix[..., 0] + 587 * pix[..., 1] + 114 * pix[..., 2]
        gmean = int(luma.sum()) // (hh * ww)
        blocks = {"tl": (slice(0, 8), slice(0, 8)),
                  "tr": (slice(0, 8), slice(ww - 8, ww)),
                  "bl": (slice(hh - 8, hh), slice(0, 8)),
                  "br": (slice(hh - 8, hh), slice(ww - 8, ww))}
        n_logo = 0
        out["image_id"].append(iid)
        for k in names:
            blk = pix[blocks[k]]
            uniform = all(int(blk[..., c].min()) == int(blk[..., c].max())
                          for c in range(3))
            cmean = int(luma[blocks[k]].sum()) // 64
            flag = int(uniform and abs(cmean - gmean) >= 50_000)
            n_logo += flag
            out[f"{k}_logo"].append(flag)
        out["global_mluma"].append(gmean)
        out["n_logo_corners"].append(n_logo)
        out["has_corner_logo"].append(int(n_logo > 0))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("tl_logo", "tr_logo", "bl_logo",
                                  "br_logo", "global_mluma",
                                  "n_logo_corners", "has_corner_logo")]))


BLOCKY_FIXTURE = "/tmp/darc_ray_fixtures/image_blocky.parquet"


def ensure_image_blocky_fixture(path: str = BLOCKY_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the compression-artifact and
    mirror-symmetry families: ``-blocky`` rows are piecewise-constant
    8x8 tiles (the decoded-JPEG-at-low-quality shape: zero gradient
    inside a block, a step at every 8-aligned boundary), ``-smooth``
    rows are the same both-axis integer gradient the borders fixture
    uses (boundary and interior column gradients statistically equal),
    ``-sym`` rows are smooth content mirrored left-to-right around the
    center (column-profile palindromes), and one ``-solid`` row pins
    the all-zero-gradient / trivially-symmetric edge case.  All pixel
    values are exact integers so the DuckDB hex-walk oracles re-derive
    the kernels bit-for-bit.  Fixed path + atomic write + ALWAYS
    rewritten, sf-independent — same contract as
    ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def smooth(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (40 + (31 * xx + 17 * yy + 7 * i) % 160).astype(np.uint8)
        g = (40 + (31 * xx + 17 * yy + 7 * i + 35) % 160).astype(np.uint8)
        b = (40 + (31 * xx + 17 * yy + 7 * i + 70) % 160).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    def blocky(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        bx, by = xx // 8, yy // 8
        r = (40 + (29 * bx + 13 * by + 7 * i) % 160).astype(np.uint8)
        g = (40 + (29 * bx + 13 * by + 7 * i + 35) % 160).astype(np.uint8)
        b = (40 + (29 * bx + 13 * by + 7 * i + 70) % 160).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    for i in range(15):
        hh, ww = 20 + (5 * i) % 21, 24 + (7 * i) % 17
        flavor = i % 3
        if flavor == 0:
            add(f"blk-{i:02d}-blocky", blocky(hh, ww, i))
        elif flavor == 1:
            add(f"blk-{i:02d}-smooth", smooth(hh, ww, i))
        else:
            pix = smooth(hh, ww, i)
            pix[:, ww - ww // 2:] = pix[:, :ww // 2][:, ::-1]
            add(f"blk-{i:02d}-sym", pix)
    add("blk-solid", np.full((24, 32, 3), 96, np.uint8))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_blockiness_batch(batch: "pa.Table") -> "pa.Table":
    """Integer JPEG-artifact (blockiness) gate over raw-pixel payloads
    — the compression-quality proxy the DataComp/LAION-class funnels
    apply before model scoring: horizontal milli-luma gradient
    g(y, x) = |L(y, x+1) − L(y, x)|, split into 8-ALIGNED BOUNDARY
    columns (x % 8 == 7, where DCT block edges land) vs interior
    columns; ``boundary_milli`` / ``interior_milli`` = Σg·1000 //
    count per side and ``blocky`` flags a boundary/interior mean
    ratio ≥ 1.3 (cross-multiplied in int64 — no division, no float).
    A heavily-quantized re-encode has near-zero interior gradient but
    visible block steps, so the ratio separates cleanly; smooth
    content scores ~1.  All-integer → bit-exact vs the DuckDB
    hex-walk oracle reading neighbor bytes at offset i+1.  Stateless
    ``map_batches``, no shuffle — embarrassingly parallel at 100 TB."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "boundary_milli",
        "interior_milli", "blocky")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        h, w = pix.shape[:2]
        if w < 9:
            raise ValueError(f"image {iid}: width {w} < 9 has no "
                             "8-aligned boundary column")
        luma = 299 * pix[..., 0] + 587 * pix[..., 1] + 114 * pix[..., 2]
        gx = np.abs(luma[:, 1:] - luma[:, :-1])
        bmask = (np.arange(w - 1) % 8) == 7
        sb = int(gx[:, bmask].sum())
        si = int(gx[:, ~bmask].sum())
        nb = int(bmask.sum()) * h
        ni = int((~bmask).sum()) * h
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["boundary_milli"].append(sb * 1000 // nb)
        out["interior_milli"].append(si * 1000 // ni)
        out["blocky"].append(int(sb > 0 and sb * ni * 10 >= si * nb * 13))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "boundary_milli",
                                  "interior_milli", "blocky")]))


def image_mirror_symmetry_batch(batch: "pa.Table") -> "pa.Table":
    """Horizontal mirror-symmetry score over raw-pixel payloads — the
    graphics/logo/synthetic-junk signal (natural photos are rarely
    palindromic; rendered logos, borders and template graphics often
    are): per column x, profile P(x) = Σ_y milli-luma(y, x); score =
    Σ_{x < w//2} |P(x) − P(w−1−x)|, normalized per compared pixel to
    ``asym_milli`` = score·1000 // (h·(w//2)); ``mirror_sym`` flags
    asym_milli below a tight threshold (a true palindrome is exactly
    0; the flag tolerates sub-pixel-scale noise).  Column sums rather
    than per-pixel compare keep the SQL oracle a flat GROUP BY x +
    self-join on w−1−x.  All-integer, stateless, no shuffle."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "asym_milli", "mirror_sym")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        h, w = pix.shape[:2]
        luma = 299 * pix[..., 0] + 587 * pix[..., 1] + 114 * pix[..., 2]
        prof = luma.sum(axis=0)
        half = w // 2
        score = int(np.abs(prof[:half] - prof[w - 1 - np.arange(half)]).sum())
        asym = score * 1000 // (h * half)
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["asym_milli"].append(asym)
        out["mirror_sym"].append(int(asym < 1000))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "asym_milli",
                                  "mirror_sym")]))


EXPOSURE_FIXTURE = "/tmp/darc_ray_fixtures/image_exposure.parquet"


def ensure_image_exposure_fixture(path: str = EXPOSURE_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the exposure-clipping gate:
    ``-normal`` rows are the mid-range both-axis gradient (no channel
    ever reaches the clip thresholds), ``-blown`` rows have their top
    third hard-clipped to 255 on all channels (the washed-out-sky /
    flash-burn shape), ``-crushed`` rows have their bottom third at 0
    (the underexposed-shadow shape), ``-both`` rows carry one clipped
    band of each, and two solid rows pin the all-blown / all-crushed
    edge cases (share = 1000 exactly).  All pixel values are exact
    integers so the DuckDB hex-walk oracle re-derives the kernel
    bit-for-bit.  Fixed path + atomic write + ALWAYS rewritten,
    sf-independent — same contract as ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def midrange(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (30 + (23 * xx + 19 * yy + 7 * i) % 190).astype(np.uint8)
        g = (30 + (23 * xx + 19 * yy + 7 * i + 37) % 190).astype(np.uint8)
        b = (30 + (23 * xx + 19 * yy + 7 * i + 74) % 190).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    for i in range(14):
        hh, ww = 18 + (5 * i) % 13, 21 + (7 * i) % 11
        pix = midrange(hh, ww, i)
        flavor = i % 4
        if flavor == 1:
            pix[: hh // 3] = 255
            add(f"exp-{i:02d}-blown", pix)
        elif flavor == 2:
            pix[hh - hh // 3:] = 0
            add(f"exp-{i:02d}-crushed", pix)
        elif flavor == 3:
            pix[: hh // 4] = 255
            pix[hh - hh // 4:] = 0
            add(f"exp-{i:02d}-both", pix)
        else:
            add(f"exp-{i:02d}-normal", pix)
    add("exp-solid-blown", np.full((16, 20, 3), 255, np.uint8))
    add("exp-solid-crushed", np.zeros((16, 20, 3), np.uint8))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_exposure_batch(batch: "pa.Table") -> "pa.Table":
    """Integer exposure-clipping gate over raw-pixel payloads — the
    blown-highlight / crushed-shadow filter a DataComp/LAION-class
    funnel runs alongside the brightness-mean gate (a half-blown image
    can have a PERFECT mean; only the clipped-pixel share catches it):
    a pixel is ``blown`` when ALL three channels ≥ 250 and ``crushed``
    when ALL three ≤ 5; ``hi_milli`` / ``lo_milli`` are the per-mille
    clipped shares and the flags fire at ≥ 200 (a fifth of the frame
    gone).  All-integer → bit-exact vs the DuckDB hex-walk oracle
    (LEAST/GREATEST over the three channel bytes).  Stateless
    ``map_batches``, no shuffle — embarrassingly parallel at 100 TB."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "hi_milli", "lo_milli",
        "overexposed", "underexposed", "keep")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        h, w = pix.shape[:2]
        n = h * w
        blown = int((pix.min(axis=2) >= 250).sum())
        crushed = int((pix.max(axis=2) <= 5).sum())
        hi = blown * 1000 // n
        lo = crushed * 1000 // n
        over, under = int(hi >= 200), int(lo >= 200)
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["hi_milli"].append(hi)
        out["lo_milli"].append(lo)
        out["overexposed"].append(over)
        out["underexposed"].append(under)
        out["keep"].append(int(not over and not under))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "hi_milli",
                                  "lo_milli", "overexposed",
                                  "underexposed", "keep")]))


AESTHETIC_FIXTURE = "/tmp/darc_ray_fixtures/image_aesthetic.parquet"


def ensure_image_aesthetic_fixture(path: str = AESTHETIC_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the aesthetic-proxy scorer:
    ``-good`` rows are colorful mid-brightness gradients (high
    saturation, healthy contrast, centered exposure — the shape a
    learned aesthetic model rewards), ``-washed`` rows are narrow-range
    grayscale (zero saturation, low contrast — scanner/doc junk),
    ``-dark`` rows are deep-shadow gradients (off-center exposure),
    and two near-solid rows pin the zero-saturation / zero-contrast
    edge cases just under the keep threshold.  All pixel values exact
    integers; the DuckDB hex-walk oracle re-derives every score
    bit-for-bit.  Fixed path + atomic write + ALWAYS rewritten,
    sf-independent — same contract as ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    for i in range(14):
        hh, ww = 17 + (5 * i) % 12, 20 + (7 * i) % 13
        yy, xx = np.mgrid[0:hh, 0:ww]
        flavor = i % 3
        if flavor == 0:
            r = (60 + (23 * xx + 17 * yy + 7 * i) % 140).astype(np.uint8)
            g = (60 + (23 * xx + 17 * yy + 7 * i + 47) % 140).astype(np.uint8)
            b = (60 + (23 * xx + 17 * yy + 7 * i + 94) % 140).astype(np.uint8)
            add(f"aes-{i:02d}-good", np.stack([r, g, b], axis=2))
        elif flavor == 1:
            v = (120 + (13 * xx + 11 * yy + 5 * i) % 30).astype(np.uint8)
            add(f"aes-{i:02d}-washed", np.stack([v, v, v], axis=2))
        else:
            r = (5 + (9 * xx + 7 * yy + 3 * i) % 55).astype(np.uint8)
            g = (5 + (9 * xx + 7 * yy + 3 * i + 18) % 55).astype(np.uint8)
            b = (5 + (9 * xx + 7 * yy + 3 * i + 36) % 55).astype(np.uint8)
            add(f"aes-{i:02d}-dark", np.stack([r, g, b], axis=2))
    add("aes-solid-mid", np.full((18, 22, 3), 127, np.uint8))
    add("aes-solid-dim", np.full((18, 22, 3), 96, np.uint8))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def aesthetic_gate_batch(batch: "pa.Table") -> "pa.Table":
    """Integer AESTHETIC-PROXY scorer over raw-pixel payloads — the
    model-scoring stage of a LAION-aesthetics-class funnel collapsed
    to a fixed linear model over three per-image pixel statistics
    (the real pipeline broadcasts a learned scorer to an actor pool;
    the Ray-side shape here is identical — stateless per-batch scoring,
    no shuffle — with an auditable integer model so the DuckDB oracle
    re-derives every score bit-for-bit):

    * ``bright_milli``  — mean milli-luma scaled to [0, 1000];
      ``centered`` = 1000 − 2·|bright − 500| rewards mid-exposure
    * ``sat_milli``     — mean (max−min) channel spread / 255
    * ``contrast_milli``— luma variance against a reference variance
      of (64 luma levels)² = 4.096e9 milli² (documented constant),
      clamped to 1000

    score = (3·sat + 3·contrast + 4·centered) // 10, keep at ≥ 400.
    All sums fit int64 at megapixel scale (sum L² ≤ n·255000²)."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "bright_milli", "sat_milli", "contrast_milli",
        "aesthetic_milli", "aesthetic_keep")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        n = pix.shape[0] * pix.shape[1]
        luma = 299 * pix[..., 0] + 587 * pix[..., 1] + 114 * pix[..., 2]
        sum_l = int(luma.sum())
        sum_l2 = int((luma * luma).sum())
        sum_sat = int((pix.max(axis=2) - pix.min(axis=2)).sum())
        bright = sum_l * 1000 // (n * 255000)
        centered = 1000 - 2 * abs(bright - 500)
        sat = sum_sat * 1000 // (n * 255)
        var = (sum_l2 - sum_l * sum_l // n) // n
        contrast = min(1000, var // 4_096_000)
        score = (3 * sat + 3 * contrast + 4 * centered) // 10
        out["image_id"].append(iid)
        out["bright_milli"].append(bright)
        out["sat_milli"].append(sat)
        out["contrast_milli"].append(contrast)
        out["aesthetic_milli"].append(score)
        out["aesthetic_keep"].append(int(score >= 400))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("bright_milli", "sat_milli",
                                  "contrast_milli", "aesthetic_milli",
                                  "aesthetic_keep")]))


TEXTBAND_FIXTURE = "/tmp/darc_ray_fixtures/image_textband.parquet"


def ensure_image_textband_fixture(path: str = TEXTBAND_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the text-overlay (OCR-junk)
    gate: ``-clean`` rows are a LOW-contrast both-axis gradient whose
    adjacent-column milli-luma step never reaches the strong-edge
    threshold (per-channel step 3 inside a 40-value band, so even the
    modular wrap is a ≤ 39 000 milli jump), ``-text`` rows plant a
    meme/subtitle-style band — h//3 rows of period-2 dark/light
    vertical strokes (every adjacent pair is a 224 000 milli edge, the
    alternating fg/bg shape of rendered glyphs), ``-busy`` rows are
    period-8 stripes over the WHOLE frame (strong edges, but only one
    per 8 columns — a graphics texture the row-density test must NOT
    confuse with text), one ``txt-full`` row is stroke texture
    everywhere (text_milli = 1000) and one ``txt-solid`` row pins the
    zero-gradient case.  All pixel values are exact integers so the
    DuckDB hex-walk oracle re-derives the kernel bit-for-bit.  Fixed
    path + atomic write + ALWAYS rewritten, sf-independent — same
    contract as ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def lowcontrast(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (40 + (3 * xx + 2 * yy + 7 * i) % 40).astype(np.uint8)
        g = (40 + (3 * xx + 2 * yy + 7 * i + 13) % 40).astype(np.uint8)
        b = (40 + (3 * xx + 2 * yy + 7 * i + 26) % 40).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    def strokes(pix: np.ndarray, ys: slice) -> None:
        xx = np.arange(pix.shape[1])
        band = np.where((xx % 2)[None, :, None] == 0, 240, 16)
        pix[ys] = band.astype(np.uint8)

    for i in range(15):
        hh, ww = 18 + (5 * i) % 13, 22 + (7 * i) % 11
        pix = lowcontrast(hh, ww, i)
        flavor = i % 3
        if flavor == 1:
            strokes(pix, slice(hh // 3, hh // 3 + max(3, hh // 3)))
            add(f"txt-{i:02d}-text", pix)
        elif flavor == 2:
            xx = np.arange(ww)
            stripe = np.where((xx // 8 % 2)[None, :, None] == 0, 200, 40)
            add(f"txt-{i:02d}-busy",
                np.broadcast_to(stripe, (hh, ww, 3)).astype(np.uint8))
        else:
            add(f"txt-{i:02d}-clean", pix)
    full = np.zeros((16, 24, 3), np.uint8)
    strokes(full, slice(0, 16))
    add("txt-full", full)
    add("txt-solid", np.full((14, 20, 3), 128, np.uint8))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_text_overlay_batch(batch: "pa.Table") -> "pa.Table":
    """Integer text-overlay (OCR-junk) gate over raw-pixel payloads —
    the meme/subtitle/banner filter a LAION/DataComp-class funnel runs
    before caption-alignment scoring (rendered text dominates the
    caption signal and poisons contrastive training): per row y count
    STRONG horizontal milli-luma edges (|L(y,x+1)−L(y,x)| ≥ 60 000 —
    glyph strokes alternate fg/bg every few pixels, natural gradients
    do not); a row is a TEXT row when strong edges cover ≥ 180/1000 of
    its w−1 steps; ``text_milli`` is the per-mille share of text rows
    and ``has_text_overlay`` fires at ≥ 150 (a subtitle band is ~⅙ of
    the frame).  Row DENSITY (not the global edge sum) is what
    separates text from blocky graphics: period-8 stripes have strong
    edges in every row but only ~125/1000 density.  All-integer →
    bit-exact vs the DuckDB hex-walk oracle; stateless ``map_batches``,
    no shuffle — embarrassingly parallel at 100 TB."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "text_rows", "text_milli",
        "has_text_overlay")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        h, w = pix.shape[:2]
        if w < 2:
            raise ValueError(f"image {iid}: width {w} < 2 has no "
                             "horizontal step")
        luma = 299 * pix[..., 0] + 587 * pix[..., 1] + 114 * pix[..., 2]
        strong = np.abs(luma[:, 1:] - luma[:, :-1]) >= 60_000
        per_row = strong.sum(axis=1)
        text_rows = int((per_row * 1000 >= 180 * (w - 1)).sum())
        milli = text_rows * 1000 // h
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["text_rows"].append(text_rows)
        out["text_milli"].append(milli)
        out["has_text_overlay"].append(int(milli >= 150))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "text_rows",
                                  "text_milli", "has_text_overlay")]))


ROWDUP_FIXTURE = "/tmp/darc_ray_fixtures/image_rowdup.parquet"


def ensure_image_rowdup_fixture(path: str = ROWDUP_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the repeated-scanline
    corruption gate: ``-clean`` rows are the low-contrast gradient
    (adjacent rows always differ — per-channel step 2 inside a
    40-value band never yields equality), ``-blockdup`` rows freeze a
    middle band of max(3, h//3) rows to byte-identical copies (the
    truncated-decode / buffer-repeat corruption shape), ``-interlace``
    rows duplicate every even row into the next one (the bad-deinterlace
    shape: h//2 adjacent-duplicate pairs), and one ``dup-solid`` row
    pins dup_milli = 1000.  All pixel values are exact integers so the
    DuckDB hex-walk oracle (per-row hex substring, self-joined at
    y+1) re-derives the kernel bit-for-bit.  Fixed path + atomic write
    + ALWAYS rewritten, sf-independent — same contract as
    ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def lowcontrast(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (40 + (3 * xx + 2 * yy + 7 * i) % 40).astype(np.uint8)
        g = (40 + (3 * xx + 2 * yy + 7 * i + 13) % 40).astype(np.uint8)
        b = (40 + (3 * xx + 2 * yy + 7 * i + 26) % 40).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    for i in range(14):
        hh, ww = 16 + (5 * i) % 13, 20 + (7 * i) % 11
        pix = lowcontrast(hh, ww, i)
        flavor = i % 3
        if flavor == 1:
            k = max(3, hh // 3)
            pix[hh // 3: hh // 3 + k] = pix[hh // 3]
            add(f"dup-{i:02d}-blockdup", pix)
        elif flavor == 2:
            pix[1::2] = pix[0::2][: pix[1::2].shape[0]]
            add(f"dup-{i:02d}-interlace", pix)
        else:
            add(f"dup-{i:02d}-clean", pix)
    add("dup-solid", np.full((12, 18, 3), 77, np.uint8))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_row_dups_batch(batch: "pa.Table") -> "pa.Table":
    """Repeated-scanline corruption gate over raw-pixel payloads — the
    truncated-decode / buffer-repeat / bad-deinterlace QA check a
    crawl-scale image funnel runs on every decoded frame (a decoder
    that runs out of stream repeats its last scanline; the frame still
    parses, so only a pixel-level check catches it): count adjacent
    byte-identical row pairs, ``dup_milli`` = dups·1000 // (h−1), and
    ``row_corrupt`` fires at ≥ 250 (a quarter of the scanline steps
    frozen).  Byte equality (not luma equality) keeps the DuckDB
    oracle a per-row hex-substring self-join at y+1 — bit-exact.
    Stateless ``map_batches``, no shuffle — embarrassingly parallel."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "dup_adjacent", "dup_milli",
        "row_corrupt")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload)
        h, w = pix.shape[:2]
        if h < 2:
            raise ValueError(f"image {iid}: height {h} < 2 has no "
                             "adjacent row pair")
        dups = int((pix[1:] == pix[:-1]).all(axis=(1, 2)).sum())
        milli = dups * 1000 // (h - 1)
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["dup_adjacent"].append(dups)
        out["dup_milli"].append(milli)
        out["row_corrupt"].append(int(milli >= 250))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "dup_adjacent",
                                  "dup_milli", "row_corrupt")]))


PAIR_MANIFEST_FIXTURE = "/tmp/darc_ray_fixtures/pair_manifest.parquet"


def ensure_pair_manifest_fixture(path: str = PAIR_MANIFEST_FIXTURE) -> str:
    """Deterministic manifest-vs-payload corpus for the pair-table QA
    gate: ``-clean`` rows have manifest (w, h) columns equal to the
    RAWI header and a byte-complete payload, ``-swap`` rows carry the
    transposed dims in the manifest (the classic width/height column
    mix-up; w ≠ h everywhere so the swap is always detectable),
    ``-trunc`` rows lose their last 5 payload bytes (the interrupted-
    download shape — header intact, body short), ``-pad`` rows carry 7
    trailing junk bytes (the concatenated-stream shape), and one
    ``man-badw`` row is off by one column.  Fixed path + atomic write
    + ALWAYS rewritten, sf-independent — same contract as
    ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows: dict[str, list] = {k: [] for k in
                             ("image_id", "bytes", "w", "h", "fmt")}

    def add(iid: str, payload: bytes, w: int, h: int) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(payload)
        rows["w"].append(w)
        rows["h"].append(h)
        rows["fmt"].append("raw")

    def content(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (30 + (29 * xx + 13 * yy + 11 * i) % 180).astype(np.uint8)
        g = (30 + (29 * xx + 13 * yy + 11 * i + 41) % 180).astype(np.uint8)
        b = (30 + (29 * xx + 13 * yy + 11 * i + 82) % 180).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    for i in range(16):
        hh, ww = 10 + i % 5, 14 + (3 * i) % 7      # hh < ww always
        payload = img.raw_encode(content(hh, ww, i))
        flavor = i % 4
        if flavor == 1:
            add(f"man-{i:02d}-swap", payload, hh, ww)
        elif flavor == 2:
            add(f"man-{i:02d}-trunc", payload[:-5], ww, hh)
        elif flavor == 3:
            add(f"man-{i:02d}-pad", payload + b"\x00JUNK\x00!", ww, hh)
        else:
            add(f"man-{i:02d}-clean", payload, ww, hh)
    add("man-badw", img.raw_encode(content(12, 20, 99)), 21, 12)

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary()),
                                ("w", pa.int32()), ("h", pa.int32()),
                                ("fmt", pa.string())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def pair_manifest_qa_batch(batch: "pa.Table") -> "pa.Table":
    """Manifest-vs-payload consistency gate over the pair table — the
    trust-but-verify pass a crawl-scale funnel runs on every ingested
    (bytes, w, h) row before spending decode cycles (upstream manifest
    columns come from HTML attributes or a third-party index and are
    ROUTINELY wrong; a width/height mix-up silently poisons every
    aspect-ratio bucket downstream): parse ONLY the 12-byte RAWI
    header (no pixel decode — this stage is I/O-shaped at 100 TB),
    compare header dims against the manifest columns, and compare
    actual payload length against the header-implied 12 + 3wh
    (truncated download / concatenated-stream detection).  ``keep``
    requires both.  Stateless ``map_batches``, no shuffle."""
    import struct

    from darc_ray.functions.image import RAW_MAGIC

    out: dict[str, list] = {k: [] for k in (
        "image_id", "decl_w", "decl_h", "hdr_w", "hdr_h",
        "payload_bytes", "expected_bytes", "dims_ok", "complete",
        "keep")}
    for iid, payload, w, h in zip(batch.column("image_id").to_pylist(),
                                  batch.column("bytes").to_pylist(),
                                  batch.column("w").to_pylist(),
                                  batch.column("h").to_pylist()):
        if len(payload) < 12 or payload[:4] != RAW_MAGIC:
            raise ValueError(f"image {iid}: not a RAWI header")
        hw, hh = struct.unpack_from(">II", payload, 4)
        expected = 12 + 3 * hw * hh
        dims_ok = int(int(w) == hw and int(h) == hh)
        complete = int(len(payload) == expected)
        out["image_id"].append(iid)
        out["decl_w"].append(int(w))
        out["decl_h"].append(int(h))
        out["hdr_w"].append(hw)
        out["hdr_h"].append(hh)
        out["payload_bytes"].append(len(payload))
        out["expected_bytes"].append(expected)
        out["dims_ok"].append(dims_ok)
        out["complete"].append(complete)
        out["keep"].append(int(dims_ok and complete))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("decl_w", "decl_h", "hdr_w", "hdr_h",
                                  "payload_bytes", "expected_bytes",
                                  "dims_ok", "complete", "keep")]))


FRAME_SAMPLE_STRIDE = 3


def video_frame_manifest_batch(batch: "pa.Table") -> "pa.Table":
    """Frame-extraction manifest over FVID payloads — the seek plan a
    video training pipeline precomputes so decode workers can slice
    sampled frames straight out of object-store byte ranges without
    walking the container again (one row per SAMPLED frame: byte
    offset + length at stride 3): parses the length-prefixed frame
    index only (``video_index`` — no pixel decode, I/O-shaped at
    100 TB).  Stateless ``flat``-shaped ``map_batches`` (rows out >
    rows in), no shuffle; the DuckDB oracle re-walks the container
    with a recursive CTE, bit-exact."""
    from darc_ray.functions.video import video_index

    out: dict[str, list] = {k: [] for k in (
        "video_id", "frame_idx", "sample_rank", "byte_off",
        "frame_bytes")}
    for vid, payload in zip(batch.column("video_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        _, spans = video_index(payload)
        for idx in range(0, len(spans), FRAME_SAMPLE_STRIDE):
            off, length = spans[idx]
            out["video_id"].append(vid)
            out["frame_idx"].append(idx)
            out["sample_rank"].append(idx // FRAME_SAMPLE_STRIDE)
            out["byte_off"].append(off)
            out["frame_bytes"].append(length)
    return pa.Table.from_pydict(
        out, schema=pa.schema([("video_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("frame_idx", "sample_rank",
                                  "byte_off", "frame_bytes")]))


UPSCALE_FIXTURE = "/tmp/darc_ray_fixtures/image_upscale.parquet"


def ensure_image_upscale_fixture(path: str = UPSCALE_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the nearest-neighbor-upscale
    detector: ``-native`` rows are the low-contrast gradient (adjacent
    pixels never equal — per-channel step 3 inside a 40-value band),
    ``-up2`` rows are a half-res gradient repeated 2× on BOTH axes
    (every even column equals its right neighbor and every even row
    its lower — the effective-resolution-halving shape), ``-upcols`` /
    ``-uprows`` stretch one axis only (anamorphic/letterbox-fill
    resizes), ``-up2-noisy`` flips one pixel of an upscale (twin
    shares just under 1000, still ≥ the 900 flag), and one
    ``up-solid`` row pins both shares at 1000.  All dims even so the
    pair grid is exact.  Fixed path + atomic write + ALWAYS rewritten,
    sf-independent — same contract as ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def lowcontrast(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (40 + (3 * xx + 2 * yy + 7 * i) % 40).astype(np.uint8)
        g = (40 + (3 * xx + 2 * yy + 7 * i + 13) % 40).astype(np.uint8)
        b = (40 + (3 * xx + 2 * yy + 7 * i + 26) % 40).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    for i in range(15):
        hh, ww = 8 + 2 * (i % 4), 10 + 2 * (i % 3)     # even half-dims
        flavor = i % 5
        if flavor == 1:
            add(f"up-{i:02d}-up2",
                lowcontrast(hh, ww, i).repeat(2, 0).repeat(2, 1))
        elif flavor == 2:
            add(f"up-{i:02d}-upcols", lowcontrast(hh, ww, i).repeat(2, 1))
        elif flavor == 3:
            add(f"up-{i:02d}-uprows", lowcontrast(hh, ww, i).repeat(2, 0))
        elif flavor == 4:
            pix = lowcontrast(hh, ww, i).repeat(2, 0).repeat(2, 1)
            pix[1, 1] = (7, 7, 7)
            add(f"up-{i:02d}-up2-noisy", pix)
        else:
            add(f"up-{i:02d}-native", lowcontrast(2 * hh, 2 * ww, i))
    add("up-solid", np.full((12, 16, 3), 60, np.uint8))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_upscale_detect_batch(batch: "pa.Table") -> "pa.Table":
    """Nearest-neighbor-upscale detector over raw-pixel payloads — the
    effective-resolution gate a DataComp/LAION-class funnel runs so a
    250×250 crawl thumbnail blown up to 1000×1000 does not pass the
    min-size filter it actually fails: per-PIXEL twin shares
    ``col_twin_milli`` (even column x equal to x+1, all three
    channels) and ``row_twin_milli`` (even row y equal to y+1) over
    the ⌊w/2⌋·h resp. w·⌊h/2⌋ pair grids; a 2× nearest-neighbor
    upscale scores 1000/1000, native content ~0, one-axis stretches
    flag only their axis.  ``upscaled`` fires when BOTH shares ≥ 900
    (tolerates post-upscale noise/sharpening), ``stretched`` when
    exactly one does.  All-integer byte equality → bit-exact vs the
    DuckDB hex-walk oracle.  Stateless ``map_batches``, no shuffle."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "col_twin_milli",
        "row_twin_milli", "upscaled", "stretched")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload)
        h, w = pix.shape[:2]
        if w < 2 or h < 2:
            raise ValueError(f"image {iid}: {w}x{h} has no pixel pair")
        cw, rh = w // 2, h // 2
        col_eq = int((pix[:, 0:2 * cw:2] == pix[:, 1:2 * cw:2])
                     .all(axis=2).sum())
        row_eq = int((pix[0:2 * rh:2] == pix[1:2 * rh:2])
                     .all(axis=2).sum())
        cm = col_eq * 1000 // (h * cw)
        rm = row_eq * 1000 // (w * rh)
        up = int(cm >= 900 and rm >= 900)
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["col_twin_milli"].append(cm)
        out["row_twin_milli"].append(rm)
        out["upscaled"].append(up)
        out["stretched"].append(int(not up and (cm >= 900 or rm >= 900)))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "col_twin_milli",
                                  "row_twin_milli", "upscaled",
                                  "stretched")]))


AUDIO_DC_FIXTURE = "/tmp/darc_ray_fixtures/audio_dc.parquet"


def ensure_audio_dc_fixture(path: str = AUDIO_DC_FIXTURE) -> str:
    """Deterministic PCM16 WAV corpus for the DC-offset gate, built
    from square waves so every sample SUM is exact by construction:
    ``-centered`` rows alternate ±A in equal halves (sum exactly 0),
    ``-pos`` / ``-neg`` rows add a constant +500 / −300 bias (sum =
    n·bias exactly), ``-dc-only`` is a constant 80 (pure offset, the
    broken-ADC shape), and one stereo row biases only the second
    channel (the aggregate still sees it).  Fixed path + atomic write
    + ALWAYS rewritten, sf-independent — same contract as
    ``ensure_audio_pcm_fixture``."""
    import os
    import tempfile

    from darc_ray.functions.audio import wav_encode

    rows = {"audio_id": [], "bytes": []}

    def square(n: int, amp: int, bias: int) -> np.ndarray:
        s = np.where(np.arange(n) % 2 == 0, amp, -amp) + bias
        return s.astype(np.int16)

    for i in range(9):
        n = 800 + 100 * i                       # even -> halves balance
        amp = 2000 + 500 * i
        flavor = i % 3
        if flavor == 1:
            rows["audio_id"].append(f"dc-{i:02d}-pos")
            rows["bytes"].append(wav_encode(square(n, amp, 500),
                                            (8000, 16000)[i % 2]))
        elif flavor == 2:
            rows["audio_id"].append(f"dc-{i:02d}-neg")
            rows["bytes"].append(wav_encode(square(n, amp, -300),
                                            (8000, 16000)[i % 2]))
        else:
            rows["audio_id"].append(f"dc-{i:02d}-centered")
            rows["bytes"].append(wav_encode(square(n, amp, 0),
                                            (8000, 16000)[i % 2]))
    rows["audio_id"].append("dc-only")
    rows["bytes"].append(wav_encode(np.full(1000, 80, np.int16), 8000))
    st = np.stack([square(1200, 3000, 0), square(1200, 3000, 400)], axis=1)
    rows["audio_id"].append("dc-stereo-pos")
    rows["bytes"].append(wav_encode(st, 16000))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("audio_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def audio_dc_offset_batch(batch: "pa.Table") -> "pa.Table":
    """DC-offset gate over PCM16 WAV payloads — the broken-ADC /
    bad-trim QA check an audio curation pass runs before windowed
    features (a constant bias poisons every RMS window and clips one
    polarity early): exact integer sample sum, magnitude per-mille
    ``dc_abs_milli`` = |Σv|·1000 // n (milli-sample units — kept as
    sign + magnitude so floor-vs-truncate division semantics never
    diverge between numpy and SQL), sign, and ``dc_biased`` at
    ≥ 50 000 (a 50-sample-unit bias).  All-integer → bit-exact vs the
    DuckDB little-endian hex sample walk.  Stateless ``map_batches``,
    no shuffle."""
    from darc_ray.functions.audio import wav_decode

    out: dict[str, list] = {k: [] for k in (
        "audio_id", "n_int16", "sum_v", "dc_abs_milli", "dc_sign",
        "dc_biased")}
    for aid, payload in zip(batch.column("audio_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        samples, _sr = wav_decode(payload)
        v = samples.reshape(-1).astype(np.int64)
        n = len(v)
        sv = int(v.sum())
        mag = abs(sv) * 1000 // n
        out["audio_id"].append(aid)
        out["n_int16"].append(n)
        out["sum_v"].append(sv)
        out["dc_abs_milli"].append(mag)
        out["dc_sign"].append((sv > 0) - (sv < 0))
        out["dc_biased"].append(int(mag >= 50_000))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("audio_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("n_int16", "sum_v", "dc_abs_milli",
                                  "dc_sign", "dc_biased")]))


HOTPIXEL_FIXTURE = "/tmp/darc_ray_fixtures/image_hotpixel.parquet"


def ensure_image_hotpixel_fixture(path: str = HOTPIXEL_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the hot-pixel (sensor-defect)
    detector: ``-clean`` rows are the low-contrast gradient (every
    4-neighbor milli-luma delta ≤ 39 000, far under the 100 000 spike
    threshold), ``-hot`` rows plant 1-3 isolated saturated pixels at
    interior positions (each differs from ALL four neighbors by ≥ the
    threshold — the stuck-photosite shape), ``-edgecase`` rows plant a
    saturated pixel on the border (border pixels have no complete
    4-neighborhood and must NOT count), and ``-line`` rows plant a
    bright vertical line 2 px wide (bright NEIGHBORS — a feature, not
    a defect — so the detector must stay silent).  All-integer; the
    DuckDB hex-walk oracle compares the same four neighbor triplets.
    Fixed path + atomic write + ALWAYS rewritten, sf-independent —
    same contract as ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def lowcontrast(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (40 + (3 * xx + 2 * yy + 7 * i) % 40).astype(np.uint8)
        g = (40 + (3 * xx + 2 * yy + 7 * i + 13) % 40).astype(np.uint8)
        b = (40 + (3 * xx + 2 * yy + 7 * i + 26) % 40).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    for i in range(14):
        hh, ww = 14 + (5 * i) % 11, 17 + (7 * i) % 9
        pix = lowcontrast(hh, ww, i)
        flavor = i % 4
        if flavor == 1:
            k = 1 + i % 3
            for j in range(k):                 # isolated interior spikes
                pix[2 + 3 * j, 2 + 4 * j] = 255
            add(f"hot-{i:02d}-hot", pix)
        elif flavor == 2:
            pix[0, 3] = 255                     # border spike: no count
            add(f"hot-{i:02d}-edgecase", pix)
        elif flavor == 3:
            pix[:, 5:7] = 250                   # 2-px line: neighbors hot
            add(f"hot-{i:02d}-line", pix)
        else:
            add(f"hot-{i:02d}-clean", pix)
    add("hot-solid", np.full((12, 14, 3), 90, np.uint8))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_hot_pixels_batch(batch: "pa.Table") -> "pa.Table":
    """Hot-pixel (stuck-photosite) detector over raw-pixel payloads —
    the sensor-defect QA a crawl-scale funnel runs on camera-sourced
    frames (a stuck pixel survives resize and poisons patch statistics
    downstream): an INTERIOR pixel is HOT when its milli-luma differs
    from ALL four 4-neighbors by ≥ 100 000 in the same direction
    (min over neighbors of |Δ| with a common sign — a 2-px line has a
    like-valued neighbor and stays silent, as does a border pixel,
    which has no complete neighborhood).  Emits the count and a
    per-megapixel-style per-mille over interior pixels plus the flag
    at ≥ 1 hot pixel.  All-integer → bit-exact vs the DuckDB
    hex-walk oracle.  Stateless ``map_batches``, no shuffle."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "n_hot", "hot_milli",
        "sensor_defect")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        h, w = pix.shape[:2]
        if h < 3 or w < 3:
            raise ValueError(f"image {iid}: {w}x{h} has no interior")
        luma = 299 * pix[..., 0] + 587 * pix[..., 1] + 114 * pix[..., 2]
        c = luma[1:-1, 1:-1]
        dn = c - luma[:-2, 1:-1]
        ds = c - luma[2:, 1:-1]
        dw = c - luma[1:-1, :-2]
        de = c - luma[1:-1, 2:]
        thr = 100_000
        hot = (((dn >= thr) & (ds >= thr) & (dw >= thr) & (de >= thr))
               | ((dn <= -thr) & (ds <= -thr) & (dw <= -thr)
                  & (de <= -thr)))
        n_hot = int(hot.sum())
        interior = (h - 2) * (w - 2)
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["n_hot"].append(n_hot)
        out["hot_milli"].append(n_hot * 1000 // interior)
        out["sensor_defect"].append(int(n_hot >= 1))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "n_hot",
                                  "hot_milli", "sensor_defect")]))


CHECKER_FIXTURE = "/tmp/darc_ray_fixtures/image_checker.parquet"


def ensure_image_checker_fixture(path: str = CHECKER_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the checkerboard-artifact
    (GAN/deconvolution) detector: ``-clean`` rows are the low-contrast
    monotone-step gradient (no sign alternation), ``-checker`` rows
    superimpose a ±30 period-2 alternation on BOTH axes over the
    gradient (the classic transposed-convolution grid), ``-hstripe``
    rows alternate on x only, and one ``chk-solid`` row pins the
    zero-gradient case.  All-integer; the DuckDB oracle reads two
    neighbor triplets per pixel.  Fixed path + atomic write + ALWAYS
    rewritten, sf-independent — same contract as
    ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def lowcontrast(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (80 + (3 * xx + 2 * yy + 7 * i) % 40).astype(np.int64)
        g = (80 + (3 * xx + 2 * yy + 7 * i + 13) % 40).astype(np.int64)
        b = (80 + (3 * xx + 2 * yy + 7 * i + 26) % 40).astype(np.int64)
        return np.stack([r, g, b], axis=2)

    for i in range(12):
        hh, ww = 14 + (5 * i) % 11, 18 + (7 * i) % 9
        base = lowcontrast(hh, ww, i)
        yy, xx = np.mgrid[0:hh, 0:ww]
        flavor = i % 3
        if flavor == 1:
            grid = 30 * ((xx + yy) % 2 * 2 - 1)
            add(f"chk-{i:02d}-checker",
                np.clip(base + grid[..., None], 0, 255).astype(np.uint8))
        elif flavor == 2:
            grid = 30 * (xx % 2 * 2 - 1)
            add(f"chk-{i:02d}-hstripe",
                np.clip(base + grid[..., None], 0, 255).astype(np.uint8))
        else:
            add(f"chk-{i:02d}-clean", base.astype(np.uint8))
    add("chk-solid", np.full((12, 16, 3), 120, np.uint8))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_checkerboard_batch(batch: "pa.Table") -> "pa.Table":
    """Checkerboard-artifact (GAN / transposed-convolution) detector
    over raw-pixel payloads — the synthetic-image QA a modern pair
    funnel runs now that generated images flood the crawl: a pixel x
    ZIGZAGS when the two consecutive horizontal milli-luma steps
    L(x+1)−L(x) and L(x+2)−L(x+1) have opposite signs and BOTH
    magnitudes ≥ 20 000 (period-2 alternation; monotone gradients and
    8-px block steps do not); ``zigzag_x_milli`` / ``zigzag_y_milli``
    are per-mille shares over the (w−2)·h resp. w·(h−2) triple grids
    and ``checkerboard`` fires when BOTH axes ≥ 500 (``striped`` when
    exactly one).  All-integer → bit-exact vs the DuckDB hex-walk
    oracle.  Stateless ``map_batches``, no shuffle."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "zigzag_x_milli",
        "zigzag_y_milli", "checkerboard", "striped")}
    thr = 20_000
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        h, w = pix.shape[:2]
        if h < 3 or w < 3:
            raise ValueError(f"image {iid}: {w}x{h} has no step triple")
        luma = 299 * pix[..., 0] + 587 * pix[..., 1] + 114 * pix[..., 2]
        gx = luma[:, 1:] - luma[:, :-1]
        zx = int((((gx[:, :-1] >= thr) & (gx[:, 1:] <= -thr))
                  | ((gx[:, :-1] <= -thr) & (gx[:, 1:] >= thr))).sum())
        gy = luma[1:, :] - luma[:-1, :]
        zy = int((((gy[:-1, :] >= thr) & (gy[1:, :] <= -thr))
                  | ((gy[:-1, :] <= -thr) & (gy[1:, :] >= thr))).sum())
        xm = zx * 1000 // (h * (w - 2))
        ym = zy * 1000 // (w * (h - 2))
        both = int(xm >= 500 and ym >= 500)
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["zigzag_x_milli"].append(xm)
        out["zigzag_y_milli"].append(ym)
        out["checkerboard"].append(both)
        out["striped"].append(int(not both and (xm >= 500 or ym >= 500)))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "zigzag_x_milli",
                                  "zigzag_y_milli", "checkerboard",
                                  "striped")]))


IMAGE_QA_FIXTURE = "/tmp/darc_ray_fixtures/image_qa.parquet"


def ensure_image_qa_fixture(path: str = IMAGE_QA_FIXTURE) -> str:
    """Deterministic (image_id, bytes, w, h) corpus for the composed
    image-QA funnel: per flavor exactly ONE stage rejects — ``-swap``
    / ``-trunc`` (manifest stage), ``-rowdup`` (a 5-row frozen band:
    triple-scanline corruption), ``-hot`` (two stuck photosites),
    ``-checker`` (±30 period-2 grid), ``-up2`` (2× nearest-neighbor
    upscale, which the TRIPLE scanline test deliberately passes —
    pair-duplicates are resampling, runs are corruption) — plus
    ``-good`` rows that pass everything and one ``qa-multi`` row that
    is both truncated and defective (must reject at the FIRST stage).
    Fixed path + atomic write + ALWAYS rewritten, sf-independent —
    same contract as ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows: dict[str, list] = {k: [] for k in ("image_id", "bytes", "w", "h")}

    def add(iid: str, payload: bytes, w: int, h: int) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(payload)
        rows["w"].append(w)
        rows["h"].append(h)

    def lowcontrast(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (80 + (3 * xx + 2 * yy + 7 * i) % 40).astype(np.int64)
        g = (80 + (3 * xx + 2 * yy + 7 * i + 13) % 40).astype(np.int64)
        b = (80 + (3 * xx + 2 * yy + 7 * i + 26) % 40).astype(np.int64)
        return np.stack([r, g, b], axis=2)

    for i in range(15):
        hh, ww = 12 + 2 * (i % 4), 14 + 2 * (i % 3)    # even, >= 12
        pix = lowcontrast(hh, ww, i).astype(np.uint8)
        flavor = i % 7
        if flavor == 1:
            add(f"qa-{i:02d}-swap", img.raw_encode(pix), hh, ww)
        elif flavor == 2:
            add(f"qa-{i:02d}-trunc", img.raw_encode(pix)[:-5], ww, hh)
        elif flavor == 3:
            pix[4:9] = pix[4]                           # 5 frozen rows
            add(f"qa-{i:02d}-rowdup", img.raw_encode(pix), ww, hh)
        elif flavor == 4:
            pix[3, 3] = 255
            pix[7, 9] = 255
            add(f"qa-{i:02d}-hot", img.raw_encode(pix), ww, hh)
        elif flavor == 5:
            yy, xx = np.mgrid[0:hh, 0:ww]
            grid = 30 * ((xx + yy) % 2 * 2 - 1)
            chk = np.clip(lowcontrast(hh, ww, i) + grid[..., None],
                          0, 255).astype(np.uint8)
            add(f"qa-{i:02d}-checker", img.raw_encode(chk), ww, hh)
        elif flavor == 6:
            up = pix.repeat(2, 0).repeat(2, 1)
            add(f"qa-{i:02d}-up2", img.raw_encode(up), 2 * ww, 2 * hh)
        else:
            add(f"qa-{i:02d}-good", img.raw_encode(pix), ww, hh)
    bad = lowcontrast(12, 14, 99).astype(np.uint8)
    bad[3, 3] = 255                                     # hot AND truncated
    add("qa-multi", img.raw_encode(bad)[:-5], 14, 12)

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary()),
                                ("w", pa.int32()), ("h", pa.int32())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_qa_funnel_batch(batch: "pa.Table") -> "pa.Table":
    """Composed image-QA funnel in PRODUCTION ORDER — the defect gate
    stack a crawl-scale ingest runs before any model scoring, cheapest
    first and never decoding a row an earlier stage rejected:
    (1) manifest (12-byte header vs (w, h) columns + exact payload
    length — no decode), then per decoded frame (2) scanlines (≥ 3
    identical CONSECUTIVE rows = corruption; pair-duplicates pass —
    that's resampling, handled by stage 5), (3) sensor (≥ 1 hot
    pixel), (4) synthetic (checkerboard zigzag ≥ 500 both axes),
    (5) resolution (2× nearest-neighbor twin shares ≥ 900 both axes).
    Stage flags are −1 for stages after the rejecting one (never
    evaluated in production; the single decode here is masked
    identically so the DuckDB oracle can reproduce the exact table).
    ``reject_stage`` names the first failure or 'keep'.  Stateless
    ``map_batches``, no shuffle — the funnel composes five proven
    per-row kernels under one oracle."""
    import struct

    from darc_ray.functions.image import RAW_MAGIC, raw_decode

    names = ("image_id", "decl_w", "decl_h", "manifest_ok", "scan_bad",
             "sensor_bad", "synth_bad", "upscaled", "keep")
    out: dict[str, list] = {k: [] for k in names}
    out["reject_stage"] = []
    for iid, payload, w, h in zip(batch.column("image_id").to_pylist(),
                                  batch.column("bytes").to_pylist(),
                                  batch.column("w").to_pylist(),
                                  batch.column("h").to_pylist()):
        if len(payload) < 12 or payload[:4] != RAW_MAGIC:
            raise ValueError(f"image {iid}: not a RAWI header")
        hw, hh = struct.unpack_from(">II", payload, 4)
        man_ok = int(int(w) == hw and int(h) == hh
                     and len(payload) == 12 + 3 * hw * hh)
        scan = sensor = synth = up = -1
        stage = "manifest"
        if man_ok:
            pix = raw_decode(payload)
            p64 = pix.astype(np.int64)
            luma = (299 * p64[..., 0] + 587 * p64[..., 1]
                    + 114 * p64[..., 2])
            eq_next = (pix[1:] == pix[:-1]).all(axis=(1, 2))
            scan = int(bool((eq_next[1:] & eq_next[:-1]).any()))
            if scan:
                stage = "scanlines"
            else:
                c = luma[1:-1, 1:-1]
                dn, ds = c - luma[:-2, 1:-1], c - luma[2:, 1:-1]
                dw, de = c - luma[1:-1, :-2], c - luma[1:-1, 2:]
                t = 100_000
                sensor = int(bool(
                    (((dn >= t) & (ds >= t) & (dw >= t) & (de >= t))
                     | ((dn <= -t) & (ds <= -t) & (dw <= -t)
                        & (de <= -t))).any()))
                if sensor:
                    stage = "sensor"
                else:
                    thr = 20_000
                    gx = luma[:, 1:] - luma[:, :-1]
                    zx = int((((gx[:, :-1] >= thr) & (gx[:, 1:] <= -thr))
                              | ((gx[:, :-1] <= -thr)
                                 & (gx[:, 1:] >= thr))).sum())
                    gy = luma[1:, :] - luma[:-1, :]
                    zy = int((((gy[:-1, :] >= thr) & (gy[1:, :] <= -thr))
                              | ((gy[:-1, :] <= -thr)
                                 & (gy[1:, :] >= thr))).sum())
                    synth = int(zx * 1000 // (hh * (hw - 2)) >= 500
                                and zy * 1000 // (hw * (hh - 2)) >= 500)
                    if synth:
                        stage = "synthetic"
                    else:
                        cw, rh = hw // 2, hh // 2
                        ce = int((pix[:, 0:2 * cw:2] == pix[:, 1:2 * cw:2])
                                 .all(axis=2).sum())
                        re = int((pix[0:2 * rh:2] == pix[1:2 * rh:2])
                                 .all(axis=2).sum())
                        up = int(ce * 1000 // (hh * cw) >= 900
                                 and re * 1000 // (hw * rh) >= 900)
                        stage = "resolution" if up else "keep"
        keep = int(stage == "keep")
        out["image_id"].append(iid)
        out["decl_w"].append(int(w))
        out["decl_h"].append(int(h))
        out["manifest_ok"].append(man_ok)
        out["scan_bad"].append(scan)
        out["sensor_bad"].append(sensor)
        out["synth_bad"].append(synth)
        out["upscaled"].append(up)
        out["keep"].append(keep)
        out["reject_stage"].append(stage)
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("decl_w", "decl_h", "manifest_ok",
                                  "scan_bad", "sensor_bad", "synth_bad",
                                  "upscaled", "keep")]
                              + [("reject_stage", pa.string())]))


VIGNETTE_FIXTURE = "/tmp/darc_ray_fixtures/image_vignette.parquet"


def ensure_image_vignette_fixture(path: str = VIGNETTE_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the vignette (corner-falloff)
    detector: ``-flat`` rows are the low-contrast gradient (corner and
    center mean milli-luma agree within noise), ``-vig`` rows multiply
    a radial falloff that darkens the four 4×4 corner blocks to
    ≈ 40% of the center 4×4 block (the lens/Instagram-filter shape),
    ``-invvig`` rows BRIGHTEN corners (flash hotspot inversion — the
    signed score separates it), and one ``vig-solid`` row pins the
    zero-contrast case.  All pixel values are exact integers so the
    DuckDB hex-walk oracle re-derives the block means bit-for-bit.
    Fixed path + atomic write + ALWAYS rewritten, sf-independent —
    same contract as ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def base(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (150 + (3 * xx + 2 * yy + 7 * i) % 40).astype(np.int64)
        g = (150 + (3 * xx + 2 * yy + 7 * i + 13) % 40).astype(np.int64)
        b = (150 + (3 * xx + 2 * yy + 7 * i + 26) % 40).astype(np.int64)
        return np.stack([r, g, b], axis=2)

    def corner_scale(pix: np.ndarray, milli: int) -> np.ndarray:
        out = pix.copy()
        for ys in (slice(0, 4), slice(-4, None)):
            for xs in (slice(0, 4), slice(-4, None)):
                out[ys, xs] = pix[ys, xs] * milli // 1000
        return out

    for i in range(12):
        hh, ww = 14 + (5 * i) % 11, 16 + (7 * i) % 9
        pix = base(hh, ww, i)
        flavor = i % 3
        if flavor == 1:
            add(f"vig-{i:02d}-vig",
                corner_scale(pix, 400).astype(np.uint8))
        elif flavor == 2:
            add(f"vig-{i:02d}-invvig",
                np.clip(corner_scale(pix, 1350), 0, 255).astype(np.uint8))
        else:
            add(f"vig-{i:02d}-flat", pix.astype(np.uint8))
    add("vig-solid", np.full((14, 16, 3), 160, np.uint8))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_vignette_batch(batch: "pa.Table") -> "pa.Table":
    """Vignette (corner-falloff) detector over raw-pixel payloads —
    the lens-defect / filter-effect signal a pair funnel scores
    alongside the exposure gates (heavy vignettes mark re-edited
    social-media copies of an original — a near-dup confounder worth
    a feature of its own): mean milli-luma of the four 4×4 corner
    blocks vs the center 4×4 block; ``falloff_milli`` =
    (center − corner_mean)·1000 // center (signed: positive = dark
    corners, negative = hotspot corners); ``vignetted`` fires at
    ≥ 300, ``corner_hot`` at ≤ −200.  All-integer floor divisions on
    non-negative sums → bit-exact vs the DuckDB hex-walk oracle.
    Stateless ``map_batches``, no shuffle."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "center_mluma", "corner_mluma",
        "falloff_milli", "vignetted", "corner_hot")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        h, w = pix.shape[:2]
        if h < 12 or w < 12:
            raise ValueError(f"image {iid}: {w}x{h} too small for "
                             "disjoint 4x4 corner/center blocks")
        luma = 299 * pix[..., 0] + 587 * pix[..., 1] + 114 * pix[..., 2]
        cy, cx = h // 2 - 2, w // 2 - 2
        center = int(luma[cy:cy + 4, cx:cx + 4].sum()) // 16
        csum = (int(luma[:4, :4].sum()) + int(luma[:4, -4:].sum())
                + int(luma[-4:, :4].sum()) + int(luma[-4:, -4:].sum()))
        corner = csum // 64
        # signed numerator over positive denominator: python floor
        # division matches DuckDB // for non-negative divisors only
        # when the numerator sign is handled symmetrically — emit the
        # magnitude with an explicit sign to stay floor/trunc-proof
        diff = center - corner
        mag = abs(diff) * 1000 // max(center, 1)
        fall = mag if diff >= 0 else -mag
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["center_mluma"].append(center)
        out["corner_mluma"].append(corner)
        out["falloff_milli"].append(fall)
        out["vignetted"].append(int(fall >= 300))
        out["corner_hot"].append(int(fall <= -200))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "center_mluma",
                                  "corner_mluma", "falloff_milli",
                                  "vignetted", "corner_hot")]))


EDGEDUP_FIXTURE = "/tmp/darc_ray_fixtures/image_edgedup.parquet"


def ensure_image_edgedup_fixture(path: str = EDGEDUP_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the replicated-border
    detector: ``-clean`` rows are the low-contrast gradient (no border
    equals its inner neighbor), ``-top`` / ``-bottom`` / ``-left`` /
    ``-right`` rows copy one border row/column from its inner
    neighbor (the off-by-one resize / BORDER_REPLICATE leak), and
    ``-frame`` rows replicate all four.  Fixed path + atomic write +
    ALWAYS rewritten, sf-independent — same contract as
    ``ensure_image_borders_fixture``."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def lowcontrast(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (40 + (3 * xx + 2 * yy + 7 * i) % 40).astype(np.uint8)
        g = (40 + (3 * xx + 2 * yy + 7 * i + 13) % 40).astype(np.uint8)
        b = (40 + (3 * xx + 2 * yy + 7 * i + 26) % 40).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    for i in range(12):
        hh, ww = 12 + (5 * i) % 9, 15 + (7 * i) % 7
        pix = lowcontrast(hh, ww, i)
        flavor = i % 6
        if flavor == 1:
            pix[0] = pix[1]
            add(f"edge-{i:02d}-top", pix)
        elif flavor == 2:
            pix[-1] = pix[-2]
            add(f"edge-{i:02d}-bottom", pix)
        elif flavor == 3:
            pix[:, 0] = pix[:, 1]
            add(f"edge-{i:02d}-left", pix)
        elif flavor == 4:
            pix[:, -1] = pix[:, -2]
            add(f"edge-{i:02d}-right", pix)
        elif flavor == 5:
            pix[0] = pix[1]
            pix[-1] = pix[-2]
            pix[:, 0] = pix[:, 1]
            pix[:, -1] = pix[:, -2]
            add(f"edge-{i:02d}-frame", pix)
        else:
            add(f"edge-{i:02d}-clean", pix)

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_edge_dup_batch(batch: "pa.Table") -> "pa.Table":
    """Replicated-border detector over raw-pixel payloads — the
    off-by-one resize / BORDER_REPLICATE leak QA (a resampler that
    reads one row short fills the last scanline by replication; the
    frame still looks fine at a glance, so only a byte compare of
    each border against its inner neighbor catches it): four flags
    (top/bottom/left/right byte-identical to the adjacent interior
    row/column), their count, and ``edge_replicated`` at ≥ 1.  Byte
    equality → bit-exact vs the DuckDB hex-substring oracle.
    Stateless ``map_batches``, no shuffle."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "top_dup", "bottom_dup",
        "left_dup", "right_dup", "n_dup_edges", "edge_replicated")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload)
        h, w = pix.shape[:2]
        if h < 2 or w < 2:
            raise ValueError(f"image {iid}: {w}x{h} has no border pair")
        t = int((pix[0] == pix[1]).all())
        b = int((pix[-1] == pix[-2]).all())
        lf = int((pix[:, 0] == pix[:, 1]).all())
        rt = int((pix[:, -1] == pix[:, -2]).all())
        n = t + b + lf + rt
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["top_dup"].append(t)
        out["bottom_dup"].append(b)
        out["left_dup"].append(lf)
        out["right_dup"].append(rt)
        out["n_dup_edges"].append(n)
        out["edge_replicated"].append(int(n >= 1))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "top_dup",
                                  "bottom_dup", "left_dup", "right_dup",
                                  "n_dup_edges", "edge_replicated")]))


def image_border_contrast_batch(batch: "pa.Table") -> "pa.Table":
    """Framed/matted-photo detector over RAW-pixel payloads — distinct
    from `image_letterbox` (bars on ONE axis) and `image_vignette`
    (corner falloff): the outermost 1-px ring's integer luma
    (299r+587g+114b) is compared to the interior's.  ``framed`` fires
    when the ring is near-uniform (range ≤ 20 000 luma-milli units)
    AND contrasts with the interior (mean delta ≥ 30 000) — a solid
    image has delta 0 and a letterboxed one has a textured ring, so
    only a full uniform frame trips it.  All-integer (floor-divided
    means) → bit-exact vs the hex-walk oracle."""
    from darc_ray.functions import image as img

    out: dict[str, list] = {k: [] for k in (
        "image_id", "width", "height", "ring_mean", "interior_mean",
        "delta", "ring_range", "framed")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = img.raw_decode(payload).astype(np.int64)
        h, w = pix.shape[:2]
        if h < 3 or w < 3:
            continue                       # no interior: no row
        luma = 299 * pix[..., 0] + 587 * pix[..., 1] + 114 * pix[..., 2]
        ring_mask = np.zeros((h, w), dtype=bool)
        ring_mask[0, :] = ring_mask[-1, :] = True
        ring_mask[:, 0] = ring_mask[:, -1] = True
        ring = luma[ring_mask]
        inner = luma[~ring_mask]
        rm = int(ring.sum() // len(ring))
        im = int(inner.sum() // len(inner))
        rr = int(ring.max() - ring.min())
        delta = abs(rm - im)
        out["image_id"].append(iid)
        out["width"].append(w)
        out["height"].append(h)
        out["ring_mean"].append(rm)
        out["interior_mean"].append(im)
        out["delta"].append(delta)
        out["ring_range"].append(rr)
        out["framed"].append(int(rr <= 20000 and delta >= 30000))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("width", "height", "ring_mean",
                                  "interior_mean", "delta",
                                  "ring_range", "framed")]))


def audio_stereo_imbalance_batch(batch: "pa.Table") -> "pa.Table":
    """Dead/attenuated-channel QA over PCM16 WAV payloads: channel-0's
    share of total sample energy in per-mille (mono → 1000 by
    definition; an all-silent track → 500, balanced); ``imbalanced``
    fires only for stereo tracks whose first channel carries ≥ 850‰
    or ≤ 150‰ of the energy.  All-integer → bit-exact vs the DuckDB
    oracle's fmt-chunk walk + sample-index-parity energy split."""
    from darc_ray.functions.audio import wav_decode

    out: dict[str, list] = {k: [] for k in (
        "audio_id", "n_channels", "left_milli", "imbalanced")}
    for aid, payload in zip(batch.column("audio_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        s, _sr = wav_decode(payload)
        ch = s.shape[1]
        v = s.astype(np.int64)
        total = int((v * v).sum())
        left = int((v[:, 0] * v[:, 0]).sum())
        lm = 500 if total == 0 else left * 1000 // total
        out["audio_id"].append(aid)
        out["n_channels"].append(ch)
        out["left_milli"].append(lm)
        out["imbalanced"].append(int(ch == 2 and (lm >= 850 or lm <= 150)))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("audio_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("n_channels", "left_milli",
                                  "imbalanced")]))


ROTDUP_FIXTURE = "/tmp/darc_ray_fixtures/image_rot.parquet"


def ensure_image_rot_fixture(path: str = ROTDUP_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the rotation-duplicate
    family: textured bases plus planted 90°/180°/270° rotated copies
    (``-r90``/``-r180``/``-r270``), one MIRRORED row (``-mir`` — a
    flip is NOT a rotation and must NOT join the group) and unique
    decoys.  All-integer pixels; fixed path + atomic write + always
    rewritten, sf-independent."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def content(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = (25 + (37 * xx + 19 * yy + 13 * i) % 190).astype(np.uint8)
        g = (25 + (37 * xx + 19 * yy + 13 * i + 47) % 190).astype(np.uint8)
        b = (25 + (37 * xx + 19 * yy + 13 * i + 94) % 190).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    for i in range(4):
        base = content(18 + 3 * i, 24 + 2 * i, i)
        add(f"rot-{i}-base", base)
        add(f"rot-{i}-r90", np.rot90(base, 1))
        if i % 2 == 0:
            add(f"rot-{i}-r180", np.rot90(base, 2))
        if i == 0:
            add(f"rot-{i}-r270", np.rot90(base, 3))
            add(f"rot-{i}-mir", base[:, ::-1])
    for i in range(4, 8):
        add(f"rot-{i}-solo", content(17 + 2 * i, 21 + 3 * i, i))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_rot_dups_batch(batch: "pa.Table") -> "pa.Table":
    """Rotation-invariant duplicate key: the canonical hash is the MIN
    of the four 90°-rotation dhashes — pixel-identical rotated copies
    share it, mirrors and distinct content don't.  Emits (image_id,
    canon_hash); grouping happens downstream.  Per-pixel work is
    vectorized inside ``dhash64``; the loop is per-IMAGE (decode
    boundary), same shape as the other pixel kernels."""
    ids, canon = [], []
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = img.raw_decode(payload)
        ids.append(iid)
        canon.append(min(img.dhash64(np.ascontiguousarray(
            np.rot90(pix, k))) for k in range(4)))
    return pa.Table.from_pydict(
        {"image_id": ids, "canon_hash": canon},
        schema=pa.schema([("image_id", pa.string()),
                          ("canon_hash", pa.int64())]))


GRAYRGB_FIXTURE = "/tmp/darc_ray_fixtures/image_gray.parquet"


def ensure_image_gray_fixture(path: str = GRAYRGB_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the grayscale-as-RGB gate:
    true grayscale gradients (r=g=b), a near-gray row (channels within
    the ±2 tolerance — warm-cast scan, still gray content), colorful
    textures (must NOT flag), and a borderline mixed row (a gray field
    with a 20 %%-wide saturated stripe — below the 990‰ gate).  Fixed
    path + atomic write + always rewritten, sf-independent."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    for i in range(3):                              # true grayscale
        hh, ww = 14 + 2 * i, 20 + 3 * i
        yy, xx = np.mgrid[0:hh, 0:ww]
        v = ((xx * 7 + yy * 3 + 11 * i) % 256).astype(np.uint8)
        add(f"gray-{i}-pure", np.stack([v, v, v], axis=2))
    # near-gray: g = r+1, b = r-1 (spread 2 — inside the tolerance)
    hh, ww = 16, 22
    yy, xx = np.mgrid[0:hh, 0:ww]
    r = (40 + (xx * 5 + yy * 9) % 170).astype(np.uint8)
    add("gray-3-cast", np.stack([r, r + 1, r - 1], axis=2))
    for i in range(4, 7):                           # colorful textures
        hh, ww = 15 + i, 19 + i
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = ((xx * 13 + 17 * i) % 256).astype(np.uint8)
        g = ((yy * 11 + 29 * i) % 256).astype(np.uint8)
        b = ((xx * 3 + yy * 7 + 41 * i) % 256).astype(np.uint8)
        add(f"gray-{i}-color", np.stack([r, g, b], axis=2))
    # mixed: gray base, saturated stripe over the last 20 % of columns
    hh, ww = 18, 30
    yy, xx = np.mgrid[0:hh, 0:ww]
    v = ((xx * 6 + yy * 4) % 256).astype(np.uint8)
    pix = np.stack([v, v, v], axis=2)
    pix[:, 24:, 0] = 250
    pix[:, 24:, 1] = 30
    pix[:, 24:, 2] = 60
    add("gray-7-stripe", pix)

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_gray_rgb_batch(batch: "pa.Table") -> "pa.Table":
    """Grayscale-stored-as-RGB gate: per image, the per-mille share of
    pixels whose channel spread max(r,g,b)−min(r,g,b) ≤ 2; flagged
    when ≥ 990‰.  Catches the wasted-3×-storage / distribution-skew
    rows a channel-stats mean can miss (a mixed image can have equal
    channel MEANS yet be fully colorful).  All-integer."""
    ids, milli, flag = [], [], []
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = img.raw_decode(payload).astype(np.int64)
        spread = pix.max(axis=2) - pix.min(axis=2)
        n = spread.size
        m = int((spread <= 2).sum()) * 1000 // n
        ids.append(iid)
        milli.append(m)
        flag.append(1 if m >= 990 else 0)
    return pa.Table.from_pydict(
        {"image_id": ids, "gray_milli": milli, "is_gray": flag},
        schema=pa.schema([("image_id", pa.string()),
                          ("gray_milli", pa.int64()),
                          ("is_gray", pa.int64())]))


POSTER_FIXTURE = "/tmp/darc_ray_fixtures/image_poster.parquet"


def ensure_image_poster_fixture(path: str = POSTER_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the posterization gate:
    heavily-quantized textures (3 significant bits — GIF-class
    banding), a solid-color card, rich gradients and textures (must
    NOT flag), and a borderline 17-level ramp just above the ≤16
    threshold.  Fixed path + atomic write + always rewritten."""
    import os
    import tempfile

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(pix)))

    def texture(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = ((xx * 13 + yy * 5 + 17 * i) % 256).astype(np.uint8)
        g = ((xx * 7 + yy * 11 + 29 * i) % 256).astype(np.uint8)
        b = ((xx * 3 + yy * 9 + 41 * i) % 256).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    for i in range(2):                              # banded: 3-bit quantized
        add(f"post-{i}-banded", texture(16 + i, 22 + i, i) & 0xE0)
    solid = np.zeros((12, 16, 3), dtype=np.uint8)
    solid[..., 0], solid[..., 1], solid[..., 2] = 96, 128, 160
    add("post-2-solid", solid)
    for i in range(3, 6):                           # rich content
        add(f"post-{i}-rich", texture(18 + i, 24 + i, i))
    # borderline: exactly 17 pooled distinct levels -> NOT flagged
    ramp = (np.arange(17, dtype=np.uint8) * 15).repeat(24).reshape(17, 24)
    add("post-6-ramp17", np.stack([ramp, ramp, ramp], axis=2))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("image_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_posterize_batch(batch: "pa.Table") -> "pa.Table":
    """Posterization/banding gate: n_levels = count of DISTINCT byte
    values pooled across all three channels; flagged when ≤ 16 (a
    GIF-class palette collapse — re-encoded screenshots, banded
    gradients).  ``np.unique`` over the flat pixel array is the whole
    kernel; all-integer."""
    ids, levels, flag = [], [], []
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = img.raw_decode(payload)
        n = int(np.unique(pix).size)
        ids.append(iid)
        levels.append(n)
        flag.append(1 if n <= 16 else 0)
    return pa.Table.from_pydict(
        {"image_id": ids, "n_levels": levels, "posterized": flag},
        schema=pa.schema([("image_id", pa.string()),
                          ("n_levels", pa.int64()),
                          ("posterized", pa.int64())]))


TONE_FIXTURE = "/tmp/darc_ray_fixtures/audio_tone.parquet"


def ensure_audio_tone_fixture(path: str = TONE_FIXTURE) -> str:
    """Deterministic mono PCM16 WAV corpus for the synthetic-tone gate
    (test beeps / sine stand-ins a speech-curation pass drops):
    ``-tone`` rows are square waves with constant half-period (zero-
    crossing intervals all equal), ``-jitter`` alternates 5/6-sample
    half-periods (spread 1 — still a tone), ``-speech`` cycles
    irregular run lengths (spread > 1, NOT a tone), ``-sparse`` has
    only 3 crossings (below the 8-crossing floor), and ``-dc`` never
    crosses at all.  Mono only — the oracle's sample walk then needs
    no channel arithmetic.  Fixed path + atomic write + always
    rewritten, sf-independent."""
    import os
    import tempfile

    from darc_ray.functions.audio import wav_encode

    rows = {"audio_id": [], "bytes": []}

    def from_runs(runs: list[int], amp: int) -> np.ndarray:
        sign, parts = 1, []
        for r in runs:
            parts.append(np.full(r, sign * amp, np.int16))
            sign = -sign
        return np.concatenate(parts)

    for i, half in enumerate((1, 3, 5, 8)):
        n_runs = 240 // half if half > 1 else 200
        rows["audio_id"].append(f"tone-{i:02d}-tone")
        rows["bytes"].append(wav_encode(
            from_runs([half] * n_runs, 6000 + 500 * i), 8000))
    rows["audio_id"].append("tone-04-jitter")
    rows["bytes"].append(wav_encode(
        from_runs([5, 6] * 40, 7000), 8000))
    for i, cyc in enumerate(([3, 7, 4, 9, 2, 6], [5, 5, 5, 12, 5, 5])):
        rows["audio_id"].append(f"tone-{5 + i:02d}-speech")
        rows["bytes"].append(wav_encode(
            from_runs(cyc * 12, 5000), 16000))
    rows["audio_id"].append("tone-07-sparse")
    rows["bytes"].append(wav_encode(
        from_runs([300, 280, 320, 290], 4000), 8000))
    rows["audio_id"].append("tone-08-dc")
    rows["bytes"].append(wav_encode(np.full(900, 1500, np.int16), 8000))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("audio_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def audio_tone_detect_batch(batch: "pa.Table") -> "pa.Table":
    """Synthetic-tone gate: zero-crossing interval regularity.  Sign
    is v ≥ 0 (zero counts positive — the same rule the oracle's CASE
    applies); crossings are sign flips between consecutive samples;
    a track is a tone when it has ≥ 8 crossings whose interval spread
    (max−min) is ≤ 1 sample.  Emits crossing count and interval
    bounds (0/0 when fewer than two crossings).  All-integer,
    stateless, no shuffle."""
    from darc_ray.functions.audio import wav_decode

    out: dict[str, list] = {k: [] for k in (
        "audio_id", "n_cross", "iv_min", "iv_max", "is_tone")}
    for aid, payload in zip(batch.column("audio_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        samples, _sr = wav_decode(payload)
        v = samples.reshape(-1).astype(np.int64)
        s = (v >= 0).astype(np.int8)
        pos = np.nonzero(s[1:] != s[:-1])[0] + 1
        nc = int(len(pos))
        if nc >= 2:
            iv = np.diff(pos)
            lo, hi = int(iv.min()), int(iv.max())
        else:
            lo = hi = 0
        out["audio_id"].append(aid)
        out["n_cross"].append(nc)
        out["iv_min"].append(lo)
        out["iv_max"].append(hi)
        out["is_tone"].append(int(nc >= 8 and hi - lo <= 1))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("audio_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("n_cross", "iv_min", "iv_max",
                                  "is_tone")]))


VSTATIC_FIXTURE = "/tmp/darc_ray_fixtures/video_static.parquet"


def ensure_video_static_fixture(path: str = VSTATIC_FIXTURE) -> str:
    """Deterministic FVID corpus for the frozen-video gate: a fully
    frozen clip (one frame repeated), a surveillance-style tail-frozen
    clip at 888‰ (flagged) and a half-frozen clip at 600‰ (NOT
    flagged), fully animated clips, a single-frame edge (no pairs)
    and a ping-pong A/B/A/B clip — non-ADJACENT duplicates must not
    count.  PNG frame encoding is deterministic, so pixel-identical
    frames are byte-identical spans.  Fixed path + atomic write +
    always rewritten, sf-independent."""
    import os
    import tempfile

    from darc_ray.functions.video import video_encode

    def frame(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = ((xx * 11 + yy * 7 + 23 * i) % 256).astype(np.uint8)
        g = ((xx * 5 + yy * 13 + 31 * i) % 256).astype(np.uint8)
        b = ((xx * 9 + yy * 3 + 41 * i) % 256).astype(np.uint8)
        return np.stack([r, g, b], axis=2)

    rows = {"video_id": [], "bytes": []}
    f0 = frame(18, 22, 0)
    rows["video_id"].append("vstat-0-frozen")
    rows["bytes"].append(video_encode([f0] * 6, 8))
    anim = [frame(16, 20, i) for i in range(3)]
    rows["video_id"].append("vstat-1-halffrozen")
    rows["bytes"].append(video_encode(anim + [anim[-1]] * 3, 8))
    rows["video_id"].append("vstat-2-tailfrozen")
    rows["bytes"].append(video_encode([frame(14, 18, 9)]
                                      + [frame(14, 18, 5)] * 9, 4))
    for j in (3, 4):
        rows["video_id"].append(f"vstat-{j}-anim")
        rows["bytes"].append(video_encode(
            [frame(15 + j, 19 + j, 10 * j + i) for i in range(5)], 12))
    rows["video_id"].append("vstat-5-single")
    rows["bytes"].append(video_encode([frame(12, 12, 77)], 4))
    a, b = frame(13, 17, 50), frame(13, 17, 60)
    rows["video_id"].append("vstat-6-pingpong")
    rows["bytes"].append(video_encode([a, b, a, b, a], 8))

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("video_id", pa.string()),
                                ("bytes", pa.binary())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def video_static_detect_batch(batch: "pa.Table") -> "pa.Table":
    """Frozen-video gate — consecutive byte-identical frames (the
    stuck-encoder / surveillance-still shape a video curation pass
    drops before spending decode budget on motion features): per clip,
    the count of adjacent frame pairs whose compressed spans are
    byte-equal, per-mille over n_frames−1, flagged ≥ 800‰.  Compares
    compressed bytes only (zero decode); all-integer."""
    from darc_ray.functions.video import video_index

    out: dict[str, list] = {k: [] for k in (
        "video_id", "n_frames", "static_pairs", "static_milli",
        "is_static")}
    for vid, payload in zip(batch.column("video_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        _fps, spans = video_index(payload)
        frames = [payload[off:off + ln] for off, ln in spans]
        n = len(frames)
        sp = sum(1 for i in range(1, n) if frames[i] == frames[i - 1])
        milli = sp * 1000 // (n - 1) if n > 1 else 0
        out["video_id"].append(vid)
        out["n_frames"].append(n)
        out["static_pairs"].append(sp)
        out["static_milli"].append(milli)
        out["is_static"].append(int(milli >= 800))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("video_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("n_frames", "static_pairs",
                                  "static_milli", "is_static")]))


VIDEO_QA_FIXTURE = "/tmp/darc_ray_fixtures/video_qa.parquet"


def ensure_video_qa_fixture(path: str = VIDEO_QA_FIXTURE) -> str:
    """Planted-defect FVID corpus for the composed video-QA funnel:
    clean animated clips (one genuine scene cut, healthy size deltas),
    MANIFEST liars (declared frame count / fps disagree with the
    container header), a frozen clip (static ≥ 800‰), a slideshow
    (flat/noisy alternation → every adjacent pair a cut candidate), a
    low-motion clip (frames differ by one pixel step — size deltas
    under 30‰, zero byte-equal pairs), a single-frame edge (no pairs
    → all motion gates vacuously pass) and multi-defect rows that
    must reject at the FIRST failing stage (frozen+liar → 'manifest';
    tail-frozen clip with a real cut → 'static').  Declared
    (n_frames, fps) ride as table columns — the manifest stage's
    input.  Fixed path + atomic write + always rewritten,
    sf-independent."""
    import os
    import tempfile

    from darc_ray.functions.video import video_encode

    def frame(hh: int, ww: int, i: int) -> np.ndarray:
        yy, xx = np.mgrid[0:hh, 0:ww]
        r = ((xx * 11 + yy * 7 + (xx * yy) % 61 + 23 * i) % 256)
        g = ((xx * 5 + yy * 13 + (xx * yy) % 53 + 31 * i) % 256)
        b = ((xx * 9 + yy * 3 + (xx * yy) % 47 + 41 * i) % 256)
        return np.stack([r, g, b], axis=2).astype(np.uint8)

    def flat(hh: int, ww: int, v: int) -> np.ndarray:
        return np.full((hh, ww, 3), v % 256, np.uint8)

    rows = {"video_id": [], "bytes": [], "n_frames": [], "fps": []}

    def add(vid: str, frames: list[np.ndarray], fps: int,
            decl_frames: int | None = None,
            decl_fps: int | None = None) -> None:
        rows["video_id"].append(vid)
        rows["bytes"].append(video_encode(frames, fps))
        rows["n_frames"].append(decl_frames if decl_frames is not None
                                else len(frames))
        rows["fps"].append(decl_fps if decl_fps is not None else fps)

    # clean: textured animation with ONE hard scene cut (texture →
    # flat) — cut rate 1/(n-1) well under the slideshow bar, deltas
    # at the cut keep max_delta ≥ 30‰
    add("vqa-0-clean", [frame(18, 22, i) for i in range(4)]
        + [flat(18, 22, 40), flat(18, 22, 41)], 12)
    add("vqa-1-clean", [frame(16, 20, 7 + i) for i in range(3)]
        + [flat(16, 20, 90)], 8)
    # manifest liars: healthy streams, lying declared columns
    add("vqa-2-frameliar", [frame(15, 19, 50 + i) for i in range(4)],
        10, decl_frames=6)
    add("vqa-3-fpsliar", [frame(14, 18, 80 + i) for i in range(4)],
        10, decl_fps=24)
    # frozen: one frame repeated (static 1000‰)
    add("vqa-4-frozen", [frame(17, 21, 3)] * 6, 8)
    # slideshow: flat/noisy alternation — every adjacent pair a cut
    rng_frames = []
    for i in range(6):
        rng_frames.append(flat(16, 16, 10 * i) if i % 2 == 0
                          else frame(16, 16, 100 + i))
    add("vqa-5-slideshow", rng_frames, 6)
    # low-motion: single advancing pixel step per frame — PNG sizes
    # within 30‰ of each other, zero byte-equal adjacent pairs
    lm = []
    base = frame(20, 24, 11)
    for i in range(5):
        f = base.copy()
        f[3 + i % 5, 5 + i % 7] = (f[3 + i % 5, 5 + i % 7] + 16) % 256
        lm.append(f)
    add("vqa-6-lowmotion", lm, 10)
    # single frame: no adjacent pairs — motion gates vacuously pass
    add("vqa-7-single", [frame(12, 12, 66)], 4)
    # multi-defect: frozen AND frame-count liar → 'manifest' first
    add("vqa-8-frozenliar", [frame(13, 17, 5)] * 5, 8, decl_frames=9)
    # multi-defect: tail-frozen (5/6 pairs byte-equal = 833‰) with a
    # genuine cut at the freeze boundary → 'static' fires before
    # 'slideshow' could
    add("vqa-9-tailfrozen", [frame(15, 15, 30)] + [flat(15, 15, 77)] * 6,
        8)

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("video_id", pa.string()),
                                ("bytes", pa.binary()),
                                ("n_frames", pa.int64()),
                                ("fps", pa.int64())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def video_qa_funnel_batch(batch: "pa.Table") -> "pa.Table":
    """Composed video-QA funnel in PRODUCTION ORDER — the gate stack a
    video-curation ingest runs before spending any decode budget,
    cheapest first, later stages −1-masked for rows an earlier stage
    rejected: (1) manifest (declared frame count / fps vs the FVID
    header — header-only), then over the frame INDEX + compressed
    spans (2) static (adjacent byte-identical pairs ≥ 800‰), (3)
    slideshow (adjacent size-delta cut candidates ≥ 600‰ of pairs),
    (4) low-motion (max size delta < 30‰ with ≥ 2 frames).
    ``reject_stage`` names the first failure or 'keep'.  ZERO frame
    decode end-to-end; stateless ``map_batches``, no shuffle — four
    proven compressed-domain kernels under ONE oracle."""
    from darc_ray.functions.video import video_index

    names = ("video_id", "decl_frames", "decl_fps", "manifest_ok",
             "static_bad", "slideshow_bad", "lowmotion_bad", "keep")
    out: dict[str, list] = {k: [] for k in names}
    out["reject_stage"] = []
    for vid, payload, dn, dfps in zip(
            batch.column("video_id").to_pylist(),
            batch.column("bytes").to_pylist(),
            batch.column("n_frames").to_pylist(),
            batch.column("fps").to_pylist()):
        fps, spans = video_index(payload)
        n = len(spans)
        man_ok = int(int(dn) == n and int(dfps) == fps)
        static = slide = lowm = -1
        stage = "manifest"
        if man_ok:
            frames = [payload[off:off + ln] for off, ln in spans]
            lens = np.array([ln for _off, ln in spans], dtype=np.int64)
            sp = sum(1 for i in range(1, n)
                     if frames[i] == frames[i - 1])
            static = int(n > 1 and sp * 1000 // (n - 1) >= 800)
            if static:
                stage = "static"
            else:
                if n >= 2:
                    prev, cur = lens[:-1], lens[1:]
                    dm = (np.abs(cur - prev) * 1000
                          // np.maximum(prev, cur))
                    slide = int(int((dm >= 300).sum()) * 1000
                                // (n - 1) >= 600)
                    mx = int(dm.max())
                else:
                    slide, mx = 0, 0
                if slide:
                    stage = "slideshow"
                else:
                    lowm = int(n >= 2 and mx < 30)
                    stage = "lowmotion" if lowm else "keep"
        keep = int(man_ok == 1 and static == 0 and slide == 0
                   and lowm == 0)
        for k, val in zip(names, (vid, int(dn), int(dfps), man_ok,
                                  static, slide, lowm, keep)):
            out[k].append(val)
        out["reject_stage"].append(stage)
    return pa.Table.from_pydict(
        out, schema=pa.schema(
            [("video_id", pa.string())]
            + [(k, pa.int64()) for k in names[1:]]
            + [("reject_stage", pa.string())]))


AUDIO_QA_FIXTURE = "/tmp/darc_ray_fixtures/audio_qa.parquet"


def ensure_audio_qa_fixture(path: str = AUDIO_QA_FIXTURE) -> str:
    """Planted-defect mono PCM16 corpus for the composed audio-QA
    funnel: clean irregular tracks (balanced ± run pairs — zero DC,
    no clipping, active, tone-negative), a MANIFEST liar (declared
    sample count / channel count disagree with the container), a
    DC-biased track, a clipped track (runs ≥ 16 at near full scale), a
    mostly-silent track (≥ 800‰ samples under the activity floor), a
    pure square tone, and multi-defect rows that must reject at the
    FIRST failing stage (dc+clip → 'dc'; clipped tone → 'clipping').
    Declared (n_samples, channels) ride as table columns — the
    manifest stage's input.  Fixed path + atomic write + always
    rewritten, sf-independent."""
    import os
    import tempfile

    from darc_ray.functions.audio import wav_encode

    def from_runs(runs: list[int], amp: int, bias: int = 0) -> np.ndarray:
        sign, parts = 1, []
        for r in runs:
            parts.append(np.full(r, sign * amp + bias, np.int16))
            sign = -sign
        return np.concatenate(parts)

    rows = {"audio_id": [], "bytes": [], "n_samples": [], "channels": []}

    def add(aid: str, samples: np.ndarray, decl_n: int | None = None,
            decl_ch: int | None = None) -> None:
        rows["audio_id"].append(aid)
        rows["bytes"].append(wav_encode(samples, 8000))
        rows["n_samples"].append(decl_n if decl_n is not None
                                 else samples.size)
        rows["channels"].append(decl_ch if decl_ch is not None else 1)

    clean_runs = [3, 3, 7, 7, 4, 4, 9, 9, 5, 5, 11, 11] * 8
    add("aqa-00-clean", from_runs(clean_runs, 5000))
    add("aqa-01-manifest", from_runs(clean_runs, 5000), decl_n=999)
    add("aqa-02-dc", from_runs([4, 4, 6, 6, 8, 8] * 20, 4000, bias=500))
    add("aqa-03-clip", from_runs([20, 20, 3, 3, 5, 5] * 10, 32700))
    silent = np.zeros(1000, np.int16)
    silent[100:150] = from_runs([5, 5] * 5, 3000)
    add("aqa-04-silent", silent)
    add("aqa-05-tone", from_runs([5] * 96, 6000))
    add("aqa-06-clean2", from_runs([2, 2, 6, 6, 9, 9, 4, 4] * 10, 900))
    add("aqa-07-dcclip", from_runs([20, 20, 4, 4] * 12, 32700, bias=60))
    add("aqa-08-toneclip", from_runs([18] * 40, 32500))
    add("aqa-09-chlie", from_runs(clean_runs, 5000), decl_ch=2)

    table = pa.Table.from_pydict(
        rows, schema=pa.schema([("audio_id", pa.string()),
                                ("bytes", pa.binary()),
                                ("n_samples", pa.int64()),
                                ("channels", pa.int64())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def audio_qa_funnel_batch(batch: "pa.Table") -> "pa.Table":
    """Composed audio-QA funnel in PRODUCTION ORDER — the gate stack
    an audio-curation ingest runs before feature extraction, cheapest
    first, later stages −1-masked for rows an earlier stage rejected:
    (1) manifest (declared sample/channel count vs the container —
    header-only), then over the decoded stream (2) DC offset
    (|Σv|·1000//n ≥ 50 000), (3) clipping (≥ 5‰ samples at |v| ≥
    32 000 OR a clipped run ≥ 16), (4) silence (≥ 800‰ samples under
    the |v| < 400 activity floor), (5) tone (≥ 8 zero crossings with
    interval spread ≤ 1).  ``reject_stage`` names the first failure
    or 'keep'.  One decode per track, stateless ``map_batches``, no
    shuffle — five proven per-row kernels under ONE oracle."""
    from darc_ray.functions.audio import wav_decode

    names = ("audio_id", "decl_n", "decl_ch", "manifest_ok", "dc_bad",
             "clip_bad", "silent_bad", "tone_bad", "keep")
    out: dict[str, list] = {k: [] for k in names}
    out["reject_stage"] = []
    for aid, payload, dn, dch in zip(
            batch.column("audio_id").to_pylist(),
            batch.column("bytes").to_pylist(),
            batch.column("n_samples").to_pylist(),
            batch.column("channels").to_pylist()):
        samples, _sr = wav_decode(payload)
        ch = samples.shape[1] if samples.ndim == 2 else 1
        man_ok = int(int(dn) == samples.size and int(dch) == ch)
        dc = clip = sil = tone = -1
        stage = "manifest"
        if man_ok:
            v = samples.reshape(-1).astype(np.int64)
            n = len(v)
            dc = int(abs(int(v.sum())) * 1000 // n >= 50_000)
            if dc:
                stage = "dc"
            else:
                m = np.abs(v) >= 32_000
                nc = int(m.sum())
                if nc:
                    idx = np.flatnonzero(m)
                    brk = np.flatnonzero(np.diff(idx) > 1)
                    bounds = np.concatenate([[-1], brk, [len(idx) - 1]])
                    mx = int(np.diff(bounds).max())
                else:
                    mx = 0
                clip = int(nc * 1000 // n >= 5 or mx >= 16)
                if clip:
                    stage = "clipping"
                else:
                    sil = int(int((np.abs(v) < 400).sum())
                              * 1000 // n >= 800)
                    if sil:
                        stage = "silence"
                    else:
                        s = (v >= 0).astype(np.int8)
                        pos = np.nonzero(s[1:] != s[:-1])[0] + 1
                        ncr = int(len(pos))
                        if ncr >= 2:
                            iv = np.diff(pos)
                            spread = int(iv.max()) - int(iv.min())
                        else:
                            spread = 0
                        tone = int(ncr >= 8 and spread <= 1)
                        stage = "tone" if tone else "keep"
        keep = int(man_ok == 1 and dc == 0 and clip == 0 and sil == 0
                   and tone == 0)
        for k, val in zip(names, (aid, int(dn), int(dch), man_ok, dc,
                                  clip, sil, tone, keep)):
            out[k].append(val)
        out["reject_stage"].append(stage)
    return pa.Table.from_pydict(
        out, schema=pa.schema(
            [("audio_id", pa.string())]
            + [(k, pa.int64()) for k in names[1:]]
            + [("reject_stage", pa.string())]))


TOKDUP_FIXTURE = "/tmp/darc_ray_fixtures/caption_tokens.parquet"


def ensure_caption_tokens_fixture(path: str = TOKDUP_FIXTURE) -> str:
    """Deterministic caption corpus for the token-multiset dedup
    family (word-order-shuffled caption spam): four 6-row groups, each
    with a clean base caption, a token-REVERSED duplicate, a CASE-
    variant duplicate, an extra-WHITESPACE duplicate (double spaces +
    trailing blank), a near-miss with ONE extra token (must NOT
    match), and a unique row.  ASCII only (char semantics identical
    between Python and DuckDB).  Fixed path + atomic write + always
    rewritten, sf-independent — same contract as
    ``ensure_image_caption_fixture``."""
    import os
    import tempfile

    nouns = ["harbor", "meadow", "bridge", "lantern", "orchard", "dune"]
    caps: list[str] = []
    for j in range(4):
        a, b, c = nouns[j], nouns[(j + 1) % 6], nouns[(j + 2) % 6]
        base = f"a quiet {a} near the {b} with soft {c} light {j}"
        toks = base.split()
        caps += [
            base,                                   # clean
            " ".join(toks[::-1]),                   # token-multiset dup
            base.upper(),                           # case-variant dup
            "  ".join(toks) + " ",                  # whitespace-variant dup
            base + " extra",                        # near-miss: NOT a dup
            f"unique {a} {b} skyline panorama {j}",  # unique
        ]
    table = pa.Table.from_pydict(
        {"image_id": [f"tok-{i:02d}" for i in range(len(caps))],
         "caption": caps},
        schema=pa.schema([("image_id", pa.string()),
                          ("caption", pa.string())]))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import pyarrow.parquet as pq

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def image_colorfulness_batch(batch: "pa.Table") -> "pa.Table":
    """Hasler–Süsstrunk colorfulness gate over raw-pixel payloads (the
    LAION-aesthetics-adjacent vividness proxy; grayscale/solid junk
    scores 0): opponent channels rg = r−g and yb2 = r+g−2b (2× the
    paper's yb so every per-pixel value stays an exact integer), all
    sums/sum-squares exact int64, variance NUMERATORS n·Σx²−(Σx)²
    published as exact integers, and M = sqrt(σ²_rg+σ²_yb) +
    0.3·sqrt(μ²_rg+μ²_yb) quantized to milli with ONE fixed IEEE
    expression mirrored token-for-token by the SQL oracle (the
    `image_entropy` ln-rule precedent: aggregation is pure-integer,
    the float tail is a per-row scalar expression, so both engines
    produce identical doubles).  `vivid` = M ≥ 24.0 (planted gradient
    content measures 75-93; the saturated posterized palette 174;
    gray/solid exactly 0 — the gate splits on the only axis this
    family owns, chroma presence, while `image_color_stats` catches
    the posterized flavor by distinct-color count).  Stateless
    ``map_batches``, no shuffle."""
    import math

    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "n_px", "sum_rg", "sum_yb2", "vnum_rg", "vnum_yb2",
        "colorfulness_milli", "vivid")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        rg = pix[..., 0] - pix[..., 1]
        yb2 = pix[..., 0] + pix[..., 1] - 2 * pix[..., 2]
        n = rg.size
        s_rg, q_rg = int(rg.sum()), int((rg * rg).sum())
        s_yb, q_yb = int(yb2.sum()), int((yb2 * yb2).sum())
        vr = n * q_rg - s_rg * s_rg
        vy = n * q_yb - s_yb * s_yb
        hb = s_yb / 2.0
        m = (math.sqrt(vr + vy / 4.0)
             + 0.3 * math.sqrt(s_rg * s_rg + hb * hb)) / n
        milli = int(math.floor(1000.0 * m + 0.5))
        out["image_id"].append(iid)
        out["n_px"].append(n)
        out["sum_rg"].append(s_rg)
        out["sum_yb2"].append(s_yb)
        out["vnum_rg"].append(vr)
        out["vnum_yb2"].append(vy)
        out["colorfulness_milli"].append(milli)
        out["vivid"].append(int(milli >= 24_000))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("n_px", "sum_rg", "sum_yb2",
                                  "vnum_rg", "vnum_yb2",
                                  "colorfulness_milli", "vivid")]))


SHARPNESS_FIXTURE = "/tmp/darc_ray_fixtures/image_sharpness.parquet"


def ensure_image_sharpness_fixture(path: str = SHARPNESS_FIXTURE) -> str:
    """Deterministic RAW-pixel corpus for the blur/defocus gate:
    full-range NOISE textures (high Laplacian variance — in-focus
    stand-in), the SAME noise 3×3 integer-box-blurred once and twice
    (defocus stand-ins at two strengths), linear ramps and solids
    (Laplacian ≡ 0 away from nothing — the flat degenerate the gate
    must also reject), and a half-sharp/half-blurred split image (the
    mixed case sits between the pure flavors).  All integer pixels;
    blur is sum//9 so the oracle-visible bytes are exact.  Fixed path
    + atomic write + ALWAYS rewritten, sf-independent."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from darc_ray.functions import image as img

    rows = {"image_id": [], "bytes": []}

    def add(iid: str, pix: np.ndarray) -> None:
        rows["image_id"].append(iid)
        rows["bytes"].append(img.raw_encode(np.ascontiguousarray(
            pix.astype(np.uint8))))

    def box3(p: np.ndarray) -> np.ndarray:
        s = p.astype(np.int64)
        padded = np.pad(s, ((1, 1), (1, 1), (0, 0)), mode="edge")
        acc = np.zeros_like(s)
        for dy in range(3):
            for dx in range(3):
                acc += padded[dy:dy + s.shape[0], dx:dx + s.shape[1]]
        return acc // 9

    for i in range(6):
        rng = np.random.default_rng(52_000 + i)
        hh, ww = 18 + (5 * i) % 13, 20 + (7 * i) % 11
        noise = rng.integers(0, 256, size=(hh, ww, 3))
        add(f"shp-{i}-noise", noise)
        add(f"shp-{i}-blur1", box3(noise))
        add(f"shp-{i}-blur2", box3(box3(noise)))
    yy, xx = np.mgrid[0:20, 0:24]
    add("shp-ramp", np.repeat(((xx * 255) // 23)[..., None], 3, axis=2))
    add("shp-solid", np.full((16, 16, 3), 130))
    rng = np.random.default_rng(52_100)
    half = rng.integers(0, 256, size=(20, 24, 3))
    half[:, 12:] = box3(box3(half))[:, 12:]
    add("shp-half", half)

    table = pa.table({"image_id": pa.array(rows["image_id"]),
                      "bytes": pa.array(rows["bytes"], type=pa.binary())})
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".parquet")
    os.close(fd)
    pq.write_table(table, tmp)
    os.replace(tmp, path)                      # atomic on POSIX
    return path


def image_sharpness_batch(batch: "pa.Table") -> "pa.Table":
    """Laplacian-variance blur gate over raw-pixel payloads — the
    canonical defocus detector (`image_edge_density` measures mean
    gradient MASS; this measures the SPREAD of the 4-neighbor
    Laplacian, which collapses under any low-pass blur while surviving
    high-contrast structure): luma = (299r+587g+114b)//1000 (0..255 so
    int64 survives megapixel images), lap = 4c−up−down−left−right over
    INTERIOR pixels only, exact int64 sum/sum-square, variance
    numerator vnum = n·Σlap²−(Σlap)² published exactly, and
    ``sharp`` ⇔ vnum ≥ 5000·n² (σ² ≥ 5000 — cross-multiplied,
    division-free; measured on the fixture: noise 46-54·10³, the
    half-sharp split 23·10³, ONE box blur already only 0.9-1.0·10³,
    two blurs ≈ 10², solids exactly 0, and the ramp's floor-
    quantization seams leave only σ² ≈ 0.13 — an order-of-magnitude
    margin on both sides of the gate).  Images smaller than 3×3 have
    no interior and are rejected loudly.  Stateless ``map_batches``,
    no shuffle."""
    from darc_ray.functions.image import raw_decode

    out: dict[str, list] = {k: [] for k in (
        "image_id", "n_int", "sum_lap", "vnum_lap", "sharp")}
    for iid, payload in zip(batch.column("image_id").to_pylist(),
                            batch.column("bytes").to_pylist()):
        pix = raw_decode(payload).astype(np.int64)
        h, w = pix.shape[:2]
        if h < 3 or w < 3:
            raise ValueError(f"{iid}: {h}x{w} has no interior pixels")
        gm = (299 * pix[..., 0] + 587 * pix[..., 1]
              + 114 * pix[..., 2]) // 1000
        lap = (4 * gm[1:-1, 1:-1] - gm[:-2, 1:-1] - gm[2:, 1:-1]
               - gm[1:-1, :-2] - gm[1:-1, 2:])
        n = lap.size
        s, q = int(lap.sum()), int((lap * lap).sum())
        vnum = n * q - s * s
        out["image_id"].append(iid)
        out["n_int"].append(n)
        out["sum_lap"].append(s)
        out["vnum_lap"].append(vnum)
        out["sharp"].append(int(vnum >= 5000 * n * n))
    return pa.Table.from_pydict(
        out, schema=pa.schema([("image_id", pa.string())]
                              + [(k, pa.int64()) for k in
                                 ("n_int", "sum_lap", "vnum_lap",
                                  "sharp")]))
