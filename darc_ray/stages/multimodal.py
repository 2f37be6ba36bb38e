"""Multimodal column stages: opaque binary payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

The decode kernels are the engine's own codecs
(``darc_ray.functions.image``): PNG is real; JPEG is the documented
deterministic stub (no image libraries in this environment) — the
Ray-side plumbing (schema, batch sizing, actor signature, output
layout) is real and tested either way.
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
            rt = img.decode(img.encode(pix, fmt), fmt)
            p = img.psnr(pix, rt)
            psnr_ok.append(bool(p == float("inf") or p >= 40.0))
        return pa.Table.from_pydict({
            "image_id": pa.array(ids),
            "w": pa.array(w, type=pa.int32()),
            "h": pa.array(h, type=pa.int32()),
            "fmt": pa.array(fmts),
            "phash": pa.array(phash, type=pa.int64()),
            "psnr_ok": pa.array(psnr_ok)})


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
