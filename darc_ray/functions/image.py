"""Image payload kernels: PNG codec, lossy-codec stand-in, PSNR, phash.

The graft's payload rows are image+caption (BASELINE.json
``input_hint``); the per-row invariant is decoded-pixel allclose
(PSNR ≥ 40 dB for lossy formats, bit-exact for PNG) + caption equality.

No image libraries exist in this environment, so:

* **PNG** is a real, self-contained codec over ``zlib`` (8-bit RGB,
  non-interlaced; decoder handles scanline filters 0-4, encoder emits
  filter 0).  Bit-exact round-trip, tested.
* **JPEG (real)**: ``FF D8`` payloads route to the self-contained
  baseline codec in :mod:`darc_ray.functions.jpeg` (T.81 SOF0 Huffman
  decode incl. 4:2:0/4:2:2 sampling and restart markers; 4:4:4
  encoder) — validated against libjpeg-produced files.
* **FJPG stub**: the deterministic fake lossy codec (6-bit/channel
  quantization + zlib) remains the synthetic-corpus format so corpus
  bytes stay reproducible byte-for-byte across numpy versions.

All kernels are numpy-vectorized per image and run inside
``map_batches`` actor-pool stages (decode once per row, amortized
setup per actor).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
FAKE_JPEG_MAGIC = b"FJPG"
RAW_MAGIC = b"RAWI"
_JPEG_REAL_MAGIC = b"\xff\xd8\xff"
_VP8_SYNC = b"\x9d\x01\x2a"


# --------------------------------------------------------------------------
# PNG (true codec)
# --------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a non-interlaced RGB8 PNG."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("png_encode expects (h, w, 3) uint8")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode an RGB8 non-interlaced PNG into (h, w, 3) uint8."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(PNG_SIG)
    w = h = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4: pos + 8]
        payload = data[pos + 8: pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if bit_depth != 8 or color_type != 2 or interlace != 0:
                raise ValueError("unsupported PNG variant (RGB8 non-interlaced only)")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    filters = rows[:, 0]
    if not filters.any():               # all filter-0 (our encoder): plain reshape
        return np.ascontiguousarray(rows[:, 1:]).reshape(h, w, 3)
    out = np.empty((h, stride), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        line = rows[y, 1:].astype(np.int32)
        f = filters[y]
        prior = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prior) & 0xFF
        elif f in (1, 3, 4):
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                if f == 1:      # Sub
                    rec[x] = (line[x] + a) & 0xFF
                elif f == 3:    # Average
                    rec[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:           # Paeth
                    c = prior[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (line[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, 3)


# --------------------------------------------------------------------------
# Fake lossy codec (JPEG STUB — see module docstring)
# --------------------------------------------------------------------------

def fake_jpeg_encode(pixels: np.ndarray) -> bytes:
    """STUB lossy encoder: 6-bit/channel quantization (PSNR ≈ 46 dB,
    above the 40 dB gate) in an ``FJPG`` container.  Deterministic."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("fake_jpeg_encode expects (h, w, 3) uint8")
    h, w, _ = pixels.shape
    quant = (pixels >> 2).astype(np.uint8)          # 6 bits/channel
    body = zlib.compress(quant.tobytes(), 6)
    return FAKE_JPEG_MAGIC + struct.pack(">II", w, h) + body


def raw_encode(pixels: np.ndarray) -> bytes:
    """Uncompressed RGB container (``RAWI`` + big-endian w, h + raw
    bytes) — the BMP-class payload of the fixture corpora whose pixel
    kernels are re-derived independently in SQL (hex arithmetic needs
    bytes it can address, so no zlib)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("raw_encode expects (h, w, 3) uint8")
    h, w, _ = pixels.shape
    return RAW_MAGIC + struct.pack(">II", w, h) + pixels.tobytes()


def raw_decode(data: bytes) -> np.ndarray:
    if not data.startswith(RAW_MAGIC):
        raise ValueError("not a RAWI payload")
    w, h = struct.unpack_from(">II", data, 4)
    return (np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=12)
            .reshape(h, w, 3))


def make_webp(w: int, h: int, flavor: str = "vp8",
              alpha: bool = False, payload_len: int = 24) -> bytes:
    """Synthesize a spec-correct WebP CONTAINER header (RIFF + VP8 /
    VP8L / VP8X chunk with real dimension encoding) over a dummy
    compressed payload.  The engine's metadata pass is header-only
    (``image_meta``), so fixture rows need valid headers, not a VP8
    codec — the decode path for WebP stays an explicit stub.

    Dimension encodings per the public container spec: VP8 = 14-bit
    w/h in little-endian uint16s after the 0x9D012A sync; VP8L =
    (w−1, h−1) as 14-bit fields of a little-endian 32-bit word after
    the 0x2F signature (bit 28 = alpha); VP8X = 24-bit little-endian
    (canvas−1) fields, flag bit 0x10 = alpha."""
    rng = np.random.default_rng(w * 31 + h * 7 + (alpha << 3))
    junk = rng.integers(0, 256, payload_len, dtype=np.uint8).tobytes()
    if flavor == "vp8":
        body = (b"\x30\x01\x00" + _VP8_SYNC
                + struct.pack("<HH", w & 0x3FFF, h & 0x3FFF) + junk)
        chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    elif flavor == "vp8l":
        v = (w - 1) | ((h - 1) << 14) | (int(alpha) << 28)
        body = b"\x2f" + struct.pack("<I", v) + junk
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    elif flavor == "vp8x":
        body = (bytes([0x10 if alpha else 0x00]) + b"\x00\x00\x00"
                + (w - 1).to_bytes(3, "little")
                + (h - 1).to_bytes(3, "little"))
        chunk = b"VP8X" + struct.pack("<I", len(body)) + body + junk
    else:
        raise ValueError(f"unknown webp flavor {flavor!r}")
    if len(chunk) % 2:
        chunk += b"\x00"                       # RIFF word alignment
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def fake_jpeg_decode(data: bytes) -> np.ndarray:
    if not data.startswith(FAKE_JPEG_MAGIC):
        raise ValueError("not an FJPG payload")
    w, h = struct.unpack_from(">II", data, 4)
    quant = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    # dequantize to bin centers: v*4 + 1 (max error 2 per channel)
    return np.minimum(quant.astype(np.uint16) * 4 + 1, 255).astype(np.uint8)


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "jpeg":
        if data.startswith(b"\xff\xd8"):       # real JPEG payload
            from darc_ray.functions.jpeg import jpeg_decode

            return jpeg_decode(data)
        return fake_jpeg_decode(data)
    if fmt == "raw":
        return raw_decode(data)
    raise ValueError(f"unknown image fmt {fmt!r}")


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt == "jpeg":
        return fake_jpeg_encode(pixels)        # synthetic-corpus default
    if fmt == "jpeg_real":
        from darc_ray.functions.jpeg import jpeg_encode

        return jpeg_encode(pixels)
    if fmt == "raw":
        return raw_encode(pixels)
    raise ValueError(f"unknown image fmt {fmt!r}")


def lossy_roundtrip(pixels: np.ndarray, data: bytes, fmt: str) -> np.ndarray:
    """Re-encode/decode with the codec family the payload actually
    used (the fetch-time PSNR-gate round trip, input_hint invariant)."""
    if fmt == "jpeg" and data.startswith(b"\xff\xd8"):
        from darc_ray.functions.jpeg import jpeg_decode, jpeg_encode

        return jpeg_decode(jpeg_encode(pixels, quality=95))
    return decode(encode(pixels, fmt), fmt)


# --------------------------------------------------------------------------
# Metrics
# --------------------------------------------------------------------------

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    if a.shape != b.shape:
        raise ValueError("shape mismatch")
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


from functools import lru_cache


@lru_cache(maxsize=1024)
def _pool_bins(n: int, out_size: int) -> tuple[np.ndarray, np.ndarray]:
    edges = np.linspace(0, n, out_size + 1).astype(np.int64)
    return edges[:-1], np.maximum(np.diff(edges), 1)


def _mean_pool(gray: np.ndarray, out_size: int) -> np.ndarray:
    """Deterministic area resample to (out_size, out_size) via two
    ``add.reduceat`` passes (empty bins fall back to the single row/col
    at the bin start, matching integral-image max(y0+1) semantics)."""
    h, w = gray.shape
    y0, cy = _pool_bins(h, out_size)
    x0, cx = _pool_bins(w, out_size)
    cols = np.add.reduceat(np.add.reduceat(gray, y0, axis=0), x0, axis=1)
    return cols / (cy[:, None] * cx[None, :])


_DCT32 = None


def _dct_matrix(n: int) -> np.ndarray:
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0] /= np.sqrt(2.0)
        _DCT32 = m
    return _DCT32


def phash64(pixels: np.ndarray) -> int:
    """Classic 64-bit DCT perceptual hash: grayscale → 32×32 area
    resample → 2-D DCT-II → top-left 8×8 → median threshold (DC
    excluded from the median) → big-endian bit-pack into int64."""
    gray = (0.299 * pixels[..., 0] + 0.587 * pixels[..., 1]
            + 0.114 * pixels[..., 2]).astype(np.float64)
    small = _mean_pool(gray, 32)
    d = _dct_matrix(32)
    coef = (d @ small @ d.T)[:8, :8].ravel()
    med = np.median(coef[1:])
    bits = (coef > med).astype(np.uint64)
    value = int((bits << np.arange(63, -1, -1, dtype=np.uint64)).sum(dtype=np.uint64))
    return value - (1 << 64) if value >= (1 << 63) else value  # as signed int64


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash (gradient hash), ALL-INTEGER so a SQL
    oracle can re-derive it bit-for-bit from raw bytes: per-pixel
    milli-luma ``299r + 587g + 114b`` → floor-banded box pool onto an
    8×9 grid (pixel row ``rr`` lands in band ``rr*8//h``, column
    ``cc`` in band ``cc*9//w``; cell mean = sum // count) → bit
    ``k = r*8 + c`` set iff ``m[r][c] > m[r][c+1]`` → little-endian
    bit-pack into signed int64.  Complements :func:`phash64` (DCT):
    dHash keys on local gradients, so the union of the two hash
    modalities improves near-dup recall.  Requires h ≥ 8 and w ≥ 9
    (every grid cell non-empty) — raises loudly otherwise, same
    discipline as the thumbs box-pool."""
    h, w = pixels.shape[:2]
    if h < 8 or w < 9:
        raise ValueError(f"dhash64 needs h>=8 and w>=9, got {h}x{w}")
    p = pixels.astype(np.int64)
    luma = 299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]
    br = (np.arange(h, dtype=np.int64) * 8) // h
    bc = (np.arange(w, dtype=np.int64) * 9) // w
    cell = (br[:, None] * 9 + bc[None, :]).ravel()
    sums = np.bincount(cell, weights=luma.ravel().astype(np.float64),
                       minlength=72).astype(np.int64)
    cnts = np.bincount(cell, minlength=72).astype(np.int64)
    m = (sums // cnts).reshape(8, 9)
    bits = (m[:, :8] > m[:, 1:]).astype(np.uint64).ravel()
    value = int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    return value - (1 << 64) if value >= (1 << 63) else value  # signed int64


# --------------------------------------------------------------------------
# Geometric transforms + per-image statistics (training-data prep ops)
# --------------------------------------------------------------------------

def rgb_to_gray(pixels: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma as float64 (the phash weighting)."""
    return (0.299 * pixels[..., 0] + 0.587 * pixels[..., 1]
            + 0.114 * pixels[..., 2]).astype(np.float64)


def center_crop(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Center crop to (out_h, out_w); dimensions are clamped to the
    input (no padding — callers resize afterwards)."""
    h, w = pixels.shape[:2]
    out_h, out_w = min(out_h, h), min(out_w, w)
    y0 = (h - out_h) // 2
    x0 = (w - out_w) // 2
    return np.ascontiguousarray(pixels[y0:y0 + out_h, x0:x0 + out_w])


def resize_bilinear(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized bilinear resample of an (h, w, c) or (h, w) uint8
    array — half-pixel-center sampling (the OpenCV/Pillow convention),
    edges clamped.  Pure fancy-indexing + two lerps; no Python loops."""
    h, w = pixels.shape[:2]
    if h == out_h and w == out_w:
        return pixels.copy()
    # source coordinate of each output pixel center
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)
    wx = np.clip(xs - x0, 0.0, 1.0)
    p = pixels.astype(np.float64)
    if p.ndim == 2:
        p = p[..., None]
    top = p[y0][:, x0] * (1 - wx)[None, :, None] + p[y0][:, x1] * wx[None, :, None]
    bot = p[y1][:, x0] * (1 - wx)[None, :, None] + p[y1][:, x1] * wx[None, :, None]
    out = top * (1 - wy)[:, None, None] + bot * wy[:, None, None]
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[..., 0] if pixels.ndim == 2 else out


def thumbnail(pixels: np.ndarray, size: int) -> np.ndarray:
    """Square thumbnail: center-crop to the short side, then bilinear
    resize to (size, size) — the standard vision-training prep."""
    h, w = pixels.shape[:2]
    side = min(h, w)
    return resize_bilinear(center_crop(pixels, side, side), size, size)


def channel_stats(pixels: np.ndarray) -> dict:
    """Quality-gate statistics: per-image brightness (mean luma),
    contrast (luma std), saturation proxy (mean channel spread), and
    near-solid flag — the LAION-style image filters, computed in one
    vectorized pass."""
    gray = rgb_to_gray(pixels)
    f = pixels.astype(np.float64)
    spread = f.max(axis=-1) - f.min(axis=-1)
    return {
        "brightness": float(gray.mean()),
        "contrast": float(gray.std()),
        "saturation": float(spread.mean()),
        "near_solid": bool(gray.std() < 2.0),
    }


def image_meta(data: bytes) -> dict:
    """Header-only metadata for any payload this engine stores,
    dispatched on magic bytes (never the table's ``fmt`` column — a
    mislabeled blob must not mis-parse): PNG IHDR, FJPG fixed header,
    or the T.81 segment walk (``jpeg.jpeg_info``).  Reads only
    ``header_bytes`` of the object — the 100 TB metadata pass fetches
    KBs per image, not the image."""
    import struct

    if data.startswith(PNG_SIG):
        if len(data) < 34 or data[12:16] != b"IHDR":
            raise ValueError("truncated PNG (no IHDR)")
        w, h = struct.unpack_from(">II", data, 16)
        depth, color, _comp, _filt, interlace = data[24:29]
        comps = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
        if comps is None:
            raise ValueError(f"unknown PNG color type {color}")
        return {"fmt_detected": "png", "width": w, "height": h,
                "depth": depth, "components": comps,
                "progressive": int(interlace == 1), "header_bytes": 33}
    if data.startswith(FAKE_JPEG_MAGIC):
        w, h = struct.unpack_from(">II", data, 4)
        return {"fmt_detected": "fjpg", "width": w, "height": h,
                "depth": 6, "components": 3, "progressive": 0,
                "header_bytes": 12}
    if data.startswith(RAW_MAGIC):
        w, h = struct.unpack_from(">II", data, 4)
        return {"fmt_detected": "raw", "width": w, "height": h,
                "depth": 8, "components": 3, "progressive": 0,
                "header_bytes": 12}
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        chunk = data[12:16]
        if chunk == b"VP8 ":                   # lossy: 14-bit LE dims
            if data[23:26] != _VP8_SYNC:
                raise ValueError("WebP VP8 chunk missing frame sync")
            wv, hv = struct.unpack_from("<HH", data, 26)
            return {"fmt_detected": "webp", "width": wv & 0x3FFF,
                    "height": hv & 0x3FFF, "depth": 8, "components": 3,
                    "progressive": 0, "header_bytes": 30}
        if chunk == b"VP8L":                   # lossless: packed bits
            if data[20] != 0x2F:
                raise ValueError("WebP VP8L chunk missing signature")
            v = int.from_bytes(data[21:25], "little")
            alpha = (v >> 28) & 1
            return {"fmt_detected": "webp", "width": (v & 0x3FFF) + 1,
                    "height": ((v >> 14) & 0x3FFF) + 1, "depth": 8,
                    "components": 4 if alpha else 3, "progressive": 0,
                    "header_bytes": 25}
        if chunk == b"VP8X":                   # extended: 24-bit canvas
            alpha = bool(data[20] & 0x10)
            w = int.from_bytes(data[24:27], "little") + 1
            h = int.from_bytes(data[27:30], "little") + 1
            return {"fmt_detected": "webp", "width": w, "height": h,
                    "depth": 8, "components": 4 if alpha else 3,
                    "progressive": 0, "header_bytes": 30}
        raise ValueError(f"unknown WebP chunk {chunk!r}")
    if data.startswith(b"\xff\xd8"):
        from darc_ray.functions.jpeg import jpeg_info

        return {"fmt_detected": "jpeg", **jpeg_info(data)}
    raise ValueError("unknown image payload (no PNG/FJPG/RAWI/WebP/JPEG magic)")
