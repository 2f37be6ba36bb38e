"""Image kernel tests: PNG round-trip, lossy-stub PSNR gate, phash."""

from __future__ import annotations

import numpy as np
import pytest

from darc_ray.functions.image import (
    decode, encode, fake_jpeg_decode, hamming64, phash64, png_decode, png_encode, psnr,
)


def _image(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 / w + yy * 128 / h) % 256
    noise = rng.integers(0, 32, size=(h, w, 3))
    return np.clip(base[..., None] + noise, 0, 255).astype(np.uint8)


def test_png_roundtrip_bit_exact():
    img = _image(1)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_png_decoder_handles_filtered_scanlines():
    # hand-build a tiny PNG with Sub/Up/Average/Paeth filtered rows
    import struct
    import zlib

    from darc_ray.functions.image import PNG_SIG, _chunk

    img = _image(7, h=5, w=4)
    raw = bytearray()
    recon = img.reshape(5, 12).astype(np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        raw.append(f)
        line = recon[y]
        prior = recon[y - 1] if y > 0 else np.zeros(12, dtype=np.int32)
        for x in range(12):
            a = line[x - 3] if x >= 3 else 0
            b = prior[x]
            c = prior[x - 3] if x >= 3 else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] - a
            elif f == 2:
                v = line[x] - b
            elif f == 3:
                v = line[x] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = line[x] - pr
            raw.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
    data = (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))
    assert np.array_equal(png_decode(data), img)


def test_fake_jpeg_psnr_above_gate():
    img = _image(2)
    out = decode(encode(img, "jpeg"), "jpeg")
    assert psnr(img, out) >= 40.0


def test_real_jpeg_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        fake_jpeg_decode(b"\xff\xd8\xff\xe0junk")


def test_psnr_identical_inf():
    img = _image(3)
    assert psnr(img, img) == float("inf")


def test_phash_stability_and_discrimination():
    img = _image(4, h=64, w=64)
    h0 = phash64(img)
    assert isinstance(h0, int)
    assert phash64(img) == h0
    # light noise → small hamming distance
    noisy = np.clip(img.astype(np.int32)
                    + np.random.default_rng(0).integers(-4, 5, img.shape), 0, 255).astype(np.uint8)
    assert hamming64(h0, phash64(noisy)) <= 10
    # structurally different image → large distance (a same-gradient
    # image with different noise is NEAR-identical by design, so build
    # a transposed checker pattern instead)
    yy, xx = np.mgrid[0:64, 0:64]
    other = ((((xx // 8) + (yy // 8)) % 2) * 255).astype(np.uint8)
    other = np.stack([other, 255 - other, other], axis=-1)
    assert hamming64(h0, phash64(other)) >= 16
    # lossy round-trip preserves the hash closely
    rt = decode(encode(img, "jpeg"), "jpeg")
    assert hamming64(h0, phash64(rt)) <= 4


def test_phash_int64_range():
    img = _image(5)
    v = phash64(img)
    assert -(1 << 63) <= v < (1 << 63)
