"""Video payload kernels: frame container + sampling.

**The codec boundary is a documented stub**: no H.264/VP9 library
exists in this environment, so video rides in ``FVID`` — a
length-prefixed sequence of REAL PNG frames (our own codec) with an
fps header.  Everything around the boundary is real: container
parsing, frame sampling without decoding unsampled frames, per-frame
pixel kernels (phash), and the Ray-side actor-pool plumbing.  A real
codec drops in by replacing :func:`decode_frame_at` /
:func:`video_encode` only.
"""

from __future__ import annotations

import struct

import numpy as np

from darc_ray.functions import image as img

FVID_MAGIC = b"FVID"


def video_encode(frames: list[np.ndarray], fps: int) -> bytes:
    """Encode (h, w, 3) uint8 frames as an FVID stream (PNG frames)."""
    if not frames:
        raise ValueError("no frames")
    out = [FVID_MAGIC, struct.pack(">HI", fps, len(frames))]
    for f in frames:
        data = img.png_encode(f)
        out.append(struct.pack(">I", len(data)))
        out.append(data)
    return b"".join(out)


def video_index(data: bytes) -> tuple[int, list[tuple[int, int]]]:
    """Parse the container header WITHOUT decoding any frame: returns
    (fps, [(offset, length), ...]) — the cheap metadata pass a
    frame-sampling stage runs before touching pixels."""
    if data[:4] != FVID_MAGIC:
        raise ValueError("not an FVID payload")
    fps, n = struct.unpack_from(">HI", data, 4)
    pos = 10
    spans = []
    for _ in range(n):
        (length,) = struct.unpack_from(">I", data, pos)
        spans.append((pos + 4, length))
        pos += 4 + length
    return fps, spans


def decode_frame_at(data: bytes, span: tuple[int, int]) -> np.ndarray:
    off, length = span
    return img.png_decode(data[off:off + length])


def sample_frames(data: bytes, every_n: int = 1,
                  max_frames: int | None = None) -> list[tuple[int, np.ndarray]]:
    """Decode every-Nth frame only (unsampled frames are never
    decompressed): [(frame_idx, pixels), ...]."""
    _fps, spans = video_index(data)
    out = []
    for i in range(0, len(spans), max(1, every_n)):
        out.append((i, decode_frame_at(data, spans[i])))
        if max_frames is not None and len(out) >= max_frames:
            break
    return out
