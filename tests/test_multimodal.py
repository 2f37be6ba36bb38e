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


def test_image_stage_real_jpeg_row(ray_session):
    """A real baseline-JPEG payload (FF D8, T.81 codec) flows through
    ImageFeatureStage end-to-end: decode via jpeg_decode, PSNR gate via
    the real-codec roundtrip (VERDICT r2 item 8)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from darc_ray.functions import image as img
    from darc_ray.functions.jpeg import jpeg_decode, jpeg_encode
    from darc_ray.schemas import IMAGES
    from darc_ray.stages.multimodal import ImageFeatureStage

    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:40, 0:48]
    pix = np.clip(128 + 80 * np.sin(2 * np.pi * xx / 24)[..., None]
                  + rng.integers(-8, 9, (40, 48, 3)), 0, 255).astype(np.uint8)
    body = jpeg_encode(pix, quality=92)
    assert body.startswith(b"\xff\xd8")
    decoded = jpeg_decode(body)
    table = pa.Table.from_pydict({
        "image_id": ["jpeg-row"], "bytes": [body],
        "w": [48], "h": [40], "fmt": ["jpeg"],
        "caption": ["a real baseline jpeg"],
        "phash": [img.phash64(decoded)]}, schema=IMAGES)
    out = (rd.from_arrow(table)
           .map_batches(ImageFeatureStage, batch_format="pyarrow",
                        batch_size=4, concurrency=1)
           .to_pandas())
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["w"], row["h"]) == (48, 40)
    assert bool(row["psnr_ok"])                   # real-codec roundtrip >= 40 dB
    assert int(row["phash"]) == img.phash64(decoded)


def test_jpeg_sos_before_tables_raises_valueerror():
    """A stream whose SOS precedes its DHT/DQT must raise ValueError
    (the corrupt-payload contract), not KeyError (ADVICE r2)."""
    import pytest as _pytest

    from darc_ray.functions.jpeg import jpeg_decode, jpeg_encode
    import numpy as np

    data = bytearray(jpeg_encode(
        np.full((16, 16, 3), 90, dtype=np.uint8), quality=85))
    # strip every DHT (FF C4) and DQT (FF DB) segment
    out = bytearray()
    i = 0
    while i < len(data):
        if data[i] == 0xFF and i + 1 < len(data) and data[i + 1] in (0xC4, 0xDB):
            seglen = (data[i + 2] << 8) | data[i + 3]
            i += 2 + seglen
            continue
        out.append(data[i])
        i += 1
    with _pytest.raises(ValueError):
        jpeg_decode(bytes(out))


# ---------------------------------------------------------------- image ops

def test_resize_bilinear_properties():
    import numpy as np

    from darc_ray.functions.image import center_crop, resize_bilinear, thumbnail

    rng = np.random.default_rng(3)
    pix = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    assert np.array_equal(resize_bilinear(pix, 37, 53), pix)  # identity
    const = np.full((5, 7, 3), 100, np.uint8)                 # constant preserved
    assert np.array_equal(resize_bilinear(const, 21, 31),
                          np.full((21, 31, 3), 100, np.uint8))
    # downscale of a horizontal gradient stays monotone
    grad = np.tile(np.arange(0, 256, 4, dtype=np.uint8)[None, :, None], (8, 1, 3))
    dn = resize_bilinear(grad, 4, 16)
    assert (np.diff(dn[0, :, 0].astype(int)) > 0).all()
    assert center_crop(pix, 20, 24).shape == (20, 24, 3)
    assert thumbnail(pix, 16).shape == (16, 16, 3)


def test_thumbnail_phash_stable_under_noise():
    """The planted near-dup perturbation (±1 on random pixels) must stay
    within the hamming radius the dedup query uses."""
    import numpy as np

    from darc_ray.functions.image import hamming64, phash64, thumbnail

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:48, 0:48]
    pix = np.clip(128 + 80 * np.sin(2 * np.pi * xx / 48)[..., None]
                  + rng.integers(-10, 11, (48, 48, 3)), 0, 255).astype(np.uint8)
    noisy = np.clip(pix.astype(np.int16)
                    + rng.integers(-1, 2, pix.shape), 0, 255).astype(np.uint8)
    assert hamming64(phash64(pix), phash64(noisy)) <= 6
    assert hamming64(phash64(thumbnail(pix, 32)), phash64(thumbnail(noisy, 32))) <= 6


def test_image_quality_gate_rejects_planted_bad_rows(ray_session):
    import ray.data as rd

    from darc_ray.stages.multimodal import ImageQualityStage, synth_image_variants

    t = synth_image_variants(list(range(1, 31)), ["amber", "basalt", "cedar"])
    out = (rd.from_arrow(t)
           .map_batches(ImageQualityStage, batch_format="pyarrow",
                        batch_size=8, concurrency=2).to_pandas())
    rejected = set(out[~out["keep"]]["image_id"])
    assert rejected == {i for i in out["image_id"] if i.endswith("-bad")}


def test_image_dedup_exact_recall_vs_bruteforce(ray_session):
    """Banded blocking over the phash column must equal the all-pairs
    hamming scan (pigeonhole-exactness on the image corpus)."""
    import ray.data as rd

    from darc_ray.functions.image import hamming64
    from darc_ray.stages.dedup import hash_near_pairs
    from darc_ray.stages.multimodal import synth_image_variants

    t = synth_image_variants(list(range(1, 41)), ["amber", "basalt", "cedar"])
    ids = t.column("image_id").to_pylist()
    hashes = t.column("phash").to_pylist()
    brute = sorted((min(a, b), max(a, b))
                   for i, (a, ha) in enumerate(zip(ids, hashes))
                   for b, hb in list(zip(ids, hashes))[i + 1:]
                   if hamming64(ha, hb) <= 6)
    got = hash_near_pairs(rd.from_arrow(t.select(["image_id", "phash"])),
                          max_hamming=6, id_col="image_id", hash_col="phash")
    assert sorted(zip(got["a"], got["b"])) == brute
    assert any(a.rstrip("-dup") == b.rstrip("-dup") for a, b in brute)


def test_image_transform_stage_roundtrip(ray_session):
    """Thumbnails decode back bit-exactly (PNG sink) at the declared
    size, and phash matches a driver-side recompute."""
    import ray.data as rd

    from darc_ray.functions.image import decode, phash64, png_decode, thumbnail
    from darc_ray.stages.multimodal import ImageTransformStage, synth_image_rows

    t = synth_image_rows(list(range(1, 9)), ["amber", "basalt", "cedar"])
    out = (rd.from_arrow(t)
           .map_batches(ImageTransformStage, fn_constructor_kwargs={"size": 24},
                        batch_format="pyarrow", batch_size=4, concurrency=2)
           .to_pandas().set_index("image_id"))
    src = {r["image_id"]: (r["bytes"], r["fmt"]) for r in t.to_pylist()}
    for image_id, row in out.iterrows():
        pix = png_decode(row["thumb_bytes"])
        assert pix.shape == (24, 24, 3)
        data, fmt = src[image_id]
        expect = thumbnail(decode(data, fmt), 24)
        assert (pix == expect).all()
        assert phash64(pix) == row["thumb_phash"]


def test_image_transcode_stage_real_t81_roundtrip(ray_session):
    """The transcode stage must produce decodable real JPEG at the
    declared quality with PSNR above the lossy floor for smooth
    gradients."""
    import ray.data as rd

    from darc_ray.stages.multimodal import ImageTranscodeStage, synth_image_rows

    t = synth_image_rows(list(range(1, 9)), ["amber", "basalt", "cedar"])
    out = (rd.from_arrow(t)
           .map_batches(ImageTranscodeStage, fn_constructor_kwargs={"quality": 85},
                        batch_format="pyarrow", batch_size=4, concurrency=2)
           .to_pandas())
    assert len(out) == 8
    assert (out["jpeg_bytes"] > 0).all()
    assert (out["psnr_db"] > 25.0).all()      # q=85 on noisy gradients


def test_wav_info_header_scan():
    """wav_info equals the decoder's ground truth, never touches PCM
    (truncation past header_bytes still parses), and walks odd-size
    chunks with RIFF word alignment."""
    import struct

    import numpy as np
    import pytest

    from darc_ray.functions.audio import wav_decode, wav_encode, wav_info

    s = (1500 * np.sin(np.arange(2001) / 3.0)).astype(np.int16)
    data = wav_encode(np.stack([s, -s], axis=1), 16000)
    m = wav_info(data)
    pcm, sr = wav_decode(data)
    assert (m["channels"], m["sample_rate"], m["bits"]) == (2, sr, 16)
    assert m["n_samples"] == pcm.shape[0] == 2001
    assert m["duration_ms"] == 2001 * 1000 // 16000
    assert wav_info(data[:m["header_bytes"]]) == m

    # odd-size chunk before data: word-align padding honored
    info = b"INFOx" * 3 + b"!"                     # 16 bytes... make odd
    info = info[:15]
    extra = b"LIST" + struct.pack("<I", len(info)) + info + b"\x00"
    patched = (b"RIFF" + struct.pack("<I", len(data) - 8 + len(extra))
               + data[8:36] + extra + data[36:])
    m2 = wav_info(patched)
    assert m2["n_samples"] == m["n_samples"]
    assert m2["header_bytes"] == m["header_bytes"] + len(extra)

    with pytest.raises(ValueError):
        wav_info(b"RIFF\x00\x00\x00\x00WAVE")      # no data chunk
    with pytest.raises(ValueError):
        wav_info(b"OggS not a wav")


def test_header_scans_roundtrip_property():
    """Property check: for arbitrary dims/rates, the header-only scans
    agree with the encoders' ground truth (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from darc_ray.functions.audio import wav_encode, wav_info
    from darc_ray.functions.image import image_meta, png_encode
    from darc_ray.functions.jpeg import jpeg_encode, jpeg_info

    @settings(max_examples=20, deadline=None)
    @given(h=st.integers(8, 40), w=st.integers(8, 40),
           seed=st.integers(0, 2**31))
    def check_image(h, w, seed):
        pix = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3)).astype(np.uint8)
        m = image_meta(png_encode(pix))
        assert (m["width"], m["height"], m["components"]) == (w, h, 3)
        j = jpeg_info(jpeg_encode(pix))
        assert (j["width"], j["height"], j["progressive"]) == (w, h, 0)

    @settings(max_examples=20, deadline=None)
    @given(n=st.integers(16, 3000), ch=st.integers(1, 2),
           sr=st.sampled_from([8000, 11025, 16000, 44100]),
           seed=st.integers(0, 2**31))
    def check_audio(n, ch, sr, seed):
        s = np.random.default_rng(seed).integers(
            -3000, 3000, (n, ch)).astype(np.int16)
        m = wav_info(wav_encode(s, sr))
        assert (m["n_samples"], m["channels"], m["sample_rate"]) == (n, ch, sr)
        assert m["duration_ms"] == n * 1000 // sr

    check_image()
    check_audio()
