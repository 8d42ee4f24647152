"""Baseline JPEG codec (datapipe/jpeg.py): hand-computed fixture,
encoder/decoder roundtrips across subsampling/quality/restart configs,
format rejection, and the Spark multimodal integration."""

import numpy as np
import pytest

from atsc_spark.datapipe import jpeg


def _smooth(h, w, seed=3):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            128 + 90 * np.sin(xx / 9.0) * np.cos(yy / 11.0),
            128 + 70 * np.cos(xx / 13.0 + seed),
            128 + 60 * np.sin(yy / 7.0 - seed),
        ],
        axis=-1,
    )
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def test_hand_crafted_dc_only_block():
    """A manually-assembled 8x8 grayscale JPEG, independent of the
    encoder: quantizer all ones, custom 1-bit huffman tables, one DC
    coefficient of 64, ACs EOB'd.  IDCT of F00=64 is a flat block at
    64/8 + 128 = 136 exactly — computable by hand from T.81."""
    import struct

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    blob = b"\xff\xd8"
    blob += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    blob += seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    # DC table: single length-1 code '0' -> symbol 7 (category/size 7)
    blob += seg(0xC4, bytes([0x00] + [1] + [0] * 15 + [7]))
    # AC table: single length-1 code '0' -> symbol 0x00 (EOB)
    blob += seg(0xC4, bytes([0x10] + [1] + [0] * 15 + [0x00]))
    blob += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # scan bits: DC sym '0', 7 magnitude bits 1000000 (=64), AC EOB '0'
    # -> 0 1000000 0 + 1-pad = 0x40 0x7F
    blob += bytes([0x40, 0x7F])
    blob += b"\xff\xd9"
    px = jpeg.decode_jpeg(blob)
    assert px.shape == (8, 8)
    assert (px == 136).all()


def test_roundtrip_color_configs():
    img = _smooth(40, 56)
    for q, sub, ri, bound in [
        (95, (1, 1), 0, 4),
        (95, (2, 2), 0, 12),
        (75, (1, 1), 0, 12),
        (75, (2, 2), 5, 18),
        (95, (1, 1), 3, 4),
    ]:
        blob = jpeg.encode_jpeg(img, quality=q, subsampling=sub, restart_interval=ri)
        out = jpeg.decode_jpeg(blob)
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int)).max()
        assert err <= bound, (q, sub, ri, err)


def test_roundtrip_grayscale_and_odd_sizes():
    for h, w in [(8, 8), (9, 13), (17, 31), (1, 1)]:
        g = _smooth(h, w)[:, :, 0]
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=95))
        assert out.shape == (h, w)
        assert np.abs(out.astype(int) - g.astype(int)).max() <= 6


def test_flat_color_exact():
    flat = np.full((16, 24, 3), (200, 50, 120), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(flat, quality=90, subsampling=(2, 2)))
    assert np.abs(out.astype(int) - flat.astype(int)).max() <= 1


def test_arithmetic_and_garbage_rejected():
    import struct

    # SOF9: arithmetic-coded extended sequential — still out of scope
    blob = b"\xff\xd8" + bytes([0xFF, 0xC9]) + struct.pack(">H", 8) + bytes(6)
    with pytest.raises(NotImplementedError, match="unsupported JPEG coding"):
        jpeg.decode_jpeg(blob)
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"not a jpeg")


# -------------------------------------------- progressive (SOF2, r7)


@pytest.mark.parametrize(
    "shape,kw",
    [
        ((16, 16), {}),                                        # gray multi-block
        ((8, 8, 3), {}),                                       # color 4:4:4 single MCU
        ((23, 17, 3), {"subsampling": (2, 2)}),                # 4:2:0, odd dims
        ((33, 41, 3), {"subsampling": (2, 2), "restart_interval": 2}),
        ((48, 32), {"restart_interval": 3}),                   # gray + restarts
    ],
)
def test_progressive_decode_pixel_exact_vs_baseline(shape, kw):
    """The progressive and baseline encoders share the quantized
    coefficients (_prepare_components), so decoding either stream must
    give bit-identical pixels — the progressive decoder's oracle."""
    px = np.random.default_rng(11).integers(0, 256, shape, dtype=np.uint8)
    base = jpeg.encode_jpeg(px, quality=75, **kw)
    prog = jpeg.encode_jpeg(px, quality=75, progressive=True, **kw)
    assert prog[:2] == b"\xff\xd8" and b"\xff\xc2" in prog  # really SOF2
    assert np.array_equal(jpeg.decode_jpeg(base), jpeg.decode_jpeg(prog))


def test_progressive_eob_runs_longer_than_one():
    """A flat image makes every AC band all-zero, so the encoder emits
    EOBn symbols with multi-block runs (n >= 1) and the decoder must
    walk them across blocks — the refinement pass additionally reads
    buffered correction bits inside the run."""
    px = np.full((64, 64, 3), 77, dtype=np.uint8)
    prog = jpeg.encode_jpeg(px, quality=75, progressive=True)
    base = jpeg.encode_jpeg(px, quality=75)
    assert np.array_equal(jpeg.decode_jpeg(base), jpeg.decode_jpeg(prog))


def test_progressive_randomized_sweep():
    """Shapes x quality x subsampling x restarts, all pixel-exact."""
    for seed in range(12):
        r = np.random.default_rng(seed)
        hh, ww = int(r.integers(1, 50)), int(r.integers(1, 50))
        color = bool(r.integers(0, 2))
        px = r.integers(0, 256, (hh, ww, 3) if color else (hh, ww), dtype=np.uint8)
        kw = {}
        if color and r.integers(0, 2):
            kw["subsampling"] = (2, 2)
        if r.integers(0, 2):
            kw["restart_interval"] = int(r.integers(1, 5))
        q = int(r.integers(5, 99))
        db = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=q, **kw))
        dp = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=q, progressive=True, **kw))
        assert np.array_equal(db, dp), (seed, px.shape, kw, q)


def test_progressive_through_multimodal_strict():
    """decode_image now takes the REAL path for progressive blobs even
    in strict mode (the r2-r6 stub is gone); corrupt progressive blobs
    still fall back to the deterministic fake when non-strict."""
    from atsc_spark.datapipe import multimodal

    img = _smooth(24, 32)
    prog = jpeg.encode_jpeg(img, quality=90, progressive=True)
    px = multimodal.decode_image(prog, 32, 24, strict=True)
    assert np.array_equal(px, jpeg.decode_jpeg(prog))
    cut = prog[: len(prog) * 2 // 3]
    fb = multimodal.decode_image(cut, 32, 24, strict=False)
    assert fb.shape == (24, 32, 3)
    with pytest.raises((ValueError, IndexError, KeyError)):
        multimodal.decode_image(cut, 32, 24, strict=True)


def test_multimodal_dispatch_and_spark_path(spark):
    """decode_image now takes the REAL path for baseline JPEG (no
    fake, no strict failure), end-to-end through the mapInPandas
    feature extractor in STRICT mode."""
    from atsc_spark.datapipe import multimodal

    img = _smooth(24, 32)
    blob = jpeg.encode_jpeg(img, quality=95)
    px = multimodal.decode_image(blob, 32, 24, strict=True)
    assert px.shape == (24, 32, 3)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 4

    rows = [(1, "image", "image/jpeg", 32, 24, 0, bytearray(blob))]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.decode_and_featurize_images(media, strict=True).collect()
    assert len(feats) == 1 and len(feats[0]["features"]) == 16

    # grayscale JPEG is expanded to 3 channels for the feature path
    gpx = multimodal.decode_image(
        jpeg.encode_jpeg(img[:, :, 0], quality=95), 32, 24, strict=True
    )
    assert gpx.shape == (24, 32, 3)


def test_corrupt_jpeg_falls_back_non_strict():
    """A truncated/corrupt baseline JPEG must not crash the batch in
    non-strict mode (ADVICE r6): decode_image falls back to the
    deterministic fake; strict mode surfaces a ValueError."""
    from atsc_spark.datapipe import multimodal

    img = _smooth(16, 16)
    good = jpeg.encode_jpeg(img, quality=90)
    cut = good[: len(good) // 2]           # truncated entropy stream
    flipped = bytearray(good)
    flipped[len(good) // 2] ^= 0xFF        # corrupted mid-stream byte
    for blob in (cut, bytes(flipped), b"\xff\xd8\xff"):
        px = multimodal.decode_image(bytes(blob), 16, 16, strict=False)
        assert px.shape == (16, 16, 3) and px.dtype == np.uint8
        # deterministic: same blob -> same fake pixels
        assert np.array_equal(px, multimodal.decode_image(bytes(blob), 16, 16, strict=False))
    with pytest.raises((ValueError, IndexError, KeyError)):
        multimodal.decode_image(cut, 16, 16, strict=True)
