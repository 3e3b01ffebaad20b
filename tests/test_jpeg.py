"""Baseline JPEG codec: roundtrip oracles (the fixture encoder is the
forward model, like encode_png for the PNG decoder), profile boundaries,
and the multimodal wiring."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_obsidian_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    jpeg_dimensions,
)


def _maxdiff(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())


def test_solid_blocks_roundtrip_exactly():
    # a solid block has only a DC coefficient; quant=1 makes the
    # quantize/dequantize exact, so decode must be bit-identical
    for v in (0, 1, 128, 137, 254, 255):
        img = np.full((16, 24), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == (16, 24, 1)
        assert _maxdiff(out[:, :, 0], img) == 0


def test_gray_roundtrip_near_lossless_odd_dims():
    rng = np.random.default_rng(11)
    for shape in [(13, 21), (8, 8), (1, 1), (9, 40), (64, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == (*shape, 1)
        # quant=1: only DCT float rounding survives
        assert _maxdiff(out[:, :, 0], img) <= 2, shape


def test_rgb_444_roundtrip():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (19, 22, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    # colorspace conversion adds one more rounding step
    assert _maxdiff(out, img) <= 3


def test_rgb_420_subsampled_smooth():
    grad = (
        np.linspace(0, 255, 40)[None, :, None]
        + np.linspace(0, 40, 25)[:, None, None]
        + np.array([0.0, 10.0, 20.0])[None, None, :]
    )
    img = np.clip(grad, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, subsample=True))
    assert out.shape == img.shape
    # chroma is 2x2-averaged: smooth images survive within a few counts
    assert np.abs(out.astype(float) - img.astype(float)).mean() < 1.5
    assert _maxdiff(out, img) <= 12


def test_restart_markers_reset_predictors():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (33, 41), dtype=np.uint8)
    b = encode_jpeg(img, restart_interval=3)
    assert b"\xff\xd0" in b or b"\xff\xd1" in b  # RSTn actually emitted
    out = decode_jpeg(b)
    assert _maxdiff(out[:, :, 0], img) <= 2


def test_quant_lossy_but_close_on_average():
    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=8))
    assert np.abs(out[:, :, 0].astype(float) - img.astype(float)).mean() < 6.0


def test_jpeg_dimensions_header_only():
    img = np.zeros((37, 53), dtype=np.uint8)
    b = encode_jpeg(img)
    assert jpeg_dimensions(b) == (53, 37)
    assert jpeg_dimensions(b"\xff\xd8\xff\xd9") is None
    assert jpeg_dimensions(b"not a jpeg") is None


def test_decode_errors():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    # truncated entropy stream
    img = np.full((16, 16), 55, dtype=np.uint8)
    b = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(b[: len(b) // 2] + b"\xff\xd9")


def test_mislabeled_progressive_fails_closed():
    # flip SOF0 -> SOF2 in a valid SEQUENTIAL stream: its Ss=0,Se=63 scan
    # header is malformed for a progressive frame (a DC scan must have
    # Se=0), so the decoder must raise a data error, not mis-decode
    img = np.full((8, 8), 99, dtype=np.uint8)
    b = bytearray(encode_jpeg(img))
    idx = bytes(b).find(b"\xff\xc0")
    assert idx > 0
    b[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b))


def test_decode_image_dispatch_jpeg():
    from ocr_obsidian_spark.operators.multimodal import decode_image

    img = np.full((10, 12), 200, dtype=np.uint8)
    out = decode_image(encode_jpeg(img))
    assert out.shape == (10, 12, 1) and int(out.max()) == 200
    # WebP is a real codec since round 5: a malformed container (chunk
    # header past the payload end) is a data error, not a missing codec
    with pytest.raises(ValueError):
        decode_image(b"RIFF....WEBPVP8 ")


def test_media_features_use_real_jpeg_pixels(spark):
    from ocr_obsidian_spark.operators.multimodal import (
        extract_media_features,
        pixel_features,
    )

    solid = np.full((16, 16, 3), [200, 100, 50], dtype=np.uint8)
    good = encode_jpeg(solid)
    rows = [
        ("u1", bytearray(good), {"media_type": "image", "mime": "image/jpeg",
                                 "width": 16, "height": 16, "duration_ms": None}),
        ("u2", bytearray(good[:20]), {"media_type": "image", "mime": "image/jpeg",
                                      "width": None, "height": None,
                                      "duration_ms": None}),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, payload binary, media_meta struct<media_type:string,"
        "mime:string,width:int,height:int,duration_ms:long>",
    )
    got = {r["url"]: r for r in extract_media_features(df).collect()}
    expected = pixel_features(decode_jpeg(good))
    assert got["u1"]["feature_vec"] == pytest.approx(expected)
    # truncated payload: fail-soft to content-derived features, stage alive
    assert got["u2"]["feature_vec"] != pytest.approx(expected)


def test_resize_recovers_dims_from_jpeg_header(spark):
    from ocr_obsidian_spark.operators.multimodal import resize_images

    img = np.zeros((800, 1600), dtype=np.uint8)
    b = encode_jpeg(img)  # solid image: encodes fast despite the size
    rows = [("u1", bytearray(b), {"media_type": "image", "mime": "image/jpeg",
                                  "width": None, "height": None,
                                  "duration_ms": None})]
    df = spark.createDataFrame(
        rows,
        "url string, payload binary, media_meta struct<media_type:string,"
        "mime:string,width:int,height:int,duration_ms:long>",
    )
    [r] = resize_images(df, max_side=400).collect()
    assert (r["out_width"], r["out_height"]) == (400, 200)


# ---------------------------------------------------------------------------
# progressive (SOF2) — forward oracle: same coefficients as baseline, so
# progressive decode must equal baseline decode bit-exactly
# ---------------------------------------------------------------------------


def _assert_prog_equals_base(img, **kw):
    from ocr_obsidian_spark.operators.jpegcodec import encode_jpeg_progressive

    enc_kw = {k: v for k, v in kw.items() if k != "scans"}
    base = decode_jpeg(encode_jpeg(img, **enc_kw))
    prog = decode_jpeg(encode_jpeg_progressive(img, **kw))
    assert np.array_equal(base, prog)


def test_progressive_roundtrip_gray_and_rgb():
    rng = np.random.default_rng(11)
    _assert_prog_equals_base(rng.integers(0, 256, (8, 8), dtype=np.uint8))
    _assert_prog_equals_base(
        rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    )
    # quant > 1 sparsifies coefficients -> long EOB runs in AC scans
    _assert_prog_equals_base(
        rng.integers(0, 256, (40, 31, 3), dtype=np.uint8), quant=8
    )


def test_progressive_roundtrip_subsampled_odd_dims():
    # 4:2:0 with dims not multiple of 16: the luma AC grid (ceil(w/8))
    # is SMALLER than the padded MCU grid — padding blocks stay DC-only
    # and must be invisible after the crop
    rng = np.random.default_rng(12)
    _assert_prog_equals_base(
        rng.integers(0, 256, (33, 30, 3), dtype=np.uint8),
        quant=2, subsample=True,
    )


def test_progressive_restart_markers():
    rng = np.random.default_rng(13)
    _assert_prog_equals_base(
        rng.integers(0, 256, (32, 40, 3), dtype=np.uint8),
        quant=2, restart_interval=3,
    )


def test_progressive_restart_sequence_resets_per_scan():
    # T.81: the RSTn modulo counter restarts at RST0 for every scan; the
    # in-repo decoder tolerates any index, but strict decoders verify it
    from ocr_obsidian_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(15)
    img = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    payload = encode_jpeg_progressive(img, quant=2, restart_interval=2)
    scans = 0
    expected = None
    i = 2
    while i < len(payload) - 1:
        if payload[i] != 0xFF:
            i += 1
            continue
        m = payload[i + 1]
        if m == 0xDA:
            scans += 1
            expected = 0
            i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
        elif 0xD0 <= m <= 0xD7:
            assert m - 0xD0 == expected, (scans, m - 0xD0, expected)
            expected = (expected + 1) & 7
            i += 2
        elif m in (0x00, 0xFF):  # stuffed byte / fill
            i += 2
        elif m == 0xD9:
            break
        else:  # other marker segment with length
            i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
    assert scans >= 2  # multiple scans actually carried restart markers


def test_progressive_flat_image_eob_runs():
    # constant image: every AC coefficient is zero -> each AC scan is one
    # maximal EOB run across all blocks
    img = np.full((48, 56, 3), 77, dtype=np.uint8)
    _assert_prog_equals_base(img, quant=1)


def test_progressive_custom_script_non_interleaved_dc():
    # single-component DC scans (the non-interleaved DC decode path) and
    # a two-step AC successive approximation (Al=2 -> 1 -> 0), which
    # forces ZRL-inside-refinement and buffered correction bits
    from ocr_obsidian_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    script = [
        ((0,), 0, 0, 0, 2), ((1,), 0, 0, 0, 2), ((2,), 0, 0, 0, 2),
        ((0,), 0, 0, 2, 1), ((1,), 0, 0, 2, 1), ((2,), 0, 0, 2, 1),
        ((0,), 0, 0, 1, 0), ((1,), 0, 0, 1, 0), ((2,), 0, 0, 1, 0),
        ((0,), 1, 63, 0, 2), ((1,), 1, 63, 0, 2), ((2,), 1, 63, 0, 2),
        ((0,), 1, 63, 2, 1), ((1,), 1, 63, 2, 1), ((2,), 1, 63, 2, 1),
        ((0,), 1, 63, 1, 0), ((1,), 1, 63, 1, 0), ((2,), 1, 63, 1, 0),
    ]
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img, scans=script))
    assert np.array_equal(base, prog)


def test_progressive_dimensions_header():
    from ocr_obsidian_spark.operators.jpegcodec import (
        encode_jpeg_progressive,
        jpeg_dimensions,
    )

    img = np.zeros((19, 23), dtype=np.uint8)
    assert jpeg_dimensions(encode_jpeg_progressive(img)) == (23, 19)


def test_progressive_truncated_stream_fails_closed():
    from ocr_obsidian_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(15)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    full = encode_jpeg_progressive(img)
    with pytest.raises(ValueError):
        decode_jpeg(full[: len(full) * 2 // 3])
