"""GIF codec: LZW/palette/interlace/transparency roundtrips against the
fixture encoder, plus the multimodal wiring."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_obsidian_spark.operators.gifcodec import (
    decode_gif,
    encode_gif,
    gif_dimensions,
)


def test_gray_identity_palette_roundtrip_exact():
    rng = np.random.default_rng(21)
    for shape in [(13, 17), (1, 1), (8, 64), (40, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_gif(encode_gif(img))
        assert out.shape == (*shape, 3)
        for ch in range(3):  # identity gray palette: every channel = index
            assert np.array_equal(out[:, :, ch], img)


def test_rgb_palette_roundtrip_exact():
    rng = np.random.default_rng(22)
    img = (rng.integers(0, 5, (9, 11, 3), dtype=np.uint8) * 50).astype(np.uint8)
    out = decode_gif(encode_gif(img))
    assert np.array_equal(out, img)


def test_interlaced_rows_deinterlace_exactly():
    rng = np.random.default_rng(23)
    for h in (1, 2, 5, 8, 13):  # cover all pass-boundary shapes
        img = rng.integers(0, 256, (h, 7), dtype=np.uint8)
        out = decode_gif(encode_gif(img, interlace=True))
        assert np.array_equal(out[:, :, 0], img), h


def test_transparency_returns_rgba():
    img = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    out = decode_gif(encode_gif(img, transparent_index=0))
    assert out.shape == (2, 2, 4)
    assert np.array_equal(out[:, :, 3], np.where(img == 0, 0, 255))


def test_clear_gce_resets_stale_transparency():
    # GIF89a §23: a graphics-control extension applies only to the block
    # that FOLLOWS it — a later GCE with the transparency flag clear must
    # reset an index set by an earlier one, so the frame decodes RGB.
    img = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    payload = encode_gif(img, transparent_index=0)
    set_gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])
    assert set_gce in payload
    clear_gce = bytes([0x21, 0xF9, 4, 0x00, 0, 0, 0, 0])
    patched = payload.replace(set_gce, set_gce + clear_gce, 1)
    out = decode_gif(patched)
    assert out.shape == (2, 2, 3)  # RGBA would mean stale transparency


def test_gif_dimensions_header_only():
    img = np.zeros((37, 53), dtype=np.uint8)
    assert gif_dimensions(encode_gif(img)) == (53, 37)
    assert gif_dimensions(b"GIF89a") is None
    assert gif_dimensions(b"not a gif") is None


def test_decode_errors_are_value_errors():
    with pytest.raises(ValueError):
        decode_gif(b"not a gif")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a\x05\x00\x05\x00\x00\x00\x00\x3b")  # no image
    good = encode_gif(np.full((8, 8), 3, dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_gif(good[: len(good) // 2])  # truncated mid-stream


def test_decode_image_dispatch_gif():
    from ocr_obsidian_spark.operators.multimodal import decode_image

    img = np.full((6, 9), 77, dtype=np.uint8)
    out = decode_image(encode_gif(img))
    assert out.shape == (6, 9, 3) and int(out[0, 0, 0]) == 77


def test_media_features_use_real_gif_pixels(spark):
    from ocr_obsidian_spark.operators.multimodal import (
        extract_media_features,
        pixel_features,
    )

    img = np.full((12, 12), 140, dtype=np.uint8)
    good = encode_gif(img)
    rows = [
        ("u1", bytearray(good), {"media_type": "image", "mime": "image/gif",
                                 "width": 12, "height": 12, "duration_ms": None}),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, payload binary, media_meta struct<media_type:string,"
        "mime:string,width:int,height:int,duration_ms:long>",
    )
    [r] = extract_media_features(df).collect()
    assert r["feature_vec"] == pytest.approx(pixel_features(decode_gif(good)))


def test_sub_canvas_frame_composes_onto_logical_screen():
    """A first frame smaller than the logical screen must decode to the
    SCREEN size (matching gif_dimensions), placed at (left, top) over the
    background color."""
    import struct

    img = np.array([[1, 2], [3, 1]], dtype=np.uint8)
    b = bytearray(encode_gif(img))
    b[6:10] = struct.pack("<HH", 6, 5)  # logical screen 6x5
    b[11] = 0  # background index
    i = 13 + 3 * 256  # header + 256-color identity palette -> descriptor
    assert b[i] == 0x2C
    b[i + 1 : i + 5] = struct.pack("<HH", 2, 1)  # frame at (left=2, top=1)
    out = decode_gif(bytes(b))
    assert out.shape == (5, 6, 3)
    assert gif_dimensions(bytes(b)) == (6, 5)
    assert int(out[1, 2, 0]) == 1 and int(out[2, 3, 0]) == 1  # frame pixels
    assert int(out[0, 0, 0]) == 0  # background
    # a frame exceeding the screen is malformed
    b[i + 1 : i + 5] = struct.pack("<HH", 5, 4)
    with pytest.raises(ValueError):
        decode_gif(bytes(b))


def test_encode_rejects_out_of_range_transparent_index():
    img = np.zeros((2, 2), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_gif(img, transparent_index=256)
