"""VP8L (lossless WebP) codec: fixture-encoder roundtrips plus
hand-built bit-level streams exercising the paths the fixture encoder
does not emit — LZ77 backward references, the color cache, the 2D
distance mapping, full code-length coding with repeats and max-symbol,
predictor blocks, palette bundling and the cross-color transform."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocr_obsidian_spark.operators.webpcodec import (
    _BitWriter,
    decode_webp,
    encode_webp_lossless,
    is_webp,
    webp_dimensions,
)


def wrap(body: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def single_code(bw: _BitWriter, sym: int) -> None:
    """simple prefix code with one symbol (costs 0 bits per use)."""
    bw.write(1, 1)
    bw.write(0, 1)
    if sym > 1:
        bw.write(1, 1)
        bw.write(sym, 8)
    else:
        bw.write(0, 1)
        bw.write(sym, 1)


def pair_code(bw: _BitWriter, s0: int, s1: int) -> None:
    """simple prefix code with two symbols (1 bit per use: s0=0, s1=1)."""
    assert s0 < s1
    bw.write(1, 1)
    bw.write(1, 1)
    if s0 > 1:
        bw.write(1, 1)
        bw.write(s0, 8)
    else:
        bw.write(0, 1)
        bw.write(s0, 1)
    bw.write(s1, 8)


def test_roundtrip_rgb_exact():
    rng = np.random.default_rng(31)
    for shape in [(9, 7, 3), (1, 1, 3), (16, 3, 3), (2, 40, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_webp(encode_webp_lossless(img))
        assert np.array_equal(out, img), shape


def test_roundtrip_rgba_and_gray():
    rng = np.random.default_rng(32)
    img = rng.integers(0, 256, (5, 6, 4), dtype=np.uint8)
    img[0, 0, 3] = 17  # keep a real alpha so RGBA comes back
    out = decode_webp(encode_webp_lossless(img))
    assert out.shape == (5, 6, 4) and np.array_equal(out, img)
    gray = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    out = decode_webp(encode_webp_lossless(gray))
    assert np.array_equal(out, np.stack([gray] * 3, axis=2))


def test_roundtrip_subtract_green_transform():
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    enc = encode_webp_lossless(img, subtract_green=True)
    assert np.array_equal(decode_webp(enc), img)


def test_dimensions_and_sniff():
    img = np.zeros((11, 23, 3), dtype=np.uint8)
    enc = encode_webp_lossless(img)
    assert is_webp(enc)
    assert webp_dimensions(enc) == (23, 11)
    assert webp_dimensions(b"RIFF\x00\x00\x00\x00WEBP") is None
    assert not is_webp(b"not webp")


def test_handbuilt_lz77_cache_and_2d_distances():
    """4x2 image written with: one literal, a length-3 copy at 2D
    distance code 2 = (1, 0) (previous pixel), a length-3 copy at 2D
    distance code 1 = (0, 1) (pixel above), and a final color-cache
    hit. G lengths use full code-length coding with 18-repeats and the
    explicit max-symbol stop."""
    w, h = 4, 2
    pixel = 0xFF010203
    cache_bits = 4
    hidx = (0x1E35A7BD * pixel & 0xFFFFFFFF) >> (32 - cache_bits)
    g_lit, g_len3, g_cache = 2, 256 + 2, 280 + hidx

    bw = _BitWriter()
    header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta prefix codes
    # --- G code: lengths {g_lit: 1, g_len3: 2, g_cache: 2} ---
    bw.write(0, 1)  # not simple
    bw.write(5 - 4, 4)  # cl lengths for ORDER[:5] = 17,18,0,1,2
    for v in (3, 3, 2, 2, 2):
        bw.write(v, 3)
    # canonical cl codes: len2: 0->00, 1->01, 2->10; len3: 17->110, 18->111
    CL = {0: (0b00, 2), 1: (0b01, 2), 2: (0b10, 2), 17: (0b110, 3), 18: (0b111, 3)}
    bw.write(1, 1)  # explicit max symbol
    bw.write(1, 3)  # length_nbits = 2 + 2*1 = 4
    bw.write(8 - 2, 4)  # 8 cl symbols will be read
    seq = []
    seq.append((CL[0], None))  # symbol 0 -> len 0
    seq.append((CL[0], None))  # symbol 1 -> len 0
    seq.append((CL[1], None))  # symbol 2 -> len 1 (g_lit)
    seq.append((CL[18], (138 - 11, 7)))  # skip 138 zeros (3..140)
    seq.append((CL[18], (117 - 11, 7)))  # skip 117 zeros (141..257)
    seq.append((CL[2], None))  # symbol 258 -> len 2 (g_len3)
    gap = g_cache - 259
    seq.append((CL[18], (gap - 11, 7)))  # skip to g_cache
    seq.append((CL[2], None))  # g_cache -> len 2
    for (code, ln), extra in seq:
        bw.write_code(code, ln)
        if extra:
            bw.write(*extra)
    # canonical over {g_lit:1, g_len3:2, g_cache:2}: 0, 10, 11
    G = {g_lit: (0b0, 1), g_len3: (0b10, 2), g_cache: (0b11, 2)}
    single_code(bw, 1)    # R
    single_code(bw, 3)    # B
    single_code(bw, 255)  # A
    pair_code(bw, 0, 1)   # D: symbols 0 and 1
    # --- pixel stream ---
    bw.write_code(*G[g_lit])   # literal (1,2,3)
    bw.write_code(*G[g_len3])  # copy 3, dist
    bw.write_code(1, 1)        # D symbol 1 -> dist_code 2 -> (1,0) -> 1
    bw.write_code(*G[g_len3])  # copy 3
    bw.write_code(0, 1)        # D symbol 0 -> dist_code 1 -> (0,1) -> w
    bw.write_code(*G[g_cache])  # final pixel from the cache

    out = decode_webp(wrap(bw.bytes()))
    assert out.shape == (2, 4, 3)
    assert np.array_equal(out, np.full((2, 4, 3), [1, 2, 3], dtype=np.uint8))


def test_handbuilt_predictor_left_mode():
    """Predictor transform, one 4x4 block, mode 1 (Left): residuals of
    (1,1,1) per channel accumulate along scan order per the spec's edge
    rules ((0,0) from opaque black, row 0 from L, column 0 from T)."""
    w, h = 4, 2
    bw = _BitWriter()
    header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # PREDICTOR
    bw.write(2 - 2, 3)  # size_bits = 2 -> 4x4 blocks -> 1x1 tiles
    # tile sub-image (1x1): mode pixel green=1; no cache
    bw.write(0, 1)
    single_code(bw, 1)  # G = mode 1
    single_code(bw, 0)  # R
    single_code(bw, 0)  # B
    single_code(bw, 0)  # A
    single_code(bw, 0)  # D
    bw.write(0, 1)  # main: no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    single_code(bw, 1)    # G residual = 1
    single_code(bw, 1)    # R residual = 1
    single_code(bw, 1)    # B residual = 1
    single_code(bw, 0)    # A residual = 0
    single_code(bw, 0)    # D
    # every pixel costs 0 bits (all codes single-symbol)
    out = decode_webp(wrap(bw.bytes()))
    # (0,0): black + (1,1,1) = 1; row 0 then adds 1 per step (L);
    # (0,1) predicts from T; row 1 then adds 1 per step again
    want = np.array(
        [[[1, 1, 1], [2, 2, 2], [3, 3, 3], [4, 4, 4]],
         [[2, 2, 2], [3, 3, 3], [4, 4, 4], [5, 5, 5]]],
        dtype=np.uint8,
    )
    assert np.array_equal(out, want)


def test_handbuilt_palette_with_bundling():
    """Color-indexing with 2 colors: width_bits=3 packs 8 indices per
    green byte; palette entries are componentwise delta-coded."""
    w, h = 10, 1
    red, green = 0xFFFF0000, 0xFF00FF00
    idx = [0, 1, 0, 1, 1, 0, 1, 0, 0, 1]
    # delta-coded palette stream pixels
    def argb_bytes(p):
        return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
    a0, r0, g0, b0 = argb_bytes(red)
    a1, r1, g1, b1 = argb_bytes(green)
    d1 = ((a1 - a0) % 256, (r1 - r0) % 256, (g1 - g0) % 256, (b1 - b0) % 256)
    bw = _BitWriter()
    header(bw, w, h)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(2 - 1, 8)  # table size 2
    # palette image (2x1): two literal pixels, channels via pair codes
    bw.write(0, 1)  # no cache
    PAL = list(zip(argb_bytes(red), d1))  # per-channel (first, delta)
    (ap, ad), (rp, rd), (gp, gd), (bp, bd) = PAL
    codes = {}
    for name, x0, x1 in (("g", gp, gd), ("r", rp, rd), ("b", bp, bd), ("a", ap, ad)):
        if x0 == x1:
            codes[name] = None
        else:
            codes[name] = {min(x0, x1): (0, 1), max(x0, x1): (1, 1)}
    for name, chan in (("g", None), ("r", None), ("b", None), ("a", None)):
        vals = {"g": (gp, gd), "r": (rp, rd), "b": (bp, bd), "a": (ap, ad)}[name]
        if codes[name] is None:
            single_code(bw, vals[0])
        else:
            pair_code(bw, min(vals), max(vals))
    single_code(bw, 0)  # D
    for i in range(2):  # the two palette pixels
        for name in ("g", "r", "b", "a"):
            vals = {"g": (gp, gd), "r": (rp, rd), "b": (bp, bd), "a": (ap, ad)}[name]
            if codes[name] is not None:
                bw.write_code(*codes[name][vals[i]])
    bw.write(0, 1)  # no more transforms
    # main packed image: 2x1, green bytes hold the packed indices
    byte0 = sum(idx[x] << x for x in range(8))
    byte1 = idx[8] | (idx[9] << 1)
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    pair_code(bw, min(byte0, byte1), max(byte0, byte1))
    single_code(bw, 0)  # R
    single_code(bw, 0)  # B
    single_code(bw, 0)  # A
    single_code(bw, 0)  # D
    for b_ in (byte0, byte1):
        bw.write_code(1 if b_ == max(byte0, byte1) else 0, 1)
    out = decode_webp(wrap(bw.bytes()))
    want = np.array(
        [[[255, 0, 0] if i == 0 else [0, 255, 0] for i in idx]], dtype=np.uint8
    )
    assert np.array_equal(out, want)


def test_distance_map_matches_published_table():
    """Pin ALL 120 entries of the 2D distance mapping against the
    spec's literal table ((dx, dy) per distance code, derived two
    independent ways: the published list itself and the inverse of the
    spec's plane_to_code_lut nibble encoding (dy << 4) | (8 - dx) —
    both agree). Codes 97-120 once regressed to spec-unrepresentable
    offsets like (0, 8), so the full table is pinned, not sampled."""
    from ocr_obsidian_spark.operators.webpcodec import _DIST_MAP

    WANT = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
        (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
        (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
        (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
        (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
        (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
        (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
        (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
        (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
        (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
        (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
    ]
    assert _DIST_MAP == WANT
    # every entry fits the spec's one-byte nibble encoding
    assert all(0 <= dy <= 7 and -7 <= dx <= 8 for dx, dy in _DIST_MAP)


def test_handbuilt_predictor_tr_rightmost_column():
    """Predictor mode 3 (top-right): per the spec's flat-buffer
    addressing, TR for a rightmost-column pixel is pix[i - w + 1] — the
    already-decoded LEFTMOST pixel of the CURRENT row, not the pixel
    above. 3x2, one tile, green residual 1 everywhere."""
    w, h = 3, 2
    bw = _BitWriter()
    header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # PREDICTOR
    bw.write(2 - 2, 3)  # size_bits = 2 -> one 4x4 tile
    bw.write(0, 1)  # tile sub-image: no cache
    single_code(bw, 3)  # G = mode 3 (TR)
    single_code(bw, 0)
    single_code(bw, 0)
    single_code(bw, 0)
    single_code(bw, 0)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    single_code(bw, 1)  # G residual 1
    single_code(bw, 0)  # R
    single_code(bw, 0)  # B
    single_code(bw, 0)  # A residual 0
    single_code(bw, 0)  # D
    out = decode_webp(wrap(bw.bytes()))
    # row 0: (0,0) black+1, then L-edge rule -> G = 1,2,3
    # row 1: (0,1) T-edge -> 2; (1,1) TR=G[0][2]=3 -> 4;
    #        (2,1) rightmost: TR = leftmost of row 1 = 2 -> 3
    want_g = np.array([[1, 2, 3], [2, 4, 3]], dtype=np.uint8)
    assert np.array_equal(out[:, :, 1], want_g)
    assert np.array_equal(out[:, :, 0], np.zeros((2, 3), dtype=np.uint8))


def test_handbuilt_palette_then_predictor_transform_order():
    """Bitstream order [color-indexing, predictor]: the predictor was
    read AFTER the palette so it operates on the PACKED image (width 1
    here) and its inverse must run at that captured width — running it
    at the full width used to overrun the packed pixel buffer. Mode 2
    is irrelevant (every packed pixel is in column 0, edge rules
    apply): row 0 gets black+res, row 1 gets T+res."""
    w, h = 8, 2
    idx0 = [1, 0, 1, 0, 1, 1, 0, 0]
    idx1 = [0, 1, 1, 0, 0, 1, 0, 1]
    byte0 = sum(b << x for x, b in enumerate(idx0))  # 53
    byte1 = sum(b << x for x, b in enumerate(idx1))  # 166
    res0, res1 = byte0, (byte1 - byte0) % 256

    red, green = (255, 0, 0, 255), (0, 255, 0, 255)
    bw = _BitWriter()
    header(bw, w, h)
    # --- transform 1: COLOR_INDEXING, 2 colors -> width_bits 3 ---
    bw.write(1, 1)
    bw.write(3, 2)
    bw.write(2 - 1, 8)
    bw.write(0, 1)  # palette sub-image: no cache
    # entries delta-coded: first = red, second = green - red (mod 256)
    d = tuple((green[i] - red[i]) % 256 for i in range(4))
    chans = {  # channel -> (entry0, entry1) in sub-image pixel order
        "g": (red[1], d[1]), "r": (red[0], d[0]),
        "b": (red[2], d[2]), "a": (red[3], d[3]),
    }
    codes = {}
    for name in ("g", "r", "b", "a"):
        v0, v1 = chans[name]
        if v0 == v1:
            single_code(bw, v0)
            codes[name] = None
        else:
            pair_code(bw, min(v0, v1), max(v0, v1))
            codes[name] = {min(v0, v1): (0, 1), max(v0, v1): (1, 1)}
    single_code(bw, 0)  # D
    for i in range(2):
        for name in ("g", "r", "b", "a"):
            if codes[name] is not None:
                bw.write_code(*codes[name][chans[name][i]])
    # --- transform 2: PREDICTOR over the packed 1x2 image ---
    bw.write(1, 1)
    bw.write(0, 2)
    bw.write(2 - 2, 3)  # one tile (packed_w=1)
    bw.write(0, 1)
    single_code(bw, 2)  # mode 2 (T)
    single_code(bw, 0)
    single_code(bw, 0)
    single_code(bw, 0)
    single_code(bw, 0)
    bw.write(0, 1)  # no more transforms
    # --- main packed image: 1x2 residuals ---
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    pair_code(bw, min(res0, res1), max(res0, res1))
    single_code(bw, 0)  # R
    single_code(bw, 0)  # B
    single_code(bw, 0)  # A
    single_code(bw, 0)  # D
    for r_ in (res0, res1):
        bw.write_code(1 if r_ == max(res0, res1) else 0, 1)

    out = decode_webp(wrap(bw.bytes()))
    want = np.array(
        [[[0, 255, 0] if b else [255, 0, 0] for b in idx0],
         [[0, 255, 0] if b else [255, 0, 0] for b in idx1]],
        dtype=np.uint8,
    )
    assert np.array_equal(out, want)


def test_handbuilt_cross_color_transform():
    """Cross-color transform, one block: green_to_red=32 (delta = green
    when green < 128), green_to_blue=64, red_to_blue=0 — expected values
    computed independently from the spec's (int8(t)*int8(c))>>5."""
    w, h = 2, 1
    bw = _BitWriter()
    header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR transform
    bw.write(2 - 2, 3)  # 4x4 blocks -> 1x1 tiles
    # element pixel: r2b in red, g2b in green, g2r in blue
    bw.write(0, 1)
    single_code(bw, 64)  # G channel = green_to_blue
    single_code(bw, 0)   # R channel = red_to_blue
    single_code(bw, 32)  # B channel = green_to_red
    single_code(bw, 255)
    single_code(bw, 0)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)
    bw.write(0, 1)
    single_code(bw, 10)   # g = 10
    single_code(bw, 5)    # r residual
    single_code(bw, 7)    # b residual
    single_code(bw, 255)  # a
    single_code(bw, 0)
    out = decode_webp(wrap(bw.bytes()))
    g = 10
    r = (5 + ((32 * g) >> 5)) & 0xFF
    b = (7 + ((64 * g) >> 5)) & 0xFF  # + r2b delta of 0
    assert np.array_equal(out, np.full((1, 2, 3), [r, g, b], dtype=np.uint8))


def test_error_paths():
    with pytest.raises(ValueError):
        decode_webp(b"junk")
    with pytest.raises(ValueError):
        decode_webp(wrap(b"\x00\x00\x00\x00\x00"))  # bad signature
    with pytest.raises(ValueError):
        decode_webp(wrap(b"\x2f\x01"))  # truncated header
    # lossy VP8 chunk -> honest NotImplementedError
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBPVP8 " + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)


def test_meta_prefix_is_honest_boundary():
    bw = _BitWriter()
    header(bw, 2, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta prefix codes present
    with pytest.raises(NotImplementedError):
        decode_webp(wrap(bw.bytes()))


def test_multimodal_dispatch_webp():
    from ocr_obsidian_spark.operators.multimodal import decode_image, image_codecs

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    enc = encode_webp_lossless(img)
    assert np.array_equal(decode_image(enc), img)
    dims = [d for sniff, _dec, d in image_codecs() if sniff(enc)]
    assert dims and dims[0](enc) == (4, 4)


def test_media_features_use_real_webp_pixels(spark):
    from ocr_obsidian_spark.operators.multimodal import (
        extract_media_features,
        pixel_features,
    )

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    enc = encode_webp_lossless(img)
    rows = [
        ("u1", bytearray(enc), {"media_type": "image", "mime": "image/webp",
                                "width": 6, "height": 4, "duration_ms": None}),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, payload binary, media_meta struct<media_type:string,"
        "mime:string,width:int,height:int,duration_ms:long>",
    )
    [r] = extract_media_features(df).collect()
    assert r["feature_vec"] == pytest.approx(pixel_features(decode_webp(enc)))
