"""Pure-stdlib/numpy baseline JPEG codec (decode + fixture encoder).

The baseline sequential DCT JPEG profile is public knowledge (ITU-T T.81 /
ISO 10918-1): marker segments, canonical Huffman tables, DC prediction +
run-length AC coding, zigzag scan, uniform dequantization, 8x8 inverse
DCT-II, JFIF YCbCr→RGB. This module implements exactly that profile:

  * decode: 8-bit sequential (SOF0/SOF1) AND progressive (SOF2 — T.81
    annex G: spectral selection, successive approximation, EOB runs,
    per-scan table snapshots), 1 or 3 components, any integer sampling
    factors whose ratio to the max divides evenly (covers 4:4:4, 4:2:2,
    4:2:0), restart markers, byte stuffing. Hierarchical/lossless SOFs
    and arithmetic coding raise NotImplementedError — an honest
    boundary, like the PNG module's non-8-bit profiles.
  * encode: the test/fixture counterparts (same role as ``encode_png``):
    baseline JPEG — and ``encode_jpeg_progressive``, carrying the SAME
    quantized coefficients across a multi-scan script — with a uniform
    quantization value (quant=1 is near-lossless — only DCT float
    rounding), optional 2x2 chroma subsampling and restart intervals,
    and "flat" canonical Huffman tables (all 256 AC symbols at 8-9 bits;
    valid per the spec since the all-ones code is never assigned). Poor
    compression, trivially correct — the decoder still exercises real
    canonical-Huffman construction, real bit unstuffing and real
    dequant/IDCT on its output, and progressive-vs-baseline decode
    equality is the forward oracle.

No reference-repo analog: the reference treats media as an opaque
external boundary; this exists so the multimodal plumbing's "decode"
stage is real for the two dominant web image formats (PNG + JPEG).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SIGNATURE = b"\xff\xd8"

# scan position -> natural (row-major) position, ITU-T T.81 figure A.6
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8x8 DCT-II matrix: spatial = M.T @ coeffs @ M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    for _x in range(8):
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _build_huffman(counts: list[int], symbols: list[int]):
    """Canonical JPEG Huffman table -> ({(length, code): symbol} for the
    decoder, {symbol: (code, length)} for the encoder)."""
    if sum(counts) > len(symbols):
        raise ValueError("truncated JPEG Huffman table")
    decode: dict[tuple[int, int], int] = {}
    encode: dict[int, tuple[int, int]] = {}
    code = 0
    it = iter(symbols)
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            sym = next(it)
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            code += 1
        code <<= 1
    return decode, encode


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG bitstream exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    # T.81 F.2.2.1: map the t-bit magnitude code to a signed value
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def jpeg_dimensions(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the SOF header — no entropy decode."""
    if not payload.startswith(JPEG_SIGNATURE):
        return None
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > len(payload):
                return None
            h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
            return (int(w), int(h))
        i += 2 + seglen
    return None


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> uint8 array (H, W, C), C in {1, 3}.

    3-component images are converted JFIF YCbCr -> RGB (BT.601 constants,
    round + clip); 1-component images return grayscale."""
    if not payload.startswith(JPEG_SIGNATURE):
        raise ValueError("not a JPEG payload")
    try:
        return _decode_jpeg_inner(payload)
    except (struct.error, IndexError, KeyError, StopIteration) as exc:
        # malformed-stream shapes surface as data errors (the module's
        # contract), never as implementation-detail exception types
        raise ValueError(f"malformed JPEG: {type(exc).__name__}: {exc}") from exc


def _entropy_segments(data: bytes, p: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes starting at ``p``: unstuff 0xFF00, split on
    RSTn markers, stop at any other marker. Returns (segments,
    next_marker_pos)."""
    segments: list[bytes] = []
    cur = bytearray()
    while p < len(data):
        b = data[p]
        if b == 0xFF and p + 1 < len(data):
            m = data[p + 1]
            if m == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break
        cur.append(b)
        p += 1
    segments.append(bytes(cur))
    return segments, p


def _decode_jpeg_inner(payload: bytes) -> np.ndarray:
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (w, h, [(cid, hs, vs, tq)])
    restart_interval = 0
    scan = None
    progressive = False
    scans: list = []  # (sel, Ss, Se, Ah, Al, segments, htables@scan, DRI)

    i = 2
    data = payload
    while i + 2 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if i + 2 > len(data):
            raise ValueError("truncated JPEG marker segment")
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                if prec == 0:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                    p += 64
                else:
                    vals = np.frombuffer(seg[p : p + 128], dtype=">u2")
                    p += 128
                nat = np.zeros(64, dtype=np.float64)
                nat[ZIGZAG] = vals.astype(np.float64)  # DQT rides zigzag
                qtables[tid] = nat
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tclass, tid = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + nsym])
                htables[(tclass, tid)], _ = _build_huffman(counts, symbols)
                p += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 seq, SOF2 progressive
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} != 8")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 15, tq))
            frame = (int(w), int(h), comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG (SOF marker 0xFF{marker:02X}): only "
                "sequential (SOF0/SOF1) and progressive (SOF2) Huffman "
                "coding is supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tabs >> 4, tabs & 15)
            segments, p = _entropy_segments(data, i + seglen)
            if progressive:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                aa = seg[3 + 2 * ns]
                # tables may be redefined between scans: snapshot them
                scans.append((sel, ss, se, aa >> 4, aa & 15, segments,
                              dict(htables), restart_interval))
                i = p
                continue
            scan = (sel, segments)
            break
        i += seglen

    if frame is None or (scan is None and not scans):
        raise ValueError("truncated JPEG: missing SOF or SOS")
    w, h, comps = frame
    if w == 0 or h == 0:
        raise ValueError("empty JPEG")
    if len(comps) not in (1, 3):
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    if progressive:
        planes = _progressive_planes(
            w, h, comps, qtables, scans, mcux, mcuy, hmax, vmax
        )
        return _finish_planes(planes, comps, w, h, hmax, vmax)

    sel, segments = scan
    planes = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    seg_idx = 0
    reader = _BitReader(segments[0])
    mcu_in_interval = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_interval == restart_interval:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("JPEG: missing restart segment")
                reader = _BitReader(segments[seg_idx])
                pred = {cid: 0 for cid, *_ in comps}
                mcu_in_interval = 0
            mcu_in_interval += 1
            for cid, hs, vs, tq in comps:
                dc_tab = htables.get((0, sel[cid][0]))
                ac_tab = htables.get((1, sel[cid][1]))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("JPEG: missing Huffman table")
                q = qtables.get(tq)
                if q is None:
                    raise ValueError("JPEG: missing quantization table")
                for by in range(vs):
                    for bx in range(hs):
                        t = _decode_symbol(reader, dc_tab)
                        pred[cid] += _extend(reader.read_bits(t), t)
                        coef = np.zeros(64, dtype=np.float64)
                        coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(reader, ac_tab)
                            run, size = rs >> 4, rs & 15
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            coef[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        nat = np.zeros(64, dtype=np.float64)
                        nat[ZIGZAG] = coef
                        block = _M.T @ (nat * q).reshape(8, 8) @ _M
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block

    return _finish_planes(planes, comps, w, h, hmax, vmax)


def _finish_planes(planes, comps, w: int, h: int, hmax: int, vmax: int) -> np.ndarray:
    """Shared decode tail: level shift, chroma upsample, crop, YCbCr→RGB."""
    out_planes = []
    for cid, hs, vs, _ in comps:
        p = planes[cid] + 128.0
        sy, sx = vmax // vs, hmax // hs
        if vmax % vs or hmax % hs:
            raise NotImplementedError("non-integer JPEG sampling ratio")
        if sy > 1:
            p = np.repeat(p, sy, axis=0)
        if sx > 1:
            p = np.repeat(p, sx, axis=1)
        out_planes.append(p[:h, :w])

    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _refine_ac_block(reader: _BitReader, ac_tab, blk, ss: int, se: int,
                     al: int, eobrun: int) -> int:
    """One block of an AC successive-approximation refinement scan
    (T.81 G.1.2.3 decode side). ``blk`` holds the coefficients known so
    far (zigzag order); a position is "history-nonzero" iff its stored
    value is nonzero, and every history-nonzero position visited costs
    one correction bit. Returns the remaining EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(reader, ac_tab)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history positions below
            else:
                if s != 1:
                    raise ValueError("JPEG AC refinement size != 1")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if reader.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if reader.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_planes(w, h, comps, qtables, scans, mcux, mcuy, hmax, vmax):
    """Accumulate coefficients across progressive scans (T.81 G.2), then
    dequantize + IDCT once. Scan kinds: DC first/refine (interleaved or
    single-component), AC first/refine (single-component by spec, over
    the component's own ceil(size/8) block grid — MCU-padding blocks
    stay DC-only, which is invisible after the crop)."""
    samp = {cid: (hs, vs) for cid, hs, vs, _ in comps}
    tqmap = {cid: tq for cid, _, _, tq in comps}
    bdims = {}
    for cid, hs, vs, _ in comps:
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        bdims[cid] = (-(-ch // 8), -(-cw // 8))
    coefs = {
        cid: np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int64)
        for cid, hs, vs, _ in comps
    }
    for sel, ss, se, ah, al, segments, htabs, ri in scans:
        order = list(sel)
        state = {
            "seg": 0, "reader": _BitReader(segments[0]),
            "count": 0, "eobrun": 0,
            "pred": {cid: 0 for cid in order},
        }

        def _maybe_restart(st=state, segs=segments, ival=ri, ordr=order):
            if ival and st["count"] == ival:
                st["seg"] += 1
                if st["seg"] >= len(segs):
                    raise ValueError("JPEG: missing restart segment")
                st["reader"] = _BitReader(segs[st["seg"]])
                st["count"] = 0
                st["eobrun"] = 0
                st["pred"] = {cid: 0 for cid in ordr}
            st["count"] += 1

        if ss == 0:  # DC scan
            if se != 0:
                raise ValueError("JPEG progressive DC scan with Se != 0")
            p1 = 1 << al

            def _dc_block(cid, blk, st=state, first=(ah == 0), al=al, p1=p1,
                          htabs=htabs, sel=sel):
                if first:
                    dc_tab = htabs.get((0, sel[cid][0]))
                    if dc_tab is None:
                        raise ValueError("JPEG: missing Huffman table")
                    t = _decode_symbol(st["reader"], dc_tab)
                    st["pred"][cid] += _extend(st["reader"].read_bits(t), t)
                    blk[0] = st["pred"][cid] << al
                elif st["reader"].read_bit():
                    blk[0] |= p1

            if len(order) > 1:  # interleaved over the MCU grid
                for my in range(mcuy):
                    for mx in range(mcux):
                        _maybe_restart()
                        for cid in order:
                            hs, vs = samp[cid]
                            for by in range(vs):
                                for bx in range(hs):
                                    _dc_block(
                                        cid,
                                        coefs[cid][my * vs + by, mx * hs + bx],
                                    )
            else:
                cid = order[0]
                bh, bw = bdims[cid]
                for idx in range(bh * bw):
                    _maybe_restart()
                    by, bx = divmod(idx, bw)
                    _dc_block(cid, coefs[cid][by, bx])
        else:  # AC scan
            if len(order) != 1:
                raise ValueError(
                    "JPEG progressive AC scan must be single-component"
                )
            cid = order[0]
            ac_tab = htabs.get((1, sel[cid][1]))
            if ac_tab is None:
                raise ValueError("JPEG: missing Huffman table")
            bh, bw = bdims[cid]
            for idx in range(bh * bw):
                _maybe_restart()
                by, bx = divmod(idx, bw)
                blk = coefs[cid][by, bx]
                reader = state["reader"]
                if ah == 0:  # first scan: values arrive << Al, EOB runs
                    if state["eobrun"]:
                        state["eobrun"] -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _decode_symbol(reader, ac_tab)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.read_bits(r)
                                state["eobrun"] = eobrun
                                break
                            k += 16
                        else:
                            k += r
                            if k > se:
                                raise ValueError("JPEG AC run overflow")
                            blk[k] = _extend(reader.read_bits(s), s) << al
                            k += 1
                else:
                    state["eobrun"] = _refine_ac_block(
                        reader, ac_tab, blk, ss, se, al, state["eobrun"]
                    )

    planes = {}
    for cid, hs, vs, _tq in comps:
        q = qtables.get(tqmap[cid])
        if q is None:
            raise ValueError("JPEG: missing quantization table")
        arr = coefs[cid]
        nby, nbx = arr.shape[0], arr.shape[1]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        for by in range(nby):
            for bx in range(nbx):
                nat = np.zeros(64, dtype=np.float64)
                nat[ZIGZAG] = arr[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _M.T @ (nat * q).reshape(8, 8) @ _M
                )
        planes[cid] = plane
    return planes


# --------------------------------------------------------------------------
# fixture encoder
# --------------------------------------------------------------------------

# "flat" canonical tables: DC symbols 0..11 (11 codes at 4 bits + 1 at 5),
# AC symbols 0..255 (255 codes at 8 bits + 1 at 9) — the all-ones code of
# each length is never assigned, as T.81 requires
_DC_COUNTS = [0, 0, 0, 11, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMBOLS = list(range(12))
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
_AC_SYMBOLS = list(range(256))
_, _DC_ENC = _build_huffman(_DC_COUNTS, _DC_SYMBOLS)
_, _AC_ENC = _build_huffman(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(w: _BitWriter, scan_coef: np.ndarray, pred: int) -> int:
    dc = int(scan_coef[0])
    diff = dc - pred
    t = _category(diff)
    code, length = _DC_ENC[t]
    w.write(code, length)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if scan_coef[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(scan_coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_ENC[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        s = _category(v)
        c, ln = _AC_ENC[(run << 4) | s]
        w.write(c, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, ln = _AC_ENC[0x00]  # EOB
        w.write(c, ln)
    return dc


def _pad_to(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // bh) * bh
    pw = -(-w // bw) * bw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _fixture_prep(img: np.ndarray, quant: int, subsample: bool):
    """Shared front half of both fixture encoders: color transform,
    optional 4:2:0 subsampling, padding, forward DCT + quantization.
    Returns (comps, blocks, h, w, mcux, mcuy) where blocks[cid] is the
    (mcu-grid) array of zigzag-order quantized coefficient vectors."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if h == 0 or w == 0 or c not in (1, 3):
        raise ValueError(f"unsupported fixture image shape {arr.shape}")
    if not 1 <= int(quant) <= 255:
        raise ValueError("quant must be in [1, 255]")

    if c == 3:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        if subsample:
            comps = [(1, 2, 2, 0, y), (2, 1, 1, 0, cb), (3, 1, 1, 0, cr)]
        else:
            comps = [(1, 1, 1, 0, y), (2, 1, 1, 0, cb), (3, 1, 1, 0, cr)]
    else:
        comps = [(1, 1, 1, 0, arr[:, :, 0].astype(np.float64))]
        subsample = False

    hmax = max(x[1] for x in comps)
    vmax = max(x[2] for x in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    q_nat = np.full(64, float(int(quant)))
    # per-component padded (and possibly subsampled) planes + their
    # quantized scan-order coefficients per block
    blocks: dict[int, np.ndarray] = {}
    for cid, hs, vs, _tq, plane in comps:
        if (hs, vs) != (hmax, vmax):
            sy, sx = vmax // vs, hmax // hs
            p = _pad_to(plane, sy, sx)  # divisible for the mean-pool reshape
            p = p.reshape(p.shape[0] // sy, sy, p.shape[1] // sx, sx).mean(axis=(1, 3))
        else:
            p = plane.astype(np.float64)
        p = np.pad(
            p,
            ((0, mcuy * vs * 8 - p.shape[0]), (0, mcux * hs * 8 - p.shape[1])),
            mode="edge",
        )
        nby, nbx = p.shape[0] // 8, p.shape[1] // 8
        coefs = np.empty((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                fc = (_M @ block @ _M.T).reshape(64) / q_nat
                # scan[k] = natural[ZIGZAG[k]]
                coefs[by, bx] = np.round(fc).astype(np.int64).take(ZIGZAG)
        blocks[cid] = coefs
    return comps, blocks, h, w, mcux, mcuy


def _chunk(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray, *, quant: int = 1, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG fixture encoder for uint8 (H, W), (H, W, 1) gray or
    (H, W, 3) RGB arrays. ``quant=1`` is near-lossless (DCT rounding
    only); ``subsample=True`` averages chroma 2x2 (4:2:0);
    ``restart_interval`` > 0 emits DRI + RSTn markers."""
    comps, blocks, h, w, mcux, mcuy = _fixture_prep(img, quant, subsample)
    chunk = _chunk

    out = bytearray(b"\xff\xd8")
    zz_q = np.empty(64, dtype=np.uint8)
    zz_q[:] = int(quant)
    out += chunk(0xDB, bytes([0x00]) + zz_q.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, _tq, _p in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += chunk(0xC0, sof)
    out += chunk(0xC4, bytes([0x00] + _DC_COUNTS) + bytes(_DC_SYMBOLS))
    out += chunk(0xC4, bytes([0x10] + _AC_COUNTS) + bytes(_AC_SYMBOLS))
    if restart_interval:
        out += chunk(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += chunk(0xDA, sos)

    writer = _BitWriter()
    pred = {cid: 0 for cid, *_ in comps}
    mcu_in_interval = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_interval == restart_interval:
                writer.flush()
                out += writer.out
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                writer = _BitWriter()
                pred = {cid: 0 for cid, *_ in comps}
                mcu_in_interval = 0
            mcu_in_interval += 1
            for cid, hs, vs, _tq, _p in comps:
                for by in range(vs):
                    for bx in range(hs):
                        pred[cid] = _encode_block(
                            writer, blocks[cid][my * vs + by, mx * hs + bx], pred[cid]
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# progressive fixture encoder (T.81 annex G encode side)
# --------------------------------------------------------------------------


class _EobState:
    """Pending EOB run + the correction bits buffered behind it (encode
    side of T.81 G.1.2.3: bits from blocks inside an EOB run are emitted
    only after the EOBn symbol that closes the run)."""

    __slots__ = ("eobrun", "be")

    def __init__(self) -> None:
        self.eobrun = 0
        self.be: list[int] = []

    def flush(self, wtr: _BitWriter) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            c, ln = _AC_ENC[r << 4]
            wtr.write(c, ln)
            if r:
                wtr.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.be:
            wtr.write(b, 1)
        self.be = []

    def bump(self, wtr: _BitWriter, br: list[int]) -> None:
        self.eobrun += 1
        self.be.extend(br)
        if self.eobrun == 0x7FFF:  # EOB14 ceiling
            self.flush(wtr)


def _enc_ac_first(wtr: _BitWriter, blk, ss: int, se: int, al: int,
                  st: _EobState) -> None:
    vals = []
    for k in range(ss, se + 1):
        v = int(blk[k])
        a = abs(v) >> al
        vals.append(-a if v < 0 else a)
    last = -1
    for i in range(len(vals) - 1, -1, -1):
        if vals[i]:
            last = i
            break
    if last < 0:
        st.bump(wtr, [])
        return
    st.flush(wtr)
    run = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_ENC[0xF0]  # ZRL
            wtr.write(c, ln)
            run -= 16
        s = _category(v)
        c, ln = _AC_ENC[(run << 4) | s]
        wtr.write(c, ln)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < se - ss:
        st.bump(wtr, [])


def _enc_ac_refine(wtr: _BitWriter, blk, ss: int, se: int, al: int,
                   st: _EobState) -> None:
    """Encode side of the refinement algorithm _refine_ac_block decodes:
    runs count only never-significant (t==0) positions, already-nonzero
    positions contribute one buffered correction bit, newly-significant
    magnitudes are exactly 1 with the sign sent as one raw bit, and
    trailing content folds into the cross-block EOB run."""
    absv = []
    sign = []
    for k in range(ss, se + 1):
        v = int(blk[k])
        absv.append(abs(v) >> al)
        sign.append(1 if v >= 0 else 0)
    eob = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    run = 0
    br: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            st.flush(wtr)
            c, ln = _AC_ENC[0xF0]
            wtr.write(c, ln)
            run -= 16
            for b in br:
                wtr.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        st.flush(wtr)
        c, ln = _AC_ENC[(run << 4) | 1]
        wtr.write(c, ln)
        wtr.write(sign[i], 1)
        for b in br:
            wtr.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        st.bump(wtr, br)


def encode_jpeg_progressive(
    img: np.ndarray, *, quant: int = 1, subsample: bool = False,
    restart_interval: int = 0, scans=None,
) -> bytes:
    """Progressive (SOF2) JPEG fixture encoder — the test counterpart of
    the progressive decode path, same role as ``encode_jpeg``. Carries
    exactly the same quantized coefficients as the baseline encoder
    (shared ``_fixture_prep``), split across spectral-selection +
    successive-approximation scans, so
    ``decode_jpeg(encode_jpeg_progressive(img, quant=q)) ==
    decode_jpeg(encode_jpeg(img, quant=q))`` bit-exactly — the forward
    oracle the tests pin.

    ``scans`` overrides the scan script: a list of
    (component_indices, Ss, Se, Ah, Al) tuples; refinement scans must
    step Al by one (Ah == Al+1). The default script exercises every
    decoder path: interleaved DC first + refine, split spectral bands,
    and per-component AC refinement."""
    comps, blocks, h, w, mcux, mcuy = _fixture_prep(img, quant, subsample)
    ncomp = len(comps)
    hmax = max(x[1] for x in comps)
    vmax = max(x[2] for x in comps)
    bdims = []
    for cid, hs, vs, _tq, _p in comps:
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        bdims.append((-(-ch // 8), -(-cw // 8)))
    if scans is None:
        if ncomp == 1:
            scans = [
                ((0,), 0, 0, 0, 1), ((0,), 0, 0, 1, 0),
                ((0,), 1, 5, 0, 1), ((0,), 6, 63, 0, 1),
                ((0,), 1, 63, 1, 0),
            ]
        else:
            scans = [
                ((0, 1, 2), 0, 0, 0, 1), ((0, 1, 2), 0, 0, 1, 0),
                ((0,), 1, 5, 0, 1), ((0,), 6, 63, 0, 1),
                ((1,), 1, 63, 0, 1), ((2,), 1, 63, 0, 1),
                ((0,), 1, 63, 1, 0), ((1,), 1, 63, 1, 0),
                ((2,), 1, 63, 1, 0),
            ]

    out = bytearray(b"\xff\xd8")
    zz_q = np.empty(64, dtype=np.uint8)
    zz_q[:] = int(quant)
    out += _chunk(0xDB, bytes([0x00]) + zz_q.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid, hs, vs, _tq, _p in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += _chunk(0xC2, sof)
    out += _chunk(0xC4, bytes([0x00] + _DC_COUNTS) + bytes(_DC_SYMBOLS))
    out += _chunk(0xC4, bytes([0x10] + _AC_COUNTS) + bytes(_AC_SYMBOLS))
    if restart_interval:
        out += _chunk(0xDD, struct.pack(">H", restart_interval))

    for comp_idxs, ss, se, ah, al in scans:
        # T.81: the modulo-8 restart count restarts at RST0 at the start
        # of EVERY scan — a counter carried across scans desyncs strict
        # decoders (libjpeg verifies the sequence)
        rst = 0
        sos = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            sos += bytes([comps[ci][0], 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _chunk(0xDA, sos)

        wtr = _BitWriter()
        st = _EobState()
        pred = {comps[ci][0]: 0 for ci in comp_idxs}
        count = 0

        def _restart_if_due():
            nonlocal wtr, st, pred, count, rst, out
            if restart_interval and count == restart_interval:
                st.flush(wtr)
                wtr.flush()
                out += wtr.out
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                wtr = _BitWriter()
                st = _EobState()
                pred = {comps[ci][0]: 0 for ci in comp_idxs}
                count = 0
            count += 1

        def _dc_unit(cid, blk):
            dc = int(blk[0]) >> al
            if ah == 0:
                diff = dc - pred[cid]
                pred[cid] = dc
                t = _category(diff)
                c, ln = _DC_ENC[t]
                wtr.write(c, ln)
                if t:
                    wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            else:
                wtr.write(dc & 1, 1)

        if ss == 0:  # DC scan
            if len(comp_idxs) > 1:  # interleaved over the MCU grid
                for my in range(mcuy):
                    for mx in range(mcux):
                        _restart_if_due()
                        for ci in comp_idxs:
                            cid, hs, vs, _tq, _p = comps[ci]
                            for by in range(vs):
                                for bx in range(hs):
                                    _dc_unit(
                                        cid,
                                        blocks[cid][my * vs + by, mx * hs + bx],
                                    )
            else:
                ci = comp_idxs[0]
                cid = comps[ci][0]
                bh, bw = bdims[ci]
                for idx in range(bh * bw):
                    _restart_if_due()
                    by, bx = divmod(idx, bw)
                    _dc_unit(cid, blocks[cid][by, bx])
        else:  # AC scan: single component, its own block grid
            if len(comp_idxs) != 1:
                raise ValueError("progressive AC scan must be single-component")
            ci = comp_idxs[0]
            cid = comps[ci][0]
            bh, bw = bdims[ci]
            for idx in range(bh * bw):
                _restart_if_due()
                by, bx = divmod(idx, bw)
                blk = blocks[cid][by, bx]
                if ah == 0:
                    _enc_ac_first(wtr, blk, ss, se, al, st)
                else:
                    _enc_ac_refine(wtr, blk, ss, se, al, st)
        st.flush(wtr)
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
