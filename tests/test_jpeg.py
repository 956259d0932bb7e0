"""Baseline JPEG decode: round-trip certification against an
independent spec-following ENCODER written below from ITU-T T.81
(forward DCT, quantization, zigzag, Annex K Huffman tables, byte
stuffing, DRI/RSTn) — the same strategy as tests/test_png.py: the
decoder is certified against a second implementation of the same
public spec, not against itself.

Error bounds: with an all-ones quantization table the only loss is
coefficient rounding (|e| <= a few gray levels); 4:2:0 adds chroma
box-downsample + nearest-upsample error, tested on smooth ramps.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from halvesting_geometric_ray.functions.multimodal import (
    JPEG_SIG, ZIGZAG, decode_binary, decode_jpeg, png_features)

# ---------------------------------------------------------------------------
# Annex K example Huffman tables (ITU-T T.81, public spec text)
# ---------------------------------------------------------------------------

DC_LUM_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_SYMS = list(range(12))
DC_CHR_COUNTS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_SYMS = list(range(12))
AC_LUM_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_SYMS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHR_COUNTS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_SYMS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _codes(counts, syms):
    out = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[syms[i]] = (ln, code)
            code += 1
            i += 1
        code <<= 1
    return out


def _fdct_basis():
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    A = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    A[0] *= 1.0 / np.sqrt(2.0)
    return A


_A = _fdct_basis()


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, ln):
        self.acc = (self.acc << ln) | code
        self.n += ln
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.acc &= (1 << self.n) - 1

    def align(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _cat(v):
    a = abs(int(v))
    t = 0
    while a:
        t += 1
        a >>= 1
    return t


def _enc_block(bw, blk, q, dc_codes, ac_codes, pred):
    F = _A @ (blk - 128.0) @ _A.T
    qz = np.round(F / q).astype(np.int64)
    zz = qz.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    t = _cat(diff)
    ln, code = dc_codes[t]
    bw.put(code, ln)
    if t:
        v = diff if diff >= 0 else diff + (1 << t) - 1
        bw.put(v & ((1 << t) - 1), t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _cat(v)
        ln, code = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        vv = v if v >= 0 else v + (1 << s) - 1
        bw.put(vv & ((1 << s) - 1), s)
        run = 0
    if run:
        ln, code = ac_codes[0x00]
        bw.put(code, ln)
    return int(zz[0])


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt(tid, q):
    zz = q.reshape(-1)[ZIGZAG].astype(np.uint8)
    return _seg(0xDB, bytes([tid]) + zz.tobytes())


def _dht(tc, th, counts, syms):
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms))


def _rgb_to_ycbcr(px):
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _pad(p, mh, mw):
    h, w = p.shape
    H = -(-h // mh) * mh
    W = -(-w // mw) * mw
    return np.pad(p, ((0, H - h), (0, W - w)), mode="edge")


def encode_jpeg(px, qluma, qchroma=None, subsample="444",
                restart_interval=0):
    """Reference baseline-JPEG encoder (T.81 forward path)."""
    gray = px.ndim == 2 or px.shape[2] == 1
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    h, w = px.shape[:2]
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, qluma)
    dc_l = _codes(DC_LUM_COUNTS, DC_LUM_SYMS)
    ac_l = _codes(AC_LUM_COUNTS, AC_LUM_SYMS)
    bw = _BitWriter()
    if gray:
        out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) +
                    bytes([1, 0x11, 0]))
        out += _dht(0, 0, DC_LUM_COUNTS, DC_LUM_SYMS)
        out += _dht(1, 0, AC_LUM_COUNTS, AC_LUM_SYMS)
        if restart_interval:
            out += _seg(0xDD, struct.pack(">H", restart_interval))
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        Y = _pad(px.astype(np.float64), 8, 8)
        pred = 0
        mcu = 0
        rst = 0
        for y0 in range(0, Y.shape[0], 8):
            for x0 in range(0, Y.shape[1], 8):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    bw.align()
                    bw.buf += bytes([0xFF, 0xD0 + (rst % 8)])
                    rst += 1
                    pred = 0
                mcu += 1
                pred = _enc_block(bw, Y[y0:y0 + 8, x0:x0 + 8], qluma,
                                  dc_l, ac_l, pred)
        bw.align()
        out += bw.buf + b"\xff\xd9"
        return bytes(out)

    if qchroma is None:
        qchroma = qluma
    out += _dqt(1, qchroma)
    dc_c = _codes(DC_CHR_COUNTS, DC_CHR_SYMS)
    ac_c = _codes(AC_CHR_COUNTS, AC_CHR_SYMS)
    y, cb, cr = _rgb_to_ycbcr(px)
    hs, vs = (2, 2) if subsample == "420" else (1, 1)
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) +
                bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]))
    out += _dht(0, 0, DC_LUM_COUNTS, DC_LUM_SYMS)
    out += _dht(1, 0, AC_LUM_COUNTS, AC_LUM_SYMS)
    out += _dht(0, 1, DC_CHR_COUNTS, DC_CHR_SYMS)
    out += _dht(1, 1, AC_CHR_COUNTS, AC_CHR_SYMS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    Y = _pad(y, 8 * vs, 8 * hs)
    if subsample == "420":
        cbs, crs = cb, cr
        if cbs.shape[0] % 2 or cbs.shape[1] % 2:
            cbs = _pad(cbs, 2, 2)
            crs = _pad(crs, 2, 2)
        cbs = cbs.reshape(cbs.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
        crs = crs.reshape(crs.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
        Cb, Cr = _pad(cbs, 8, 8), _pad(crs, 8, 8)
    else:
        Cb, Cr = _pad(cb, 8, 8), _pad(cr, 8, 8)
    mcux = Y.shape[1] // (8 * hs)
    mcuy = Y.shape[0] // (8 * vs)
    preds = [0, 0, 0]
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.align()
                bw.buf += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0, 0, 0]
            mcu += 1
            for by in range(vs):
                for bx in range(hs):
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    preds[0] = _enc_block(bw, Y[y0:y0 + 8, x0:x0 + 8],
                                          qluma, dc_l, ac_l, preds[0])
            preds[1] = _enc_block(bw, Cb[my * 8:my * 8 + 8,
                                         mx * 8:mx * 8 + 8],
                                  qchroma, dc_c, ac_c, preds[1])
            preds[2] = _enc_block(bw, Cr[my * 8:my * 8 + 8,
                                         mx * 8:mx * 8 + 8],
                                  qchroma, dc_c, ac_c, preds[2])
    bw.align()
    out += bw.buf + b"\xff\xd9"
    return bytes(out)




# ---------------------------------------------------------------------------
# Progressive (SOF2) reference encoder: spectral selection + successive
# approximation, written from T.81 G.1.2 (the jcphuff algorithms) as an
# independent certification partner for the progressive decode path.
# Coefficient math is shared with the baseline encoder, so
# decode(progressive(img, scans)) must be PIXEL-IDENTICAL to
# decode(baseline(img)) for any legal scan script.
# ---------------------------------------------------------------------------


# Progressive AC scans need EOBn symbols (0x10, 0x20, ...) that the
# baseline Annex K tables do not define; use a flat 9-bit canonical
# table over all 256 symbols (Kraft 256/512, no all-ones code).
AC_PROG_COUNTS = [0] * 8 + [255, 1] + [0] * 6  # DHT counts are bytes
AC_PROG_SYMS = list(range(256))  # 0xFF (r=15,s=15) unused, 10-bit


def _quant_blocks(plane, q):
    """Pad to 8 and return (bh, bw, 64) quantized coefficients in
    zigzag-index order."""
    P = _pad(plane.astype(np.float64), 8, 8)
    bh, bw = P.shape[0] // 8, P.shape[1] // 8
    out = np.zeros((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            F = _A @ (P[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0) @ _A.T
            qz = np.round(F / q).astype(np.int64)
            out[by, bx] = qz.reshape(-1)[ZIGZAG]
    return out


def _emit_vli(bw_, v, s):
    vv = v if v >= 0 else v + (1 << s) - 1
    bw_.put(vv & ((1 << s) - 1), s)


def _enc_dc_first(bw_, order, codes_by_ci, al):
    """DC first scan (Ah=0): diff coding of coef >> Al (arithmetic
    shift).  ``order`` = the scan's block sequence as (ci, block)
    pairs — true MCU interleave order for multi-component scans
    (sampling-factor blocks per MCU), plain raster for
    single-component scans."""
    preds = {}
    for ci, blk in order:
        v = int(blk[0]) >> al
        diff = v - preds.get(ci, 0)
        preds[ci] = v
        t = _cat(diff)
        ln, code = codes_by_ci[ci][t]
        bw_.put(code, ln)
        if t:
            _emit_vli(bw_, diff, t)


def _enc_dc_refine(bw_, order, al):
    for _ci, blk in order:
        bw_.put((int(blk[0]) >> al) & 1, 1)


def _enc_ac_first(bw_, blocks, ac_codes, ss, se, al):
    """Single-component AC first scan with cross-block EOBRUN
    accumulation (exercises the decoder's multi-block end-of-band
    path; max run 32767 per T.81)."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        while eobrun > 0:
            r = min(14, eobrun.bit_length() - 1)
            take = min(eobrun, (1 << (r + 1)) - 1)
            ln, code = ac_codes[r << 4]
            bw_.put(code, ln)
            if r:
                bw_.put(take - (1 << r), r)
            eobrun -= take

    for blk in blocks:
        run = 0
        emitted = False
        for k in range(ss, se + 1):
            v = int(blk[k])
            t = abs(v) >> al
            if t == 0:
                run += 1
                continue
            flush_eob()
            while run > 15:
                ln, code = ac_codes[0xF0]
                bw_.put(code, ln)
                run -= 16
            s = _cat(t)
            ln, code = ac_codes[(run << 4) | s]
            bw_.put(code, ln)
            _emit_vli(bw_, t if v >= 0 else -t, s)
            run = 0
            emitted = True
        if run or not emitted:
            eobrun += 1
    flush_eob()


def _enc_ac_refine(bw_, blocks, ac_codes, ss, se, al):
    """Single-component AC refinement scan (T.81 G.1.2.3 / jcphuff
    encode_mcu_AC_refine), per-block EOB flush.  The ZRL-emission
    loop runs at EVERY nonzero coefficient (history included), before
    that coefficient's own bit is buffered — the ordering the decoder
    relies on to pair buffered correction bits with the positions its
    advance actually passes."""
    for blk in blocks:
        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        # EOB position: index AFTER the last newly-nonzero coefficient
        eob = 0
        for i, t in enumerate(absv):
            if t == 1:
                eob = i + 1
        run = 0
        pending = []  # correction bits buffered behind the next symbol
        for i, t in enumerate(absv):
            if t == 0:
                run += 1
                continue
            # ZRLs not foldable into the EOB (k <= EOB only)
            while run > 15 and i < eob:
                ln, code = ac_codes[0xF0]
                bw_.put(code, ln)
                for b in pending:
                    bw_.put(b, 1)
                pending = []
                run -= 16
            if t > 1:  # history coefficient: buffered correction bit
                pending.append(t & 1)
                continue
            # newly nonzero (t == 1)
            ln, code = ac_codes[(run << 4) | 1]
            bw_.put(code, ln)
            bw_.put(1 if int(blk[ss + i]) >= 0 else 0, 1)
            for b in pending:
                bw_.put(b, 1)
            pending = []
            run = 0
        if run or pending:
            ln, code = ac_codes[0x00]  # EOB (EOBRUN = 1)
            bw_.put(code, ln)
            for b in pending:
                bw_.put(b, 1)


def encode_jpeg_progressive(px, qluma, qchroma=None, scans=None,
                            subsample="444"):
    """Progressive encoder.  ``scans``: list of
    (comp_idx | None, Ss, Se, Ah, Al) — comp_idx None = interleaved
    DC scan over every component (legal only for Ss == 0).  Defaults
    to a libjpeg-like script exercising spectral selection AND
    successive approximation on both DC and AC.  ``subsample``:
    "444" or "420" (luma 2x2 sampling; MCU-ordered DC interleave,
    per-component ceil-grid AC scans)."""
    gray = px.ndim == 2 or px.shape[2] == 1
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    h, w = px.shape[:2]
    if scans is None:
        if gray:
            scans = [(None, 0, 0, 0, 1), (None, 0, 0, 1, 0),
                     (0, 1, 5, 0, 2), (0, 6, 63, 0, 2),
                     (0, 1, 63, 2, 1), (0, 1, 63, 1, 0)]
        else:
            scans = [(None, 0, 0, 0, 1), (None, 0, 0, 1, 0)]
            for c in range(3):
                scans += [(c, 1, 5, 0, 1), (c, 6, 63, 0, 1)]
            for c in range(3):
                scans += [(c, 1, 63, 1, 0)]
    out = bytearray(b"\xff\xd8")
    out += _dqt(0, qluma)
    dc_l = _codes(DC_LUM_COUNTS, DC_LUM_SYMS)
    ac_p = _codes(AC_PROG_COUNTS, AC_PROG_SYMS)
    if gray:
        comps_blocks = [_quant_blocks(px, qluma)]
        samp = [(1, 1)]
        dc_codes = [dc_l]
        ac_codes = [ac_p]
        sof_comps = bytes([1, 0x11, 0])
        scan_ids = [(1, 0, 0)]
        out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + sof_comps)
        out += _dht(0, 0, DC_LUM_COUNTS, DC_LUM_SYMS)
        out += _dht(1, 0, AC_PROG_COUNTS, AC_PROG_SYMS)
    else:
        if qchroma is None:
            qchroma = qluma
        out += _dqt(1, qchroma)
        dc_c = _codes(DC_CHR_COUNTS, DC_CHR_SYMS)
        y, cb, cr = _rgb_to_ycbcr(px)
        hs, vs = (2, 2) if subsample == "420" else (1, 1)
        if subsample == "420":
            Y = _pad(y, 16, 16)
            cbs, crs = cb, cr
            if cbs.shape[0] % 2 or cbs.shape[1] % 2:
                cbs = _pad(cbs, 2, 2)
                crs = _pad(crs, 2, 2)
            cbs = cbs.reshape(cbs.shape[0] // 2, 2, -1, 2).mean(
                axis=(1, 3))
            crs = crs.reshape(crs.shape[0] // 2, 2, -1, 2).mean(
                axis=(1, 3))
            comps_blocks = [_quant_blocks(Y, qluma),
                            _quant_blocks(cbs, qchroma),
                            _quant_blocks(crs, qchroma)]
        else:
            comps_blocks = [_quant_blocks(y, qluma),
                            _quant_blocks(cb, qchroma),
                            _quant_blocks(cr, qchroma)]
        samp = [(hs, vs), (1, 1), (1, 1)]
        dc_codes = [dc_l, dc_c, dc_c]
        ac_codes = [ac_p, ac_p, ac_p]
        out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, 3) +
                    bytes([1, (hs << 4) | vs, 0,
                           2, 0x11, 1, 3, 0x11, 1]))
        out += _dht(0, 0, DC_LUM_COUNTS, DC_LUM_SYMS)
        out += _dht(1, 0, AC_PROG_COUNTS, AC_PROG_SYMS)
        out += _dht(0, 1, DC_CHR_COUNTS, DC_CHR_SYMS)
        out += _dht(1, 1, AC_PROG_COUNTS, AC_PROG_SYMS)
        scan_ids = [(1, 0, 0), (2, 1, 1), (3, 1, 1)]
    hmax = max(hv for hv, _ in samp)
    vmax = max(vv for _, vv in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def mcu_order(idxs):
        order = []
        for my in range(mcuy):
            for mx in range(mcux):
                for c in idxs:
                    chs, cvs = samp[c]
                    B = comps_blocks[c]
                    for by in range(cvs):
                        for bx in range(chs):
                            order.append(
                                (c, B[my * cvs + by, mx * chs + bx]))
        return order

    def comp_grid(c):
        """Non-interleaved ceil-8 block subgrid of component c."""
        chs, cvs = samp[c]
        cw = -(-w * chs // hmax)
        ch = -(-h * cvs // vmax)
        B = comps_blocks[c]
        return B[:-(-ch // 8), :-(-cw // 8)].reshape(-1, 64)

    for comp, ss, se, ah, al in scans:
        bw_ = _BitWriter()
        if ss == 0:
            idxs = (list(range(len(comps_blocks)))
                    if comp is None else [comp])
            hdr = bytes([len(idxs)]) + b"".join(
                bytes([scan_ids[c][0], scan_ids[c][1] << 4])
                for c in idxs) + bytes([0, 0, (ah << 4) | al])
            out += _seg(0xDA, hdr)
            if len(idxs) > 1:
                order = mcu_order(idxs)
            else:  # non-interleaved single-component DC scan
                order = [(idxs[0], blk) for blk in comp_grid(idxs[0])]
            if ah == 0:
                _enc_dc_first(bw_, order, dc_codes, al)
            else:
                _enc_dc_refine(bw_, order, al)
        else:
            c = comp
            hdr = bytes([1, scan_ids[c][0], scan_ids[c][2]]) + \
                bytes([ss, se, (ah << 4) | al])
            out += _seg(0xDA, hdr)
            if ah == 0:
                _enc_ac_first(bw_, comp_grid(c), ac_codes[c], ss, se,
                              al)
            else:
                _enc_ac_refine(bw_, comp_grid(c), ac_codes[c], ss, se,
                               al)
        bw_.align()
        out += bw_.buf
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

Q1 = np.ones((8, 8), dtype=np.int32)


def test_constant_gray_exact():
    img = np.full((16, 16), 130, dtype=np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(img, Q1))
    assert (w, h, c) == (16, 16, 1)
    assert np.abs(px[:, :, 0].astype(int) - 130).max() <= 1


def test_random_gray_q1_tight():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(img, Q1))
    assert (w, h, c) == (17, 24, 1)
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 3


def test_random_rgb_444_q1_tight():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (19, 21, 3), dtype=np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(img, Q1))
    assert (w, h, c) == (21, 19, 3)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 4


def test_smooth_rgb_420():
    img = np.stack(
        [np.linspace(0, 200, 30)[None, :].repeat(33, 0),
         np.linspace(50, 180, 33)[:, None].repeat(30, 1),
         np.full((33, 30), 90.0)], axis=2).astype(np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(img, Q1, subsample="420"))
    assert (w, h, c) == (30, 33, 3)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 8


def test_restart_markers_gray_and_420():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(img, Q1, restart_interval=3))
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 3
    rgb = img[:, :, None].repeat(3, 2)
    w, h, c, px = decode_jpeg(
        encode_jpeg(rgb, Q1, subsample="420", restart_interval=2))
    assert (w, h, c) == (40, 40, 3)
    # gray input -> chroma is flat 128, so 4:2:0 loses nothing; luma
    # round-trips within coefficient rounding + color-transform rounding
    assert np.abs(px.astype(int) - rgb.astype(int)).max() <= 6


def test_coarse_quant_bounded():
    img = np.stack(
        [np.linspace(50, 180, 33)[:, None].repeat(30, 1)],
        axis=2)[..., 0].astype(np.uint8)
    QL = np.full((8, 8), 16, dtype=np.int32)
    w, h, c, px = decode_jpeg(encode_jpeg(img, QL))
    # error bounded by quant-step rounding, q/2 per coefficient
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 24


def test_rejects():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # lossless (SOF3) refused — progressive (SOF2) now decodes; its
    # malformed-scan rejection lives in the progressive test block
    img = np.full((8, 8), 99, dtype=np.uint8)
    data = bytearray(encode_jpeg(img, Q1))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC3
    with pytest.raises(ValueError, match="sequential"):
        decode_jpeg(bytes(data))


def test_decode_stage_real_jpeg(ray_session):
    """mode='real' DecodeStage routes JPEG payloads through decode_jpeg."""
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
            for _ in range(4)]
    rows = [{"url": f"u{i}", "html": encode_jpeg(im, Q1)}
            for i, im in enumerate(imgs)]
    out = decode_binary(rd.from_arrow(pa.Table.from_pylist(rows)),
                        mode="real", batch_size=2).to_pandas()
    out = out.sort_values("url").reset_index(drop=True)
    for i, im in enumerate(imgs):
        assert out.loc[i, "width"] == 24
        assert out.loc[i, "height"] == 16
        _, _, _, px = decode_jpeg(rows[i]["html"])
        np.testing.assert_allclose(np.asarray(out.loc[i, "features"]),
                                   png_features(px))


# ---------------------------------------------------------------------------
# progressive tests: decode(progressive) must be PIXEL-IDENTICAL to
# decode(baseline) — identical quantized coefficients by construction
# ---------------------------------------------------------------------------


def _prog_equals_baseline(img, scans=None, q=None, qc=None):
    q = Q1 if q is None else q
    base = decode_jpeg(encode_jpeg(img, q, qchroma=qc))[3]
    prog = decode_jpeg(encode_jpeg_progressive(img, q, qchroma=qc,
                                               scans=scans))[3]
    np.testing.assert_array_equal(prog, base)


def test_progressive_gray_default_script():
    # default script: DC SA (Al=1 -> refine), AC spectral bands at
    # Al=2, then two AC refinement passes (2->1->0)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    _prog_equals_baseline(img)


def test_progressive_gray_spectral_only():
    # pure spectral selection, no successive approximation
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    _prog_equals_baseline(img, scans=[
        (None, 0, 0, 0, 0), (0, 1, 2, 0, 0), (0, 3, 20, 0, 0),
        (0, 21, 63, 0, 0)])


def test_progressive_gray_eobrun_accumulation():
    # smooth image, coarse quant -> long zero bands -> multi-block
    # EOBRUN symbols in the AC-first scans
    x = np.linspace(0, 40, 64)
    img = (120 + np.add.outer(x, x) / 2).astype(np.uint8)
    q = np.full((8, 8), 24, dtype=np.int32)
    _prog_equals_baseline(img, q=q)
    _prog_equals_baseline(img, q=q, scans=[
        (None, 0, 0, 0, 0), (0, 1, 63, 0, 1), (0, 1, 63, 1, 0)])


def test_progressive_color_444():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (19, 26, 3), dtype=np.uint8)
    _prog_equals_baseline(img)


def test_progressive_color_custom_tables():
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    ql = np.full((8, 8), 3, dtype=np.int32)
    qc = np.full((8, 8), 5, dtype=np.int32)
    _prog_equals_baseline(img, q=ql, qc=qc)


def test_progressive_deep_sa_ladder():
    # three successive-approximation refinement levels on AC
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    _prog_equals_baseline(img, scans=[
        (None, 0, 0, 0, 2), (None, 0, 0, 2, 1), (None, 0, 0, 1, 0),
        (0, 1, 63, 0, 3), (0, 1, 63, 3, 2), (0, 1, 63, 2, 1),
        (0, 1, 63, 1, 0)])


def test_progressive_decode_stage_routes():
    # mode='real' DecodeStage handles SOF2 payloads now
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    data = encode_jpeg_progressive(img, Q1)
    w, h, c, px = decode_jpeg(data)
    assert (w, h, c) == (16, 16, 1)
    base = decode_jpeg(encode_jpeg(img, Q1))[3]
    np.testing.assert_array_equal(px, base)


def test_progressive_malformed_scan_rejected():
    # a baseline stream relabeled SOF2 carries an interleaved
    # full-band scan — illegal in progressive; must be refused
    img = np.full((8, 8), 99, dtype=np.uint8)
    data = bytearray(encode_jpeg(img, Q1))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_progressive_420_matches_baseline_420():
    # subsampled progressive: MCU-ordered interleaved DC + ceil-grid
    # AC scans; coefficients identical to the baseline 4:2:0 encoder
    rng = np.random.default_rng(13)
    base_img = rng.integers(60, 196, (3, 4, 3))
    img = np.repeat(np.repeat(base_img, 7, axis=0), 5,
                    axis=1).astype(np.uint8)  # 21 x 20, smooth-ish
    base = decode_jpeg(encode_jpeg(img, Q1, subsample="420"))[3]
    prog = decode_jpeg(encode_jpeg_progressive(
        img, Q1, subsample="420"))[3]
    np.testing.assert_array_equal(prog, base)


def test_progressive_noninterleaved_dc_scans():
    # per-component DC scans (ns=1, the non-interleaved DC grid path)
    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (17, 18, 3), dtype=np.uint8)
    scans = ([(c, 0, 0, 0, 1) for c in range(3)]
             + [(c, 0, 0, 1, 0) for c in range(3)]
             + [(c, 1, 63, 0, 0) for c in range(3)])
    _prog_equals_baseline(img, scans=scans)
    gimg = rng.integers(0, 256, (12, 9), dtype=np.uint8)
    _prog_equals_baseline(gimg, scans=[
        (0, 0, 0, 0, 0), (0, 1, 63, 0, 0)])
