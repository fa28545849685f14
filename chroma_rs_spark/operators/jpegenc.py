"""Greyscale JPEG ENCODERS (ITU T.81 annexes C/F/G — public spec):
baseline (SOF0) and progressive (SOF2, spectral selection + successive
approximation with EOB-run and correction-bit buffering, the jcphuff
algorithm). These exist to RENDER the suite's real-decode fixtures —
the oracle-gated rows plant images whose progressive and sequential
encodings hold identical quantized coefficients, so the two decode
paths in `operators/multimodal.decode_jpeg` must reproduce each other
bit-for-bit over the whole corpus.

Independence note: tests/test_multimodal_decode.py deliberately keeps
its OWN copy of this encoder (same spec, separately written) so an
engine-side encode bug cannot cancel against the decoder under pytest;
this module is the distributed fixture twin. All-ones quantization
keeps the roundtrip near-lossless and fully deterministic.
"""

from __future__ import annotations

import struct

# standard luminance DC Huffman table (T.81 annex K.3)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# standard luminance AC table — sequential scans only (no EOBn codes)
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
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
# progressive scans emit EOBn symbols the sequential table has no
# codes for; this flat table (255 symbols at 8 bits + one at 9, no
# all-ones code) covers every possible AC symbol
_FLAT_AC_BITS = [0] * 7 + [255, 1] + [0] * 7
_FLAT_AC_VALS = bytes(range(255)) + bytes([255])

# the libjpeg -progressive greyscale scan script
PROG_SCRIPT_DEFAULT = [
    (0, 0, 0, 1),   # DC first, point transform 1
    (1, 5, 0, 2),   # AC 1-5 first at Al=2
    (6, 63, 0, 2),  # AC 6-63 first at Al=2
    (1, 63, 2, 1),  # AC refine Ah=2 -> Al=1
    (0, 0, 1, 0),   # DC refine
    (1, 63, 1, 0),  # AC refine Ah=1 -> Al=0
]


def _huff_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length, code):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec
        return bytes(self.out)


def _cat(v: int) -> int:
    return abs(v).bit_length()


def _grey_zz_blocks(pixels: bytes, width: int, height: int) -> list:
    """Quantized (q=1) zigzag coefficient blocks in raster order, with
    edge-replicated padding to the 8x8 grid."""
    import numpy as np

    from chroma_rs_spark.operators.multimodal import _ZIGZAG, _idct_block

    img = np.frombuffer(bytes(pixels), dtype=np.uint8).astype(
        np.float64
    ).reshape(height, width)
    bx = (width + 7) // 8
    by = (height + 7) // 8
    padded = np.empty((by * 8, bx * 8))
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]
    padded[:, width:] = padded[:, width - 1 : width]
    if not hasattr(_idct_block, "_basis"):
        _idct_block(np.zeros((8, 8)))
    a = _idct_block._basis  # forward DCT is a @ blk @ a.T
    blocks = []
    for my in range(by):
        for mx in range(bx):
            blk = padded[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
            coef = np.round(a @ blk @ a.T).astype(int)
            blocks.append([int(coef.flat[_ZIGZAG[i]]) for i in range(64)])
    return blocks


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _grey_headers(width: int, height: int, sof_marker: int,
                  flat_ac: bool) -> bytes:
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _seg(
        sof_marker,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    if flat_ac:
        out += _seg(0xC4, bytes([0x10]) + bytes(_FLAT_AC_BITS) + _FLAT_AC_VALS)
    else:
        out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    return bytes(out)


def encode_jpeg_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Baseline (SOF0) greyscale JPEG, all-ones quantization."""
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    blocks = _grey_zz_blocks(pixels, width, height)
    w = _BitWriter()
    pred = 0
    for zz in blocks:
        diff = zz[0] - pred
        pred = zz[0]
        t = _cat(diff)
        w.write(*dc_codes[t])
        if t:
            w.write(t, diff if diff >= 0 else diff + (1 << t) - 1)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                w.write(*ac_codes[0xF0])  # ZRL
                run -= 16
            s = _cat(zz[k])
            w.write(*ac_codes[(run << 4) | s])
            w.write(s, zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1)
            run = 0
        if last_nz < 63:
            w.write(*ac_codes[0x00])  # EOB
    return (
        _grey_headers(width, height, 0xC0, flat_ac=False)
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + w.flush()
        + b"\xff\xd9"
    )


def encode_jpeg_gray_progressive(
    pixels: bytes, width: int, height: int, script=None
) -> bytes:
    """Progressive (SOF2) greyscale JPEG holding the SAME quantized
    coefficients as encode_jpeg_gray(pixels, width, height)."""
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_FLAT_AC_BITS, _FLAT_AC_VALS)
    blocks = _grey_zz_blocks(pixels, width, height)
    if script is None:
        script = PROG_SCRIPT_DEFAULT
    out = bytearray(_grey_headers(width, height, 0xC2, flat_ac=True))
    for ss, se, ah, al in script:
        out += _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        w = _BitWriter()
        if ss == 0 and ah == 0:
            _enc_dc_first(w, dc_codes, blocks, al)
        elif ss == 0:
            for zz in blocks:  # DC refine: one raw bit per block
                w.write(1, (zz[0] >> al) & 1)
        elif ah == 0:
            _enc_ac_first(w, ac_codes, blocks, ss, se, al)
        else:
            _enc_ac_refine(w, ac_codes, blocks, ss, se, al)
        out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _enc_dc_first(w, dc_codes, blocks, al):
    pred = 0
    for zz in blocks:
        v = zz[0] >> al  # arithmetic shift (jcphuff DC point transform)
        diff = v - pred
        pred = v
        t = _cat(diff)
        w.write(*dc_codes[t])
        if t:
            w.write(t, diff if diff >= 0 else diff + (1 << t) - 1)


def _enc_ac_first(w, ac_codes, blocks, ss, se, al):
    eobrun = 0

    def emit_eobrun():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            w.write(*ac_codes[nbits << 4])
            if nbits:
                w.write(nbits, eobrun & ((1 << nbits) - 1))
            eobrun = 0

    for zz in blocks:
        r = 0
        for k in range(ss, se + 1):
            v = zz[k]
            t = (v >> al) if v >= 0 else -((-v) >> al)  # magnitude shift
            if t == 0:
                r += 1
                continue
            emit_eobrun()
            while r > 15:
                w.write(*ac_codes[0xF0])
                r -= 16
            s = _cat(t)
            w.write(*ac_codes[(r << 4) | s])
            w.write(s, t if t >= 0 else t + (1 << s) - 1)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


def _enc_ac_refine(w, ac_codes, blocks, ss, se, al):
    eobrun = 0
    be: list = []  # correction bits attached to the pending EOB run

    def emit_eobrun():
        nonlocal eobrun, be
        if eobrun:
            nbits = eobrun.bit_length() - 1
            w.write(*ac_codes[nbits << 4])
            if nbits:
                w.write(nbits, eobrun & ((1 << nbits) - 1))
            for b in be:
                w.write(1, b)
            be = []
            eobrun = 0

    for zz in blocks:
        r = 0
        br: list = []
        for k in range(ss, se + 1):
            t = abs(zz[k]) >> al
            if t == 0:
                r += 1  # zero-history position
                continue
            if t > 1:
                br.append(t & 1)  # previously nonzero: correction bit
                continue
            # t == 1: newly nonzero at this precision
            emit_eobrun()
            while r > 15:
                w.write(*ac_codes[0xF0])
                for b in br:
                    w.write(1, b)
                br = []
                r -= 16
            w.write(*ac_codes[(r << 4) | 1])
            w.write(1, 1 if zz[k] > 0 else 0)
            for b in br:
                w.write(1, b)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()
