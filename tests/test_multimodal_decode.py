"""Real image-decode path: pure-stdlib PNG decode (operators/
multimodal.decode_png) locally and distributed through mapInPandas.

The test writes its own PNGs (zlib + struct over the public spec) with
different filter types per scanline, so the unfilter code is exercised
against ground-truth pixels without any media library.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from chroma_rs_spark.operators.multimodal import (
    decode_image_real,
    decode_png,
    extract_image_features,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def make_png(width, height, channels, pixels, filter_type=0):
    """Minimal PNG encoder (8-bit, non-interlaced), filtering every
    scanline with `filter_type` (0=None, 1=Sub, 2=Up)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = bytearray()
    prev = bytearray(stride)
    for r in range(height):
        line = bytearray(pixels[r * stride : (r + 1) * stride])
        filtered = bytearray(line)
        if filter_type == 1:
            for i in range(stride - 1, channels - 1, -1):
                filtered[i] = (line[i] - line[i - channels]) & 0xFF
        elif filter_type == 2:
            for i in range(stride):
                filtered[i] = (line[i] - prev[i]) & 0xFF
        raw.append(filter_type)
        raw += filtered
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _pixels(n: int) -> bytes:
    return bytes((i * 37 + 11) % 256 for i in range(n))


@pytest.mark.parametrize("filter_type", [0, 1, 2])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_decode_png_roundtrip(channels, filter_type):
    w, h = 7, 5
    px = _pixels(w * h * channels)
    img = decode_png(make_png(w, h, channels, px, filter_type))
    assert (img["width"], img["height"], img["channels"]) == (w, h, channels)
    assert img["pixels"] == px


def test_decode_image_real_default_path():
    """No NotImplementedError in the default path: PNG decodes whether
    or not PIL exists in the environment."""
    px = _pixels(4 * 3 * 3)
    img = decode_image_real(make_png(4, 3, 3, px))
    assert img["pixels"] == px


def test_decode_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_extract_image_features_distributed(spark):
    rows = []
    expected = {}
    for i, (w, h, ch, ft) in enumerate(
        [(8, 6, 3, 0), (5, 9, 1, 1), (16, 2, 4, 2), (1, 1, 3, 0)]
    ):
        px = _pixels(w * h * ch)
        rows.append((i, make_png(w, h, ch, px, ft)))
        expected[i] = (
            w,
            h,
            ch,
            sum(px) / len(px),
            hashlib.md5(px).hexdigest(),
        )
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r["doc_id"]: (
            r["width"],
            r["height"],
            r["channels"],
            r["mean_intensity"],
            r["pixel_md5"],
        )
        for r in extract_image_features(df).collect()
    }
    assert out == expected


def make_wav(n_channels=1, rate=8000, samples=None):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_decode_wav_roundtrip():
    from chroma_rs_spark.operators.multimodal import decode_wav

    samples = [0, 1000, -1000, 32767, -32768, 5]
    a = decode_wav(make_wav(1, 8000, samples))
    assert a["n_channels"] == 1 and a["sample_rate"] == 8000
    assert a["samples"] == samples
    # stereo: frames interleave channels
    st = decode_wav(make_wav(2, 16000, samples))
    assert st["n_channels"] == 2 and st["n_samples"] == 3
    assert st["samples"] == samples


def test_extract_audio_features_distributed(spark):
    import math

    from chroma_rs_spark.operators.multimodal import extract_audio_features

    s0 = [0, 3000, -3000, 3000]
    s1 = [100] * 8
    df = spark.createDataFrame(
        [(0, make_wav(1, 8000, s0)), (1, make_wav(2, 16000, s1))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    assert out[0]["n_samples"] == 4 and out[0]["duration_sec"] == 4 / 8000
    assert out[0]["peak"] == 3000
    assert abs(out[0]["rms"] - math.sqrt(sum(x * x for x in s0) / len(s0))) < 1e-9
    assert out[1]["n_channels"] == 2 and out[1]["n_samples"] == 4
    assert out[1]["rms"] == 100.0 and out[1]["peak"] == 100


# ---------------------------------------------------------------------
# JPEG: minimal in-test baseline encoder (ITU T.81 public spec) so the
# decoder is exercised against ground-truth pixels with no media lib.

# standard luminance/chrominance Huffman tables (T.81 annex K.3)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
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

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _enc_huff_codes(bits, vals):
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


def _fdct(block):
    import numpy as np

    x = np.arange(8)
    u = np.arange(8)
    c = np.where(u == 0, 1.0 / np.sqrt(2.0), 1.0)
    a = c[:, None] / 2.0 * np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16)
    return a @ block @ a.T


def _cat(v):
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    return t


def make_jpeg_grey(pixels, width, height):
    """Baseline greyscale JPEG with all-ones quant table (near-lossless
    — only FDCT/IDCT float rounding survives)."""
    import struct

    import numpy as np

    dc_codes = _enc_huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _enc_huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    img = np.asarray(pixels, dtype=np.float64).reshape(height, width)
    mcux = (width + 7) // 8
    mcuy = (height + 7) // 8
    padded = np.empty((mcuy * 8, mcux * 8))
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]
    padded[:, width:] = padded[:, width - 1 : width]
    w = _BitWriter()
    pred = 0
    for my in range(mcuy):
        for mx in range(mcux):
            blk = padded[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
            coef = np.round(_fdct(blk)).astype(int)
            zz = [int(coef.flat[_ZZ[i]]) for i in range(64)]
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

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)) + seg(
        0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS)
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + w.flush() + b"\xff\xd9"


def test_decode_jpeg_flat_grey():
    from chroma_rs_spark.operators.multimodal import decode_jpeg

    img = make_jpeg_grey([200] * (8 * 8), 8, 8)
    out = decode_jpeg(img)
    assert (out["width"], out["height"], out["channels"]) == (8, 8, 1)
    assert set(out["pixels"]) == {200}


def test_decode_jpeg_gradient_roundtrip():
    import numpy as np

    from chroma_rs_spark.operators.multimodal import decode_jpeg

    rng = np.random.default_rng(7)
    # 20x13 forces MCU padding + cropping; smooth gradient + noise
    # exercises AC runs, ZRL-free paths, sign extension
    base = np.fromfunction(lambda y, x: 6 * x + 3 * y, (13, 20))
    pix = np.clip(base + rng.integers(0, 40, size=(13, 20)), 0, 255).astype(int)
    out = decode_jpeg(make_jpeg_grey(pix.ravel().tolist(), 20, 13))
    assert (out["width"], out["height"], out["channels"]) == (20, 13, 1)
    got = np.frombuffer(out["pixels"], dtype=np.uint8).reshape(13, 20)
    # all-ones quant: only FDCT round + IDCT round survive
    assert np.abs(got.astype(int) - pix).max() <= 2


def test_decode_image_real_dispatches_jpeg():
    from chroma_rs_spark.operators.multimodal import decode_image_real

    out = decode_image_real(make_jpeg_grey([64] * 64, 8, 8))
    assert out["channels"] == 1 and set(out["pixels"]) == {64}


def test_decode_jpeg_sof2_without_scan_is_truncated():
    """Round 12: SOF2 is now a supported frame type (progressive
    decode), so a header-only progressive skeleton fails as TRUNCATED
    (no scan data), not as unsupported."""
    import struct

    from chroma_rs_spark.operators.multimodal import decode_jpeg

    sof2 = bytes([0xFF, 0xC2]) + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, 8, 8, 1
    ) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="missing SOF or SOS"):
        decode_jpeg(b"\xff\xd8" + sof2 + b"\xff\xd9")


def make_jpeg_flat_color_420(ycc, width=16, height=16):
    """Solid-color 3-component baseline JPEG with 4:2:0 subsampling:
    one MCU layer of four Y blocks + one Cb + one Cr, all flat, so
    every block is a DC-only code. `ycc` = (Y, Cb, Cr) ints."""
    import struct

    dc_codes = _enc_huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _enc_huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    mcux = (width + 15) // 16
    mcuy = (height + 15) // 16
    w = _BitWriter()
    preds = [0, 0, 0]

    def put_block(ci, val):
        dc = round(8 * (val - 128.0))
        diff = dc - preds[ci]
        preds[ci] = dc
        t = _cat(diff)
        w.write(*dc_codes[t])
        if t:
            w.write(t, diff if diff >= 0 else diff + (1 << t) - 1)
        w.write(*ac_codes[0x00])  # EOB (all AC zero)

    for _ in range(mcuy * mcux):
        for _ in range(4):
            put_block(0, ycc[0])
        put_block(1, ycc[1])
        put_block(2, ycc[2])

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x22, 0])  # Y: 2x2 sampling
        + bytes([2, 0x11, 0])  # Cb
        + bytes([3, 0x11, 0]),  # Cr
    )
    dht = seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)) + seg(
        0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS)
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + w.flush() + b"\xff\xd9"


def test_decode_jpeg_color_420_flat():
    import numpy as np

    from chroma_rs_spark.operators.multimodal import decode_jpeg

    y, cb, cr = 120, 90, 180
    out = decode_jpeg(make_jpeg_flat_color_420((y, cb, cr)))
    assert (out["width"], out["height"], out["channels"]) == (16, 16, 3)
    got = np.frombuffer(out["pixels"], dtype=np.uint8).reshape(16, 16, 3)
    # flat blocks with q=1 reconstruct Y/Cb/Cr exactly; expected RGB is
    # the standard JFIF conversion of those exact values
    exp = np.clip(
        np.round(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ]
        ),
        0,
        255,
    ).astype(np.uint8)
    assert (got == exp[None, None, :]).all()


def test_decode_jpeg_truncated_entropy_raises_valueerror():
    from chroma_rs_spark.operators.multimodal import decode_jpeg

    full = make_jpeg_grey([100] * 64, 8, 8)
    # cut inside the entropy-coded segment (after SOS, before EOI)
    truncated = full[: len(full) - 4]
    with pytest.raises(ValueError):
        decode_jpeg(truncated)


def test_extract_image_features_decode_status(spark):
    """Unsupported formats (sub-byte palette PNG, arithmetic-coded
    JPEG) and corrupt payloads survive as measured rows — NULL
    features with a decode_status verdict — instead of killing the
    batch; healthy rows (including Adam7-interlaced PNG and
    progressive JPEG as of round 12, 16-bit PNG as of round 13)
    carry 'ok'. The 100 TB crawl rule: undecodable fractions are
    counted, not thrown."""
    px = _pixels(8 * 8)
    good = make_png(8, 8, 1, px)
    # sub-byte (4-bit) palette PNG: the remaining honestly-unsupported
    # PNG class now that 8-bit palette and 16-bit depth decode (r13)
    ihdr4 = struct.pack(">IIBBBBB", 8, 8, 4, 3, 0, 0, 0)
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr4)
        + _chunk(b"PLTE", b"\x00\x00\x00" * 16)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * (8 * 5)))
        + _chunk(b"IEND", b"")
    )
    # 16-bit PNG decodes via MSB tone-map as of round 13
    deep16 = make_png16(8, 8, 1, [v << 8 for v in px])
    # arithmetic-coded JPEG skeleton (SOF10): the remaining honestly-
    # unsupported class now that progressive (SOF2) decodes (round 12)
    sof10 = b"\xff\xca" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + b"\x11\x00"
    arithmetic = b"\xff\xd8" + sof10 + b"\xff\xd9"
    # a REAL progressive JPEG decodes with status ok (round 12)
    progressive = make_jpeg_grey_progressive([90] * 64, 8, 8)
    corrupt = b"\x89PNG\r\n\x1a\ngarbage"
    interlaced_ok = make_png_interlaced(8, 8, 1, px)
    df = spark.createDataFrame(
        [(0, good), (1, deep), (2, arithmetic), (3, corrupt), (4, None),
         (5, progressive), (6, interlaced_ok), (7, deep16)],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in extract_image_features(df).collect()}
    assert out[0]["decode_status"] == "ok"
    assert out[0]["pixel_md5"] == hashlib.md5(px).hexdigest()
    assert out[1]["decode_status"] == "unsupported"
    assert out[2]["decode_status"] == "unsupported"
    assert out[3]["decode_status"] == "corrupt"
    assert out[4]["decode_status"] == "corrupt"
    assert out[5]["decode_status"] == "ok"
    assert out[5]["width"] == 8 and out[5]["channels"] == 1
    assert out[6]["decode_status"] == "ok"
    assert out[6]["pixel_md5"] == hashlib.md5(px).hexdigest()
    assert out[7]["decode_status"] == "ok"
    assert out[7]["pixel_md5"] == hashlib.md5(px).hexdigest()
    for i in (1, 2, 3, 4):
        assert out[i]["width"] is None and out[i]["pixel_md5"] is None


# ---------------------------------------------------------------------------
# Progressive JPEG (round 12, VERDICT r11 #4): a full test-side
# progressive ENCODER (spectral selection + successive approximation
# with EOB-run and correction-bit buffering — the jcphuff algorithm)
# encodes the SAME quantized coefficients make_jpeg_grey encodes, so a
# correct decoder must reproduce the baseline decode BIT-IDENTICALLY.
# Encoder and decoder are structurally disjoint transforms (buffered
# emission vs stateful refinement), so a bug on either side breaks the
# pixel equality rather than cancelling out.
# ---------------------------------------------------------------------------


def _grey_zz_blocks(pixels, width, height):
    """Quantized (q=1) zigzag coefficient blocks in raster order —
    exactly what make_jpeg_grey entropy-codes."""
    import numpy as np

    img = np.asarray(pixels, dtype=np.float64).reshape(height, width)
    mcux = (width + 7) // 8
    mcuy = (height + 7) // 8
    padded = np.empty((mcuy * 8, mcux * 8))
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]
    padded[:, width:] = padded[:, width - 1 : width]
    blocks = []
    for my in range(mcuy):
        for mx in range(mcux):
            blk = padded[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
            coef = np.round(_fdct(blk)).astype(int)
            blocks.append([int(coef.flat[_ZZ[i]]) for i in range(64)])
    return blocks


def _emit_val(w, codes, t, v):
    w.write(*codes[t])
    if t:
        w.write(t, v if v >= 0 else v + (1 << t) - 1)


def _enc_dc_first(w, dc_codes, blocks, al):
    pred = 0
    for zz in blocks:
        v = zz[0] >> al  # arithmetic shift (jcphuff DC point transform)
        diff = v - pred
        pred = v
        _emit_val(w, dc_codes, _cat(diff), diff)


def _enc_dc_refine(w, blocks, al):
    for zz in blocks:
        w.write(1, (zz[0] >> al) & 1)


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
    be = []  # correction bits attached to the pending EOB run

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
        br = []
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


# Progressive scans emit EOBn symbols (0x10, 0x20, ...) that the
# standard SEQUENTIAL AC table has no codes for — real progressive
# files ship custom Huffman tables. This flat table (255 symbols at 8
# bits + one at 9, no all-ones code) covers every possible AC symbol.
_FLAT_AC_BITS = [0] * 7 + [255, 1] + [0] * 7
_FLAT_AC_VALS = bytes(range(255)) + bytes([255])


_PROG_SCRIPT_DEFAULT = [
    # the libjpeg -progressive grayscale scan script
    (0, 0, 0, 1),  # DC first, point transform 1
    (1, 5, 0, 2),  # AC 1-5 first at Al=2
    (6, 63, 0, 2),  # AC 6-63 first at Al=2
    (1, 63, 2, 1),  # AC refine Ah=2 -> Al=1
    (0, 0, 1, 0),  # DC refine
    (1, 63, 1, 0),  # AC refine Ah=1 -> Al=0
]


def make_jpeg_grey_progressive(pixels, width, height, script=None):
    """Progressive (SOF2) greyscale JPEG holding the SAME quantized
    coefficients as make_jpeg_grey(pixels, width, height)."""
    import struct

    dc_codes = _enc_huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _enc_huff_codes(_FLAT_AC_BITS, _FLAT_AC_VALS)
    blocks = _grey_zz_blocks(pixels, width, height)
    if script is None:
        script = _PROG_SCRIPT_DEFAULT

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(
        0xC2, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    )
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_FLAT_AC_BITS) + _FLAT_AC_VALS)
    for ss, se, ah, al in script:
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        w = _BitWriter()
        if ss == 0 and ah == 0:
            _enc_dc_first(w, dc_codes, blocks, al)
        elif ss == 0:
            _enc_dc_refine(w, blocks, al)
        elif ah == 0:
            _enc_ac_first(w, ac_codes, blocks, ss, se, al)
        else:
            _enc_ac_refine(w, ac_codes, blocks, ss, se, al)
        out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_jpeg_progressive_matches_baseline():
    """Full successive-approximation script on a random image: the
    progressive decode must be BIT-identical to the baseline decode of
    the same quantized coefficients."""
    import numpy as np

    from chroma_rs_spark.operators.multimodal import decode_jpeg

    rng = np.random.RandomState(7)
    pix = rng.randint(0, 256, size=(24, 24))
    base = decode_jpeg(make_jpeg_grey(pix.ravel().tolist(), 24, 24))
    prog = decode_jpeg(
        make_jpeg_grey_progressive(pix.ravel().tolist(), 24, 24)
    )
    assert prog["width"] == 24 and prog["channels"] == 1
    assert prog["pixels"] == base["pixels"]


def test_decode_jpeg_progressive_band_split_nonmultiple_of_8():
    """Spectral-selection-only script (no refinement) on a non-8-
    multiple image: exercises the comp-grid-vs-MCU-grid block math and
    the EOB-run path, still bit-equal to baseline."""
    import numpy as np

    from chroma_rs_spark.operators.multimodal import decode_jpeg

    rng = np.random.RandomState(11)
    pix = rng.randint(0, 256, size=(13, 20))
    script = [(0, 0, 0, 0), (1, 5, 0, 0), (6, 63, 0, 0)]
    base = decode_jpeg(make_jpeg_grey(pix.ravel().tolist(), 20, 13))
    prog = decode_jpeg(
        make_jpeg_grey_progressive(pix.ravel().tolist(), 20, 13, script)
    )
    assert prog["pixels"] == base["pixels"]


def test_decode_jpeg_progressive_eobrun_spans_blocks():
    """A mostly-flat multi-block image makes the AC scans pure EOB
    runs spanning many blocks — the run accounting must land exactly."""
    import numpy as np

    from chroma_rs_spark.operators.multimodal import decode_jpeg

    pix = np.full((32, 32), 140, dtype=int)
    pix[0, 0] = 10  # one busy block so the AC scan isn't empty
    base = decode_jpeg(make_jpeg_grey(pix.ravel().tolist(), 32, 32))
    prog = decode_jpeg(
        make_jpeg_grey_progressive(pix.ravel().tolist(), 32, 32)
    )
    assert prog["pixels"] == base["pixels"]


def make_jpeg_color_420_progressive(ycc, width=16, height=16):
    """Progressive twin of make_jpeg_flat_color_420: interleaved DC
    first + DC refine scans over the 4:2:0 MCU grid, then one AC scan
    per component (pure EOB runs — every AC is zero). Exercises the
    interleaved progressive path and the per-component block grids."""
    import struct

    dc_codes = _enc_huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _enc_huff_codes(_FLAT_AC_BITS, _FLAT_AC_VALS)
    mcux = (width + 15) // 16
    mcuy = (height + 15) // 16
    dcs = [round(8 * (v - 128.0)) for v in ycc]

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(
        0xC2,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_FLAT_AC_BITS) + _FLAT_AC_VALS)

    # scan 1: interleaved DC first (Al=1)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x01]))
    w = _BitWriter()
    preds = [0, 0, 0]
    for _ in range(mcuy * mcux):
        for ci, nblk in ((0, 4), (1, 1), (2, 1)):
            for _b in range(nblk):
                v = dcs[ci] >> 1
                diff = v - preds[ci]
                preds[ci] = v
                _emit_val(w, dc_codes, _cat(diff), diff)
    out += w.flush()
    # scan 2: interleaved DC refine (Ah=1, Al=0)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10]))
    w = _BitWriter()
    for _ in range(mcuy * mcux):
        for ci, nblk in ((0, 4), (1, 1), (2, 1)):
            for _b in range(nblk):
                w.write(1, dcs[ci] & 1)
    out += w.flush()
    # scans 3-5: per-component AC first 1-63 (all zero -> one EOB run
    # over the COMPONENT grid: Y has 2x2 blocks per MCU, chroma 1x1)
    comp_blocks = [
        (1, 4 * mcux * mcuy),
        (2, mcux * mcuy),
        (3, mcux * mcuy),
    ]
    for cs, nblocks in comp_blocks:
        out += seg(0xDA, bytes([1, cs, 0x00, 1, 63, 0x00]))
        w = _BitWriter()
        nbits = nblocks.bit_length() - 1
        w.write(*ac_codes[nbits << 4])
        if nbits:
            w.write(nbits, nblocks & ((1 << nbits) - 1))
        out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_jpeg_progressive_color_420():
    import numpy as np

    from chroma_rs_spark.operators.multimodal import decode_jpeg

    ycc = (120, 90, 180)
    base = decode_jpeg(make_jpeg_flat_color_420(ycc))
    prog = decode_jpeg(make_jpeg_color_420_progressive(ycc))
    assert prog["channels"] == 3
    assert prog["pixels"] == base["pixels"]


def test_decode_jpeg_rejects_arithmetic_and_12bit():
    import struct

    from chroma_rs_spark.operators.multimodal import decode_jpeg

    # arithmetic-coded progressive (SOF10 = 0xCA)
    sof10 = b"\xff\xca" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + b"\x11\x00"
    with pytest.raises(NotImplementedError, match="unsupported"):
        decode_jpeg(b"\xff\xd8" + sof10 + b"\xff\xd9")
    # 12-bit precision baseline
    sof12 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 12, 8, 8, 1) + b"\x11\x00"
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_jpeg(b"\xff\xd8" + sof12 + b"\xff\xd9")


def make_jpeg_grey_dri(pixels, width, height, restart_interval=2):
    """Baseline greyscale JPEG WITH restart markers: DRI segment +
    RSTn every `restart_interval` MCUs, DC predictor reset per
    segment — exercises decode's align_to_marker path."""
    import struct

    dc_codes = _enc_huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _enc_huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    blocks = _grey_zz_blocks(pixels, width, height)

    def encode_segment(seg_blocks):
        w = _BitWriter()
        pred = 0
        for zz in seg_blocks:
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
                    w.write(*ac_codes[0xF0])
                    run -= 16
                s = _cat(zz[k])
                w.write(*ac_codes[(run << 4) | s])
                w.write(s, zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1)
                run = 0
            if last_nz < 63:
                w.write(*ac_codes[0x00])
        return w.flush()

    entropy = bytearray()
    segs = [
        blocks[i : i + restart_interval]
        for i in range(0, len(blocks), restart_interval)
    ]
    for i, seg_blocks in enumerate(segs):
        if i:
            entropy += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
        entropy += encode_segment(seg_blocks)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS))
        + seg(0xDD, struct.pack(">H", restart_interval))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(entropy)
        + b"\xff\xd9"
    )


def test_decode_jpeg_restart_markers():
    """DRI/RSTn handling: a restart-coded file must decode identically
    to the plain encoding of the same image (predictor resets and the
    bit-realignment both land exactly)."""
    import numpy as np

    from chroma_rs_spark.operators.multimodal import decode_jpeg

    rng = np.random.RandomState(5)
    pix = rng.randint(0, 256, size=(16, 32))  # 2x4 = 8 MCUs
    plain = decode_jpeg(make_jpeg_grey(pix.ravel().tolist(), 32, 16))
    for ri in (1, 2, 3):
        dri = decode_jpeg(
            make_jpeg_grey_dri(pix.ravel().tolist(), 32, 16, ri)
        )
        assert dri["pixels"] == plain["pixels"], f"restart_interval={ri}"


def make_jpeg_grey_progressive_dri(pixels, width, height,
                                   restart_interval=2):
    """Progressive greyscale JPEG with restart markers inside EVERY
    scan (DC first/refine, AC first/refine) — per-segment predictor
    and EOB-run resets."""
    import struct

    dc_codes = _enc_huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _enc_huff_codes(_FLAT_AC_BITS, _FLAT_AC_VALS)
    blocks = _grey_zz_blocks(pixels, width, height)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(0xC2, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_FLAT_AC_BITS) + _FLAT_AC_VALS)
    out += seg(0xDD, struct.pack(">H", restart_interval))
    chunks = [
        blocks[i : i + restart_interval]
        for i in range(0, len(blocks), restart_interval)
    ]
    for ss, se, ah, al in _PROG_SCRIPT_DEFAULT:
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        entropy = bytearray()
        for i, chunk in enumerate(chunks):
            if i:
                entropy += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
            w = _BitWriter()
            if ss == 0 and ah == 0:
                _enc_dc_first(w, dc_codes, chunk, al)
            elif ss == 0:
                _enc_dc_refine(w, chunk, al)
            elif ah == 0:
                _enc_ac_first(w, ac_codes, chunk, ss, se, al)
            else:
                _enc_ac_refine(w, ac_codes, chunk, ss, se, al)
            entropy += w.flush()
        out += bytes(entropy)
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_jpeg_progressive_restart_markers():
    import numpy as np

    from chroma_rs_spark.operators.multimodal import decode_jpeg

    rng = np.random.RandomState(9)
    pix = rng.randint(0, 256, size=(16, 24))  # 2x3 = 6 MCUs
    plain = decode_jpeg(make_jpeg_grey(pix.ravel().tolist(), 24, 16))
    for ri in (1, 2):
        prog = decode_jpeg(
            make_jpeg_grey_progressive_dri(pix.ravel().tolist(), 24, 16, ri)
        )
        assert prog["pixels"] == plain["pixels"], f"restart_interval={ri}"


# ---------------------------------------------------------------------
# Adam7 interlaced PNG (round 12): real interlaced encoder fixture —
# per-pass sub-images, independently filtered — vs the straight decode.

_ADAM7_TEST = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def make_png_interlaced(width, height, channels, pixels, filter_type=0):
    """8-bit Adam7-interlaced PNG: gathers each pass's sub-image and
    filters its scanlines independently (type 0 None or 2 Up)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 1)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7_TEST:
        wp = (width - x0 + dx - 1) // dx
        hp = (height - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        stride = wp * channels
        prev = bytearray(stride)
        for ry in range(hp):
            line = bytearray()
            y = y0 + ry * dy
            for rx in range(wp):
                x = x0 + rx * dx
                s = (y * width + x) * channels
                line += pixels[s : s + channels]
            if filter_type == 2:
                filtered = bytearray(
                    (line[i] - prev[i]) & 0xFF for i in range(stride)
                )
            else:
                filtered = line
            raw.append(filter_type)
            raw += filtered
            prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filter_type", [0, 2])
@pytest.mark.parametrize(
    "w,h,ch", [(8, 8, 1), (7, 5, 3), (9, 3, 4), (1, 1, 1), (16, 11, 3)]
)
def test_decode_png_interlaced_matches_straight(w, h, ch, filter_type):
    """Adam7 decode reproduces the exact pixels of the straight
    encoding — odd sizes exercise empty and partial passes."""
    px = _pixels(w * h * ch)
    straight = decode_png(make_png(w, h, ch, px))
    inter = decode_png(make_png_interlaced(w, h, ch, px, filter_type))
    assert inter["width"] == w and inter["channels"] == ch
    assert inter["pixels"] == straight["pixels"] == px


def test_decode_png_interlaced_truncated_raises():
    px = _pixels(8 * 8)
    good = make_png_interlaced(8, 8, 1, px)
    # corrupt the IDAT payload length by re-wrapping a shorter stream
    raw_short = zlib.compress(b"\x00" * 10)
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 1)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", raw_short)
        + _chunk(b"IEND", b"")
    )
    assert decode_png(good)["pixels"] == px
    with pytest.raises((ValueError, IndexError)):
        decode_png(bad)


def test_decode_jpeg_fill_bytes_before_markers():
    # T.81 B.1.1.2: markers may be preceded by any run of 0xFF fill
    # bytes. Insert fill runs before every marker of a valid baseline
    # JPEG (after SOI, outside entropy data) and require identical
    # pixels — real crawls contain such files and they must not be
    # classified "corrupt" (ADVICE r12).
    from chroma_rs_spark.operators.multimodal import decode_jpeg

    img = make_jpeg_grey([200] * (8 * 8), 8, 8)
    ref = decode_jpeg(img)

    # Rebuild the stream, prefixing each marker segment with fill
    # bytes. Walk markers the same way a writer would: SOI, then
    # segment-by-segment; stop padding once SOS begins (entropy data
    # may legally contain 0xFF00 stuffing we must not touch).
    out = bytearray(img[:2])  # SOI
    pos = 2
    in_scan = False
    while pos < len(img):
        if not in_scan:
            assert img[pos] == 0xFF
            marker = img[pos + 1]
            out += b"\xff\xff\xff"  # fill run before the marker's 0xFF
            if marker == 0xD9:  # EOI, no length
                out += img[pos : pos + 2]
                pos += 2
                continue
            (seglen,) = struct.unpack(">H", img[pos + 2 : pos + 4])
            out += img[pos : pos + 2 + seglen]
            pos += 2 + seglen
            if marker == 0xDA:  # SOS: entropy data follows verbatim
                in_scan = True
        else:
            # copy entropy bytes until EOI (flat-grey fixture has no
            # restart markers; EOI is the next non-stuffed marker)
            nxt = img.find(b"\xff\xd9", pos)
            assert nxt != -1
            out += img[pos:nxt]
            pos = nxt
            in_scan = False
    got = decode_jpeg(bytes(out))
    assert got["pixels"] == ref["pixels"]
    assert (got["width"], got["height"]) == (ref["width"], ref["height"])


# -- palette PNG (color_type 3, round 13) -------------------------------


def _palette() -> bytes:
    # non-trivial mapping so an index-passthrough "decode" can't pass
    return b"".join(bytes((i, 255 - i, i ^ 0x55)) for i in range(256))


@pytest.mark.parametrize("filter_type", [0, 1, 2])
def test_decode_png_palette_roundtrip(filter_type):
    from chroma_rs_spark.operators.multimodal import encode_png_palette

    w, h = 7, 5
    idx = _pixels(w * h)
    png = encode_png_palette(idx, w, h, _palette())
    if filter_type:
        # re-filter through the generic writer: splice palette header +
        # PLTE onto make_png's filtered grey scanlines
        grey = make_png(w, h, 1, idx, filter_type)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", _palette())
            + grey[8 + 12 + 13 :]
        )
    img = decode_png(png)
    assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
    assert img["pixels"] == b"".join(
        bytes((v, 255 - v, v ^ 0x55)) for v in idx
    )


def test_decode_png_palette_trns_alpha():
    from chroma_rs_spark.operators.multimodal import encode_png_palette

    idx = _pixels(6 * 4)
    trns = bytes(255 - i for i in range(64))  # entries >=64 opaque
    img = decode_png(encode_png_palette(idx, 6, 4, _palette(), trns))
    assert img["channels"] == 4
    assert img["pixels"] == b"".join(
        bytes((v, 255 - v, v ^ 0x55, (255 - v) if v < 64 else 255))
        for v in idx
    )


def test_decode_png_palette_index_out_of_range_is_corrupt():
    from chroma_rs_spark.operators.multimodal import encode_png_palette

    png = encode_png_palette(bytes([5] * 4), 2, 2, b"\x00\x01\x02" * 3)
    with pytest.raises(ValueError, match="palette index"):
        decode_png(png)


def test_decode_png_palette_missing_plte_is_corrupt():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"\x00\x00\x00" + b"\x00\x00\x00"  # 2 scanlines, filter 0
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(png)


def test_decode_png_palette_subbyte_depth_unsupported():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 4, 3, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", b"\x00\x00\x00" * 16)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 12))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(png)


def test_decode_png_palette_interlaced():
    from chroma_rs_spark.operators.multimodal import (
        encode_png_gray_interlaced,
    )

    w = h = 16
    idx = _pixels(w * h)
    g = bytearray(encode_png_gray_interlaced(idx, w, h))
    g[25] = 3  # IHDR color_type: grey -> palette (decoder skips CRCs)
    png = (
        bytes(g[: 8 + 12 + 13])
        + _chunk(b"PLTE", _palette())
        + bytes(g[8 + 12 + 13 :])
    )
    img = decode_png(png)
    assert img["channels"] == 3
    assert img["pixels"] == b"".join(
        bytes((v, 255 - v, v ^ 0x55)) for v in idx
    )


# -- 24/32-bit PCM + float32 WAV (round 13) -----------------------------


def make_wav_wide(width, n_channels=1, rate=8000, samples=None):
    """PCM WAV at sampwidth 3 or 4: each int16 sample carried in the
    TOP bytes (s << 8 / s << 16), the form a 16-bit master remastered
    to 24/32-bit produces — so decode must recover `samples` exactly."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 3:
            raw = b"".join(
                (s << 8).to_bytes(3, "little", signed=True) for s in samples
            )
        else:
            raw = struct.pack(f"<{len(samples)}i", *[s << 16 for s in samples])
        w.writeframes(raw)
    return buf.getvalue()


def make_wav_float(n_channels=1, rate=8000, samples=None):
    """IEEE-float (format 3) WAV: int16 samples as s/32768.0 — exact in
    float32, so decode's round(x*32768) must recover them exactly."""
    import struct

    data = struct.pack(f"<{len(samples)}f", *[s / 32768.0 for s in samples])
    n_ch = n_channels
    fmt = struct.pack("<HHIIHH", 3, n_ch, rate, rate * n_ch * 4, n_ch * 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize("width", [3, 4])
def test_decode_wav_wide_parity(width):
    from chroma_rs_spark.operators.multimodal import decode_wav

    samples = [0, 1000, -1000, 32767, -32768, 5]
    a = decode_wav(make_wav_wide(width, 1, 8000, samples))
    assert a["sample_rate"] == 8000 and a["n_samples"] == len(samples)
    assert a["samples"] == samples
    st = decode_wav(make_wav_wide(width, 2, 16000, samples))
    assert st["n_channels"] == 2 and st["samples"] == samples


def test_decode_wav_float32_parity():
    from chroma_rs_spark.operators.multimodal import decode_wav

    samples = [0, 1000, -1000, 32767, -32768, 5]
    a = decode_wav(make_wav_float(1, 44100, samples))
    assert a["n_channels"] == 1 and a["sample_rate"] == 44100
    assert a["n_samples"] == len(samples)
    assert a["samples"] == samples


def test_decode_wav_float32_clamps_out_of_range():
    from chroma_rs_spark.operators.multimodal import decode_wav

    import struct

    data = struct.pack("<4f", 2.0, -2.0, 0.5, -0.25)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    a = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert a["samples"] == [32767, -32768, 16384, -8192]


def test_decode_wav_float64_unsupported():
    from chroma_rs_spark.operators.multimodal import decode_wav

    import struct

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 8, 8, 64)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 8) + b"\x00" * 8
    with pytest.raises(NotImplementedError):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_decode_wav_garbage_still_corrupt_class():
    from chroma_rs_spark.operators.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")


def test_extract_audio_features_wide_widths(spark):
    """All four widths of the same master produce identical features
    through the distributed path — the decode-status parity claim."""
    from chroma_rs_spark.operators.multimodal import extract_audio_features

    s = [0, 3000, -3000, 3000, 12345, -12345, 7, -8]
    df = spark.createDataFrame(
        [
            (16, make_wav(1, 8000, s)),
            (24, make_wav_wide(3, 1, 8000, s)),
            (32, make_wav_wide(4, 1, 8000, s)),
            (33, make_wav_float(1, 8000, s)),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    base = rows[16]
    for k in (24, 32, 33):
        assert (
            rows[k]["n_samples"],
            rows[k]["rms"],
            rows[k]["peak"],
        ) == (base["n_samples"], base["rms"], base["peak"]), k


# -- 16-bit PNG (round 13): MSB tone-map to the 8-bit contract ----------


def make_png16(w, h, ch, samples16, filter_type=0, interlace=0):
    """16-bit PNG writer: big-endian samples, filtering on bytes with
    bpp = ch*2 (spec section 9)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 16, color_type, 0, 0, interlace)
    bpp = ch * 2
    raw = bytearray()
    prev = bytearray(w * bpp)
    for r in range(h):
        line = bytearray()
        for s in samples16[r * w * ch : (r + 1) * w * ch]:
            line += struct.pack(">H", s)
        filt = bytearray(line)
        if filter_type == 1:
            for i in range(len(line) - 1, bpp - 1, -1):
                filt[i] = (line[i] - line[i - bpp]) & 0xFF
        elif filter_type == 2:
            for i in range(len(line)):
                filt[i] = (line[i] - prev[i]) & 0xFF
        raw.append(filter_type)
        raw += filt
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_decode_png_16bit(channels, filter_type):
    w, h = 5, 4
    s16 = [((i * 4099 + 7) % 65536) for i in range(w * h * channels)]
    img = decode_png(make_png16(w, h, channels, s16, filter_type))
    assert (img["width"], img["height"], img["channels"]) == (w, h, channels)
    assert img["pixels"] == bytes((v >> 8) & 0xFF for v in s16)


def test_decode_png_16bit_interlaced():
    from chroma_rs_spark.operators.multimodal import _ADAM7

    w = h = 13  # odd size exercises empty/partial Adam7 passes
    s16 = [((i * 2654435761) >> 3) & 0xFFFF for i in range(w * h)]
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 1)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        for ry in range(hp):
            raw.append(0)
            y = y0 + ry * dy
            for rx in range(wp):
                raw += struct.pack(">H", s16[y * w + x0 + rx * dx])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    img = decode_png(png)
    assert img["channels"] == 1
    assert img["pixels"] == bytes((v >> 8) & 0xFF for v in s16)


def test_decode_png_16bit_palette_still_unsupported():
    # bit_depth 16 + color_type 3 is spec-illegal; stays measured
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", b"\x00" * 6)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(png)


# -- 4-component (Adobe CMYK / YCCK) JPEG (round 13) --------------------


def make_jpeg_flat_cmyk(vals, width=8, height=8, transform=None):
    """Solid-color 4-component baseline JPEG, 1x1 sampling, flat
    DC-only blocks; `vals` are the four STORED plane values. When
    `transform` is not None an Adobe APP14 marker carries it."""
    import struct

    dc_codes = _enc_huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _enc_huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    bx = (width + 7) // 8
    by = (height + 7) // 8
    w = _BitWriter()
    preds = [0, 0, 0, 0]

    def put_block(ci, val):
        dc = round(8 * (val - 128.0))
        diff = dc - preds[ci]
        preds[ci] = dc
        t = _cat(diff)
        w.write(*dc_codes[t])
        if t:
            w.write(t, diff if diff >= 0 else diff + (1 << t) - 1)
        w.write(*ac_codes[0x00])  # EOB

    for _ in range(by * bx):
        for ci in range(4):
            put_block(ci, vals[ci])

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    if transform is not None:
        out += seg(
            0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, transform])
        )
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 4)
        + b"".join(bytes([i + 1, 0x11, 0]) for i in range(4)),
    )
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS))
    out += seg(0xDA, bytes([4, 1, 0x00, 2, 0x00, 3, 0x00, 4, 0x00, 0, 63, 0]))
    return out + w.flush() + b"\xff\xd9"


@pytest.mark.parametrize("with_marker", [True, False])
def test_decode_jpeg_cmyk_flat(with_marker):
    import numpy as np

    from chroma_rs_spark.operators.multimodal import decode_jpeg

    c_, m_, y_, k_ = 200, 120, 60, 220  # stored (inverted) planes
    out = decode_jpeg(
        make_jpeg_flat_cmyk(
            (c_, m_, y_, k_), transform=0 if with_marker else None
        )
    )
    assert (out["width"], out["height"], out["channels"]) == (8, 8, 3)
    got = np.frombuffer(out["pixels"], dtype=np.uint8).reshape(8, 8, 3)
    exp = np.array(
        [round(c_ * k_ / 255.0), round(m_ * k_ / 255.0), round(y_ * k_ / 255.0)],
        dtype=np.uint8,
    )
    assert (got == exp[None, None, :]).all()


def test_decode_jpeg_ycck_flat():
    import numpy as np

    from chroma_rs_spark.operators.multimodal import decode_jpeg

    y, cb, cr, k_ = 120, 90, 180, 240
    out = decode_jpeg(make_jpeg_flat_cmyk((y, cb, cr, k_), transform=2))
    got = np.frombuffer(out["pixels"], dtype=np.uint8).reshape(8, 8, 3)
    inv = [
        y + 1.402 * (cr - 128.0),
        y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
        y + 1.772 * (cb - 128.0),
    ]
    exp = np.array(
        [
            round(min(max(ch, 0.0), 255.0) * k_ / 255.0)
            for ch in inv
        ],
        dtype=np.uint8,
    )
    assert (got == exp[None, None, :]).all()


def test_decode_jpeg_two_component_still_unsupported():
    from chroma_rs_spark.operators.multimodal import decode_jpeg

    # truncate the 4-comp frame to 2 comps: still a NotImplementedError
    import struct

    dc_codes = _enc_huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _enc_huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    w = _BitWriter()
    preds = [0, 0]

    def put_block(ci, val):
        dc = round(8 * (val - 128.0))
        diff = dc - preds[ci]
        preds[ci] = dc
        t = _cat(diff)
        w.write(*dc_codes[t])
        if t:
            w.write(t, diff if diff >= 0 else diff + (1 << t) - 1)
        w.write(*ac_codes[0x00])

    put_block(0, 100)
    put_block(1, 100)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    png = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(
            0xC0,
            struct.pack(">BHHB", 8, 8, 8, 2)
            + bytes([1, 0x11, 0])
            + bytes([2, 0x11, 0]),
        )
        + seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS))
        + seg(0xDA, bytes([2, 1, 0x00, 2, 0x00, 0, 63, 0]))
        + w.flush()
        + b"\xff\xd9"
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg(png)
