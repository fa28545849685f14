"""Multimodal column plumbing (SURVEY.md §2.3 [EXT]).

Images/audio/video are opaque BINARY columns + typed metadata. The
Spark-side plumbing (schema, Arrow batch shape, mapInPandas UDF
signature, partitioning) is real and tested, and so is image decode:

* `decode_image_real` uses PIL when importable (any format) and
  otherwise dispatches on magic bytes to a pure-stdlib PNG decoder
  (`decode_png`: zlib inflate + scanline unfilter per the public PNG
  spec) or a stdlib+numpy baseline JPEG decoder (`decode_jpeg`:
  Huffman + dequant + IDCT + chroma upsample per public ITU T.81,
  sequential AND progressive as of round 12; PNG covers Adam7
  interlace too) — no NotImplementedError in the default path for the
  two formats a real corpus mostly holds; arithmetic-coded JPEG,
  16-bit PNG and video without PIL remain explicit
  NotImplementedError sites.
* `extract_image_features` runs the real decode distributed
  (mapInPandas, Arrow binary batches); pytest drives it over
  synthetic in-test PNGs (tests/test_multimodal_decode.py).
* `extract_media_features` keeps a deterministic fake decode (pure
  arithmetic on byte length) so the oracle hash-gate has an
  engine-independent twin.
* audio: `decode_wav` (stdlib `wave`, PCM 8/16-bit) +
  `extract_audio_features` (channels / rate / duration / RMS / peak)
  run the same distributed shape; mp3/flac without a codec lib remain
  explicit NotImplementedError sites.

At scale this is the pattern for media feature extraction: binary
parquet columns, `mapInPandas` with bounded Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch), one Python worker per
core, no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, byte_len long, width long, height long, n_frames long"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a media payload column: utf-8 bytes of the text.

    In a real pipeline this column would come straight from parquet
    (BINARY) — everything downstream is identical.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (PNG spec, 8-bit depth supported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, width: int, height: int, channels: int) -> bytes:
    """Undo PNG per-scanline filtering (types 0-4, spec section 9)."""
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out += line
        prev = line
    return bytes(out)


def encode_png_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Real 8-bit greyscale PNG encoder (zlib + struct over the public
    spec; filter type 0 per scanline, CRC'd chunks) — the writer half
    of decode_png, used by the real-decode driver fixture so the
    oracle-gated round trip exercises an actual container format, not
    a fake. Any PNG reader (PIL included) decodes it back to exactly
    `pixels`."""
    import struct
    import zlib

    if len(pixels) != width * height:
        raise ValueError("encode_png_gray: pixels must be width*height bytes")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0 (None)
        raw += pixels[y * width : (y + 1) * width]
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_png_gray_interlaced(
    pixels: bytes, width: int, height: int
) -> bytes:
    """8-bit greyscale Adam7-INTERLACED PNG encoder — the writer half
    of the interlaced decode path, used by the decode-parity fixture
    row (each pass's sub-image gathered and written with filter type
    0). Any PNG reader deinterlaces it back to exactly `pixels`."""
    import struct
    import zlib

    if len(pixels) != width * height:
        raise ValueError(
            "encode_png_gray_interlaced: pixels must be width*height bytes"
        )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 1)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        wp = (width - x0 + dx - 1) // dx
        hp = (height - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        for ry in range(hp):
            raw.append(0)  # filter type 0 (None)
            y = y0 + ry * dy
            for rx in range(wp):
                raw.append(pixels[y * width + (x0 + rx * dx)])
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_png_palette(
    indices: bytes,
    width: int,
    height: int,
    palette: bytes,
    trns: bytes | None = None,
) -> bytes:
    """8-bit PALETTE (color_type 3) PNG encoder — the writer half of
    the round-13 palette decode path, used by the decode-parity fixture
    row. `palette` is the raw PLTE body (RGB triples); `trns` an
    optional per-entry alpha prefix. Any PNG reader expands it back to
    exactly palette[indices]."""
    import struct
    import zlib

    if len(indices) != width * height:
        raise ValueError("encode_png_palette: indices must be width*height bytes")
    if len(palette) % 3 or not palette:
        raise ValueError("encode_png_palette: palette must be RGB triples")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0 (None)
        raw += indices[y * width : (y + 1) * width]
    out = PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"PLTE", palette)
    if trns is not None:
        out += chunk(b"tRNS", trns)
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


# Adam7 interlace pass grid: (x0, y0, dx, dy) per pass (PNG spec
# section 8.2). Each pass is an independently-filtered sub-image; the
# IDAT stream concatenates the passes in order, empty passes (zero
# width or height at this image size) contribute no bytes.
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def decode_png(payload: bytes) -> dict:
    """Pure-stdlib PNG decode (zlib + struct; PNG spec is public):
    returns {width, height, channels, pixels} for 8-bit greyscale /
    RGB / RGBA / grey+alpha / PALETTE (color_type 3, round 13 — the
    most common remaining `unsupported` class in real crawls) images,
    non-interlaced OR Adam7-interlaced — the real decode path when no
    media library exists in the environment. Palette images expand
    through PLTE to RGB, or to RGBA when a tRNS chunk supplies
    per-entry alpha (spec section 11.3.2: missing trailing entries are
    opaque 255)."""
    import struct
    import zlib

    if not payload.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG payload")
    pos = len(PNG_SIGNATURE)
    width = height = None
    channels = None
    color_type = None
    interlace = 0
    plte = None
    trns = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if (
                bit_depth not in (8, 16)
                or (color_type not in _PNG_CHANNELS and color_type != 3)
                or (bit_depth == 16 and color_type == 3)  # spec-illegal
            ):
                raise NotImplementedError(
                    f"PNG bit_depth={bit_depth} color_type={color_type} "
                    "unsupported (8/16-bit grey/RGB/RGBA, 8-bit palette)"
                )
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
            # palette scanlines carry 1 byte/pixel of PLTE indices; the
            # unfilter/deinterlace passes run on the index plane and the
            # palette expansion happens once at the end. 16-bit samples
            # (round 13) carry 2 bytes each: PNG filtering is defined on
            # BYTES with bpp = channels*2 (spec section 9), so the
            # unfilter/deinterlace passes run with a doubled "channel"
            # count and the big-endian MSB extraction to the 8-bit
            # contract happens once at the end.
            channels = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
            if bit_depth == 16:
                channels *= 2
        elif ctype == b"PLTE":
            if length % 3 or length == 0:
                raise ValueError("PLTE length not a positive multiple of 3")
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR or IDAT)")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        pixels = _png_unfilter(raw, width, height, channels)
    else:
        out = bytearray(width * height * channels)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (width - x0 + dx - 1) // dx
            hp = (height - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            nbytes = hp * (1 + wp * channels)
            sub = _png_unfilter(raw[off : off + nbytes], wp, hp, channels)
            off += nbytes
            for ry in range(hp):
                y = y0 + ry * dy
                for rx in range(wp):
                    x = x0 + rx * dx
                    s = (ry * wp + rx) * channels
                    d = (y * width + x) * channels
                    out[d : d + channels] = sub[s : s + channels]
        if off != len(raw):
            raise ValueError("interlaced PNG data length mismatch")
        pixels = bytes(out)
    if color_type == 3:
        pixels, channels = _expand_palette(pixels, plte, trns)
    elif bit_depth == 16:
        # big-endian 16-bit samples -> MSB (the standard 16->8 tone
        # mapping); channels returns to the true per-pixel count
        pixels = pixels[::2]
        channels //= 2
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": pixels,
    }


def _expand_palette(
    indices: bytes, plte: bytes, trns: bytes | None
) -> tuple[bytes, int]:
    """PLTE (+ optional tRNS) lookup: index plane -> RGB(A) pixels.

    Vectorized (one fancy-index gather per image) because this runs
    inside the mapInPandas decode hot loop; a per-pixel Python loop
    tripled decode wall on the 16x16 fixture corpus."""
    import numpy as np

    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = np.frombuffer(indices, dtype=np.uint8)
    if idx.size and int(idx.max()) >= pal.shape[0]:
        raise ValueError("palette index out of range")
    if trns is not None:
        alpha = np.full(pal.shape[0], 255, dtype=np.uint8)
        alpha[: min(len(trns), pal.shape[0])] = np.frombuffer(
            trns[: pal.shape[0]], dtype=np.uint8
        )
        pal = np.column_stack([pal, alpha])
    out = pal[idx]
    return out.tobytes(), pal.shape[1]


JPEG_SOI = b"\xff\xd8"

# zigzag scan order (ITU T.81 figure 5): index in scan order -> index
# in row-major 8x8 order
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment, undoing
    0xFF00 byte stuffing and stopping at markers (T.81 section B.1.1.5).
    """

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                # payload truncated right after a 0xFF lead byte
                raise ValueError("truncated JPEG entropy data")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker: the caller resets us between
                # intervals; hitting one mid-read means corrupt data
                raise ValueError("unexpected restart marker in entropy data")
            else:
                # reached the next real marker — pad with 1-bits per
                # spec so trailing EOB reads still complete
                self.pos -= 1
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return out

    def align_to_marker(self) -> None:
        """Drop partial bits and consume a restart marker."""
        self.bits = 0
        self.nbits = 0
        while True:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            if self.data[self.pos] == 0xFF and (
                0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                break
            self.pos += 1
        self.pos += 2


def _build_huffman(bits: list[int], values: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol map from the DHT BITS/HUFFVAL lists
    (T.81 annex C code assignment)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _JpegBitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy data")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude-category sign extension (T.81 F.2.2.1)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_block(coef):
    """Float 2-D inverse DCT of one dequantized 8x8 block (numpy)."""
    import numpy as np

    if not hasattr(_idct_block, "_basis"):
        x = np.arange(8)
        u = np.arange(8)
        c = np.where(u == 0, 1.0 / np.sqrt(2.0), 1.0)
        # basis[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
        _idct_block._basis = (
            c[:, None] / 2.0 * np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16)
        )
    a = _idct_block._basis
    return a.T @ coef @ a


def decode_jpeg(payload: bytes) -> dict:
    """Pure stdlib+numpy JPEG decode (ITU T.81 is public): sequential
    (SOF0/1) AND progressive (SOF2) DCT, 8-bit, Huffman-coded,
    greyscale or YCbCr with any 1/2x chroma subsampling, restart
    intervals, multi-scan files (spectral selection + successive
    approximation with EOB runs — the full T.81 G.2 progressive
    model; round 12, VERDICT r11 #4: a real crawl's progressive
    fraction is large, so those rows now decode instead of carrying
    NULL features). Returns {width, height, channels, pixels} with
    interleaved RGB (or grey) bytes — the same contract as
    `decode_png`. Arithmetic coding, 12-bit precision, lossless and
    hierarchical modes raise NotImplementedError.

    Physical shape: every scan's entropy decode fills per-component
    QUANTIZED coefficient arrays (zigzag order — the natural index for
    the band loops); dequantization + inverse DCT run ONCE at the end
    as a vectorized einsum over all blocks, so the per-block Python
    work is the Huffman loop only.
    """
    import struct

    import numpy as np

    if not payload.startswith(JPEG_SOI):
        raise ValueError("not a JPEG payload")

    def _find_marker(p: int) -> int:
        # end of a scan's entropy data: the next 0xFF that is neither
        # a stuffed zero byte nor a restart marker
        while p + 1 < len(payload):
            if payload[p] == 0xFF and payload[p + 1] != 0x00 and not (
                0xD0 <= payload[p + 1] <= 0xD7
            ):
                return p
            p += 1
        return len(payload)

    pos = 2
    qtables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    comps: list[dict] = []
    coefs: dict[int, object] = {}  # comp id -> int32 (brows, bcols, 64)
    width = height = None
    hmax = vmax = mcux = mcuy = 0
    restart_interval = 0
    progressive = False
    n_scans = 0
    adobe_transform = None

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        # T.81 B.1.1.2: any marker may be preceded by a run of 0xFF
        # fill bytes; skip to the last 0xFF before the marker code.
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec == 0:
                    qtables[tid] = list(seg[p : p + 64])
                    p += 64
                else:
                    qtables[tid] = list(
                        struct.unpack(f">{64}H", seg[p : p + 128])
                    )
                    p += 128
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                huff[(cls, tid)] = _build_huffman(
                    bits, seg[p + 17 : p + 17 + n]
                )
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            progressive = marker == 0xC2
            prec, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                coefs[c["id"]] = np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-DCT/arithmetic JPEG (SOF marker 0x{marker:02x})"
                " unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xEE:  # APP14 — Adobe color-transform tag
            if seg[:5] == b"Adobe" and len(seg) >= 12:
                adobe_transform = seg[11]
        elif marker == 0xDA:  # SOS — decode this scan's entropy data
            if width is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scomps.append(
                    {**comp, "td": tdta >> 4, "ta": tdta & 0x0F}
                )
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            elif ns > 1 and not (ss == 0 and se == 0):
                raise ValueError(
                    "progressive interleaved scan must be DC-only"
                )
            reader = _JpegBitReader(payload, pos + seglen)
            _decode_scan(
                reader, scomps, coefs, huff,
                ss, se, ah, al,
                progressive, restart_interval,
                width, height, hmax, vmax, mcux, mcuy,
            )
            n_scans += 1
            pos = _find_marker(reader.pos)
            continue
        pos += seglen
    if width is None or n_scans == 0:
        raise ValueError("truncated JPEG (missing SOF or SOS)")

    # dequantize + inverse DCT, vectorized over every block at once
    if not hasattr(_idct_block, "_basis"):
        _idct_block(np.zeros((8, 8)))  # build the shared basis
    a = _idct_block._basis
    zig = np.asarray(_ZIGZAG, dtype=np.int64)
    full = []
    for c in comps:
        arr = coefs[c["id"]]
        if c["tq"] not in qtables:
            raise ValueError(f"missing quantization table {c['tq']}")
        q = np.asarray(qtables[c["tq"]], dtype=np.float64)
        brows, bcols, _ = arr.shape
        nat = np.zeros((brows, bcols, 64), dtype=np.float64)
        nat[:, :, zig] = arr.astype(np.float64) * q[None, None, :]
        blocks = nat.reshape(brows, bcols, 8, 8)
        out = np.einsum("ux,rcuv,vy->rcxy", a, blocks, a, optimize=True)
        plane = (
            out.transpose(0, 2, 1, 3).reshape(brows * 8, bcols * 8) + 128.0
        )
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(plane[:height, :width])
    if len(full) == 1:
        out8 = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return {
            "width": width,
            "height": height,
            "channels": 1,
            "pixels": out8.tobytes(),
        }
    if len(full) == 4:
        # Adobe 4-component (round 13): print-media crawls carry CMYK
        # (APP14 transform 0 — stored INVERTED per Adobe convention)
        # or YCCK (transform 2 — CMY channels ride the YCbCr
        # transform, K passes through). Either way the stored planes
        # are inverted, so RGB = stored_channel * stored_K / 255 —
        # the standard libjpeg-consumer convention. No marker defaults
        # to plain inverted CMYK, matching libjpeg.
        if adobe_transform == 2:
            y_, cb, cr, k = full
            c_ = y_ + 1.402 * (cr - 128.0)
            m_ = y_ - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            ye_ = y_ + 1.772 * (cb - 128.0)
        else:
            c_, m_, ye_, k = full
        k = np.clip(k, 0.0, 255.0)
        rgb = np.stack(
            [
                np.clip(np.round(np.clip(ch, 0.0, 255.0) * k / 255.0), 0, 255)
                .astype(np.uint8)
                for ch in (c_, m_, ye_)
            ],
            axis=-1,
        )
        return {
            "width": width,
            "height": height,
            "channels": 3,
            "pixels": rgb.tobytes(),
        }
    if len(full) != 3:
        raise NotImplementedError("only 1-, 3- or 4-component JPEG supported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.round(ch), 0, 255).astype(np.uint8) for ch in (r, g, b)],
        axis=-1,
    )
    return {
        "width": width,
        "height": height,
        "channels": 3,
        "pixels": rgb.tobytes(),
    }


def _decode_scan(
    reader,
    scomps: list,
    coefs: dict,
    huff: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    progressive: bool,
    restart_interval: int,
    width: int,
    height: int,
    hmax: int,
    vmax: int,
    mcux: int,
    mcuy: int,
) -> None:
    """One SOS scan's entropy-coded segment into the coefficient
    arrays (T.81 E.2 sequential / G.2 progressive control flow).
    Per-scan state: DC predictors, the shared EOB run, the restart
    counter — all reset at restart markers. Interleaved scans walk
    the frame MCU grid; single-component scans walk the component's
    OWN block grid (ceil(comp dims / 8), NOT the MCU-padded grid —
    T.81 A.2.2)."""
    preds = {c["id"]: 0 for c in scomps}
    state = {"eobrun": 0}

    def decode_unit(c: dict, coef) -> None:
        if not progressive:
            _seq_block(reader, huff, c, coef, preds)
        elif ss == 0 and ah == 0:
            _dc_first(reader, huff, c, coef, preds, al)
        elif ss == 0:
            # DC refinement: one raw bit per block (G.2 / libjpeg
            # decode_mcu_DC_refine); |= is two's-complement correct
            # for the negative predictors python ints preserve
            if reader.read(1):
                coef[0] |= 1 << al
        elif ah == 0:
            _ac_first(reader, huff, c, coef, ss, se, al, state)
        else:
            _ac_refine(reader, huff, c, coef, ss, se, al, state)

    if len(scomps) > 1:
        units = [(my, mx) for my in range(mcuy) for mx in range(mcux)]
        per_mcu = [
            (c, by, bx)
            for c in scomps
            for by in range(c["v"])
            for bx in range(c["h"])
        ]
    else:
        c0 = scomps[0]
        comp_w = (width * c0["h"] + hmax - 1) // hmax
        comp_h = (height * c0["v"] + vmax - 1) // vmax
        bcols = (comp_w + 7) // 8
        brows = (comp_h + 7) // 8
        units = [(by, bx) for by in range(brows) for bx in range(bcols)]
        per_mcu = None

    count = 0
    for uy, ux in units:
        if restart_interval and count and count % restart_interval == 0:
            reader.align_to_marker()
            for k in preds:
                preds[k] = 0
            state["eobrun"] = 0
        count += 1
        if per_mcu is not None:
            for c, by, bx in per_mcu:
                decode_unit(
                    c, coefs[c["id"]][uy * c["v"] + by, ux * c["h"] + bx]
                )
        else:
            decode_unit(scomps[0], coefs[scomps[0]["id"]][uy, ux])


def _seq_block(reader, huff, c, coef, preds) -> None:
    """Sequential DC+AC decode of one block (quantized, zigzag)."""
    t = _huff_decode(reader, huff[(0, c["td"])])
    diff = _extend(reader.read(t), t) if t else 0
    preds[c["id"]] += diff
    coef[0] = preds[c["id"]]
    ac_t = huff[(1, c["ta"])]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[k] = _extend(reader.read(s), s)
        k += 1


def _dc_first(reader, huff, c, coef, preds, al) -> None:
    """Progressive DC, first pass (Ah=0): diff-coded magnitude at the
    Al point transform (T.81 G.2 / libjpeg decode_mcu_DC_first)."""
    t = _huff_decode(reader, huff[(0, c["td"])])
    diff = _extend(reader.read(t), t) if t else 0
    preds[c["id"]] += diff
    coef[0] = preds[c["id"]] << al


def _ac_first(reader, huff, c, coef, ss, se, al, state) -> None:
    """Progressive AC, first pass over the Ss..Se band: run/size pairs
    at the Al point transform; EOB runs skip whole blocks (T.81
    G.1.2.2 / libjpeg decode_mcu_AC_first)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    ac_t = huff[(1, c["ta"])]
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            coef[k] = _extend(reader.read(s), s) << al
            k += 1
        else:
            if r != 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.read(r)
                break
            k += 16  # ZRL


def _ac_refine(reader, huff, c, coef, ss, se, al, state) -> None:
    """Progressive AC refinement (Ah>0) over the Ss..Se band: newly
    nonzero coefficients arrive as run/1 symbols with a sign bit; every
    already-nonzero coefficient traversed (including during EOB runs)
    reads one correction bit (T.81 G.1.2.3 / libjpeg
    decode_mcu_AC_refine — this is the faithful translation, inner
    advance loop and all)."""
    p1 = 1 << al
    m1 = -(1 << al)
    ac_t = huff[(1, c["ta"])]
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_t)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise ValueError(
                        "invalid refinement symbol (size != 1)"
                    )
                val = p1 if reader.read(1) else m1
            elif r != 15:
                state["eobrun"] = 1 << r
                if r:
                    state["eobrun"] += reader.read(r)
                break
            # advance past r zero-HISTORY positions, refining every
            # nonzero coefficient passed on the way
            while k <= se:
                if coef[k] != 0:
                    if reader.read(1) and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if state["eobrun"] > 0:
        # the block that triggered (or continues) an EOB run still
        # carries correction bits for its remaining nonzero coefficients
        while k <= se:
            if coef[k] != 0:
                if reader.read(1) and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def decode_image_real(payload: bytes) -> dict:
    """Real decode: PIL when available (any format), else the
    pure-stdlib PNG or baseline-JPEG path by magic bytes. Returns
    {width, height, channels, pixels}."""
    try:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        return {
            "width": img.width,
            "height": img.height,
            "channels": len(img.getbands()),
            "pixels": img.tobytes(),
        }
    except ImportError:
        if payload.startswith(JPEG_SOI):
            return decode_jpeg(payload)
        return decode_png(payload)


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width long, height long, channels long,"
    " mean_intensity double, pixel_md5 string, decode_status string"
)


def extract_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distributed REAL decode: mapInPandas over (id, payload) Arrow
    batches, decoding each PNG/JPEG payload and emitting size, channel
    count, mean pixel intensity and an md5 fingerprint of the raw
    pixels. Same batch shape and partitioning as the deterministic
    fake (`extract_media_features`); the decode body is the only
    difference — this is the integration point a JPEG/video codec
    would plug into.

    A real crawl contains formats the decoders refuse (arithmetic-
    coded JPEG, sub-byte palette PNG, truncated files — progressive
    JPEG and Adam7-interlaced PNG decode as of round 12; palette,
    16-bit PNG and 24/32-bit+float WAV as of round 13): those rows
    survive with
    NULL features and `decode_status` = 'unsupported' (explicit
    NotImplementedError guard) or 'corrupt' (anything else), so a
    100 TB run MEASURES its undecodable fraction instead of dying on
    the first odd file — the attrition-report discipline applied to
    media. Healthy rows carry decode_status = 'ok'."""
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"), "payload")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                base = {
                    "doc_id": did,
                    "width": None,
                    "height": None,
                    "channels": None,
                    "mean_intensity": None,
                    "pixel_md5": None,
                }
                if payload is None:
                    rows.append({**base, "decode_status": "corrupt"})
                    continue
                try:
                    img = decode_image_real(bytes(payload))
                except NotImplementedError:
                    rows.append({**base, "decode_status": "unsupported"})
                    continue
                except Exception:
                    rows.append({**base, "decode_status": "corrupt"})
                    continue
                px = img["pixels"]
                rows.append(
                    {
                        "doc_id": did,
                        "width": img["width"],
                        "height": img["height"],
                        "channels": img["channels"],
                        "mean_intensity": (sum(px) / len(px)) if px else 0.0,
                        "pixel_md5": hashlib.md5(px).hexdigest(),
                        "decode_status": "ok",
                    }
                )
            yield pd.DataFrame(rows)

    return src.mapInPandas(decode, schema=IMAGE_FEATURE_SCHEMA)


def extract_media_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distributed 'decode': mapInPandas over (id, payload) batches.

    The fake decode derives width/height/frame-count deterministically
    from the byte length, exercising the real Arrow binary transfer.
    """
    # NULL payloads are unscorable media (the null-embedding rule):
    # dropped here and by the oracle's WHERE text IS NOT NULL
    src = df.filter(F.col("payload").isNotNull()).select(
        F.col(id_col).alias("doc_id"), "payload"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": n,
                    "width": n % 640,
                    "height": n % 480,
                    "n_frames": n % 30 + 1,
                }
            )

    return src.mapInPandas(decode, schema=FEATURE_SCHEMA)


def resize_media(
    df: DataFrame, target_bytes: int = 256, id_col: str = "doc_id"
) -> DataFrame:
    """Distributed 'resize': normalize every payload to `target_bytes`
    (cycle-pad short payloads, truncate long ones).

    Real-image resize would decode -> PIL/opencv resize -> re-encode in
    the same mapInPandas slot (see decode_image_real); the byte-cycling
    fake keeps the operator deterministic with zero media deps while
    exercising the identical binary-in/binary-out Arrow path.
    """
    src = df.select(F.col(id_col).alias("doc_id"), "payload")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fit(b: bytes) -> bytes:
                if not b:
                    return bytes(target_bytes)
                reps = -(-target_bytes // len(b))  # ceil
                return (b * reps)[:target_bytes]

            out = pdf["payload"].map(fit)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "byte_len": out.map(len),
                }
            )

    return src.mapInPandas(
        resize, schema="doc_id long, payload binary, byte_len long"
    )


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_len long, frame_md5 string"


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 16,
    every_n: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed frame sampling: each payload is treated as a 'video'
    of fixed-size byte frames; every `every_n`-th frame is emitted as
    its own row (fan-out through Arrow — the row-multiplying shape real
    video frame extraction has).

    Frame count uses the same deterministic fake as
    extract_media_features (byte_len % 30 + 1). Frames are fingerprinted
    as md5 over the UPPERCASE HEX of the frame bytes — hex because the
    SQL oracle can slice hex(payload) but has no byte-level blob ops,
    so both engines hash the same string representation.
    """
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"), "payload")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, md5s = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # NULL payload -> no frames (mirrors the oracle's
                    # NULL-text drop; octet_length(NULL) unnests nothing)
                    continue
                b = bytes(payload)
                n_frames = len(b) % 30 + 1
                for i in range(0, n_frames, every_n):
                    chunk = b[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(chunk))
                    md5s.append(
                        hashlib.md5(chunk.hex().upper().encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_len": lens,
                    "frame_md5": md5s,
                }
            )

    return src.mapInPandas(frames, schema=FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_channels long, sample_rate long, n_samples long,"
    " duration_sec double, rms double, peak long"
)


def decode_wav(payload: bytes) -> dict:
    """Real audio decode (RIFF/WAVE): returns {n_channels, sample_rate,
    n_samples, samples} with 16-bit signed samples — every width
    normalizes to the int16 contract so rms/peak/ahash are uniform
    downstream (8-bit unsigned rescaled up; 24/32-bit PCM truncated
    down by 8/16 bits — round 13, VERDICT r12 #7; float32 scaled by
    32768 and clamped, exact on int16-representable values). PCM goes
    through the stdlib `wave` module; IEEE-float (format code 3), which
    `wave` rejects, through the pure-struct RIFF fallback."""
    import io
    import struct
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n_channels = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
    except wave.Error:
        return _decode_wav_float(payload)
    if width == 2:
        samples = list(struct.unpack(f"<{n * n_channels}h", raw))
    elif width == 1:
        samples = [(b - 128) << 8 for b in raw]
    elif width == 3:
        samples = [
            (int.from_bytes(raw[i : i + 3], "little", signed=True)) >> 8
            for i in range(0, 3 * n * n_channels, 3)
        ]
    elif width == 4:
        samples = [
            x >> 16 for x in struct.unpack(f"<{n * n_channels}i", raw)
        ]
    else:
        raise NotImplementedError(
            f"{8 * width}-bit WAV unsupported (8/16/24/32 PCM + float32 only)"
        )
    return {
        "n_channels": n_channels,
        "sample_rate": rate,
        "n_samples": n,
        "samples": samples,
    }


def _decode_wav_float(payload: bytes) -> dict:
    """IEEE-float WAV (fmt audio_format 3) via a pure-struct RIFF walk
    — stdlib `wave` only accepts PCM. float32 samples map to int16 as
    clamp(round(x * 32768)): exact on any value that IS an int16/32768
    (the common float-rendered-from-PCM case), saturating otherwise."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("truncated WAV (missing fmt or data chunk)")
    audio_format, n_channels, rate = struct.unpack("<HHI", fmt[:8])
    (bits,) = struct.unpack("<H", fmt[14:16])
    if audio_format != 3:
        raise NotImplementedError(f"WAV format code {audio_format} unsupported")
    if bits != 32:
        raise NotImplementedError(f"{bits}-bit float WAV unsupported (32 only)")
    floats = struct.unpack(f"<{len(data) // 4}f", data[: len(data) // 4 * 4])
    samples = [
        max(-32768, min(32767, int(round(x * 32768.0)))) for x in floats
    ]
    return {
        "n_channels": n_channels,
        "sample_rate": rate,
        "n_samples": len(samples) // max(n_channels, 1),
        "samples": samples,
    }


def extract_audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distributed REAL audio decode: mapInPandas over (id, payload)
    Arrow batches decoding WAV payloads into channel count, sample
    rate, duration, RMS amplitude and peak. Same batch shape as the
    image path; an mp3/flac codec would plug into the same slot."""
    import math

    src = df.select(F.col(id_col).alias("doc_id"), "payload")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = decode_wav(bytes(payload))
                xs = a["samples"]
                rms = math.sqrt(sum(x * x for x in xs) / len(xs)) if xs else 0.0
                rows.append(
                    {
                        "doc_id": did,
                        "n_channels": a["n_channels"],
                        "sample_rate": a["sample_rate"],
                        "n_samples": a["n_samples"],
                        "duration_sec": a["n_samples"] / a["sample_rate"],
                        "rms": rms,
                        "peak": max((abs(x) for x in xs), default=0),
                    }
                )
            yield pd.DataFrame(rows)

    return src.mapInPandas(decode, schema=AUDIO_FEATURE_SCHEMA)


def ahash64(pixels: bytes, width: int, height: int, channels: int) -> int | None:
    """64-bit average hash (aHash) of decoded pixels — ALL-INTEGER so
    the hash is engine- and partition-exact: grayscale = channel sum
    // channels per pixel; the image splits into an 8x8 grid with
    floor boundaries; bit i is set iff cell_sum * total_area >
    total_sum * cell_area (cross-multiplied exact integers — no float
    mean anywhere). Images narrower than the grid are unscorable
    (None), the NULL-embedding rule."""
    if width < 8 or height < 8 or not pixels:
        return None
    if channels < 1 or len(pixels) < width * height * channels:
        # truncated/inconsistent buffer: unscorable row, not an
        # IndexError (the documented unscorable contract)
        return None
    gray = [0] * (width * height)
    for p in range(width * height):
        base = p * channels
        s = 0
        for c in range(channels):
            s += pixels[base + c]
        gray[p] = s // channels
    xb = [(i * width) // 8 for i in range(9)]
    yb = [(i * height) // 8 for i in range(9)]
    sums, areas = [], []
    for gy in range(8):
        for gx in range(8):
            s = 0
            for y in range(yb[gy], yb[gy + 1]):
                row = y * width
                for x in range(xb[gx], xb[gx + 1]):
                    s += gray[row + x]
            sums.append(s)
            areas.append((yb[gy + 1] - yb[gy]) * (xb[gx + 1] - xb[gx]))
    total_sum, total_area = sum(sums), sum(areas)
    h = 0
    for i in range(64):
        if sums[i] * total_area > total_sum * areas[i]:
            h |= 1 << i
    # fold to SIGNED two's complement: bit 63 set would overflow the
    # Arrow/Spark int64 column; banding and XOR-popcount are
    # sign-agnostic
    return h - (1 << 64) if h >= (1 << 63) else h


IMAGE_PHASH_SCHEMA = "doc_id long, width long, height long, ahash long"


def image_phash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, width, height, ahash): distributed perceptual hashing —
    real decode (`decode_image_real`) + the integer-exact `ahash64`
    per Arrow batch. NULL payloads and sub-8x8 images yield NULL
    ahash (unscorable)."""
    src = df.select(F.col(id_col).alias("doc_id"), "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    rows.append(
                        {"doc_id": did, "width": None, "height": None,
                         "ahash": None}
                    )
                    continue
                # a malformed payload is an unscorable IMAGE, never a
                # failed JOB: one truncated crawl image must cost its
                # row, not the stage (the NULL-embedding rule)
                try:
                    img = decode_image_real(bytes(payload))
                    h = ahash64(
                        img["pixels"], img["width"], img["height"],
                        img["channels"],
                    )
                    w_, h_ = img["width"], img["height"]
                except Exception:
                    w_ = h_ = h = None
                rows.append(
                    {"doc_id": did, "width": w_, "height": h_, "ahash": h}
                )
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=IMAGE_PHASH_SCHEMA)


def image_near_dup_pairs(
    hashed: DataFrame,
    max_hamming: int = 5,
    id_col: str = "doc_id",
    max_bucket: int | None | str = "auto",
) -> DataFrame:
    """(id_a, id_b, hamming) for image pairs within `max_hamming` bits
    on their 64-bit aHash — the image analogue of the banded MinHash
    miner: the hash splits into four 16-bit bands and candidates must
    agree exactly on >= 1 band, so the join is keyed (no all-pairs)
    and exact hamming (bit_count of XOR) rescreens candidates.

    Recall guarantee, stated honestly: a pair differing in k bits is
    caught with certainty for k <= 3 (pigeonhole — 3 flips cannot
    touch all 4 bands); for k in {4, 5} only the adversarial spread
    placing >= 1 flip in EVERY band evades, vanishingly rare for real
    near-identical images whose differences cluster in a few cells —
    the standard multi-index tradeoff (Lv et al., multi-probe LSH).

    `max_bucket` is the same size-gated hot-bucket guard as
    `minhash_lsh_pairs`: crawl corpora carry huge volumes of identical
    blank/black images whose aHash is a constant (all four band keys
    shared by every one of them), making the banded self-join
    quadratic in that one bucket. Band-key groups larger than the cap
    are DROPPED from candidate generation — a bucket beyond any
    plausible duplicate-group size is a degenerate constant image, not
    a near-dup signal. ``"auto"`` resolves through the shared
    size-gate (small provable inputs run uncapped, bit-identical to
    the historical plan; large/unknown inputs get the cap); pass
    ``None`` for explicitly uncapped.
    """
    if not 0 <= max_hamming <= 64:
        raise ValueError(f"max_hamming must be in [0, 64], got {max_hamming}")
    from chroma_rs_spark.operators.dedup import _resolve_max_bucket

    h = hashed.filter(F.col("ahash").isNotNull()).select(
        F.col(id_col).alias("_id"), F.col("ahash").alias("_h")
    )
    max_bucket = _resolve_max_bucket(h, max_bucket)
    bands = h.select(
        "_id",
        "_h",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), b -> struct(b AS band,"
                " shiftright(_h, b * 16) & 65535 AS key))"
            )
        ).alias("_b"),
    ).select("_id", "_h", F.col("_b.band").alias("_band"), F.col("_b.key").alias("_key"))
    if max_bucket is not None:
        keep = (
            bands.groupBy("_band", "_key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= F.lit(int(max_bucket)))
            .select("_band", "_key")
        )
        bands = bands.join(keep, ["_band", "_key"], "left_semi")
    a = bands.select(
        F.col("_id").alias("id_a"), F.col("_h").alias("_ha"), "_band", "_key"
    )
    b = bands.select(
        F.col("_id").alias("id_b"), F.col("_h").alias("_hb"), "_band", "_key"
    )
    return (
        a.join(b, ["_band", "_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= F.lit(int(max_hamming)))
        .distinct()
    )


def audio_ahash64(samples: list[int], n_channels: int) -> int | None:
    """64-bit energy-envelope hash of decoded PCM — the audio analogue
    of `ahash64`, all-integer for the same engine/partition-exactness:
    mixdown = channel sum per frame (no division), 64 floor-boundary
    windows over the frame sequence, bit i set iff the window's summed
    ABSOLUTE mixdown, cross-multiplied against the global sum, exceeds
    its share (window_sum * total_frames > total_sum * window_len).
    Clips shorter than 64 frames are unscorable (None)."""
    if not samples or n_channels < 1:
        return None
    n_frames = len(samples) // n_channels
    if n_frames < 64:
        return None
    # vectorized mixdown + prefix sums (guide §4.2): the per-frame
    # Python generator loop dominated the decode task. int64 is exact
    # here — samples are int16-normalized, so even a year-long clip's
    # total absolute sum stays far below 2**63 — and the 64 window
    # comparisons fold in arbitrary-precision Python ints, so the bits
    # match the scalar loop bit-for-bit.
    import numpy as np

    arr = np.asarray(samples[: n_frames * n_channels], dtype=np.int64)
    mix = np.abs(arr.reshape(n_frames, n_channels).sum(axis=1))
    csum = np.concatenate(([0], np.cumsum(mix)))
    wb = [(i * n_frames) // 64 for i in range(65)]
    total_sum, total_len = int(csum[n_frames]), n_frames
    h = 0
    for i in range(64):
        s = int(csum[wb[i + 1]] - csum[wb[i]])
        if s * total_len > total_sum * (wb[i + 1] - wb[i]):
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


AUDIO_PHASH_SCHEMA = "doc_id long, n_samples long, sample_rate long, ahash long"


def audio_phash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_samples, sample_rate, ahash): distributed audio
    fingerprinting — real WAV decode + `audio_ahash64` per Arrow
    batch; NULL payloads and sub-64-frame clips yield NULL ahash.
    Near-dup mining reuses `hash_band_pairs` (the hash is the same
    64-bit banded domain as the image hash)."""
    src = df.select(F.col(id_col).alias("doc_id"), "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    rows.append(
                        {"doc_id": did, "n_samples": None,
                         "sample_rate": None, "ahash": None}
                    )
                    continue
                # malformed/unsupported (24/32-bit) WAV: unscorable
                # row, never a failed job — same rule as image_phash
                try:
                    wav = decode_wav(bytes(payload))
                    rows.append(
                        {
                            "doc_id": did,
                            "n_samples": wav["n_samples"],
                            "sample_rate": wav["sample_rate"],
                            "ahash": audio_ahash64(
                                wav["samples"], wav["n_channels"]
                            ),
                        }
                    )
                except Exception:
                    rows.append(
                        {"doc_id": did, "n_samples": None,
                         "sample_rate": None, "ahash": None}
                    )
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=AUDIO_PHASH_SCHEMA)


# the banded 64-bit near-dup miner is hash-domain agnostic: same
# machinery for image aHash and audio energy hash
hash_band_pairs = image_near_dup_pairs


def video_near_dup_pairs(
    frames: DataFrame,
    min_shared: int = 2,
    max_df: int | None = 1000,
    id_col: str = "doc_id",
    frame_col: str = "frame_md5",
) -> DataFrame:
    """(id_a, id_b, n_shared) for videos sharing >= `min_shared`
    distinct frame fingerprints — video-level near-dup over a
    `sample_frames` output (re-encoded or trimmed copies keep most
    sampled frames; the shared-fingerprint count survives both). Same
    inverted-index shape as the shingle pair miner: the join is keyed
    on the fingerprint, so only videos sharing a frame ever meet, and
    `max_df` drops ubiquitous frames (real corpora: black/intro
    frames) from candidate generation before the join can degenerate —
    the shingle `max_df` / LSH hot-bucket guard applied to frames.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    f = frames.select(
        F.col(id_col).alias("_id"), F.col(frame_col).alias("_f")
    ).distinct()
    if max_df is not None:
        keep = (
            f.groupBy("_f")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= F.lit(int(max_df)))
            .select("_f")
        )
        f = f.join(keep, "_f", "left_semi")
    a = f.select(F.col("_id").alias("id_a"), "_f")
    b = f.select(F.col("_id").alias("id_b"), "_f")
    return (
        a.join(b, "_f")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= F.lit(int(min_shared)))
    )
