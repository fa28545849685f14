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
