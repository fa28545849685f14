"""Multimodal column plumbing (SURVEY.md §2.3 [EXT]).

Images/audio/video are opaque BINARY columns + typed metadata. The
Spark-side plumbing (schema, Arrow batch shape, mapInPandas UDF
signature, partitioning) is real and tested, and so is image decode:

* `decode_image_real` uses PIL when importable (any format) and
  otherwise a pure-stdlib PNG decoder (`decode_png`: zlib inflate +
  scanline unfilter per the public PNG spec) — no NotImplementedError
  in the default path; JPEG/video without PIL remain explicit
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


def decode_png(payload: bytes) -> dict:
    """Pure-stdlib PNG decode (zlib + struct; PNG spec is public):
    returns {width, height, channels, pixels} for 8-bit greyscale /
    RGB / RGBA / grey+alpha, non-interlaced images — the real decode
    path when no media library exists in the environment."""
    import struct
    import zlib

    if not payload.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG payload")
    pos = len(PNG_SIGNATURE)
    width = height = None
    channels = None
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
            if bit_depth != 8 or color_type not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG bit_depth={bit_depth} color_type={color_type} "
                    "unsupported (8-bit grey/RGB/RGBA only)"
                )
            if interlace != 0:
                raise NotImplementedError("interlaced PNG unsupported")
            channels = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR or IDAT)")
    raw = zlib.decompress(bytes(idat))
    pixels = _png_unfilter(raw, width, height, channels)
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": pixels,
    }


def decode_image_real(payload: bytes) -> dict:
    """Real decode: PIL when available (any format), else the
    pure-stdlib PNG path. Returns {width, height, channels, pixels}."""
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
        return decode_png(payload)


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width long, height long, channels long,"
    " mean_intensity double, pixel_md5 string"
)


def extract_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distributed REAL decode: mapInPandas over (id, payload) Arrow
    batches, decoding each PNG payload and emitting size, channel
    count, mean pixel intensity and an md5 fingerprint of the raw
    pixels. Same batch shape and partitioning as the deterministic
    fake (`extract_media_features`); the decode body is the only
    difference — this is the integration point a JPEG/video codec
    would plug into."""
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"), "payload")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image_real(bytes(payload))
                px = img["pixels"]
                rows.append(
                    {
                        "doc_id": did,
                        "width": img["width"],
                        "height": img["height"],
                        "channels": img["channels"],
                        "mean_intensity": (sum(px) / len(px)) if px else 0.0,
                        "pixel_md5": hashlib.md5(px).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return src.mapInPandas(decode, schema=IMAGE_FEATURE_SCHEMA)


def extract_media_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distributed 'decode': mapInPandas over (id, payload) batches.

    The fake decode derives width/height/frame-count deterministically
    from the byte length, exercising the real Arrow binary transfer.
    """
    src = df.select(F.col(id_col).alias("doc_id"), "payload")

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
                b = bytes(payload) if payload is not None else b""
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
    """Real audio decode via the stdlib `wave` module (RIFF/WAVE PCM):
    returns {n_channels, sample_rate, n_samples, samples} with 16-bit
    signed samples (8-bit unsigned rescaled to signed 16 for a uniform
    downstream contract)."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    if width == 2:
        samples = list(struct.unpack(f"<{n * n_channels}h", raw))
    elif width == 1:
        samples = [(b - 128) << 8 for b in raw]
    else:
        raise NotImplementedError(f"{8 * width}-bit WAV unsupported (8/16 only)")
    return {
        "n_channels": n_channels,
        "sample_rate": rate,
        "n_samples": n,
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
