"""Multimodal column plumbing (SURVEY.md §2.3 [EXT]).

Images/audio/video are opaque BINARY columns + typed metadata. The
Spark-side plumbing (schema, Arrow batch shape, mapInPandas UDF
signature, partitioning) is real and tested; the actual media decode
is STUBBED because no image/audio libraries exist in this container:

* `decode_image_real` raises NotImplementedError unless PIL is
  importable (it is not here) — the integration point is explicit.
* `extract_media_features` uses a deterministic fake decode (pure
  arithmetic on byte length) so the full distributed path — binary
  payloads through Arrow into pandas and back — runs and is
  oracle-checkable.

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


def decode_image_real(payload: bytes):
    """Real decode path — explicit stub (no media libs in container)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires pillow; container provides no media libs "
            "— deterministic fake decode is used instead (extract_media_features)"
        ) from e
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")


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
