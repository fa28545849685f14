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
