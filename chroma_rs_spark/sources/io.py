"""Collection export / import across file formats (SURVEY.md §2.3
scans/sinks row).

Parquet is the native at-rest format (columnar, typed arrays); JSON
and CSV are interchange formats: JSON keeps nested types via Spark's
native encoder, CSV — which has no nested types — flattens the
embedding to a `;`-joined string and the metadata map to a JSON
string, and the importer reverses both (floats round-trip through
repr; multi-line documents survive via multiLine+escape). Known CSV
caveat: an empty-string document reads back as NULL — CSV cannot
distinguish the two; use parquet/json where that matters.

All three paths are plain `df.write`/`spark.read` — distributed,
partitioned, no driver materialization — so an export is usable as a
100 TB data-exchange job, not just a debug dump.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chroma_rs_spark.catalog import Collection, Engine

FORMATS = ("parquet", "json", "csv")

ITEM_SCHEMA = (
    "id STRING, embedding ARRAY<FLOAT>, embedding_norm DOUBLE, "
    "document STRING, metadata MAP<STRING,STRING>"
)


def export_collection(
    engine: Engine, coll: Collection, path: str, fmt: str = "parquet"
) -> None:
    """Write a collection's items to `path` in `fmt`."""
    from chroma_rs_spark import collection as item_ops

    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    df = item_ops.items_df(engine, coll)
    if fmt == "csv":
        df = df.select(
            "id",
            F.array_join(F.col("embedding").cast("array<string>"), ";").alias(
                "embedding"
            ),
            "embedding_norm",
            "document",
            F.to_json("metadata").alias("metadata"),
        )
        # escape=" matches the reader below so embedded quotes/newlines
        # survive the round trip
        (
            df.write.mode("overwrite")
            .option("header", "true")
            .option("escape", '"')
            .csv(path)
        )
    else:
        df.write.mode("overwrite").format(fmt).save(path)


def read_items(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read item-shaped rows exported by `export_collection`."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {FORMATS}")
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        return spark.read.schema(ITEM_SCHEMA).json(path)
    raw = (
        spark.read.option("header", "true")
        .option("multiLine", "true")  # documents may contain newlines
        .option("escape", '"')
        .csv(path)
    )
    return raw.select(
        "id",
        F.split("embedding", ";").cast("array<float>").alias("embedding"),
        F.col("embedding_norm").cast("double"),
        "document",
        F.from_json("metadata", "map<string,string>").alias("metadata"),
    )
