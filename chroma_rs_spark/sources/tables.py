"""Parquet sources for the driver's test tables (TESTDATA.md).

Scans are plain `spark.read.parquet` so Catalyst gets predicate
pushdown, column pruning and partition-splitting for free; at 100 TB
these would be directory-partitioned datasets and the same call sites
would pick up partition pruning with zero code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (region/nation are fixed-cardinality; supplier/part grow slowly).
BROADCAST_TABLES = frozenset({"region", "nation"})

# The embeddings table's vector dimension (TESTDATA.md contract). A
# vector collection always knows its dim (the catalog registry records
# it at first add); suite queries pass it so distance expressions take
# the unrolled whole-stage-codegen path (functions/vector.py).
EMBEDDING_DIM = 64


# (session, sf_dir, table) -> DataFrame. DataFrames are immutable plan
# handles, so sharing one scan relation across queries is safe and
# skips the parquet footer read + relation resolution that otherwise
# repeats per query (the dominant share of driver-side plan-build
# time when a suite runs many queries against the same tables).
# Keyed on the SparkSession object itself: a stopped session's entries
# simply go stale and a new session builds fresh scans.
# The value keeps a strong reference to the session so its id() can
# never be recycled onto a different live session.
_SCAN_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (id(spark), os.path.abspath(sf_dir), name)
    cached = _SCAN_CACHE.get(key)
    if cached is not None and cached[0] is spark:
        return cached[1]
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as either parquet TIMESTAMP(NANOS) or
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) across testdata
        # generations; normalize both to session-tz TIMESTAMP so the
        # column always carries the same microsecond instants DuckDB
        # reads (session tz is UTC, so the NTZ->LTZ cast is value-
        # preserving).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
        from pyspark.sql import functions as F

        ts_type = dict(raw.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos-as-long: integer `div` (not `/`) — ns values exceed
            # 2^53, double division would lose precision
            df = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            df = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(path)
    _SCAN_CACHE[key] = (spark, df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view so `spark.sql` queries work."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
