"""Training-shard output: range-partitioned, in-shard-sorted parquet
with an auditable manifest.

The layout every large-scale training pipeline wants its curated
corpus in: N shards whose key ranges are DISJOINT and whose rows are
sorted within each shard — so a data loader can map shard -> worker
deterministically, seek by key, and reproduce the exact global order
(shard ranges ascending, rows ascending inside). On Spark this is
`repartitionByRange` (reservoir-samples the key distribution, so
shards balance even on skewed keys — the planner's own range
exchange) + `sortWithinPartitions`, which needs NO global sort: one
shuffle, each shard sorts locally.

`target_shard_mb` sizes N from the optimizer's own plan estimate
(`plan_size_bytes`, the same statistic the broadcast gates use) so
callers declare intent ("~512 MB shards") instead of hand-counting —
at 100 TB that is the difference between a config constant that rots
and a layout that tracks the data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    sort_by: str = "doc_id",
    target_shard_mb: int = 512,
    mode: str = "error",
) -> int:
    """Write `df` as range-sharded, in-shard-sorted parquet under
    `path`; returns the shard count used.

    `n_shards` explicit, or derived from the optimizer size estimate /
    `target_shard_mb` (minimum 1; unknown estimate falls back to the
    current partition count). One file per shard (each range partition
    writes exactly one parquet part), ranges disjoint by construction.
    """
    if n_shards is None:
        from chroma_rs_spark.plans.partitioning import plan_size_bytes

        est = plan_size_bytes(df)
        # the optimizer reports Long.MaxValue-ish for unknown-size
        # relations — treat anything past 1 PB as unknown, not as a
        # 2-billion-shard request
        if 0 <= est < (1 << 50):
            n_shards = max(1, math.ceil(est / (target_shard_mb * (1 << 20))))
        else:
            n_shards = max(1, df.rdd.getNumPartitions())
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if n_shards > 1_000_000:
        raise ValueError(
            f"n_shards {n_shards} is past any sane layout; pass it explicitly"
        )
    (
        df.repartitionByRange(n_shards, F.col(sort_by))
        .sortWithinPartitions(sort_by)
        .write.mode(mode)
        .parquet(path)
    )
    return n_shards


def shard_manifest(
    spark: SparkSession, path: str, sort_by: str = "doc_id"
) -> DataFrame:
    """(shard_file, n_rows, min_key, max_key) per shard file — the
    audit a consumer runs before trusting a layout: ranges must be
    disjoint and row counts roughly even. One scan, one small groupBy
    (|files| result rows)."""
    return (
        spark.read.parquet(path)
        .select(
            F.input_file_name().alias("shard_file"), F.col(sort_by).alias("_k")
        )
        .groupBy("shard_file")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("_k").alias("min_key"),
            F.max("_k").alias("max_key"),
        )
    )


def assert_disjoint_shards(manifest: DataFrame) -> None:
    """Raise if any two shards' [min_key, max_key] ranges overlap —
    collects |files| rows only."""
    rows = sorted(
        manifest.select("shard_file", "min_key", "max_key").collect(),
        key=lambda r: (r["min_key"], r["max_key"]),
    )
    for prev, cur in zip(rows, rows[1:]):
        if cur["min_key"] <= prev["max_key"]:
            raise ValueError(
                f"overlapping shard ranges: {prev['shard_file']} "
                f"[..{prev['max_key']}] vs {cur['shard_file']} "
                f"[{cur['min_key']}..]"
            )
