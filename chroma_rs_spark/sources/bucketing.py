"""Bucketed tables for shuffle-free co-located joins (SURVEY.md §2.3
joins row; the "pre-partitioning / bucketing" lever of the 100 TB
design).

A join between two tables bucketed on the join key with the same
bucket count needs NO exchange on either side: each task zips bucket i
with bucket i. At 100 TB this converts the dominant fact-fact shuffle
(e.g. orders ⋈ lineitem on orderkey, re-run by every downstream
pipeline) into a one-time cost paid when the bucketed copy is written.

The write itself shuffles once into `n_buckets` files per partition —
so bucketing pays off when the table is joined on that key more than
once, which is exactly the shape of a curated fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 8,
    sort_cols: list[str] | str | None = None,
) -> DataFrame:
    """Persist `df` as a bucketed (optionally sorted) managed table and
    return the re-read table. Sorting within buckets additionally
    enables sort-merge joins with no per-task sort."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    spark = df.sparkSession
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    return spark.table(table_name)
