"""Event-time windowed operators (SURVEY.md §2.3 [EXT] streaming).

Every transformation here is expressed on a plain DataFrame, so the
SAME function runs in batch mode (for the DuckDB-oracle correctness
gate) and on a `readStream` DataFrame (for real streaming) — that
batch/stream symmetry is the point of Structured Streaming's model.

Watermarks are applied only on streaming inputs (`df.isStreaming`):
in batch they'd be a no-op anyway; in streaming they bound state and
drop late data.

At scale: windowed groupBys shuffle on (window, key); state store size
is bounded by watermark horizon x key cardinality. Session windows use
Spark's native `session_window` (state-merging implementation), not a
collect-and-sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """`events` as a file-source stream (same ts normalization as batch).

    The stream schema is taken from the batch reader so the source
    adapts to whichever physical ts type (ns-int64 or us-timestamp)
    this testdata generation shipped with.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # the file stream source requires a directory; glob-filter the
    # events file(s) out of the scale-factor dir
    raw = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _maybe_watermark(df: DataFrame, watermark: str | None) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark("ts", watermark)
    return df


def tumbling_window_counts(
    events: DataFrame, width: str = "10 minutes", watermark: str | None = "1 hour"
) -> DataFrame:
    """Per-(window, event_type) count + exact value sum."""
    ev = _maybe_watermark(events, watermark)
    return (
        ev.groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_tv"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            F.col("_tv").cast("double").alias("total_value"),
        )
    )


def sliding_window_counts(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    ev = _maybe_watermark(events, watermark)
    return (
        ev.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "1 hour"
) -> DataFrame:
    """Native session windows per user: merge events closer than `gap`;
    window end = last event + gap (half-open)."""
    ev = _maybe_watermark(events, watermark)
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def top_event_types_per_window(counts: DataFrame, k: int = 2) -> DataFrame:
    """Batch finisher for the trending pattern: rank event types by
    count inside each window, keep the top k (ties broken by type name
    for determinism).

    Rank-over-window is not expressible inside a streaming aggregation
    (Spark rejects non-time windows on streaming plans), so production
    trending is two-stage there too: stream the windowed counts to a
    sink, rank the (tiny, windows x types) result in batch — exactly
    what this pair of functions models. See
    tests/test_streaming.py::test_stream_trending_matches_batch.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        counts.select(
            "window_start",
            "event_type",
            "n_events",
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def trending_event_types(
    events: DataFrame,
    width: str = "10 minutes",
    k: int = 2,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Top-k event types per tumbling window (batch composition)."""
    counts = tumbling_window_counts(events, width, watermark)
    return top_event_types_per_window(counts, k)
