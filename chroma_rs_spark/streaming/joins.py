"""Stream-stream joins and streaming deduplication (SURVEY.md §2.3
[EXT] streaming).

Like `streaming/events.py`, every transformation is written against a
plain DataFrame so the SAME function serves batch (oracle-checkable)
and `readStream` inputs. Watermarks are attached only when the input
is streaming.

Scale notes (100 TB / unbounded streams):

- The interval join keeps per-key state bounded by BOTH watermarks
  plus the interval width: Spark evicts buffered rows once the other
  side's watermark passes `ts + horizon`. Without the time-bound
  condition the state store would grow forever — the interval
  condition is load-bearing, not an optimization.
- Inner stream-stream joins emit eagerly on match (no watermark wait);
  the watermark only drives state cleanup, so latency stays low.
- `dropDuplicatesWithinWatermark` holds one state row per key within
  the watermark horizon — O(distinct keys in horizon), not O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner interval join: each (purchase, click) pair for the same
    user where the click happened within `horizon` before the purchase.

    Batch: a hash equi-join on user_id with a range filter (the same
    physical shape as `suite/temporal.py::q_error_prior_clicks`).
    Stream-stream: both sides watermarked; the interval condition
    bounds the join state store.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (c["c_user"] == p["p_user"])
        & (c["click_ts"] <= p["purchase_ts"])
        & (c["click_ts"] >= p["purchase_ts"] - F.expr(f"INTERVAL {horizon}"))
    )
    return c.join(p, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )


def dedup_events(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
    event_time: str = "ts",
    order_id: str = "event_id",
) -> DataFrame:
    """Exactly-once event delivery by key.

    Streaming: `dropDuplicatesWithinWatermark(keys)` — duplicates
    arriving within the watermark horizon of the first occurrence are
    suppressed while state stays bounded (the batch-mode
    unbounded-memory variant of streaming dropDuplicates is exactly
    what this avoids at scale).

    Batch twin: keep the EARLIEST row per key by (event_time,
    order_id) — deterministic, unlike `dropDuplicates(keys)` which
    keeps an arbitrary partition-order-dependent row, and the faithful
    batch reading of the stream's first-arrival-wins semantics (in
    event-time replay the earliest event IS the first arrival). One
    key-partitioned window shuffle; at 100 TB this is the same
    hash-shuffle-on-key shape as the streaming state store.
    """
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    missing = [c for c in (event_time, order_id) if c not in events.columns]
    if missing:
        raise ValueError(
            f"dedup_events batch mode keeps the earliest row per key and "
            f"needs the ordering columns {missing} (pass event_time=/"
            f"order_id= to point at your frame's columns)"
        )
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(
        F.col(event_time).asc(), F.col(order_id).asc()
    )
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
