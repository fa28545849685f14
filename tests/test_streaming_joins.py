"""Stream-stream interval join and streaming dedup: the streaming
results must match the batch twins once the stream is drained."""

import glob
import os
import shutil
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chroma_rs_spark.sources.tables import load_table
from chroma_rs_spark.streaming.events import read_events_stream
from chroma_rs_spark.streaming.joins import (
    click_purchase_interval_join,
    dedup_events,
)
from tests.conftest import SF001_DIR
from tests.test_streaming import drain_to_memory


def _split(ev):
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return clicks, purchases


def test_interval_join_batch_matches_manual(spark):
    ev = load_table(spark, SF001_DIR, "events")
    got = click_purchase_interval_join(*_split(ev))
    assert not got.isStreaming
    manual = spark.sql(
        """
        SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
               p.value AS purchase_value, c.event_id AS click_id, c.ts AS click_ts
        FROM (SELECT * FROM {ev} WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM {ev} WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        """,
        ev=ev,
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, manual.collect()))
    assert a == b
    assert len(a) > 0


def test_interval_join_stream_matches_batch(spark):
    batch = click_purchase_interval_join(
        *_split(load_table(spark, SF001_DIR, "events"))
    )
    expected = sorted(
        (r["purchase_id"], r["click_id"]) for r in batch.collect()
    )
    stream = click_purchase_interval_join(
        *_split(read_events_stream(spark, SF001_DIR))
    )
    assert stream.isStreaming
    drain_to_memory(stream, "ssjoin_t", mode="append")
    got = sorted(
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM ssjoin_t").collect()
    )
    # inner stream-stream joins emit eagerly on match; with a single
    # availableNow drain every on-time pair is emitted
    assert got == expected


def _write_stream_files(spark, tmp_path, dfs, dirname):
    src = tmp_path / dirname
    src.mkdir()
    now = time.time()
    for i, df in enumerate(dfs):
        staging = tmp_path / f"{dirname}_staging{i}"
        df.coalesce(1).write.parquet(str(staging))
        (part,) = glob.glob(str(staging / "part-*.parquet"))
        dst = src / f"f{i}.parquet"
        shutil.copy(part, str(dst))
        os.utime(dst, (now - 100 + i, now - 100 + i))
    return src


def test_dedup_stream_suppresses_cross_batch_duplicates(spark, tmp_path):
    base = pd.Timestamp("2024-01-01 10:00:00")
    schema = "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"
    mk = lambda rows: spark.createDataFrame(
        [(i, (base + pd.Timedelta(minutes=m)).to_pydatetime(), u, v)
         for (i, m, u, v) in rows],
        schema,
    )
    # event 1 repeats within the same batch AND again in the next batch,
    # both within the 1h watermark horizon of its first occurrence
    src = _write_stream_files(
        spark,
        tmp_path,
        [
            mk([(1, 0, 10, 1.0), (1, 1, 10, 1.0), (2, 2, 11, 2.0)]),
            mk([(1, 3, 10, 1.0), (3, 4, 12, 3.0)]),
        ],
        "dedup_src",
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = dedup_events(stream, keys=["event_id"], watermark="1 hour")
    assert out.isStreaming
    drain_to_memory(out, "dedup_t", mode="append")
    rows = spark.sql("SELECT event_id FROM dedup_t").collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]


def test_dedup_batch_twin(spark):
    ev = load_table(spark, SF001_DIR, "events")
    doubled = ev.unionByName(ev)
    assert dedup_events(doubled).count() == ev.select("event_id").distinct().count()


def test_dedup_batch_keeps_earliest_and_is_order_independent(spark):
    # batch first-arrival semantics: the keeper per key is the row with
    # the smallest (ts, event_id) — identical no matter how the input
    # is partitioned or ordered (dropDuplicates would not be)
    from datetime import datetime

    def t(h):
        return datetime(2026, 1, 1, h)

    rows = [
        (10, t(10), 1, "click", 1.0),
        (11, t(9), 1, "click", 2.0),  # earliest -> keeper
        (12, t(9), 1, "click", 3.0),  # same ts, higher id
        (13, t(8), 2, "click", 4.0),
        (14, t(12), 1, "buy", 5.0),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    fwd = spark.createDataFrame(rows, schema)
    rev = spark.createDataFrame(list(reversed(rows)), schema).repartition(5)
    keys = ["user_id", "event_type"]
    got_f = sorted(tuple(r) for r in dedup_events(fwd, keys=keys).collect())
    got_r = sorted(tuple(r) for r in dedup_events(rev, keys=keys).collect())
    assert got_f == got_r
    assert sorted(r[0] for r in got_f) == [11, 13, 14]


def test_dedup_batch_missing_order_columns_raises_clearly(spark):
    df = spark.createDataFrame([(1, "click")], "user_id long, event_type string")
    with pytest.raises(ValueError, match="ordering columns"):
        dedup_events(df, keys=["user_id", "event_type"])


def test_stream_dedup_within_watermark_reemission(spark):
    """The suite row's 3-batch fixture exercises both sides of the
    dropDuplicatesWithinWatermark guarantee on real data: every
    delivered key emits exactly once per state generation, and keys
    reused a full eviction band after their day-1 state re-emit
    (n_emitted = 2) — the documented within-watermark boundary."""
    from pyspark.sql import functions as F

    from chroma_rs_spark.suite.streaming import q_stream_dedup_within_wm
    from tests.conftest import SF001_DIR

    out = q_stream_dedup_within_wm(spark, SF001_DIR)
    counts = {r["k"]: r["n_emitted"] for r in out.collect()}
    assert set(counts.values()) <= {1, 2}
    reemitted = [k for k, n in counts.items() if n == 2]
    assert len(reemitted) > 0  # the fixture plants live re-emissions
    # re-emitted keys are exactly day-1 keys re-delivered on day 3
    ev = (
        load_table(spark, SF001_DIR, "events")
        .select(
            F.concat(
                F.col("user_id").cast("string"),
                F.lit(":"),
                F.col("event_type"),
            ).alias("k"),
            "ts",
        )
        .filter(F.col("k").isNotNull() & F.col("ts").isNotNull())
    )
    k1 = {
        r["k"]
        for r in ev.filter(
            (F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-02")
        ).select("k").distinct().collect()
    }
    assert set(reemitted) <= k1
