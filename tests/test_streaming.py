"""Streaming-mode tests: the same window functions over readStream
must produce the batch answers once the stream is drained."""

import pytest
from pyspark.sql import functions as F

from chroma_rs_spark.sources.tables import load_table
from chroma_rs_spark.streaming.events import (
    read_events_stream,
    session_window_agg,
    tumbling_window_counts,
)
from tests.conftest import SF001_DIR


def drain_to_memory(stream_df, name: str, mode: str = "complete"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_tumbling_matches_batch(spark):
    batch = tumbling_window_counts(load_table(spark, SF001_DIR, "events"))
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    stream = tumbling_window_counts(read_events_stream(spark, SF001_DIR))
    assert stream.isStreaming
    drain_to_memory(stream, "tumbling_t")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM tumbling_t").collect()
    }
    assert got == expected


def test_stream_session_windows_matches_batch(spark):
    batch = session_window_agg(load_table(spark, SF001_DIR, "events"))
    expected = sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect()
    )
    stream = session_window_agg(read_events_stream(spark, SF001_DIR))
    drain_to_memory(stream, "sessions_t")
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_t").collect()
    )
    assert got == expected


def test_watermark_applied_on_stream_only(spark):
    stream = read_events_stream(spark, SF001_DIR)
    wm = tumbling_window_counts(stream, watermark="1 hour")
    assert "EventTimeWatermark" in wm._jdf.queryExecution().analyzed().toString()
    batch = tumbling_window_counts(load_table(spark, SF001_DIR, "events"))
    assert "EventTimeWatermark" not in batch._jdf.queryExecution().analyzed().toString()


def test_stateful_running_totals_matches_batch(spark):
    from chroma_rs_spark.streaming.stateful import running_user_totals

    batch = (
        load_table(spark, SF001_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    expected = {r["user_id"]: (r["n_events"], r["total_value"]) for r in batch.collect()}

    stream = running_user_totals(read_events_stream(spark, SF001_DIR))
    assert stream.isStreaming
    drain_to_memory(stream, "running_t", mode="update")
    # update mode emits one row per (user, trigger); last row per user
    # is the final cumulative state. Single input file -> one trigger,
    # but don't rely on it: take max n_events per user.
    rows = spark.sql(
        "SELECT user_id, max_by(struct(n_events, total_value), n_events) s "
        "FROM running_t GROUP BY user_id"
    ).collect()
    got = {r["user_id"]: (r["s"]["n_events"], r["s"]["total_value"]) for r in rows}
    assert set(got) == set(expected)
    for u, (n, tv) in expected.items():
        assert got[u][0] == n
        assert abs(got[u][1] - tv) < 1e-6


def test_stream_add_ingests_and_dedups(spark, engine, tmp_path):
    import pyspark.sql.functions as SF

    from chroma_rs_spark.streaming.ingest import stream_add

    src = tmp_path / "items_src"
    src.mkdir()
    df1 = spark.createDataFrame(
        [("a", [1.0, 0.0], "doc a"), ("b", [0.0, 1.0], "doc b")],
        "id STRING, embedding ARRAY<FLOAT>, document STRING",
    )
    df2 = spark.createDataFrame(
        [("b", [0.0, 1.0], "doc b"), ("c", [1.0, 1.0], "doc c")],  # b repeats
        "id STRING, embedding ARRAY<FLOAT>, document STRING",
    )
    # the file stream source lists flat files: extract the single part
    # file from each batch write into the watched directory
    import glob
    import shutil

    for i, df in enumerate((df1, df2)):
        staging = tmp_path / f"staging{i}"
        df.coalesce(1).write.parquet(str(staging))
        part, = glob.glob(str(staging / "part-*.parquet"))
        shutil.copy(part, str(src / f"f{i}.parquet"))

    coll = engine.create_collection("streamed")
    stream = (
        spark.readStream.schema("id STRING, embedding ARRAY<FLOAT>, document STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_add(engine, coll, stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert coll.count() == 3  # b ingested once despite appearing twice
    got = {r["id"]: r["document"] for r in coll.get().collect()}
    assert got == {"a": "doc a", "b": "doc b", "c": "doc c"}

    # replay with a fresh checkpoint: anti-join makes it a no-op
    q2 = stream_add(engine, coll, stream, checkpoint_dir=str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert coll.count() == 3


def test_stream_add_dedups_within_batch(spark, engine, tmp_path):
    from chroma_rs_spark.streaming.ingest import stream_add

    src = tmp_path / "dup_src"
    src.mkdir()
    import glob
    import shutil

    df = spark.createDataFrame(
        [("x", [1.0, 0.0], "one"), ("x", [1.0, 0.0], "one")],
        "id STRING, embedding ARRAY<FLOAT>, document STRING",
    )
    staging = tmp_path / "dup_staging"
    df.coalesce(1).write.parquet(str(staging))
    part, = glob.glob(str(staging / "part-*.parquet"))
    shutil.copy(part, str(src / "f.parquet"))

    coll = engine.create_collection("dup_batch")
    stream = spark.readStream.schema(
        "id STRING, embedding ARRAY<FLOAT>, document STRING"
    ).parquet(str(src))
    q = stream_add(engine, coll, stream, checkpoint_dir=str(tmp_path / "dup_ckpt"))
    q.awaitTermination(120)
    assert coll.count() == 1


def test_watermark_drops_late_data_across_microbatches(spark, tmp_path):
    """True late-data semantics, not just plan shape: a row arriving a
    micro-batch after the watermark passed its window is dropped, so
    the emitted (append-mode, finalized) window excludes it."""
    import os
    import time

    import pandas as pd

    src = tmp_path / "stream_src"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 10:00:00")
    # write microsecond timestamps: the engine session reads ns-int64
    # parquet as LONG (nanosAsLong), which would shadow TIMESTAMP here
    mk = lambda *ts: pd.DataFrame(
        {
            "ts": pd.Series(
                [base + pd.Timedelta(t) for t in ts], dtype="datetime64[us]"
            ),
            "event_type": ["click"] * len(ts),
            "value": [1.0] * len(ts),
        }
    )
    # batch 0: one row in [10:00,10:10), one at 10:59 that advances the
    # max event time, hence (10-min watermark) the watermark to 10:49.
    mk("5min", "59min").to_parquet(src / "f1.parquet", index=False)
    # batch 1: on-time filler (the watermark a batch uses for dropping
    # is the one committed before the batch starts, so the advance
    # from batch 0 is in force from here on)
    mk("55min").to_parquet(src / "f2.parquet", index=False)
    # batch 2: a late row for [10:00,10:10) — behind the watermark.
    mk("1min").to_parquet(src / "f3.parquet", index=False)
    now = time.time()
    for i, f in enumerate(["f1.parquet", "f2.parquet", "f3.parquet"]):
        os.utime(src / f, (now - 100 + i, now - 100 + i))  # process in order

    stream = (
        spark.readStream.schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = tumbling_window_counts(stream, width="10 minutes", watermark="10 minutes")
    q = drain_to_memory(agg, "late_drop_t", mode="append")
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1
    rows = {
        r["window_start"]: r["n_events"]
        for r in spark.sql("SELECT * FROM late_drop_t").collect()
    }
    first = base.to_pydatetime().replace(tzinfo=None)
    # the finalized first window holds ONLY the on-time row; the late
    # row would have made it 2 had the watermark not dropped it
    assert rows[first] == 1


def test_stream_trending_matches_batch(spark):
    """Two-stage trending: stream the windowed counts, rank the drained
    sink in batch — equals the all-batch composition."""
    from chroma_rs_spark.streaming.events import (
        top_event_types_per_window,
        trending_event_types,
    )

    batch = trending_event_types(load_table(spark, SF001_DIR, "events"), k=2)
    expected = sorted(
        (r["window_start"], r["event_type"], r["n_events"], r["rank"])
        for r in batch.collect()
    )
    counts = tumbling_window_counts(read_events_stream(spark, SF001_DIR))
    drain_to_memory(counts, "trend_counts_t")
    ranked = top_event_types_per_window(
        spark.sql("SELECT * FROM trend_counts_t"), k=2
    )
    got = sorted(
        (r["window_start"], r["event_type"], r["n_events"], r["rank"])
        for r in ranked.collect()
    )
    assert got == expected and len(got) > 0


def test_stream_watermark_counts_drops_and_tolerates(spark):
    """The suite row's 4-batch fixture exercises BOTH late classes on
    real data: day-1 morning stragglers (arriving after day 2) are
    dropped by the watermark; day-2 tail stragglers are tolerated and
    their windows finalize once day 3 advances the watermark."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from chroma_rs_spark.suite.streaming import (
        _WM_DELAY,
        _WM_WIDTH,
        _watermark_inbox,
    )

    inbox = _watermark_inbox(spark, SF001_DIR)
    ev = load_table(spark, SF001_DIR, "events")
    n_dropped_expected = ev.filter(
        (F.col("event_id") % 10 == 7) & (F.col("ts") < "2024-01-01 12:00:00")
    ).count()
    tail = ev.filter(
        (F.col("event_id") % 2 == 1)
        & (F.col("ts") >= "2024-01-02 22:00:00")
        & (F.col("ts") < "2024-01-03")
    )
    n_tolerated = tail.count()
    assert n_dropped_expected > 0 and n_tolerated > 0  # fixture is live

    root = tempfile.mkdtemp(prefix="wm_counts_test_")
    try:
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{inbox}/*")
        )
        agg = tumbling_window_counts(stream, width=_WM_WIDTH, watermark=_WM_DELAY)
        q = (
            agg.writeStream.format("parquet")
            .option("path", f"{root}/out")
            .option("checkpointLocation", f"{root}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        dropped = sum(
            p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            if p["stateOperators"]
        )
        out = spark.read.parquet(f"{root}/out")
        # every held-back day-1 morning row was dropped by the watermark
        assert dropped == n_dropped_expected
        # the tolerated stragglers' contributions are IN the emitted
        # windows: each tail row's (window, type) count includes it
        tol = tail.select(
            F.window("ts", _WM_WIDTH).start.alias("window_start"),
            "event_type",
        )
        joined = tol.join(out, ["window_start", "event_type"], "left")
        assert joined.filter(F.col("n_events").isNull()).count() == 0
        # and no dropped day-1 morning window got a second (re-opened)
        # append row: (window, type) is unique in the sink
        assert (
            out.groupBy("window_start", "event_type").count()
            .filter(F.col("count") > 1).count() == 0
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
