"""Equivalence tests for relational operators whose standalone suite
queries were consolidated in round 2 (the suite checks the merged
query; these keep the individual operators pinned).

Covers: ROLLUP ≡ the grouping-sets lattice used by orders_grouping_sets,
left OUTER join + coalesce counts (former customer_order_counts), and
the decorrelated window form of a correlated subquery (former
customers_above_nation_avg).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from chroma_rs_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _rows(df):
    # sort on repr: rollup rows contain NULLs, which don't order
    # against strings in Python
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_rollup_equals_grouping_sets(spark):
    """rollup(a, b) produces exactly the ((a,b),(a),()) grouping sets."""
    orders = load_table(spark, SF_DIR, "orders")
    aggs = [
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(15,2)"))
        .cast("double")
        .alias("total_price"),
    ]
    rolled = orders.rollup("o_orderstatus", "o_orderpriority").agg(*aggs)
    sets = orders.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(*aggs)
    assert _rows(rolled) == _rows(sets)


def test_left_outer_join_counts(spark):
    """Left-outer + coalesce yields a row per customer; inner-join rows
    agree and the remainder are exactly the orderless customers."""
    cust = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("_n"))
    outer = (
        cust.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_orders"),
        )
    )
    rows = {r["c_custkey"]: r["n_orders"] for r in outer.collect()}
    assert len(rows) == cust.count()
    inner = {r["o_custkey"]: r["_n"] for r in per_cust.collect()}
    for ck, n in inner.items():
        assert rows[ck] == n
    n_zero = sum(1 for n in rows.values() if n == 0)
    n_anti = cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).count()
    assert n_zero == n_anti


def test_decorrelated_window_subquery(spark):
    """Window-decorrelated 'above own group average' matches the naive
    join-against-aggregated-averages form."""
    cust = load_table(spark, SF_DIR, "customer")
    w = Window.partitionBy("c_nationkey")
    dec_avg = (
        F.sum(F.col("c_acctbal").cast("decimal(15,2)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    via_window = (
        cust.withColumn("nation_avg", dec_avg)
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey")
    )
    per_nation = cust.groupBy("c_nationkey").agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(15,2)")).cast("double")
            / F.count("*")
        ).alias("nation_avg")
    )
    via_join = (
        cust.join(F.broadcast(per_nation), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey")
    )
    assert _rows(via_window) == _rows(via_join)


def test_percentile_formulations_agree(spark):
    """The window rank-select and the cent-histogram percentile
    formulations must produce identical values — the histogram path is
    the no-group-sized-sort variant for groups too large to sort in
    one task (suite/relational.py docstrings)."""
    from chroma_rs_spark.suite.relational import (
        _rank_select_percentiles,
        percentiles_cent_histogram,
    )

    ps = (0.25, 0.5, 0.75, 0.95)
    names = ("p25", "p50", "p75", "p95")
    li = load_table(spark, SF_DIR, "lineitem")
    a = {
        r["l_returnflag"]: tuple(r[n] for n in names)
        for r in _rank_select_percentiles(
            li, "l_returnflag", "l_extendedprice", ps, names
        ).collect()
    }
    b = {
        r["l_returnflag"]: tuple(r[n] for n in names)
        for r in percentiles_cent_histogram(
            li, "l_returnflag", "l_extendedprice", ps, names
        ).collect()
    }
    assert a == b and len(a) == 3

    # skewed synthetic with heavy ties + a single-row group: bucket
    # boundaries and floor==ceil rank collapses must not diverge
    rows = (
        [("a", 10.0)] * 50
        + [("a", 10.01)] * 3
        + [("a", 99999.99)] * 7
        + [("b", 0.01 * i) for i in range(101)]
        + [("c", 42.42)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    a2 = {
        r["g"]: tuple(r[n] for n in names)
        for r in _rank_select_percentiles(df, "g", "v", ps, names).collect()
    }
    b2 = {
        r["g"]: tuple(r[n] for n in names)
        for r in percentiles_cent_histogram(df, "g", "v", ps, names).collect()
    }
    assert a2 == b2 and len(a2) == 3


def test_event_funnel_time_bounds_and_order(spark):
    from datetime import datetime

    from chroma_rs_spark.suite.relational import q_event_funnel

    # build a tiny events table and monkey-point load_table at it via a
    # temp view? q_event_funnel reads parquet — instead test the same
    # logic inline through the suite function on a written parquet dir
    import tempfile

    def t(m):
        return datetime(2026, 1, 1, 10, m)

    rows = [
        # u1: view -> click 10 min later -> purchase 10 min after that
        (1, t(0), 1, "view", 0.0, "{}"),
        (2, t(10), 1, "click", 0.0, "{}"),
        (3, t(20), 1, "purchase", 5.0, "{}"),
        # u2: view -> click 40 min later (outside the 30-min window)
        (4, t(0), 2, "view", 0.0, "{}"),
        (5, t(40), 2, "click", 0.0, "{}"),
        # u3: click BEFORE any view -> stage 1 only
        (6, t(0), 3, "click", 0.0, "{}"),
        (7, t(5), 3, "view", 0.0, "{}"),
        # u4: purchase without qualifying click -> stage 1
        (8, t(0), 4, "view", 0.0, "{}"),
        (9, t(5), 4, "purchase", 9.0, "{}"),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    d = tempfile.mkdtemp()
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    got = {
        r["funnel_stage"]: r["n_users"]
        for r in q_event_funnel(spark, d).collect()
    }
    # u1 completes (3); u2/u3/u4 stop at view-only (1)
    assert got == {3: 1, 1: 3}


def test_cohort_retention_offsets(spark):
    from datetime import datetime

    from chroma_rs_spark.suite.relational import q_cohort_retention
    import tempfile

    rows = [
        # u1 first active week of Jan 5 (Mon), active again wk+2
        (1, datetime(2026, 1, 7), 1, "view", 0.0, "{}"),
        (2, datetime(2026, 1, 22), 1, "view", 0.0, "{}"),
        # u2 same cohort, only week 0 (two events, one distinct week)
        (3, datetime(2026, 1, 5), 2, "view", 0.0, "{}"),
        (4, datetime(2026, 1, 9), 2, "click", 0.0, "{}"),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    d = tempfile.mkdtemp()
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    got = {
        (str(r["cohort_week"])[:10], r["week_offset"]): r["n_users"]
        for r in q_cohort_retention(spark, d).collect()
    }
    assert got == {("2026-01-05", 0): 2, ("2026-01-05", 2): 1}


def test_price_histogram_bucket_boundaries(spark):
    import tempfile

    from chroma_rs_spark.suite.relational import (
        HIST_BINS,
        HIST_HI,
        HIST_LO,
        q_order_price_histogram,
    )

    step = (HIST_HI - HIST_LO) / HIST_BINS
    rows = [
        (1, 1, "O", -5.0, None, "a"),        # below lo -> clamped to 0
        (2, 1, "O", 0.0, None, "a"),         # lo edge -> bucket 1
        (3, 1, "O", step, None, "a"),        # first internal edge -> 2
        (4, 1, "O", HIST_HI - 0.01, None, "a"),  # last in-range -> BINS
        (5, 1, "O", HIST_HI, None, "a"),     # hi edge -> clamped BINS+1
        (6, 1, "O", HIST_HI * 2, None, "a"),  # far above -> BINS+1
    ]
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    d = tempfile.mkdtemp()
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    got = {
        r["bucket"]: r["n_orders"]
        for r in q_order_price_histogram(spark, d).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1, HIST_BINS: 1, HIST_BINS + 1: 2}
