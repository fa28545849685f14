"""Bucketed co-located join: same-bucketed tables join with no shuffle
exchange on either side, and results match the plain join."""

import pytest
from pyspark.sql import functions as F

from chroma_rs_spark.sources.bucketing import bucketize
from chroma_rs_spark.sources.tables import load_table
from tests.conftest import SF001_DIR


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = load_table(spark, SF001_DIR, "orders")
    li = load_table(spark, SF001_DIR, "lineitem")
    bo = bucketize(orders, "t_orders_b", "o_orderkey", n_buckets=4)
    bl = bucketize(li, "t_lineitem_b", "l_orderkey", n_buckets=4)
    yield bo, bl
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    bo, bl = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy(
            "o_orderkey"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not introduce a hash-partitioning shuffle
        # of either scan; only the final groupBy reuses the bucketing
        assert "Exchange hashpartitioning" not in plan.split("HashAggregate")[-1]
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, bucketed):
    bo, bl = bucketed
    orders = load_table(spark, SF001_DIR, "orders")
    li = load_table(spark, SF001_DIR, "lineitem")
    got = (
        bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        .groupBy("o_orderkey")
        .count()
        .collect()
    )
    want = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .count()
        .collect()
    )
    assert sorted((r["o_orderkey"], r["count"]) for r in got) == sorted(
        (r["o_orderkey"], r["count"]) for r in want
    )
