"""Skew helpers (plans/skew.py): equivalence with the naive plans on a
deliberately hot-keyed dataset."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 owns 80% of rows; values repeat so distinct < count
    df = spark.range(10_000).select(
        F.when(F.col("id") % 5 != 0, F.lit(0)).otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    return df.cache()


def test_count_distinct_twophase_matches_builtin(skewed):
    from chroma_rs_spark.plans.skew import count_distinct_twophase

    got = {
        r["k"]: r["n_distinct"]
        for r in count_distinct_twophase(skewed, "k", "v").collect()
    }
    want = {
        r["k"]: r["n"]
        for r in skewed.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want


def test_salted_join_matches_plain_join(spark, skewed):
    from chroma_rs_spark.plans.skew import salted_join

    dim = spark.range(7).select(
        F.col("id").cast("long").alias("k"), F.concat(F.lit("name"), "id").alias("nm")
    )
    got = salted_join(skewed, dim, on="k", n_salt=4).groupBy("k", "nm").count()
    want = skewed.join(dim, "k").groupBy("k", "nm").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_count_distinct_twophase_ignores_nulls(spark):
    from chroma_rs_spark.plans.skew import count_distinct_twophase

    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, None), (1, None)], "k LONG, v LONG"
    )
    got = {r["k"]: r["n_distinct"] for r in count_distinct_twophase(df, "k", "v").collect()}
    assert got == {0: 2}  # key 1 has only NULLs -> no row, like COUNT(DISTINCT)


def test_salted_join_rejects_outer(spark):
    import pytest as pt

    from chroma_rs_spark.plans.skew import salted_join

    df = spark.range(3).select(F.col("id").alias("k"))
    with pt.raises(ValueError, match="inner"):
        salted_join(df, df, on="k", how="full")


def test_maybe_broadcast_gates_on_size(spark):
    """ADVICE r6: the vocab joins must hint broadcast only under the
    estimate gate — an oversized (or unknown-size) build side stays
    un-hinted so the join degrades to a shuffled equi-join instead of
    failing at the 8 GB broadcast ceiling."""
    from chroma_rs_spark.plans import maybe_broadcast, plan_size_bytes

    small = spark.range(10).toDF("k")
    hinted = maybe_broadcast(small)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    # force the gate shut: a limit below the (known, positive) estimate
    est = plan_size_bytes(small)
    assert est > 0
    unhinted = maybe_broadcast(small, limit_bytes=1)
    assert (
        "ResolvedHint"
        not in unhinted._jdf.queryExecution().analyzed().toString()
    )
