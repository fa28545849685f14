"""as-of join unit semantics (operators/asof.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from chroma_rs_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (2, _ts("2024-01-01 10:05:00"), "a"),
            (3, _ts("2024-01-01 09:00:00"), "b"),  # before any right row
            (4, _ts("2024-01-01 10:00:00"), "c"),  # key with no right rows
        ],
        "lid LONG, ts TIMESTAMP, k STRING",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 09:59:00"), 100),
            ("a", _ts("2024-01-01 10:00:00"), 101),  # ties left row 1 exactly
            ("a", _ts("2024-01-01 10:04:00"), 102),
            ("b", _ts("2024-01-01 12:00:00"), 103),
        ],
        "k STRING, rts TIMESTAMP, payload LONG",
    )
    return left, right


def test_most_recent_at_or_before(sides):
    left, right = sides
    out = {
        r["lid"]: (r["payload"], r["rts"])
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    }
    assert out[1][0] == 101  # equal-ts right row matches (inclusive)
    assert out[2][0] == 102  # most recent, not first
    assert out[3] == (None, None)  # left precedes all right rows
    assert out[4] == (None, None)  # key absent from right


def test_tolerance_nulls_stale_matches(sides):
    left, right = sides
    out = {
        r["lid"]: r["payload"]
        for r in asof_join(
            left,
            right,
            on="k",
            left_ts="ts",
            right_ts="rts",
            tolerance=F.expr("INTERVAL 30 SECONDS"),
        ).collect()
    }
    assert out[1] == 101  # 0s old: within tolerance
    assert out[2] is None  # 60s old: nulled
    assert out[3] is None and out[4] is None


def test_left_rows_preserved_exactly_once(sides):
    left, right = sides
    res = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    assert res.count() == left.count()
    assert sorted(r["lid"] for r in res.select("lid").collect()) == [1, 2, 3, 4]


def test_right_ts_collision_raises(sides):
    left, right = sides
    colliding = right.select("k", F.col("rts").alias("lid"), "payload")
    with pytest.raises(ValueError, match="collides"):
        asof_join(left, colliding, on="k", left_ts="ts", right_ts="lid")
