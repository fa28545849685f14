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


def test_asof_matches_pandas_merge_asof_on_random_data(spark):
    """Property-style check on one large random instance: our
    union+window as-of join must agree with pandas merge_asof
    (backward direction) when right rows are unique per (key, ts)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    left_pd = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "ts": pd.to_datetime(rng.integers(0, 10_000, n_l), unit="s"),
            "k": rng.integers(0, 5, n_l).astype(str),
        }
    )
    right_pd = (
        pd.DataFrame(
            {
                "rts": pd.to_datetime(rng.integers(0, 10_000, n_r), unit="s"),
                "k": rng.integers(0, 5, n_r).astype(str),
                "payload": np.arange(n_r),
            }
        )
        .drop_duplicates(subset=["k", "rts"], keep="last")
        .reset_index(drop=True)
    )

    expected = pd.merge_asof(
        left_pd.sort_values("ts", kind="mergesort"),
        right_pd.sort_values("rts", kind="mergesort"),
        left_on="ts",
        right_on="rts",
        by="k",
        direction="backward",
    ).sort_values("lid")

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    got = {
        r["lid"]: r["payload"]
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    }
    for lid, want in zip(expected["lid"], expected["payload"]):
        w = None if pd.isna(want) else int(want)
        assert got[lid] == w, (lid, got[lid], w)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_directions_match_pandas(spark, direction):
    """pandas merge_asof is the independent oracle for all three
    directions, including tolerance and the ties-to-backward rule."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(20260814)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 60),
            "lts": rng.integers(0, 500, 60).astype("datetime64[s]"),
            "lid": np.arange(60),
        }
    ).sort_values(["lts", "lid"], kind="mergesort")
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 40),
            "rts": rng.integers(0, 500, 40).astype("datetime64[s]"),
            "pay": np.arange(40) * 10,
        }
    )
    # one right row per (k, rts): the operator's documented tie
    # contract differs from pandas' for duplicate right keys
    right = right.groupby(["k", "rts"], as_index=False).agg(pay=("pay", "max"))
    right = right.sort_values(["rts", "k"], kind="mergesort")

    exp = pd.merge_asof(
        left.sort_values("lts", kind="mergesort"),
        right.sort_values("rts", kind="mergesort"),
        left_on="lts",
        right_on="rts",
        by="k",
        direction=direction,
        tolerance=pd.Timedelta(seconds=60),
    )
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="k",
        left_ts="lts",
        right_ts="rts",
        tolerance=F.expr("INTERVAL 60 SECONDS"),
        direction=direction,
    ).toPandas()
    g = got.sort_values("lid", kind="mergesort").reset_index(drop=True)
    e = exp.sort_values("lid", kind="mergesort").reset_index(drop=True)
    assert len(g) == len(e) == 60
    for i in range(60):
        ge, ee = g.iloc[i], e.iloc[i]
        assert ge["lid"] == ee["lid"]
        if pd.isna(ee["pay"]):
            assert pd.isna(ge["pay"]), (direction, i, ge, ee)
        else:
            assert ge["pay"] == ee["pay"], (direction, i, ge, ee)
            assert ge["rts"] == ee["rts"]


def test_asof_bad_direction_raises(spark):
    df = spark.createDataFrame([(1, 1)], "k long, ts long")
    with pytest.raises(ValueError, match="direction"):
        asof_join(df, df.withColumnRenamed("ts", "rts"), on="k",
                  left_ts="ts", right_ts="rts", direction="sideways")
