"""Exact int64 two-limb money aggregation (functions/money.py):
randomized exactness against the DECIMAL ground truth, and bit-parity
between the Column-DSL and SQL-string builder forms."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from chroma_rs_spark.functions import money


@pytest.fixture(scope="module")
def prices(spark):
    rng = np.random.default_rng(99)
    # 2-decimal money values incl. the large-magnitude end of the
    # TPC-H domain, plus exact boundary cases
    vals = np.round(rng.uniform(0.01, 120_000.0, 5000), 2).tolist()
    vals += [0.01, 0.05, 99999.99, 104949.5, 0.1 + 0.2]  # 0.30000000000000004 rounds to 0.3
    vals = [round(v, 2) for v in vals]
    return (
        spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id LONG, v DOUBLE"),
        vals,
    )


def test_int_scaled_exact(prices):
    df, vals = prices
    got = {
        r["id"]: r["c"]
        for r in df.select("id", money.int_scaled("v").alias("c")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == round(v * 100), f"v={v!r}"


def test_two_limb_sum_equals_decimal_sum(prices):
    df, vals = prices
    agg = df.groupBy().agg(*money.split_sum_aggs(money.int_scaled("v"), "s"))
    got = agg.select(money.combine_double("s", 2).alias("t")).first()["t"]
    # exact rational ground truth in integer cents
    cents = sum(round(v * 100) for v in vals)
    expect = float(
        __import__("decimal").Decimal(cents) / __import__("decimal").Decimal(100)
    )
    assert np.float64(got).view(np.int64) == np.float64(expect).view(np.int64)


def test_sql_string_forms_bit_match_dsl(prices):
    df, _ = prices
    dsl = df.groupBy().agg(
        *money.split_sum_aggs(money.int_scaled("v"), "s")
    ).select(money.combine_double("s", 2).alias("t"))
    sql = df.selectExpr(f"{money.int_scaled_sql('v')} AS _c").groupBy().agg(
        *[F.expr(s) for s in money.split_sum_sql("_c", "s")]
    ).selectExpr(f"{money.combine_double_sql('s', 2)} AS t")
    a = dsl.first()["t"]
    b = sql.first()["t"]
    assert np.float64(a).view(np.int64) == np.float64(b).view(np.int64)


def test_second_moment_product_limbs(prices):
    """x*x products (units 1e-4) through the limbs — the stats-query
    shape — must equal the DECIMAL ground truth."""
    df, vals = prices
    agg = df.selectExpr(
        f"{money.int_scaled_sql('v')} AS _c"
    ).groupBy().agg(*[F.expr(s) for s in money.split_sum_sql("_c * _c", "sq")])
    got = agg.selectExpr(f"{money.combine_double_sql('sq', 4)} AS t").first()["t"]
    import decimal

    total = sum(decimal.Decimal(round(v * 100)) ** 2 for v in vals)
    expect = float(total / decimal.Decimal(10_000))
    assert np.float64(got).view(np.int64) == np.float64(expect).view(np.int64)
