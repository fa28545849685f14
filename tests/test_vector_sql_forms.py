"""The SQL-string forms of functions/vector.py must parse to trees
bit-identical to the Column-DSL forms — for every metric, with and
without the dim= unrolling, composed inside larger arithmetic (the
regression class: an unparenthesized `+` fold changing precedence
inside `1 - dot / norms`)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from chroma_rs_spark.functions.vector import (
    cosine_distance,
    dot_product,
    ip_distance,
    l2_distance,
    l2_norm,
    vector_lit,
    vector_lit_sql,
)

DIM = 7


@pytest.fixture(scope="module")
def pairs(spark):
    rng = np.random.default_rng(1234)
    rows = []
    for i in range(64):
        a = rng.normal(0, 3, DIM)
        b = rng.normal(0, 3, DIM)
        # exercise exponents and signs the literal printer must
        # round-trip exactly
        a[i % DIM] *= 10.0 ** ((i % 9) - 4)
        rows.append((i, [float(x) for x in a], [float(x) for x in b]))
    return spark.createDataFrame(
        rows, "id LONG, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>"
    )


def _bits(df, col):
    pdf = df.orderBy("id").toPandas()
    return np.asarray(pdf[col], dtype=np.float64).view(np.int64)


@pytest.mark.parametrize("dim", [None, DIM])
def test_all_metrics_str_equals_column(pairs, dim):
    fns = {
        "dot": lambda sa, sb, d: dot_product(sa, sb, d),
        "l2": lambda sa, sb, d: l2_distance(sa, sb, d),
        "ip": lambda sa, sb, d: ip_distance(sa, sb, d),
        "cos": lambda sa, sb, d: cosine_distance(sa, sb, dim=d),
        "norm": lambda sa, sb, d: l2_norm(sa, d),
    }
    for name, fn in fns.items():
        via_str = pairs.select("id", fn("a", "b", dim).alias("v"))
        via_col = pairs.select("id", fn(F.col("a"), F.col("b"), dim).alias("v"))
        s, c = _bits(via_str, "v"), _bits(via_col, "v")
        assert (s == c).all(), f"{name} dim={dim}: str vs Column bits differ"


@pytest.mark.parametrize("dim", [None, DIM])
def test_composed_inside_arithmetic(pairs, dim):
    """The precedence trap: embed each form inside round(1 - X / 2, 6)."""
    for sa, ca in (("a", F.col("a")),):
        via_str = pairs.select(
            "id",
            (F.round(F.lit(1.0) - dot_product(sa, "b", dim) / F.lit(2.0), 6)).alias("v"),
        )
        via_col = pairs.select(
            "id",
            (F.round(F.lit(1.0) - dot_product(ca, F.col("b"), dim) / F.lit(2.0), 6)).alias("v"),
        )
        assert (_bits(via_str, "v") == _bits(via_col, "v")).all()


def test_vector_lit_roundtrips_every_double(spark):
    vals = [
        0.1,
        -0.0,
        1e-300,
        -1e300,
        3.141592653589793,
        2.0 ** -52,
        123456789.123456789,
        -7e-9,
    ]
    got = spark.range(1).select(vector_lit(vals).alias("v")).first()["v"]
    assert [np.float64(g).view(np.int64) for g in got] == [
        np.float64(v).view(np.int64) for v in vals
    ]
    # and the SQL fragment parses to the same array
    got2 = spark.range(1).selectExpr(f"{vector_lit_sql(vals)} AS v").first()["v"]
    assert got2 == got


def test_mixed_forms_rejected():
    with pytest.raises(TypeError, match="all-Column or all-string"):
        dot_product("a", F.col("b"))
