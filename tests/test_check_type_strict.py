"""The local gate (tools/check.py) must be TYPE-strict.

The round-3/4 driver red on ``pack_sequences`` was a pure type leak:
DuckDB's windowed ``sum(BIGINT)`` returns HUGEINT, which Arrow serializes
as ``decimal128(38,0)`` while Spark emits ``int64``.  Values were
bit-identical, so the old pandas-coercing local check stayed green while
the driver's type-sensitive value hash failed two rounds in a row.

These tests pin that ``tools/check.py`` now catches every class of the
leak (a deliberately injected HUGEINT oracle FAILS the local gate), and
that benign serialization flavors (string vs large_string) still pass.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pytest
from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check import canonical_arrow_type, type_problems  # noqa: E402


def _spark_schema(*fields):
    return StructType([StructField(n, t) for n, t in fields])


def test_injected_hugeint_oracle_fails_gate():
    # windowed sum(BIGINT) -> HUGEINT: the exact pack_sequences leak
    tbl = duckdb.sql(
        "SELECT sum(x) OVER (ORDER BY x) AS s FROM (VALUES (1::BIGINT)) t(x)"
    ).arrow()
    schema = _spark_schema(("s", LongType()))
    problems = type_problems(schema, tbl.schema)
    assert problems, "HUGEINT->decimal128 oracle leak must fail the local gate"
    assert "decimal(38,0)" in problems[0] and "int64" in problems[0]


def test_int_width_mismatch_fails_gate():
    tbl = duckdb.sql("SELECT 1::BIGINT AS r").arrow()
    schema = _spark_schema(("r", IntegerType()))
    assert type_problems(schema, tbl.schema) == [
        "col r: TYPE spark=int32 oracle=int64"
    ]


def test_timestamp_vs_date_fails_gate():
    tbl = duckdb.sql("SELECT DATE '2024-01-01' AS d").arrow()
    schema = _spark_schema(("d", TimestampType()))
    problems = type_problems(schema, tbl.schema)
    assert problems == ["col d: TYPE spark=timestamp oracle=date"]


def test_matching_types_pass():
    tbl = duckdb.sql(
        "SELECT 1::BIGINT AS a, 1.5::DOUBLE AS b, 'x' AS c, "
        "DATE '2024-01-01' AS d, [1.0::DOUBLE] AS e"
    ).arrow()
    schema = _spark_schema(
        ("a", LongType()),
        ("b", DoubleType()),
        ("c", StringType()),
        ("d", DateType()),
        ("e", ArrayType(DoubleType())),
    )
    assert type_problems(schema, tbl.schema) == []


def test_string_flavors_collapse():
    # large_string vs string is an Arrow serialization detail both engines
    # normalize before hashing values — must NOT fail the gate
    assert canonical_arrow_type(pa.large_string()) == canonical_arrow_type(
        pa.string()
    )
    assert canonical_arrow_type(pa.large_list(pa.int64())) == canonical_arrow_type(
        pa.list_(pa.int64())
    )


def test_nested_list_element_type_checked():
    tbl = duckdb.sql("SELECT [1::BIGINT] AS v").arrow()
    schema = _spark_schema(("v", ArrayType(DoubleType())))
    problems = type_problems(schema, tbl.schema)
    assert problems == ["col v: TYPE spark=list<float64> oracle=list<int64>"]


@pytest.mark.parametrize(
    "sql,expect",
    [
        # DuckDB windowed/plain sum over BIGINT -> HUGEINT (decimal128)
        ("SELECT sum(x) AS s FROM (VALUES (1::BIGINT)) t(x)", "decimal(38,0)"),
        # plain sum over INTEGER -> HUGEINT too
        ("SELECT sum(x) AS s FROM (VALUES (1::INTEGER)) t(x)", "decimal(38,0)"),
    ],
)
def test_duckdb_sum_hugeint_behavior_pinned(sql, expect):
    """Pin the DuckDB behavior this gate exists for: if a DuckDB upgrade
    changes sum()'s return type, this test documents the new baseline."""
    t = duckdb.sql(sql).arrow()
    assert canonical_arrow_type(t.schema.field("s").type) == expect
