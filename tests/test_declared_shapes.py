"""Every DECLARED row's schema must be driver-canonicalizable.

The driver's correctness harness canonicalizes a result by sorting the
raw pandas frame over all columns; an array/map/struct cell raises
``TypeError: unhashable type`` there and the row errs regardless of
value correctness (the `bpe_tokenize` round-9 red,
CORRECTNESS_r09.json). tools/check.py stringifies containers before
sorting, so the local gate alone cannot catch the class — this test
plus check.py's DECLARED-row rejection close the divergence.

Non-iterative rows are checked on the LAZY plan (schema resolution
only, nothing executes). Iterative rows execute their driver-side
loops at sf0.001 — seconds each — except `dedup_ingest`, whose
real-Structured-Streaming run is covered by its own correctness gate;
its output schema is pinned literally here instead.
"""

from __future__ import annotations

import pytest

from chroma_rs_spark.suite import all_queries

SF001_DIR = "/root/testdata/sf0.001"

_DECLARED = all_queries()
_LAZY = sorted(k for k, v in _DECLARED.items() if not v.iterative)
_ITERATIVE = sorted(
    k for k, v in _DECLARED.items() if v.iterative and k != "dedup_ingest"
)


def _bad_cols(schema) -> list[str]:
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


@pytest.mark.parametrize("name", _LAZY)
def test_declared_schema_is_canonicalizable(spark, name):
    df = _DECLARED[name].fn(spark, SF001_DIR)
    assert _bad_cols(df.schema) == [], (
        f"{name}: declared row exposes container-typed columns the "
        f"driver cannot sort/hash — reshape (array_join/explode) or "
        f"demote to EXTRA"
    )


@pytest.mark.parametrize("name", _ITERATIVE)
def test_declared_iterative_schema_is_canonicalizable(spark, name):
    df = _DECLARED[name].fn(spark, SF001_DIR)
    assert _bad_cols(df.schema) == [], (
        f"{name}: declared row exposes container-typed columns the "
        f"driver cannot sort/hash — reshape (array_join/explode) or "
        f"demote to EXTRA"
    )


def test_dedup_ingest_schema_pinned():
    # dedup_ingest runs real Structured Streaming (seconds of startup
    # floor); its output is `select("doc_id", "text")` over a
    # `doc_id long, text string` source (suite/streaming.py
    # q_dedup_ingest) — scalar by construction, pinned here without
    # execution.
    from pyspark.sql import types as T

    schema = T._parse_datatype_string("doc_id long, text string")
    assert _bad_cols(schema) == []


def test_injected_array_column_fails_the_local_gate(spark):
    # the tools/check.py discipline: a deliberately-injected array
    # column must be rejected for DECLARED rows
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from check import non_canonicalizable_cols

    from pyspark.sql import functions as F

    df = spark.range(3).select(F.array(F.lit("a"), F.lit("b")).alias("xs"))
    assert non_canonicalizable_cols(df.schema) == ["xs"]
    ok = spark.range(3).select(F.col("id"), F.lit("s").alias("t"))
    assert non_canonicalizable_cols(ok.schema) == []
