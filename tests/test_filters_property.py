"""Property-based tests for the where-DSL compiler: for random filter
trees and random rows, the compiled Column predicate must agree with a
pure-Python evaluator of the same grammar (SURVEY.md §5 — the filter
compiler is the pure-function, property-testable core)."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from chroma_rs_spark.filters import column_resolver, compile_where

# fields and value pools kept small so collisions (and thus matches)
# actually happen
FIELDS = ["a", "b"]
VALUES = [0, 1, 2, 5, 10]

leaf_eq = st.builds(
    lambda f, v: {f: v}, st.sampled_from(FIELDS), st.sampled_from(VALUES)
)
leaf_op = st.builds(
    lambda f, op, v: {f: {op: v}},
    st.sampled_from(FIELDS),
    st.sampled_from(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte"]),
    st.sampled_from(VALUES),
)
leaf_in = st.builds(
    lambda f, op, vs: {f: {op: vs}},
    st.sampled_from(FIELDS),
    st.sampled_from(["$in", "$nin"]),
    st.lists(st.sampled_from(VALUES), min_size=1, max_size=3),
)
leaves = st.one_of(leaf_eq, leaf_op, leaf_in)

filters = st.recursive(
    leaves,
    lambda children: st.builds(
        lambda op, cs: {op: cs},
        st.sampled_from(["$and", "$or"]),
        st.lists(children, min_size=1, max_size=3),
    ),
    max_leaves=6,
)


def eval_py(where: dict, row: dict) -> bool:
    (key, val), = where.items()
    if key == "$and":
        return all(eval_py(c, row) for c in val)
    if key == "$or":
        return any(eval_py(c, row) for c in val)
    x = row[key]
    if not isinstance(val, dict):
        return x == val
    (op, v), = val.items()
    return {
        "$eq": lambda: x == v,
        "$ne": lambda: x != v,
        "$gt": lambda: x > v,
        "$gte": lambda: x >= v,
        "$lt": lambda: x < v,
        "$lte": lambda: x <= v,
        "$in": lambda: x in v,
        "$nin": lambda: x not in v,
    }[op]()


ROWS = [(a, b) for a in VALUES for b in VALUES]


@pytest.fixture(scope="module")
def grid(spark):
    return spark.createDataFrame(ROWS, "a LONG, b LONG").cache()


@settings(max_examples=60, deadline=None)
@given(where=filters)
def test_compiled_filter_matches_python_semantics(grid, where):
    pred = compile_where(where, resolver=column_resolver)
    got = {(r["a"], r["b"]) for r in grid.filter(pred).collect()}
    expected = {(a, b) for a, b in ROWS if eval_py(where, {"a": a, "b": b})}
    assert got == expected, where
