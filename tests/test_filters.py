"""where / where_document compiler tests (SURVEY.md §2.2 A13-A14)."""

import pytest

from chroma_rs_spark.errors import InvalidFilterError
from chroma_rs_spark.filters import (
    column_resolver,
    compile_where,
    compile_where_document,
)


@pytest.fixture(scope="module")
def items(spark):
    rows = [
        ("1", {"label": "3", "lang": "en", "score": "0.5", "flag": "true"}, "hello world"),
        ("2", {"label": "7", "lang": "fr", "score": "1.5", "flag": "false"}, "bonjour monde"),
        ("3", {"label": "3", "lang": "de", "score": "2.5", "flag": "true"}, "hallo welt"),
        ("4", None, None),
    ]
    return spark.createDataFrame(
        rows, "id STRING, metadata MAP<STRING,STRING>, document STRING"
    )


def ids(df, pred):
    return sorted(r["id"] for r in df.filter(pred).select("id").collect())


def test_eq_implicit(items):
    assert ids(items, compile_where({"lang": "en"})) == ["1"]


def test_eq_explicit_and_ne(items):
    assert ids(items, compile_where({"lang": {"$eq": "fr"}})) == ["2"]
    assert ids(items, compile_where({"lang": {"$ne": "fr"}})) == ["1", "3"]


def test_numeric_comparisons_cast(items):
    assert ids(items, compile_where({"score": {"$gt": 1.0}})) == ["2", "3"]
    assert ids(items, compile_where({"score": {"$lte": 1.5}})) == ["1", "2"]
    assert ids(items, compile_where({"label": {"$gte": 7}})) == ["2"]


def test_bool_comparison(items):
    assert ids(items, compile_where({"flag": True})) == ["1", "3"]


def test_in_nin(items):
    assert ids(items, compile_where({"lang": {"$in": ["en", "de"]}})) == ["1", "3"]
    assert ids(items, compile_where({"lang": {"$nin": ["en", "de"]}})) == ["2"]


def test_and_or(items):
    w = {"$and": [{"label": "3"}, {"lang": "de"}]}
    assert ids(items, compile_where(w)) == ["3"]
    w = {"$or": [{"lang": "en"}, {"lang": "fr"}]}
    assert ids(items, compile_where(w)) == ["1", "2"]


def test_implicit_and_of_fields(items):
    assert ids(items, compile_where({"label": "3", "lang": "en"})) == ["1"]


def test_where_document(items):
    assert ids(items, compile_where_document({"$contains": "world"})) == ["1"]
    assert ids(items, compile_where_document({"$not_contains": "mond"})) == ["1", "3"]
    w = {"$or": [{"$contains": "welt"}, {"$contains": "monde"}]}
    assert ids(items, compile_where_document(w)) == ["2", "3"]


def test_column_resolver(spark):
    df = spark.createDataFrame([(1, "en"), (2, "fr")], "doc_id INT, lang STRING")
    pred = compile_where({"lang": "fr"}, resolver=column_resolver)
    assert [r["doc_id"] for r in df.filter(pred).collect()] == [2]


@pytest.mark.parametrize(
    "bad",
    [
        {},
        {"$unknown": []},
        {"f": {"$bogus": 1}},
        {"f": {"$eq": 1, "$ne": 2}},
        {"$and": []},
        {"f": {"$in": []}},
    ],
)
def test_invalid_filters_raise(bad):
    with pytest.raises(InvalidFilterError):
        compile_where(bad)


def test_invalid_where_document_raises():
    with pytest.raises(InvalidFilterError):
        compile_where_document({"$like": "x"})
