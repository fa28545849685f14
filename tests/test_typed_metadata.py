"""Schemaless typed metadata (VERDICT r4 'What's missing' #1).

The reference reads collection metadata as arbitrary JSON
(serde_json::Value, reference src/collection.rs:8, client.rs:359).
The engine mirrors that: collection metadata round-trips typed through
the JSON registry; item metadata (MAP<STRING,STRING> storage) encodes
non-string values as canonical JSON recoverable with
decode_meta_value, and the where-DSL's typed accessors (casts) filter
numeric metadata fields.
"""

from __future__ import annotations

import pytest

from chroma_rs_spark import decode_meta_value


TYPED = {
    "hnsw:space": "cosine",
    "n": 3,
    "f": 1.5,
    "flag": True,
    "nested": {"a": [1, 2], "b": {"c": "x"}},
    "arr": [1, "two", False],
}


def test_collection_metadata_round_trips_typed(engine):
    engine.create_collection("typed_meta", TYPED)
    got = engine.get_collection("typed_meta").metadata
    assert got == TYPED
    assert isinstance(got["n"], int) and isinstance(got["f"], float)
    assert got["flag"] is True and isinstance(got["nested"], dict)
    # and through list_collections
    listed = {c.name: c for c in engine.list_collections()}
    assert listed["typed_meta"].metadata == TYPED


def test_modify_keeps_typed_metadata(engine):
    engine.create_collection("typed_modify", {"a": 1})
    engine.modify_collection(
        "typed_modify", new_metadata={"b": {"x": [True, 2.5]}}
    )
    assert engine.get_collection("typed_modify").metadata == {
        "b": {"x": [True, 2.5]}
    }


def test_list_collections_df_carries_recoverable_json(engine):
    engine.create_collection("typed_df", TYPED)
    row = (
        engine.list_collections_df()
        .filter("name = 'typed_df'")
        .collect()[0]
    )
    decoded = {k: decode_meta_value(v) for k, v in row["metadata"].items()}
    assert decoded == TYPED


def test_item_metadata_nested_values_round_trip_via_accessor(engine):
    c = engine.create_collection("typed_items")
    c.add(
        ids=["x", "y"],
        embeddings=[[1.0, 0.0], [0.0, 1.0]],
        metadatas=[
            {"score": 2.5, "tags": {"a": 1, "b": [True, "s"]}, "s": "plain"},
            {"score": 1, "tags": [3, 4], "s": "2nd"},
        ],
    )
    rows = {
        r["id"]: r["metadata"]
        for r in c.get(include=["metadatas"]).collect()
    }
    x = {k: decode_meta_value(v) for k, v in rows["x"].items()}
    assert x == {"score": 2.5, "tags": {"a": 1, "b": [True, "s"]}, "s": "plain"}
    y = {k: decode_meta_value(v) for k, v in rows["y"].items()}
    assert y == {"score": 1, "tags": [3, 4], "s": "2nd"}


def test_numeric_gt_filter_on_metadata_field(engine):
    c = engine.create_collection("typed_filter")
    c.add(
        ids=["a", "b", "c"],
        embeddings=[[1.0, 0.0]] * 3,
        metadatas=[{"score": 0.5}, {"score": 2.5}, {"score": 10}],
    )
    got = sorted(r["id"] for r in c.get(where={"score": {"$gt": 1.0}}).collect())
    assert got == ["b", "c"]
    # string-typed comparison still works untouched
    got = [r["id"] for r in c.get(where={"score": {"$eq": 0.5}}).collect()]
    assert got == ["a"]


def test_nested_equality_filter_meets_canonical_encoding(engine):
    c = engine.create_collection("typed_nested_eq")
    c.add(
        ids=["a", "b"],
        embeddings=[[1.0, 0.0]] * 2,
        metadatas=[{"tags": {"b": 2, "a": 1}}, {"tags": {"a": 9}}],
    )
    # key order in the comparand must not matter: canonical JSON
    got = [
        r["id"]
        for r in c.get(where={"tags": {"$eq": {"a": 1, "b": 2}}}).collect()
    ]
    assert got == ["a"]


@pytest.mark.parametrize(
    "stored,expect",
    [
        ("true", True),
        ("false", False),
        ("null", None),
        ("3", 3),
        ("-1.5", -1.5),
        ('{"a":1}', {"a": 1}),
        ("[1,2]", [1, 2]),
        ("plain string", "plain string"),
        ("cosine", "cosine"),
        ("1.2.3", "1.2.3"),   # not valid JSON -> raw string
        ("", ""),
        (None, None),
    ],
)
def test_decode_meta_value(stored, expect):
    assert decode_meta_value(stored) == expect
