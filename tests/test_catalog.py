"""Catalog lifecycle tests — replicates the reference's e2e test
(reference tests/end-to-en.rs:4-45, FIXTURES.md §4) plus error paths."""

import pytest

from chroma_rs_spark.errors import (
    CollectionExistsError,
    CollectionNotFoundError,
    ResetDisabledError,
)


def test_reference_lifecycle(engine):
    # end-to-en.rs: create collection-1 (no metadata), get-or-create
    # collection-2 with metadata, create collection-3
    engine.create_collection("collection-1")
    engine.get_or_create_collection(
        "collection-2",
        {
            "description": "my first collection into a vector db",
            "other-metadata": "testing get or create fn with metadata...",
        },
    )
    engine.create_collection("collection-3")
    assert len(engine.list_collections()) == 3

    engine.delete_collection("collection-1")
    engine.delete_collection("collection-2")
    assert len(engine.list_collections()) == 1

    got = engine.get_collection("collection-3")
    assert got.name == "collection-3"
    engine.delete_collection("collection-3")
    assert len(engine.list_collections()) == 0


def test_create_duplicate_errors(engine):
    engine.create_collection("c")
    with pytest.raises(CollectionExistsError):
        engine.create_collection("c")
    # get_or_create is idempotent and returns the same id (client.rs:160-199)
    c1 = engine.get_or_create_collection("c")
    assert c1.id == engine.get_collection("c").id


def test_get_missing_errors(engine):
    with pytest.raises(CollectionNotFoundError):
        engine.get_collection("nope")
    with pytest.raises(CollectionNotFoundError):
        engine.delete_collection("nope")


def test_metadata_roundtrip(engine):
    engine.create_collection("m", {"hnsw:space": "cosine"})
    assert engine.get_collection("m").metadata == {"hnsw:space": "cosine"}


def test_modify_collection(engine):
    engine.create_collection("old", {"a": "1"})
    engine.modify_collection("old", new_name="new", new_metadata={"b": "2"})
    assert engine.get_collection("new").metadata == {"b": "2"}
    with pytest.raises(CollectionNotFoundError):
        engine.get_collection("old")


def test_reset_gated(spark, tmp_path):
    from chroma_rs_spark.catalog import Engine

    e = Engine(spark, str(tmp_path / "w2"), allow_reset=False)
    e.create_collection("x")
    with pytest.raises(ResetDisabledError):
        e.reset()
    e.allow_reset = True
    e.reset()
    assert e.list_collections() == []


def test_heartbeat_and_version(engine):
    assert engine.heartbeat() > 0
    assert "spark" in engine.version()


def test_registry_df(engine):
    engine.create_collection("a", {"k": "v"})
    df = engine.list_collections_df()
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["name"] == "a"
    assert rows[0]["metadata"]["k"] == "v"


def test_collections_survive_engine_restart(spark, tmp_path):
    from chroma_rs_spark.catalog import Engine

    wh = str(tmp_path / "persist_wh")
    e1 = Engine(spark, wh)
    c = e1.create_collection("durable", {"hnsw:space": "l2"})
    c.add(ids=["x", "y"], embeddings=[[1.0, 2.0], [3.0, 4.0]], documents=["dx", "dy"])

    # a brand-new Engine over the same warehouse sees everything
    e2 = Engine(spark, wh)
    assert [col.name for col in e2.list_collections()] == ["durable"]
    c2 = e2.get_collection("durable")
    assert c2.id == c.id and c2.metadata == {"hnsw:space": "l2"}
    assert c2.count() == 2
    assert {r["id"]: r["document"] for r in c2.get().collect()} == {
        "x": "dx",
        "y": "dy",
    }
