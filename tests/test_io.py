"""Collection export/import round-trips (sources/io.py) across
parquet / json / csv."""

import pytest
from pyspark.sql import functions as F

from chroma_rs_spark.sources.io import export_collection, read_items


@pytest.fixture()
def coll(engine):
    c = engine.create_collection("io_rt", {"hnsw:space": "cosine"})
    c.add(
        ids=["a", "b"],
        embeddings=[[0.25, -1.5, 3.0], [1.0, 2.0, 4.5]],
        documents=["hello world", None],
        metadatas=[{"lang": "en", "n": "5"}, None],
    )
    return c


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_roundtrip(engine, coll, tmp_path, fmt):
    path = str(tmp_path / f"export_{fmt}")
    export_collection(engine, coll, path, fmt=fmt)
    back = read_items(engine.spark, path, fmt=fmt)
    rows = {r["id"]: r for r in back.collect()}
    orig = {
        r["id"]: r
        for r in coll.get(include=["embeddings", "documents", "metadatas"]).collect()
    }
    assert set(rows) == {"a", "b"}
    for i in rows:
        assert rows[i]["embedding"] == orig[i]["embedding"], fmt
        assert rows[i]["document"] == orig[i]["document"]
        assert (rows[i]["metadata"] or {}) == (orig[i]["metadata"] or {})
    # imported data is directly addable to a fresh collection
    c2 = engine.create_collection(f"io_rt2_{fmt}")
    c2.add_df(back.drop("embedding_norm"))
    assert c2.count() == 2


def test_bad_format_raises(engine, coll, tmp_path):
    with pytest.raises(ValueError, match="unknown format"):
        export_collection(engine, coll, str(tmp_path / "x"), fmt="xml")


def test_csv_roundtrip_multiline_document(engine, tmp_path):
    c = engine.create_collection("io_ml")
    c.add(
        ids=["m"],
        embeddings=[[1.0, 2.0]],
        documents=['line1\nline2 "quoted"'],
    )
    path = str(tmp_path / "ml_csv")
    export_collection(engine, c, path, fmt="csv")
    back = read_items(engine.spark, path, fmt="csv").collect()
    assert len(back) == 1
    assert back[0]["document"] == 'line1\nline2 "quoted"'


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_roundtrip_preserves_typed_metadata_encoding(engine, tmp_path, fmt):
    """Nested/typed metadata values (stored as canonical JSON in the
    map) must survive export/import byte-for-byte in every format, so
    decode_meta_value recovers the typed values on the other side."""
    from chroma_rs_spark import decode_meta_value

    c = engine.create_collection(f"io_typed_{fmt}")
    meta = {"score": 2.5, "flag": True, "tags": {"a": [1, "x"], "b": 2}}
    c.add(ids=["t1"], embeddings=[[1.0, 0.0]], metadatas=[meta])
    path = str(tmp_path / f"typed_{fmt}")
    export_collection(engine, c, path, fmt=fmt)
    back = read_items(engine.spark, path, fmt=fmt)
    row = back.filter("id = 't1'").collect()[0]
    decoded = {k: decode_meta_value(v) for k, v in row["metadata"].items()}
    assert decoded == meta, fmt
