"""Pluggable embedding function (functions/embedding.py): determinism,
unit norms, and end-to-end use in a collection + KNN query."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from chroma_rs_spark.functions.embedding import embed_text, hash_embed_batch


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma"),  # duplicate text -> identical embedding
        (3, "delta epsilon zeta eta theta"),
        (4, ""),  # empty -> zero vector (not NaN)
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_embeddings_match_local_reference(docs):
    got = {r["doc_id"]: np.array(r["embedding"]) for r in embed_text(docs, dim=16).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i, t in texts.items():
        ref = hash_embed_batch([t], 16)[0]
        assert np.allclose(got[i], ref, atol=1e-6), i


def test_unit_norm_and_duplicates(docs):
    got = {r["doc_id"]: np.array(r["embedding"]) for r in embed_text(docs, dim=16).collect()}
    assert np.allclose(np.linalg.norm(got[1]), 1.0, atol=1e-6)
    assert np.allclose(got[1], got[2])
    assert np.allclose(got[4], 0.0)  # empty text: zero vector, no NaN


def test_collection_roundtrip_with_embedder(engine, docs):
    emb = embed_text(docs.filter(F.col("text") != ""), dim=16)
    coll = engine.create_collection("embedded", {"hnsw:space": "cosine"})
    coll.add_df(
        emb.select(
            F.col("doc_id").cast("string").alias("id"),
            F.col("embedding"),
            F.col("text").alias("document"),
            F.create_map().cast("map<string,string>").alias("metadata"),
        )
    )
    assert coll.count() == 3
    probe = hash_embed_batch(["alpha beta gamma"], 16)[0].tolist()
    res = coll.query(query_embeddings=[probe], n_results=2).collect()
    # doc 1 and 2 are exact text dups of the probe: distance ~0
    top_ids = {r["id"] for r in res}
    assert top_ids == {"1", "2"}
    assert all(abs(r["distance"]) < 1e-5 for r in res)
