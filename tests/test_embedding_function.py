"""Collection-attached embedding functions (Chroma parity):
{"embedding_function": "<name>"} in the collection metadata resolves a
registered deterministic embedder; add(documents=) auto-embeds and
query(query_texts=) probes in the same space."""

from __future__ import annotations

import pytest

from chroma_rs_spark.errors import EngineError

DOCS = [
    "spark window join order",
    "stream batch value merge",
    "completely different words entirely",
]


@pytest.fixture()
def embed_coll(engine):
    c = engine.create_collection(
        "autoembed",
        {"hnsw:space": "cosine", "embedding_function": "hash64"},
    )
    c.add(ids=["a", "b", "c"], documents=DOCS)
    return c


def test_add_auto_embeds_and_query_texts_round_trips(embed_coll):
    # same text -> identical hash embedding -> cosine distance 0 at rank 1
    res = embed_coll.query(query_texts=[DOCS[1]], n_results=2).collect()
    assert res[0]["id"] == "b" and res[0]["distance"] == 0.0
    # the stored vectors are real dim-64 unit vectors
    got = embed_coll.get(ids=["a"], include=("embeddings",)).collect()
    v = got[0]["embedding"]
    assert len(v) == 64 and abs(sum(x * x for x in v) - 1.0) < 1e-5


def test_query_texts_and_embeddings_are_exclusive(embed_coll):
    with pytest.raises(EngineError):
        embed_coll.query(
            query_embeddings=[[0.0] * 64], query_texts=["x"]
        )
    with pytest.raises(EngineError):
        embed_coll.query()


def test_query_texts_without_registered_fn_errors(engine):
    c = engine.create_collection("noembed", {"hnsw:space": "cosine"})
    c.add(ids=["a"], embeddings=[[1.0, 0.0]])
    with pytest.raises(EngineError):
        c.query(query_texts=["hello"])


def test_unknown_embedder_name_errors(engine):
    c = engine.create_collection(
        "badembed", {"embedding_function": "modelX"}
    )
    with pytest.raises(EngineError):
        c.add(ids=["a"], documents=["text"])


def test_custom_registered_embedder(engine):
    import numpy as np

    from chroma_rs_spark.functions.embedding import register_embedder

    def const_embed(texts, dim=4):
        return np.asarray([[1.0, 0.0, 0.0, float(len(t or ""))] for t in texts])

    register_embedder("const4", const_embed, 4)
    c = engine.create_collection(
        "customembed", {"hnsw:space": "cosine", "embedding_function": "const4"}
    )
    c.add(ids=["a", "b"], documents=["xy", "longer text"])
    res = c.query(query_texts=["xy"], n_results=1).collect()
    assert res[0]["id"] == "a" and res[0]["distance"] == 0.0


def test_explicit_embeddings_still_win(embed_coll):
    # passing embeddings alongside documents skips the auto-embed
    embed_coll.add(
        ids=["explicit"],
        documents=["spark window join order"],
        embeddings=[[1.0] + [0.0] * 63],
    )
    got = embed_coll.get(ids=["explicit"], include=("embeddings",)).collect()
    assert got[0]["embedding"][0] == 1.0


def test_upsert_and_update_re_embed(embed_coll):
    # upsert a changed document: the stored vector must re-embed
    embed_coll.upsert(ids=["b"], documents=["replacement body text"])
    res = embed_coll.query(
        query_texts=["replacement body text"], n_results=1
    ).collect()
    assert res[0]["id"] == "b" and res[0]["distance"] == 0.0
    # update the document: Chroma re-embeds on document change
    embed_coll.update(ids=["c"], documents=["updated body words"])
    res = embed_coll.query(
        query_texts=["updated body words"], n_results=1
    ).collect()
    assert res[0]["id"] == "c" and res[0]["distance"] == 0.0


def test_auto_embed_never_hands_none_to_custom_embedder(engine):
    """None documents stay NULL-embedded, and the registered model is
    called with the non-None documents ONLY — a real embedding model
    (the advertised integration point) would crash or mis-embed on
    None even though None rows' results are discarded."""
    import numpy as np

    from chroma_rs_spark.functions.embedding import register_embedder

    seen: list[list[str]] = []

    def strict_embed(texts):
        assert all(t is not None for t in texts), "embedder saw None"
        seen.append(list(texts))
        return np.asarray([[float(len(t)), 1.0] for t in texts])

    register_embedder("strict2", strict_embed, 2)
    c = engine.create_collection(
        "strict_none", {"embedding_function": "strict2"}
    )
    c.add(ids=["a", "b", "c"], documents=["xx", None, "yyyy"])
    got = {
        r["id"]: r["embedding"]
        for r in c.get(include=["embeddings"]).collect()
    }
    assert got["b"] is None
    assert got["a"] == [2.0, 1.0] and got["c"] == [4.0, 1.0]
    assert seen == [["xx", "yyyy"]]
