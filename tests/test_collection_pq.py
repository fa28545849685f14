"""PQ index on the public Collection API (collection.py:build_pq_index
/ query(index="pq")): persisted codebook artifact, exact re-scored
distances, metric gating, read-only transient path."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from chroma_rs_spark.errors import EngineError


def _clustered(rng, n_per, centers):
    vecs, ids = [], []
    for ci, c in enumerate(centers):
        for j in range(n_per):
            v = np.asarray(c) + rng.normal(0, 0.05, size=len(c))
            ids.append(f"c{ci}_{j:02d}")
            vecs.append([float(x) for x in v])
    return ids, vecs


@pytest.fixture()
def pq_coll(engine):
    rng = np.random.default_rng(11)
    centers = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
    ids, vecs = _clustered(rng, 15, centers)
    c = engine.create_collection("pq_items", {"hnsw:space": "cosine"})
    c.add(ids=ids, embeddings=vecs, documents=[f"doc {i}" for i in ids])
    return c, ids, vecs


def _cosine_dist(a, b):
    num = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(1.0 - num / (na * nb), 6) + 0.0


def test_build_persists_and_distances_are_exact(pq_coll):
    c, ids, vecs = pq_coll
    path = c.build_pq_index(m=2, k=8, sample_size=64)
    assert os.path.isdir(path)
    probe = vecs[5]
    res = c.query([probe], n_results=5, index="pq", oversample=6).collect()
    assert len(res) == 5
    by_id = dict(zip(ids, vecs))
    for r in res:
        # PQ affects recall only — every returned distance is the
        # exact rounded cosine distance, same as the exact path
        assert r["distance"] == _cosine_dist(probe, by_id[r["id"]])
    assert res[0]["id"] == ids[5] and res[0]["distance"] == 0.0
    assert res[0]["document"] == f"doc {ids[5]}"


def test_pq_recall_on_clustered_data(pq_coll):
    c, ids, vecs = pq_coll
    c.build_pq_index(m=2, k=8, sample_size=64)
    for qi in (0, 20, 45):
        exact = [r["id"] for r in c.query([vecs[qi]], n_results=5).collect()]
        approx = [
            r["id"]
            for r in c.query(
                [vecs[qi]], n_results=5, index="pq", oversample=8
            ).collect()
        ]
        # well-separated clusters + 8x oversample: exact top-5 recovered
        assert approx == exact


def test_pq_transient_read_only_and_l2(engine):
    rng = np.random.default_rng(3)
    ids, vecs = _clustered(rng, 12, [[1.0, 0.0], [0.0, 1.0]])
    c = engine.create_collection("pq_l2", {"hnsw:space": "l2"})
    c.add(ids=ids, embeddings=vecs)
    res = c.query([vecs[0]], n_results=3, index="pq", oversample=8)
    assert res.collect()[0]["id"] == ids[0]
    from chroma_rs_spark.collection import PQ_INDEX_DIR

    idx_dir = os.path.join(c._engine.collection_dir(c.id), PQ_INDEX_DIR)
    # reads never write: the transient query left no index directory
    assert not os.path.isdir(idx_dir)


def test_pq_rejects_ip_metric(engine):
    c = engine.create_collection("pq_ip", {"hnsw:space": "ip"})
    c.add(ids=["a", "b"], embeddings=[[1.0, 0.0], [0.0, 1.0]])
    with pytest.raises(EngineError, match="l2/cosine"):
        c.query([[1.0, 0.0]], index="pq")
    with pytest.raises(EngineError, match="l2/cosine"):
        c.build_pq_index()


def test_materialized_codes_serve_queries_and_absorb_late_adds(pq_coll):
    c, ids, vecs = pq_coll
    c.build_pq_index(m=2, k=8, sample_size=64)
    import os

    from chroma_rs_spark.collection import PQ_CODES_DIR

    path = c.materialize_pq_codes()
    assert os.path.isdir(path) and path.endswith(PQ_CODES_DIR)
    probe = vecs[7]
    res = c.query([probe], n_results=5, index="pq", oversample=8).collect()
    assert res[0]["id"] == ids[7] and res[0]["distance"] == 0.0
    # late-added item (not in the codes table) is still searchable
    c.add(ids=["late"], embeddings=[[0.0, 0.0, 0.0, 1.01]])
    got = c.query(
        [[0.0, 0.0, 0.0, 1.01]], n_results=1, index="pq", oversample=8
    ).collect()
    assert got[0]["id"] == "late" and got[0]["distance"] == 0.0
    # a partial codes dir (no _SUCCESS) is treated as absent
    os.remove(os.path.join(path, "_SUCCESS"))
    from chroma_rs_spark.collection import _load_pq_codes

    assert _load_pq_codes(c._engine, c) is None


def test_materialize_requires_persisted_index(engine):
    c = engine.create_collection("codes_noindex", {"hnsw:space": "cosine"})
    c.add(ids=["a"], embeddings=[[1.0, 0.0]])
    with pytest.raises(EngineError, match="build_pq_index"):
        c.materialize_pq_codes()
