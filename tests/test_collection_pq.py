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


def test_rebuild_with_different_m_invalidates_stale_codes(pq_coll):
    """ADVICE regression: rebuilding codebooks with a different m must
    not leave a codes table encoded under the old codebooks — larger m
    crashed ADC (codes[:, mi] out of range), smaller m silently ranked
    garbage candidates."""
    c, ids, vecs = pq_coll
    c.build_pq_index(m=2, k=8, sample_size=64)
    codes_path = c.materialize_pq_codes()
    assert os.path.isdir(codes_path)
    # rebuild with LARGER m: stale 2-subspace codes would crash ADC
    c.build_pq_index(m=4, k=8, sample_size=64)
    assert not os.path.isdir(codes_path), "stale codes must be invalidated"
    probe = vecs[3]
    res = c.query([probe], n_results=3, index="pq", oversample=8).collect()
    assert res[0]["id"] == ids[3] and res[0]["distance"] == 0.0
    # and with SMALLER m after re-materializing under m=4
    c.materialize_pq_codes()
    c.build_pq_index(m=2, k=8, sample_size=64)
    res = c.query([probe], n_results=3, index="pq", oversample=8).collect()
    assert res[0]["id"] == ids[3] and res[0]["distance"] == 0.0


def test_load_pq_codes_self_heals_on_m_mismatch(pq_coll):
    """Defense-in-depth: codes rows whose length disagrees with the
    loaded codebooks' m read as absent and are re-encoded on the fly."""
    c, ids, vecs = pq_coll
    c.build_pq_index(m=2, k=8, sample_size=64)
    c.materialize_pq_codes()
    from chroma_rs_spark.collection import _load_pq_codes

    ok = _load_pq_codes(c._engine, c, expected_m=2)
    assert ok.count() == len(ids)
    mismatched = _load_pq_codes(c._engine, c, expected_m=4)
    assert mismatched.count() == 0  # all rows filtered -> re-encode path


def test_filtered_pq_query_candidates_come_from_matching_docs(pq_coll):
    """ADVICE regression: with a persisted codes table, a selective
    where-filter must prune BEFORE ADC candidate selection — previously
    the unfiltered corpus filled the oversampled pool and the filter at
    re-scoring could starve the result below n_results."""
    c, ids, vecs = pq_coll
    # tag a small minority of docs far from cluster 0's probe
    minority = [i for i in ids if i.startswith("c3_")]
    c.build_pq_index(m=2, k=8, sample_size=64)
    c.materialize_pq_codes()
    # update metadata for the minority
    c.update(ids=minority, metadatas=[{"grp": "keep"} for _ in minority])
    probe = vecs[0]  # cluster 0 center-ish: every unfiltered ADC
    # candidate would be a c0/c1/c2 doc at low oversample
    res = c.query(
        [probe],
        n_results=5,
        index="pq",
        oversample=2,
        where={"grp": {"$eq": "keep"}},
    ).collect()
    assert len(res) == 5, f"filter starved the pool: got {len(res)}"
    assert all(r["id"].startswith("c3_") for r in res)


def test_atomic_index_write_crash_window_preserves_old_index(pq_coll):
    """ADVICE regression: _atomic_index_write now parks the old index
    (two-rename discipline) instead of rmtree-ing it before the swap —
    a crash between the renames restores the OLD index on next load."""
    c, ids, vecs = pq_coll
    path = c.build_pq_index(m=2, k=8, sample_size=64)
    # simulate the crash window: old parked aside, new never promoted
    os.replace(path, path + ".__old")
    from chroma_rs_spark.collection import _committed_index_dir

    assert _committed_index_dir(path), "parked old index must be restored"
    res = c.query([vecs[0]], n_results=1, index="pq", oversample=8).collect()
    assert res[0]["id"] == ids[0] and res[0]["distance"] == 0.0
