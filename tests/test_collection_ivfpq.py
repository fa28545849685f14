"""Composite IVF-PQ index on the public Collection API
(collection.py:build_ivfpq_index / query(index="ivfpq")): persisted
two-table artifact, exact re-scored distances, metric gating, the
read-only transient path, and filter composition."""

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
def ivfpq_coll(engine):
    rng = np.random.default_rng(17)
    centers = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
    ids, vecs = _clustered(rng, 15, centers)
    c = engine.create_collection("ivfpq_items", {"hnsw:space": "cosine"})
    c.add(ids=ids, embeddings=vecs, documents=[f"doc {i}" for i in ids])
    return c, ids, vecs


def _cosine_dist(a, b):
    num = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(1.0 - num / (na * nb), 6) + 0.0


def test_build_persists_and_distances_are_exact(ivfpq_coll):
    c, ids, vecs = ivfpq_coll
    path = c.build_ivfpq_index(
        n_centroids=4, max_iter=3, m=2, k=8, sample_size=64
    )
    assert os.path.isdir(os.path.join(path, "centroids"))
    assert os.path.isdir(os.path.join(path, "codebooks"))
    assert c.stats()["ivfpq_index"] is True
    probe = vecs[5]
    res = c.query(
        [probe], n_results=5, index="ivfpq", n_probe=2, oversample=6
    ).collect()
    assert len(res) == 5
    by_id = dict(zip(ids, vecs))
    for r in res:
        # the composite index affects recall only — every returned
        # distance is the exact rounded cosine, same as the exact path
        assert r["distance"] == _cosine_dist(probe, by_id[r["id"]])
    assert res[0]["id"] == ids[5] and res[0]["distance"] == 0.0


def test_transient_path_reads_never_write(ivfpq_coll, engine):
    from chroma_rs_spark.collection import IVFPQ_INDEX_DIR

    c, ids, vecs = ivfpq_coll
    res = c.query(
        [vecs[0]], n_results=3, index="ivfpq", n_probe=2, oversample=6
    ).collect()
    assert len(res) == 3 and res[0]["id"] == ids[0]
    assert not os.path.exists(
        os.path.join(engine.collection_dir(c.id), IVFPQ_INDEX_DIR)
    )


def test_metric_gating(engine):
    c = engine.create_collection("ivfpq_l2", {"hnsw:space": "l2"})
    c.add(ids=["a", "b"], embeddings=[[1.0, 0.0], [0.0, 1.0]])
    with pytest.raises(EngineError):
        c.build_ivfpq_index()
    with pytest.raises(EngineError):
        c.query([[1.0, 0.0]], n_results=1, index="ivfpq")


def test_where_filter_composes(ivfpq_coll):
    c, ids, vecs = ivfpq_coll
    c.build_ivfpq_index(n_centroids=4, max_iter=3, m=2, k=8, sample_size=64)
    # restrict to cluster-0 ids via metadata-free document filter
    res = c.query(
        [vecs[0]],
        n_results=3,
        index="ivfpq",
        n_probe=4,
        oversample=10,
        where_document={"$contains": "doc c0_"},
    ).collect()
    assert res and all(r["id"].startswith("c0_") for r in res)


def test_recall_beats_chance_on_clustered_data(ivfpq_coll):
    c, ids, vecs = ivfpq_coll
    c.build_ivfpq_index(n_centroids=4, max_iter=3, m=2, k=8, sample_size=64)
    exact = c.query([vecs[7]], n_results=10, index="exact").collect()
    approx = c.query(
        [vecs[7]], n_results=10, index="ivfpq", n_probe=2, oversample=6
    ).collect()
    hits = {r["id"] for r in approx} & {r["id"] for r in exact}
    # clustered fixture: the probed cells contain the true neighbors
    assert len(hits) >= 7


def test_materialized_codes_used_and_results_unchanged(ivfpq_coll, engine):
    c, ids, vecs = ivfpq_coll
    c.build_ivfpq_index(n_centroids=4, max_iter=3, m=2, k=8, sample_size=64)
    probe = vecs[9]
    before = c.query(
        [probe], n_results=5, index="ivfpq", n_probe=2, oversample=6
    ).collect()
    path = c.materialize_ivfpq_codes()
    assert os.path.isdir(path) and c.stats()["ivfpq_codes"] is True
    after = c.query(
        [probe], n_results=5, index="ivfpq", n_probe=2, oversample=6
    ).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in before]
    # late-added item is still searchable (encoded on the fly + union)
    c.add(ids=["late_00"], embeddings=[probe], documents=["late twin"])
    res = c.query(
        [probe], n_results=2, index="ivfpq", n_probe=2, oversample=6
    ).collect()
    assert {r["id"] for r in res} >= {"late_00"}
    assert all(r["distance"] == 0.0 for r in res if r["id"] == "late_00")


def test_rebuild_invalidates_materialized_codes(ivfpq_coll, engine):
    from chroma_rs_spark.collection import IVFPQ_CODES_DIR

    c, ids, vecs = ivfpq_coll
    c.build_ivfpq_index(n_centroids=4, max_iter=3, m=2, k=8, sample_size=64)
    c.materialize_ivfpq_codes()
    codes_dir = os.path.join(engine.collection_dir(c.id), IVFPQ_CODES_DIR)
    assert os.path.isdir(codes_dir)
    # rebuilding with different m must delete the stale codes table
    c.build_ivfpq_index(n_centroids=4, max_iter=3, m=4, k=8, sample_size=64)
    assert not os.path.exists(codes_dir)
    assert c.stats()["ivfpq_codes"] is False


def test_materialize_requires_index(engine):
    c = engine.create_collection("ivfpq_noidx", {"hnsw:space": "cosine"})
    c.add(ids=["a"], embeddings=[[1.0, 0.0]])
    with pytest.raises(EngineError):
        c.materialize_ivfpq_codes()


def test_rebuild_crash_windows_never_mix_generations(ivfpq_coll, engine):
    """REBUILD promotes both tables in ONE root rename: replay every
    crash window's on-disk state and assert the loader always sees a
    complete single generation (old m=2 or new m=4), never codebooks
    from one build with centroids from the other."""
    import shutil

    from chroma_rs_spark.collection import IVFPQ_INDEX_DIR, _load_ivfpq_index

    c, ids, vecs = ivfpq_coll
    c.build_ivfpq_index(n_centroids=4, max_iter=3, m=2, k=8, sample_size=64)
    root = os.path.join(engine.collection_dir(c.id), IVFPQ_INDEX_DIR)
    gen1 = root + ".__gen1_keep"
    shutil.copytree(root, gen1)
    c.build_ivfpq_index(n_centroids=4, max_iter=3, m=4, k=8, sample_size=64)
    gen2 = root + ".__gen2_keep"
    shutil.copytree(root, gen2)

    def reset(tmp_from=None, old_from=None, live_from=None):
        for suffix in ("", ".__tmp", ".__old"):
            shutil.rmtree(root + suffix, ignore_errors=True)
        if tmp_from:
            shutil.copytree(tmp_from, root + ".__tmp")
        if old_from:
            shutil.copytree(old_from, root + ".__old")
        if live_from:
            shutil.copytree(live_from, root)

    # window A: old parked, committed tmp in place, live missing ->
    # the NEW generation wins (its write completed)
    reset(tmp_from=gen2, old_from=gen1)
    cents, books = _load_ivfpq_index(engine, c)
    assert books.shape[0] == 4  # m=4 codebooks
    assert len(cents[0][1]) == 4  # 4-dim centroids of the same build
    assert os.path.isdir(root) and not os.path.isdir(root + ".__tmp")

    # window B: old parked, tmp UNcommitted (no root _SUCCESS), live
    # missing -> roll back to the complete OLD generation
    reset(tmp_from=gen2, old_from=gen1)
    os.remove(os.path.join(root + ".__tmp", "_SUCCESS"))
    cents, books = _load_ivfpq_index(engine, c)
    assert books.shape[0] == 2  # m=2: the parked old build, intact

    # window C: swap finished (live present), stale park dirs remain ->
    # live generation is authoritative
    reset(live_from=gen2, old_from=gen1)
    cents, books = _load_ivfpq_index(engine, c)
    assert books.shape[0] == 4
    shutil.rmtree(gen1, ignore_errors=True)
    shutil.rmtree(gen2, ignore_errors=True)
