"""Cross-engine bit-equality contract for rounded KNN distances.

Round-1 regression class: self-match cosine/ip distances round to
-0.0 in one engine and +0.0 in the other, breaking the bit-level value
hash even though every comparison says equal. The fix canonicalizes
with `+ 0.0` after rounding on BOTH sides (operators/knn.py,
suite/vector.py). This test pins the contract: for adversarial vector
sets (exact duplicates -> rank-1 distance == 0, scaled copies ->
cosine 0, negatives), every rounded distance from knn_exact and
knn_exact_local_topk is BIT-identical to DuckDB evaluating the same
math — compared via IEEE-754 bit patterns, not ==.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from chroma_rs_spark.operators.knn import knn_exact, knn_exact_local_topk

DIM = 8
METRIC_SQL = {
    "cosine": (
        "1.0 - list_dot_product(e.emb, q.emb)"
        " / (sqrt(list_dot_product(e.emb, e.emb))"
        " * sqrt(list_dot_product(q.emb, q.emb)))"
    ),
    "l2": "list_distance(e.emb, q.emb) ** 2",
    "ip": "1.0 - list_dot_product(e.emb, q.emb)",
}


def _vectors():
    rng = np.random.default_rng(20260813)
    vecs = rng.normal(0.0, 1.0, size=(24, DIM))
    vecs[3] = vecs[0]          # exact duplicate -> distance 0 self-pair
    vecs[7] = vecs[1] * 2.5    # scaled copy -> cosine distance rounds to 0
    vecs[9] = -vecs[2]         # antipodal -> cosine 2, ip sign flips
    return [[float(x) for x in row] for row in vecs]


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


@pytest.mark.parametrize("metric", ["cosine", "l2", "ip"])
def test_rounded_distances_bit_match_duckdb(spark, metric):
    import duckdb

    vecs = _vectors()
    items = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "doc_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs[:6])],
        "query_id long, query_embedding array<double>",
    )
    spark_rows = {
        (r["query_id"], r["doc_id"]): _bits(r["distance"])
        for r in knn_exact(items, queries, k=len(vecs), metric=metric).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE vecs (id BIGINT, emb DOUBLE[])")
    con.executemany(
        "INSERT INTO vecs VALUES (?, ?)", [(i, v) for i, v in enumerate(vecs)]
    )
    oracle = {
        (qid, iid): _bits(d)
        for qid, iid, d in con.execute(
            f"""
            SELECT q.id, e.id, ROUND(({METRIC_SQL[metric]}), 6) + 0.0
            FROM vecs e CROSS JOIN vecs q WHERE q.id < 6
            """
        ).fetchall()
    }
    assert spark_rows == {k: oracle[k] for k in spark_rows}
    # the adversarial self-pairs must be +0.0, never -0.0 (cosine of a
    # vector with itself / its scaled copy; ip is 1-|a|^2, not 0)
    if metric == "cosine":
        assert spark_rows[(0, 3)] == _bits(0.0)
        assert spark_rows[(3, 3)] == _bits(0.0)
        assert spark_rows[(1, 7)] == _bits(0.0)


def test_scale_path_bit_matches_exact_path(spark):
    """knn_exact_local_topk (numpy) and knn_exact (HOF) agree bit-wise
    on rounded distances, including the canonicalized zero."""
    vecs = _vectors()
    items = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "doc_id long, embedding array<double>",
    )
    queries_df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs[:6])],
        "query_id long, query_embedding array<double>",
    )
    exact = {
        (r["query_id"], r["rank"]): (r["doc_id"], _bits(r["distance"]))
        for r in knn_exact(items, queries_df, k=5, metric="cosine").collect()
    }
    local = {
        (r["query_id"], r["rank"]): (r["doc_id"], _bits(r["distance"]))
        for r in knn_exact_local_topk(
            items, [(i, v) for i, v in enumerate(vecs[:6])], k=5, metric="cosine"
        ).collect()
    }
    assert exact == local
