"""IVF ANN (operators/ivf.py): assignment determinism and recall
against exact KNN on real sf0.001 embeddings."""

import pytest
from pyspark.sql import functions as F

from chroma_rs_spark.operators.ivf import assign_cells, ivf_topk
from chroma_rs_spark.operators.knn import knn_exact
from chroma_rs_spark.sources.tables import load_table
from tests.conftest import SF001_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF001_DIR, "embeddings")


def test_assignment_covers_all_items_once(emb):
    centroids = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 8).collect()
    ]
    assigned = assign_cells(emb, centroids)
    assert assigned.count() == emb.count()
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= {c for c, _ in centroids}


def test_ivf_recall_vs_exact(emb):
    k = 10
    approx = ivf_topk(emb, k=k, n_centroids=16, n_probe=4, n_queries=5)
    got = {
        (r["query_id"], r["neighbor_id"]) for r in approx.collect()
    }
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("query_embedding"),
    )
    exact = knn_exact(emb, queries, k=k, metric="cosine", item_id="vec_id")
    want = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    # every query returns a full top-k, and each query's own vector
    # (distance 0) must always survive probing
    assert len(got) == 5 * k
    for qid in range(5):
        assert (qid, qid) in got
    recall = len(got & want) / len(want)
    assert recall >= 0.5, recall  # probing 4/16 cells keeps most true neighbors
