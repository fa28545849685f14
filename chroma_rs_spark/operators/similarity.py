"""Similarity search over embedding columns (SURVEY.md §2.3 [EXT]).

* `cosine_topk_pairs` — exact all-pairs top-N most-similar pairs
  (baseline; quadratic, fine for small/medium collections).
* `signbucket_ann` — LSH-bucketed approximate nearest neighbours:
  vectors are bucketed by the sign pattern of their leading
  dimensions (a fixed, data-independent set of axis-aligned
  hyperplanes — deterministic and replicable in ANSI SQL), and
  search touches only the probe's bucket. At 100 TB the bucket join
  shuffles on the bucket key instead of forming a cross product;
  recall/cost is tuned by `n_planes` (buckets = 2^n_planes).

Exact KNN (brute force top-k per query) lives in operators/knn.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chroma_rs_spark.functions.vector import cosine_distance, dot_product, l2_norm


def cosine_topk_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    top_n: int = 20,
) -> DataFrame:
    """Exact top-N most-cosine-similar pairs (id_a < id_b)."""
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(emb_col).alias("emb_a"),
        l2_norm(F.col(emb_col)).alias("norm_a"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(emb_col).alias("emb_b"),
        l2_norm(F.col(emb_col)).alias("norm_b"),
    )
    sim = F.round(
        dot_product(F.col("emb_a"), F.col("emb_b"))
        / (F.col("norm_a") * F.col("norm_b")),
        6,
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), "id_a", "id_b")
        .limit(top_n)
    )


def sign_bucket(emb_col, n_planes: int = 8):
    """Bucket key: sign pattern of the first `n_planes` dimensions."""
    return F.concat(
        *[
            F.when(F.element_at(emb_col, i + 1) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(n_planes)
        ]
    )


def signbucket_ann(
    items: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    item_id: str = "vec_id",
    item_emb: str = "embedding",
    probe_id: str = "query_id",
    probe_emb: str = "query_embedding",
) -> DataFrame:
    """ANN: top-k by cosine distance within the probe's sign bucket,
    excluding the probe row itself. Returns
    (query_id, rank, neighbor_id, distance)."""
    it = items.select(
        F.col(item_id).alias("_iid"),
        F.col(item_emb).alias("_iemb"),
        sign_bucket(F.col(item_emb), n_planes).alias("_bucket"),
    )
    pr = probes.select(
        F.col(probe_id).alias("_qid"),
        F.col(probe_emb).alias("_qemb"),
        sign_bucket(F.col(probe_emb), n_planes).alias("_bucket"),
    )
    dist = F.round(cosine_distance(F.col("_iemb"), F.col("_qemb")), 6)
    scored = (
        it.join(F.broadcast(pr), "_bucket")
        .filter(F.col("_iid") != F.col("_qid"))
        .select(
            F.col("_qid").alias(probe_id),
            F.col("_iid").alias("neighbor_id"),
            dist.alias("distance"),
        )
    )
    w = Window.partitionBy(probe_id).orderBy(
        F.col("distance").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, "rank", "neighbor_id", "distance")
    )
