"""Hybrid retrieval: reciprocal-rank fusion of lexical (BM25) and
vector (cosine) rankings (SURVEY.md §2.3 [EXT] similarity search — the
fusion pattern modern vector stores expose next to pure ANN).

RRF (public formulation, Cormack et al.): fused(d) = Σ_systems
1 / (k0 + rank_s(d)). Rank-based fusion needs no score calibration
between BM25's unbounded scores and cosine's [0, 2] distances, and the
arithmetic is engine-exact: ranks are integers, each term is one
double division, and the sum is two terms in a fixed order — so the
fused score replays bit-for-bit in SQL.

Scale shape: both input rankings are global top-ranked lists. Computed
here as corpus-wide windows (fine at suite scale); at 100 TB each
system produces its top-m per partition first and only |partitions|*m
candidates meet the global window — the standard top-k merge, same
pattern as knn_exact_local_topk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from chroma_rs_spark.functions.vector import cosine_distance
from chroma_rs_spark.operators.text import bm25_scores

RRF_K0 = 60  # the standard damping constant from the RRF literature


def hybrid_search_rrf(
    docs: DataFrame,
    emb: DataFrame,
    terms: list[str],
    query_vec: list[float],
    k: int = 10,
    k0: int = RRF_K0,
    k1: float = 1.2,
    b: float = 0.75,
    doc_id: str = "doc_id",
    vec_id: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Top-k documents under RRF fusion of a BM25 text query and a
    cosine vector query (doc_id == vec_id joins the two modalities).

    Returns (doc_id, bm25_rank, vec_rank, rrf) ordered by (rrf desc,
    doc_id) — both input ranks are reported so callers can see which
    modality surfaced each hit. Every rank uses the repo-wide
    deterministic tie-break (score desc / distance asc, then id asc)
    over round-6 scores.
    """
    if not terms:
        raise ValueError("hybrid_search_rrf needs a non-empty terms list")
    bm = bm25_scores(docs, terms, k1=k1, b=b)
    w_bm = Window.orderBy(F.col("bm25").desc(), F.col(doc_id).asc())
    bm_ranked = bm.select(
        doc_id, F.row_number().over(w_bm).alias("bm25_rank")
    )
    qlit = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    dist = F.round(cosine_distance(F.col(emb_col), qlit), 6) + F.lit(0.0)
    w_vec = Window.orderBy(F.col("_dist").asc(), F.col(doc_id).asc())
    vec_ranked = (
        emb.filter(F.col(emb_col).isNotNull())
        .select(F.col(vec_id).alias(doc_id), dist.alias("_dist"))
        .select(doc_id, "_dist", F.row_number().over(w_vec).alias("vec_rank"))
        .drop("_dist")
    )
    rrf: Column = F.round(
        F.lit(1.0) / (F.lit(float(k0)) + F.col("bm25_rank"))
        + F.lit(1.0) / (F.lit(float(k0)) + F.col("vec_rank")),
        6,
    ) + F.lit(0.0)
    return (
        bm_ranked.join(vec_ranked, doc_id)
        .select(
            doc_id,
            F.col("bm25_rank").cast("long").alias("bm25_rank"),
            F.col("vec_rank").cast("long").alias("vec_rank"),
            rrf.alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col(doc_id).asc())
        .limit(k)
    )
