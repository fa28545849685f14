"""IVF-style ANN (SURVEY.md §2.3 [EXT] similarity search — the
"IVF variant" scale path alongside the LSH sign-bucket one).

Classic inverted-file search: partition the collection into cells
around centroids, then search only the `n_probe` cells nearest each
query. Recall < 1 by design; the win is that a query touches
|collection| * n_probe / n_centroids vectors.

Determinism contract (what makes this oracle-checkable): centroids are
the `n_centroids` lowest-id vectors — a placeholder for k-means that
any engine can reproduce exactly. At 100 TB you'd swap in k-means||
centroids computed once at index-build time and persist them next to
the collection (the assignment/probe/search plan below is unchanged);
with sampled centroids the cells are unbalanced but the mechanics are
identical.

Scale shape: assignment is map-side (centroids broadcast as literals
into a `least(struct(dist, cid))` expression — no shuffle, no Python);
the search is an equi-join on cell id, so the shuffle carries only
probed cells. Cell skew is the known IVF failure mode — AQE skew-join
splits hot cells at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chroma_rs_spark.functions.vector import dot_product, l2_norm
from chroma_rs_spark.operators.knn import DIST_DECIMALS


def _seq_norm(vec: list[float]) -> float:
    """L2 norm with strict left-to-right accumulation — the exact
    double `l2_norm` (aggregate HOF) produces, so a driver-computed
    centroid norm is interchangeable with the JVM-computed one."""
    import math

    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def assign_cells(
    items: DataFrame,
    centroids: list[tuple[int, list[float]]],
    item_emb: str = "embedding",
) -> DataFrame:
    """Append `cell` = id of the nearest centroid (cosine, ties to the
    lower centroid id). Pure map-side column expression.

    Cost discipline: HOF lambdas evaluate interpreted (outside
    whole-stage codegen), so the expression computes the item norm
    ONCE per row (not once per centroid) and takes each centroid's
    norm as a driver-computed literal — one dot product per centroid
    per row is the irreducible work. Same doubles as the naive form
    (norms accumulate in the same order), ~3x less interpreted work.
    For wide vectors or large centroid counts, the Arrow-batch path
    (knn_exact_local_topk's matmul) is the next gear.
    """
    norm_col = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col(item_emb),
                F.col(item_emb),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    with_norm = items.withColumn("_inorm", norm_col)
    cands = []
    for cid, vec in centroids:
        lit_vec = F.array(*[F.lit(float(x)) for x in vec]).cast("array<double>")
        dist = F.round(
            F.lit(1.0)
            - dot_product(F.col(item_emb), lit_vec)
            / (F.col("_inorm") * F.lit(_seq_norm(vec))),
            DIST_DECIMALS,
        )
        cands.append(F.struct(dist.alias("d"), F.lit(int(cid)).alias("c")))
    return with_norm.withColumn("cell", F.least(*cands).getField("c"))


def ivf_topk(
    items: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_queries: int = 5,
    item_id: str = "vec_id",
    item_emb: str = "embedding",
) -> DataFrame:
    """Approximate top-k: queries = the `n_queries` lowest-id vectors,
    centroids = the `n_centroids` lowest-id vectors; each query probes
    its `n_probe` nearest cells. Returns
    (query_id, rank, neighbor_id, distance)."""
    import numpy as np

    small = (
        items.filter(F.col(item_id) < max(n_centroids, n_queries))
        .select(F.col(item_id).alias("id"), F.col(item_emb).alias("emb"))
        .collect()
    )
    by_id = {r["id"]: [float(x) for x in r["emb"]] for r in small}
    centroids = [(i, by_id[i]) for i in sorted(by_id) if i < n_centroids]
    queries = [(i, by_id[i]) for i in sorted(by_id) if i < n_queries]

    # driver-side probe selection (queries and centroids are tiny):
    # same rounding + lower-id tie-break as every ranking in the engine
    cmat = np.array([v for _, v in centroids], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1)
    probe_rows = []
    for qid, qv in queries:
        q = np.array(qv, dtype=np.float64)
        d = np.round(1.0 - (cmat @ q) / (cnorm * np.linalg.norm(q)), DIST_DECIMALS)
        order = np.lexsort(([c for c, _ in centroids], d))
        for cell in order[:n_probe]:
            probe_rows.append((qid, int(centroids[cell][0]), qv))

    spark = items.sparkSession
    probes = spark.createDataFrame(
        [(qid, cell, qv, _seq_norm(qv)) for qid, cell, qv in probe_rows],
        "query_id long, cell long, qemb array<double>, qnorm double",
    )

    assigned = assign_cells(items, centroids, item_emb)
    joined = assigned.join(F.broadcast(probes), "cell")
    scored = joined.select(
        "query_id",
        F.col(item_id).alias("neighbor_id"),
        # item norm reused from assignment, query norm precomputed on
        # the driver (same sequential accumulation = same doubles);
        # +0.0 canonicalizes -0.0 after rounding (see operators/knn.py)
        (
            F.round(
                F.lit(1.0)
                - dot_product(F.col(item_emb), F.col("qemb"))
                / (F.col("_inorm") * F.col("qnorm")),
                DIST_DECIMALS,
            )
            + F.lit(0.0)
        ).alias("distance"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "distance")
    )
