"""Per-label embedding centroids + nearest-centroid assignment.

The two primitives behind cluster-based corpus curation (and the
E/M steps of a DataFrame-native k-means): average an embedding column
per group, then re-assign rows to their nearest centroid.

Cross-engine determinism: float averages are partition-order-dependent
in any parallel engine, so the accumulation here is fixed-point —
each component is scaled to an exact integer of micro-units
(round(x * 1e6), identical IEEE ops in Spark and DuckDB) and summed
exactly (decimal(38,0) ≡ DuckDB's int128 sum), making the centroid a
deterministic function of the data, not of the partitioning. The same
rationale as functions/money.py, applied to unit-scale floats; 1e-6
quantization is far below embedding noise.

Scale: posexplode keeps rows narrow (label, pos, micro) and the
aggregate is map-side combinable; shuffle volume is
|labels| × dim × |partitions| partial sums, independent of row count.
Assignment broadcasts the (tiny) centroid matrix and is a map-side
HOF dot product — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000.0


def label_centroids(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """(label, pos, centroid, n_vectors): per-label mean of each
    embedding component, in long form (one row per component — the
    shape that joins/compares cleanly across engines)."""
    e = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "_val"),
    )
    micro = F.round(F.col("_val").cast("double") * F.lit(MICRO)).cast(
        "decimal(38,0)"
    )
    g = e.groupBy("label", "pos").agg(
        F.sum(micro).alias("_s"), F.count(F.lit(1)).alias("n_vectors")
    )
    centroid = F.round(
        F.col("_s").cast("double") / (F.col("n_vectors") * F.lit(MICRO)),
        decimals,
    )
    # + 0.0 canonicalizes -0.0 (the repo-wide rounding contract,
    # tests/test_distance_rounding.py)
    return g.select(
        "label",
        "pos",
        (centroid + F.lit(0.0)).alias("centroid"),
        "n_vectors",
    )


def assign_nearest_centroid(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, assigned_label, sq_dist): nearest centroid by squared
    L2. `centroids` is label_centroids() output (long form); it is
    pivoted to one array per label and broadcast — rows never shuffle.
    """
    mats = (
        centroids.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "centroid"))
            ).alias("_pc")
        )
        .select(
            "label",
            F.transform("_pc", lambda x: x["centroid"]).alias("cvec"),
        )
    )
    sq = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("cvec"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # round before the argmin so ties (and the label tie-break) are
    # identical across engines; + 0.0 canonicalizes -0.0
    sqr = F.round(sq, 6) + F.lit(0.0)
    scored = (
        emb.select(id_col, vec_col)
        .crossJoin(F.broadcast(mats))
        .select(id_col, F.col("label").alias("assigned_label"), sqr.alias("sq_dist"))
    )
    best = scored.groupBy(id_col).agg(F.min(F.struct("sq_dist", "assigned_label")).alias("_b"))
    return best.select(
        id_col,
        F.col("_b.assigned_label").alias("assigned_label"),
        F.col("_b.sq_dist").alias("sq_dist"),
    )
