"""Model-based quality classification: distributed logistic regression
on hashed bag-of-words features.

The model-based filter is the step beyond rule-based quality scoring in
every modern pretraining pipeline (FineWeb-Edu's educational-value
classifier, the GPT-3 WebText-vs-CommonCrawl LR filter, Brown et al.
2020 §A): train a small linear classifier on labeled documents, score
the whole corpus, keep the high-scoring tail. This module implements
the Spark-native version with full-batch gradient descent whose every
step is ENGINE-EXACT (bit-reproducible and DuckDB-replayable):

- features: md5-hashed bag-of-words (`base_hash32(token) % n_features`,
  the repo's engine-portable hash family), term frequencies x = cnt/n,
  plus a constant bias feature at index `n_features`. Each document's
  feature vector is ONE array column sorted by feature index — so the
  per-document margin is a position-ordered fold (the bm25/centroid
  float-order discipline), fully map-side against a literal weight
  array (no join, no shuffle).
- gradients: per-(doc, feature) contributions quantized to integer
  micro-units with floor(err * x * 1e6) — floor, not round, so there
  is no half-boundary class at all — then summed as exact BIGINTs
  (order-free, map-side-combinable). One ~n_features-key groupBy per
  iteration is the only shuffle.
- weights: held as INTEGER micro-units on the driver; the update
  w -= floor(lr * g / m) is computed on the same doubles both engines
  see, so the trained model is replayable in SQL by unrolling the
  Lloyd's-style iteration CTEs (the `knn_ivf_trained` oracle pattern).

At 100 TB the shape holds: featurization is two map-side-combinable
groupBys (doc-local keys), each GD iteration is one codegen pass over
the cached feature table plus a ≤(n_features+1)-row collect. Full-batch
GD over a 100 TB corpus is deliberate — it is exactly one extra pass
per iteration, and 3-5 iterations of a 65-parameter model converge to
filter-grade quality; minibatch SGD would add nondeterminism for no
capacity gain at this model size.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def featurize_text(
    df: DataFrame,
    n_features: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *extra_cols, feats): hashed-bag-of-words features as one
    array<struct<j int, x double>> per document, sorted by feature
    index j, bias feature (j = n_features, x = 1.0) appended last.
    NULL/empty documents keep their row with only the bias feature, so
    every document is scoreable.
    """
    from chroma_rs_spark.operators.dedup import base_hash32, nonempty_tokens_col

    if n_features < 1:
        raise ValueError(f"n_features must be >= 1, got {n_features}")
    occ = (
        df.select(id_col, F.explode(nonempty_tokens_col(text_col)).alias("_tok"))
        .withColumn("_j", (base_hash32("_tok") % n_features).cast("int"))
        .groupBy(id_col, "_j")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    feats = (
        occ.groupBy(id_col)
        .agg(
            F.sum("_cnt").alias("_n"),
            F.array_sort(F.collect_list(F.struct("_j", "_cnt"))).alias("_cf"),
        )
        .select(
            id_col,
            F.expr(
                "transform(_cf, f -> struct(f._j AS j,"
                " CAST(f._cnt AS DOUBLE) / CAST(_n AS DOUBLE) AS x))"
            ).alias("_tf"),
        )
    )
    bias = F.expr(f"array(struct({int(n_features)} AS j, 1.0D AS x))")
    return (
        df.select(id_col, *extra_cols)
        .join(feats, id_col, "left")
        .select(
            id_col,
            *extra_cols,
            F.concat(
                F.coalesce(F.col("_tf"), F.expr("array()")), bias
            ).alias("feats"),
        )
    )



def _r6(expr: str) -> str:
    """Engine-portable round-to-6: floor(x*1e6 + 0.5)/1e6 — both
    engines floor the SAME double, so there is no half-boundary
    rounding class (Spark rounds the shortest decimal repr, DuckDB the
    near-exact binary value; a fuzz corpus found a sigmoid output
    differing in the 6th decimal between the two `round(x, 6)`s —
    the r7 centroid divergence class on a transcendental output).
    Ties round toward +infinity for negative inputs; the oracle uses
    the identical formula, which is the only property that matters."""
    return f"floor(({expr}) * 1000000.0D + 0.5D) / 1000000.0D"


def _margin_expr(weights_micro: list[int]) -> str:
    """The per-row margin as one SQL expression: a position-ordered
    fold of the feats array against the literal weight array (micro
    units divided to doubles exactly as the oracle does)."""
    lits = ", ".join(f"{int(w)}L" for w in weights_micro)
    fold = (
        f"aggregate(feats, 0.0D, (a, f) -> a +"
        f" (CAST(element_at(array({lits}), f.j + 1) AS DOUBLE)"
        f" / 1000000.0D) * f.x)"
    )
    return _r6(fold)


def train_quality_classifier(
    featurized: DataFrame,
    label_col: str = "label",
    n_features: int = 64,
    iters: int = 3,
    lr: float = 1.0,
) -> list[int]:
    """Full-batch logistic-regression GD over a `featurize_text`
    output; returns the trained weights as n_features+1 integer
    micro-unit values (index n_features is the bias).

    Per iteration: margin = ordered fold (map-side), p = sigmoid of the
    6-rounded margin, err = round(p - y, 6), per-feature gradient =
    exact BIGINT sum of floor(err * x * 1e6), update
    w_j -= floor(lr * g_j / m) in micro units. Every step is the same
    double arithmetic in Spark, Python, and the SQL oracle replay.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if lr <= 0.0:
        raise ValueError(f"lr must be > 0, got {lr}")
    d = n_features + 1
    cached = featurized.persist()
    try:
        m = cached.count()
        if m == 0:
            raise ValueError("cannot train on an empty corpus")
        weights = [0] * d
        for _ in range(iters):
            err = F.expr(
                _r6(
                    f"1.0D / (1.0D + exp(-({_margin_expr(weights)})))"
                    f" - CAST(`{label_col}` AS DOUBLE)"
                )
            )
            grads = (
                cached.withColumn("_e", err)
                .select(F.explode("feats").alias("f"), "_e")
                .select(
                    F.col("f.j").alias("j"),
                    F.floor(F.col("_e") * F.col("f.x") * F.lit(1000000.0)).alias(
                        "_g"
                    ),
                )
                .groupBy("j")
                .agg(F.sum("_g").alias("g"))
                .collect()
            )
            g = {int(r["j"]): int(r["g"]) for r in grads}
            weights = [
                w - math.floor(lr * g.get(j, 0) / m)
                for j, w in enumerate(weights)
            ]
        return weights
    finally:
        cached.unpersist()


def score_quality_classifier(
    featurized: DataFrame,
    weights_micro: list[int],
    out: str = "score",
    threshold: float = 0.5,
) -> DataFrame:
    """Adds `out` = round(sigmoid(margin), 6) and `{out}_pred` =
    score >= threshold over a `featurize_text` output."""
    margin = _margin_expr(weights_micro)
    return featurized.withColumn(
        out, F.expr(_r6(f"1.0D / (1.0D + exp(-({margin})))"))
    ).withColumn(f"{out}_pred", F.col(out) >= F.lit(float(threshold)))
