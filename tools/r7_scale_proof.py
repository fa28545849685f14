#!/usr/bin/env python
"""Round-7 scale proofs (VERDICT r6 next-round #2 and #8).

Proof A — ngram_decontamination hot-gram shuffle shape. The realistic
contamination skew is a BOILERPLATE block: one 13-token sentence shared
by a large fraction of the corpus, so one gram key holds a constant
fraction of all (doc, gram) rows. Builds zipf-token corpora with the
block planted in 30% of docs at 1x and 10x, then measures what each
formulation's gram-keyed exchange actually carries:

  * occurrence form (REJECTED): raw (doc, gram) occurrence rows
    repartitioned on the gram hash — the reducer holding the planted
    gram receives every one of its occurrences (linear, unsplittable).
  * shipped two-phase form: phase 1 shuffles on (doc, split, gram) —
    the hot gram spreads over all reducers because doc varies — and
    phase 2 / the train-side distinct carry per-map-task PARTIAL
    distinct rows on the gram key (<= map tasks per gram, constant in
    corpus size).

Proof B — semantic_dedup pair-join bound. The round-6 form pinned the
cluster count to the LABEL cardinality (k = 10 for the driver tables),
so the within-cluster self-join formed (n/k)^2 pairs per cluster with
constant k — all-pairs with a constant shaved off. The shipped form
trains k-means with k = ceil(sqrt(n)). Both assignments are computed
on the twin corpus at 1x (sf0.1) and 10x (sf1.0) and the ordered
within-cluster pair count sum(n_c * (n_c - 1)) is reported: the
label-pinned count grows ~quadratically (100x at 10x), the sqrt-k
count ~n^1.5 (~31.6x at 10x).

Usage: python tools/r7_scale_proof.py [--rebuild]
Writes corpora under _scaletmp/boiler{1,10}; prints one JSON per proof.
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_DOCS_1X = 5_000
TOKENS_PER_DOC = 100
VOCAB = 20_000
ZIPF_S = 1.3
BOILER_FRAC = 0.3
BOILER = " ".join(f"boiler{i}" for i in range(13))  # one 13-gram exactly


def build_corpus(path: str, n_docs: int, seed: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    probs = ranks**-ZIPF_S
    probs /= probs.sum()
    toks = rng.choice(VOCAB, size=(n_docs, TOKENS_PER_DOC), p=probs)
    texts = []
    for d, row in enumerate(toks):
        body = " ".join(f"w{t}" for t in row)
        if d % int(1 / BOILER_FRAC) == 0:
            body = BOILER + " " + body
        texts.append(body)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path)


def gram_shuffle_skew(spark, df, n: int = 13) -> dict:
    import pyspark.sql.functions as F

    from chroma_rs_spark.operators.dedup import (
        nonempty_tokens_col,
        shingles_col,
    )
    from chroma_rs_spark.operators.sampling import dataset_split

    sp = dataset_split(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="doc_id"
    )
    grams = sp.select(
        F.col("doc_id"),
        F.col("split"),
        F.explode(shingles_col(nonempty_tokens_col("text"), n)).alias("_g"),
    ).select("doc_id", "split", F.md5("_g").alias("_h"))
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))

    hot = (
        grams.groupBy("_h").count().orderBy(F.desc("count")).limit(1)
    ).collect()[0]
    hot_h = hot["_h"]

    def hot_colocation(d, *keys) -> int:
        """Rows of the HOT gram landing in the single most-loaded
        partition under this partitioning — the direct skew signal
        (md5-uniform background load is the same for every form and
        would swamp a plain max-partition-rows comparison)."""
        return int(
            d.repartition(n_shuffle, *keys)
            .withColumn("_p", F.spark_partition_id())
            .filter(F.col("_h") == hot_h)
            .groupBy("_p")
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()[0]["mx"]
        )

    # REJECTED: every occurrence row keyed by the gram alone — the hot
    # gram's rows all hash to ONE reducer
    occ_hot = hot_colocation(grams, "_h")
    # shipped phase 1: distinct (doc, split, gram) pairs keyed by all 3
    # — the hot gram spreads across reducers because doc varies
    pairs = grams.distinct()
    pair_hot = hot_colocation(pairs, "doc_id", "split", "_h")
    # shipped phase 2 / train-side distinct: per-map partial-distinct
    # rows keyed by the gram — at most one row per map task survives
    partials = (
        grams.withColumn("_mp", F.spark_partition_id())
        .select("_mp", "_h")
        .distinct()
    )
    partial_hot = hot_colocation(partials, "_h")
    return {
        "total_gram_rows": grams.count(),
        "hottest_gram_occurrences": int(hot["count"]),
        "occurrence_form_hot_rows_one_reducer": occ_hot,
        "twophase_pair_hot_rows_max_reducer": pair_hot,
        "twophase_partial_hot_rows_max_reducer": partial_hot,
    }


def semdedup_pair_counts(spark, sf_dir: str) -> dict:
    import pyspark.sql.functions as F

    from chroma_rs_spark.operators.centroids import (
        assign_nearest_centroid,
        kmeans,
        label_centroids,
    )

    # project the canonical columns: the regenerated _scaletmp/sf1.0
    # table carries an extra helper column from an earlier round
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    twin = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.when(
            F.col("vec_id") % 10 == 0, F.expr("transform(embedding, x -> -x)")
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
        "label",
    )
    corpus = emb.unionByName(twin)
    n = corpus.count()

    def ordered_pairs(assign) -> int:
        sizes = assign.groupBy("assigned_label").count().collect()
        return int(sum(r["count"] * (r["count"] - 1) for r in sizes))

    # round-6 label-pinned form (k = |labels|, constant)
    lab = assign_nearest_centroid(corpus, label_centroids(corpus))
    lab_pairs = ordered_pairs(lab)
    k_lab = lab.select("assigned_label").distinct().count()
    # shipped form: k-means with k = ceil(sqrt(n))
    r = math.isqrt(n)
    k = max(2, r if r * r == n else r + 1)
    _, cents = kmeans(corpus.select("vec_id", "embedding"), k=k, max_iter=3)
    km = assign_nearest_centroid(corpus, cents)
    km_pairs = ordered_pairs(km)
    k_km = km.select("assigned_label").distinct().count()
    return {
        "n_vectors": n,
        "label_pinned_k": int(k_lab),
        "label_pinned_ordered_pairs": lab_pairs,
        "sqrt_k": int(k_km),
        "sqrt_k_ordered_pairs": km_pairs,
    }


def main() -> int:
    rebuild = "--rebuild" in sys.argv
    from chroma_rs_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tag, ndocs, seed in (("boiler1", N_DOCS_1X, 5), ("boiler10", N_DOCS_1X * 10, 6)):
        p = os.path.join(ROOT, "_scaletmp", tag, "documents.parquet")
        if rebuild or not os.path.exists(p):
            build_corpus(p, ndocs, seed)
        df = spark.read.parquet(p)
        out[tag] = gram_shuffle_skew(spark, df)
        print(json.dumps({"proof": "ngram_gram_shuffle", "corpus": tag, **out[tag]}))
    for tag, sf_dir in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1.0", os.path.join(ROOT, "_scaletmp", "sf1.0")),
    ):
        r = semdedup_pair_counts(spark, sf_dir)
        print(json.dumps({"proof": "semdedup_pairs", "corpus": tag, **r}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
