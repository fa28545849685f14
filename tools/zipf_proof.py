"""Zipf-skew scale proof for the token-frequency operators (VERDICT r5 #1).

Builds a stop-word-dense corpus (token stream ~Zipf: the top token is
~20% of all occurrences — the distribution tfidf_topk / lm_perplexity
exist to process), then A/Bs the shipped map-side groupBy + broadcast
vocabulary form against the rejected `Window.partitionBy(token)` count
form at 1x and 10x. The window form has no partial aggregation, so
every occurrence of the top token lands in ONE task's partition; the
groupBy form shuffles per-partition partial counts (|vocab| rows per
map task, uniform).

Evidence captured per run:
  - wall time (best of 3)
  - max task shuffle-read rows of the token-keyed stage (via the
    status API) — the direct skew measurement
  - plan assertion: shipped form has no Window over the token key

Usage: python tools/zipf_proof.py [--rebuild]
Writes parquet under _scaletmp/zipf{1,10}/documents.parquet.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_DOCS_1X = 5_000
TOKENS_PER_DOC = 100
VOCAB = 20_000
ZIPF_S = 1.3  # top token ~20% of the stream at this vocab size


def build_corpus(path: str, n_docs: int, seed: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    probs = ranks**-ZIPF_S
    probs /= probs.sum()
    toks = rng.choice(VOCAB, size=(n_docs, TOKENS_PER_DOC), p=probs)
    texts = [" ".join(f"w{t}" for t in row) for row in toks]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path)


def window_form_tfidf(df, k=3):
    """The REJECTED round-5 formulation, kept here (only) for the A/B."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window as W

    from chroma_rs_spark.operators.text import tokens_col

    tok = df.select("doc_id", F.explode(tokens_col("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("_tf"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    idf = F.log(
        (F.lit(1.0) + F.col("_n").cast("double"))
        / (F.lit(1.0) + F.col("_df").cast("double"))
    ) + F.lit(1.0)
    scored = (
        tf.withColumn("_df", F.count(F.lit(1)).over(W.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (F.round(F.col("_tf").cast("double") * idf, 6) + F.lit(0.0)).alias(
                "tfidf"
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", F.col("rank").cast("long").alias("rank"), "term", "tfidf")
    )


def window_form_perplexity(df, k_smooth=0.5):
    """The REJECTED round-5 lm_perplexity count shape."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window as W

    from chroma_rs_spark.operators.dedup import nonempty_tokens_col

    tok = df.select(
        F.col("doc_id"),
        F.posexplode(nonempty_tokens_col("text")).alias("_pos", "_tok"),
    )
    totals = tok.agg(
        F.count(F.lit(1)).alias("_N"), F.count_distinct(F.col("_tok")).alias("_V")
    )
    logp = F.log(
        (F.col("_cnt").cast("double") + F.lit(float(k_smooth)))
        / (
            F.col("_N").cast("double")
            + F.lit(float(k_smooth)) * F.col("_V").cast("double")
        )
    )
    scored = (
        tok.withColumn("_cnt", F.count(F.lit(1)).over(W.partitionBy("_tok")))
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.array_sort(
                F.collect_list(F.struct(F.col("_pos"), logp.alias("_lp")))
            ).alias("_l"),
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "round(aggregate(_l, 0.0D, (a, x) -> a + x._lp)"
            " / n_tokens, 6) + 0.0D AS avg_logp",
        )
        .withColumn(
            "perplexity", F.round(F.exp(-F.col("avg_logp")), 6) + F.lit(0.0)
        )
    )
    return df.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
        "avg_logp",
        "perplexity",
    )


def shuffle_skew_rows(spark, df) -> dict:
    """What each formulation's token-keyed shuffle actually carries.

    * window form: the exchange moves every OCCURRENCE row keyed by
      token — the reducer holding the hottest token receives all of
      its occurrences (linear in corpus size, unsplittable).
    * groupBy form: the exchange moves per-map-partition PARTIAL
      counts — the reducer holding the hottest token receives at most
      one row per map task (constant in corpus size).

    Both are measured on the real token stream by materializing the
    respective shuffle inputs and counting rows per hash partition.
    """
    import pyspark.sql.functions as F

    from chroma_rs_spark.operators.text import tokens_col

    tok = df.select("doc_id", F.explode(tokens_col("text")).alias("term"))
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    occ_per_part = (
        tok.repartition(n_shuffle, "term")
        .withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
        .collect()[0]
    )
    # the partial-agg output a groupBy(term) shuffle would carry:
    # one (map partition, term) row per distinct term per map task
    partials = tok.withColumn("_mp", F.spark_partition_id()).groupBy(
        "_mp", "term"
    ).count()
    part_per_part = (
        partials.repartition(n_shuffle, "term")
        .withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
        .collect()[0]
    )
    top = (
        tok.groupBy("term").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    return {
        "total_occurrences": tok.count(),
        "hottest_token_occurrences": int(top["count"]),
        "window_form_max_partition_rows": int(occ_per_part["mx"]),
        "window_form_avg_partition_rows": round(float(occ_per_part["avg"]), 1),
        "groupby_form_max_partition_rows": int(part_per_part["mx"]),
        "groupby_form_avg_partition_rows": round(float(part_per_part["avg"]), 1),
    }


def timed(df, n=3):
    """Force full computation with the bench.py noop-write action —
    count() lets Catalyst eliminate aggregate-unique left joins."""

    def run():
        df.write.format("noop").mode("overwrite").save()

    run()
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    rebuild = "--rebuild" in sys.argv
    paths = {
        "1x": os.path.join(ROOT, "_scaletmp", "zipf1", "documents.parquet"),
        "10x": os.path.join(ROOT, "_scaletmp", "zipf10", "documents.parquet"),
    }
    for label, mult in (("1x", 1), ("10x", 10)):
        if rebuild or not os.path.exists(paths[label]):
            build_corpus(paths[label], N_DOCS_1X * mult, seed=7 + mult)

    from chroma_rs_spark.operators.text import lm_perplexity, tfidf_topk
    from chroma_rs_spark.session import get_spark

    spark = get_spark()
    results = {}
    for label in ("1x", "10x"):
        df = spark.read.parquet(paths[label])
        shipped_tfidf = tfidf_topk(df)
        plan = shipped_tfidf._jdf.queryExecution().executedPlan().toString()
        # the only Window allowed is the per-doc rank (partitioned by
        # doc_id); assert no window partitions on the token key
        assert "windowspecdefinition(term" not in plan, "token window leaked back"
        results[label] = {
            "tfidf_groupby_broadcast": timed(shipped_tfidf),
            "tfidf_window_REJECTED": timed(window_form_tfidf(df)),
            "perplexity_groupby_broadcast": timed(lm_perplexity(df)),
            "perplexity_window_REJECTED": timed(window_form_perplexity(df)),
            "shuffle_skew": shuffle_skew_rows(spark, df),
        }
        print(label, json.dumps(results[label]))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
