#!/usr/bin/env python
"""Reproduces the SCALE.md round-7 LSH hot-bucket measurements.

On zipf-distributed text the banded MinHash minimum degenerates to a
corpus-common shingle, so one band bucket collects a constant fraction
of the corpus and uncapped candidate generation goes quadratic. This
script prints, for `_scaletmp/zipf10` (50k docs):

  1. the band-bucket size distribution (max, p50/p99/p99.9) and the
     implied uncapped candidate-pair bound sum(c*(c-1)/2);
  2. wall time of `minhash_lsh_pairs(max_bucket=MINHASH_MAX_BUCKET)`
     (the uncapped run is NOT attempted — it exceeds 15 minutes);
  3. the recall check: 500 planted exact twins must all surface at
     est_jaccard = 1.0 under the cap.

Usage: python tools/lsh_bucket_proof.py  (builds the corpus via
tools/r7_scale_proof.py conventions if _scaletmp/zipf10 is missing).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "_scaletmp",
    "zipf10",
    "documents.parquet",
)


def main() -> int:
    from pyspark.sql import functions as F

    from chroma_rs_spark.operators.dedup import (
        MINHASH_MAX_BUCKET,
        _signature_df,
        minhash_lsh_pairs,
    )
    from chroma_rs_spark.session import get_spark

    if not os.path.exists(CORPUS):
        print(f"missing {CORPUS}; run tools/r7_scale_proof.py first")
        return 1
    spark = get_spark(
        app_name="lsh_bucket_proof", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(CORPUS).select("doc_id", "text").localCheckpoint()
    )

    # 1. bucket census of the 16 one-row bands
    sig = _signature_df(docs, "doc_id", "text", 16, 3)
    band_sql = ", ".join(
        f"named_struct('band', {b}, 'band_key', element_at(sig, {b + 1}))"
        for b in range(16)
    )
    sizes = (
        sig.selectExpr("doc_id", f"explode(array({band_sql})) AS bb")
        .groupBy("bb")
        .count()
    )
    stats = sizes.agg(
        F.max("count").alias("max"),
        F.expr("percentile(count, array(0.5, 0.99, 0.999))").alias("pct"),
        F.expr("sum(count * (count - 1) / 2)").alias("pair_bound"),
    ).collect()[0]
    print(
        f"bucket max={stats['max']}  p50/p99/p99.9={stats['pct']}  "
        f"uncapped pair bound={stats['pair_bound']:.3g}"
    )

    # 2. capped pair mining wall time
    t0 = time.time()
    n_pairs = minhash_lsh_pairs(docs, max_bucket=MINHASH_MAX_BUCKET).count()
    print(
        f"capped (max_bucket={MINHASH_MAX_BUCKET}) pairs={n_pairs} "
        f"in {time.time() - t0:.1f} s"
    )

    # 3. planted-twin recall under the cap
    twins = docs.filter("doc_id % 100 = 0").select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    n_twins = twins.count()
    corpus = docs.unionByName(twins).localCheckpoint()
    found = (
        minhash_lsh_pairs(corpus, max_bucket=MINHASH_MAX_BUCKET)
        .filter(
            (F.col("id_b") - F.col("id_a") == 1000000)
            & (F.col("est_jaccard") == 1.0)
        )
        .count()
    )
    print(f"planted twins found under cap: {found}/{n_twins}")
    spark.stop()
    return 0 if found == n_twins else 1


if __name__ == "__main__":
    raise SystemExit(main())
