#!/usr/bin/env python
"""Round-14 probe: where does localCheckpoint(eager=False)'s build-time
cost come from? Times each QueryExecution phase (analyzed / optimized /
physical / toRdd) for the subtrees lsh_recall checkpoints, plus a
trivial control. Driver-side only — no job runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def phases(df, label):
    qe = df._jdf.queryExecution()
    t0 = time.time()
    qe.analyzed()
    t1 = time.time()
    qe.optimizedPlan()
    t2 = time.time()
    qe.executedPlan()
    t3 = time.time()
    qe.toRdd()
    t4 = time.time()
    print(
        f"{label:28s} analyze={t1-t0:6.3f} optimize={t2-t1:6.3f} "
        f"physical={t3-t2:6.3f} toRdd={t4-t3:6.3f} total={t4-t0:6.3f}"
    )


def main() -> int:
    from chroma_rs_spark.operators.dedup import (
        minhash_lsh_pairs,
        shingle_pair_intersections,
    )
    from chroma_rs_spark.session import get_spark
    from chroma_rs_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    spark = get_spark(app_name="r14_checkpoint_probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SF_DIR, "documents")
    phases(docs.select("doc_id"), "control: bare scan")

    inter = shingle_pair_intersections(docs, max_df=None)
    phases(inter, "shingle_pair_intersections")

    true_pairs = inter.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_inter").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
            6,
        ).alias("_j"),
    ).filter(F.col("_j") >= F.lit(0.5))
    phases(true_pairs, "true_pairs (pre-checkpoint)")

    cands = minhash_lsh_pairs(docs)
    phases(cands, "minhash_lsh_pairs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
