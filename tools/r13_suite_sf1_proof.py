#!/usr/bin/env python
"""Round-13 suite-wide sf1.0 stress run (VERDICT r12 next-round #6).

The 100x proofs so far are per-family (curate r11, IVF-PQ r12); this
runs EVERY declared suite row once at ~sf1.0 to catch the class of
bugs that sf0.1's dispatch floor prices away (super-linear plans,
skew blowups, driver-side collects that only hurt when data grows).

Data: `_scaletmp/sf1.0` — the established 10x replication of the
sf0.1 driver parquet (SCALE.md round-3 methodology): deterministic id
remap per replica with disjoint key ranges, FK-consistent across
orders/lineitem/customer/supplier/part, replica text suffixed
" r{k}" so copies are near- not exact dups, embeddings perturbed
per replica (+k*1e-3 on one coordinate), dimension tables
(nation/region) kept 1x. Streaming rows rebuild their own sources
from the documents/events tables, so they scale with the corpus too.

Per row: one timed run (noop-format write — full computation, no
collect) under a cancellable job group with a wall timeout, plus the
sf0.1 wall measured the same way in the same session. The signal is
the sf1.0/sf0.1 wall RATIO: a row whose cost grows much faster than
the 10x data multiplier is super-linear and gets investigated.

Usage: python tools/r13_suite_sf1_proof.py [--rebuild] [name ...]
Prints one JSON line per row and a summary; paste into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(ROOT, "_scaletmp", "sf1.0")
REPLICAS = 10
# disjoint-range key offset per replica — far above every sf0.1 max key
OFF = 10_000_000
ROW_TIMEOUT = 420.0


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF1, exist_ok=True)
    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("_r"))

    def explode10(df):
        return df.crossJoin(F.broadcast(reps))

    def shift(col, mult=1):
        return (F.col(col) + F.col("_r").cast("long") * (OFF * mult)).alias(col)

    # documents: near-dup replicas (suffixed text), n_chars kept
    # consistent with the new text
    docs = explode10(spark.read.parquet(f"{SF01}/documents.parquet")).select(
        shift("doc_id"),
        F.when(F.col("_r") == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" r"), F.col("_r")))
        .alias("text"),
        "lang",
        "source",
    )
    docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    docs.write.parquet(f"{SF1}/documents.parquet", mode="overwrite")

    # embeddings: vec_id tracks doc_id's offset; one coordinate nudged
    # per replica so copies are near- not exact dups
    emb = explode10(spark.read.parquet(f"{SF01}/embeddings.parquet")).select(
        shift("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CASE WHEN i = 0"
            " THEN cast(x + _r * 0.001 AS FLOAT) ELSE x END)"
        ).alias("embedding"),
        "label",
    )
    emb.write.parquet(f"{SF1}/embeddings.parquet", mode="overwrite")

    explode10(spark.read.parquet(f"{SF01}/customer.parquet")).select(
        shift("c_custkey"), "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment",
    ).write.parquet(f"{SF1}/customer.parquet", mode="overwrite")

    explode10(spark.read.parquet(f"{SF01}/supplier.parquet")).select(
        shift("s_suppkey"), "s_name", "s_nationkey", "s_acctbal"
    ).write.parquet(f"{SF1}/supplier.parquet", mode="overwrite")

    explode10(spark.read.parquet(f"{SF01}/part.parquet")).select(
        shift("p_partkey"), "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice",
    ).write.parquet(f"{SF1}/part.parquet", mode="overwrite")

    explode10(spark.read.parquet(f"{SF01}/orders.parquet")).select(
        shift("o_orderkey"), shift("o_custkey"), "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ).write.parquet(f"{SF1}/orders.parquet", mode="overwrite")

    explode10(spark.read.parquet(f"{SF01}/lineitem.parquet")).select(
        shift("l_orderkey"), shift("l_partkey"), shift("l_suppkey"),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    ).write.parquet(f"{SF1}/lineitem.parquet", mode="overwrite")

    explode10(spark.read.parquet(f"{SF01}/events.parquet")).select(
        shift("event_id"), "ts", shift("user_id"), "event_type", "value",
        "props",
    ).write.parquet(f"{SF1}/events.parquet", mode="overwrite")

    # dimension tables stay 1x (replicating them breaks FK semantics)
    for t in ("nation", "region"):
        spark.read.parquet(f"{SF01}/{t}.parquet").write.parquet(
            f"{SF1}/{t}.parquet", mode="overwrite"
        )


def timed_run(spark, name, fn, sf_dir, timeout=ROW_TIMEOUT):
    """One forced run under a cancellable job group; returns
    (wall_sec | None, status)."""
    sc = spark.sparkContext
    group = f"r13proof-{name}-{os.path.basename(sf_dir)}"
    result = {}

    def run():
        try:
            sc.setJobGroup(group, name, interruptOnCancel=True)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            result["wall"] = time.perf_counter() - t0
            result["status"] = "ok"
        except Exception as e:  # noqa: BLE001 — recorded, not raised
            result.setdefault("status", f"error: {type(e).__name__}: {e}"[:200])

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout)
    if th.is_alive():
        sc.cancelJobGroup(group)
        th.join(30)
        return None, "timeout"
    return result.get("wall"), result.get("status", "error")


def main() -> int:
    rebuild = "--rebuild" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("--")]

    from chroma_rs_spark.session import get_spark
    from chroma_rs_spark.suite import all_queries

    spark = get_spark(app_name="r13_suite_sf1_proof")
    spark.sparkContext.setLogLevel("ERROR")

    if rebuild or not os.path.isdir(SF1):
        shutil.rmtree(SF1, ignore_errors=True)
        t0 = time.perf_counter()
        build_sf1(spark)
        print(
            json.dumps(
                {"built": SF1, "replicas": REPLICAS,
                 "build_sec": round(time.perf_counter() - t0, 1)}
            ),
            flush=True,
        )

    declared = all_queries(include_extra=False)
    if names:
        declared = {k: v for k, v in declared.items() if k in names}
    out = []
    for name, qd in declared.items():
        w01, s01 = timed_run(spark, name, qd.fn, SF01)
        w10, s10 = timed_run(spark, name, qd.fn, SF1)
        ratio = (
            round(w10 / w01, 2) if (w01 and w10 and w01 > 0) else None
        )
        row = {
            "query": name,
            "sf0.1_sec": round(w01, 3) if w01 else None,
            "sf1.0_sec": round(w10, 3) if w10 else None,
            "ratio": ratio,
            "status": s10 if s10 != "ok" else ("ok" if s01 == "ok" else s01),
        }
        out.append(row)
        print(json.dumps(row), flush=True)

    done = [r for r in out if r["ratio"] is not None]
    worst = sorted(done, key=lambda r: -r["ratio"])[:8]
    print(
        json.dumps(
            {
                "rows": len(out),
                "ok": len(done),
                "total_sf0.1": round(sum(r["sf0.1_sec"] or 0 for r in out), 1),
                "total_sf1.0": round(sum(r["sf1.0_sec"] or 0 for r in out), 1),
                "worst_ratios": [(r["query"], r["ratio"]) for r in worst],
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
