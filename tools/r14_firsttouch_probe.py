#!/usr/bin/env python
"""Round-14 probe for the dedup_ngram_jaccard first-touch anomaly
(VERDICT r13 #8: 284 s rep 1 vs 28 s steady at sf1.0, attributed to
heap growth/JIT without counter evidence). Runs a named query N times
in one session and records, per rep, the JVM's own counters: total GC
time and count (GarbageCollectorMXBeans), JIT compilation time
(CompilationMXBean), heap used/committed (MemoryMXBean), and
WholeStageCodegen compile cache stats via CodeGenerator metrics when
reachable. The attribution is whatever counter grew by the same order
as the wall.

Usage: SPARK_GRAFT_SF_DIR=... python tools/r14_firsttouch_probe.py <query> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def jvm_counters(spark):
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    gc_ms = 0
    gc_n = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        b = it.next()
        gc_ms += b.getCollectionTime()
        gc_n += b.getCollectionCount()
    comp = mf.getCompilationMXBean()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    return {
        "gc_ms": gc_ms,
        "gc_count": gc_n,
        "jit_ms": comp.getTotalCompilationTime(),
        "heap_used_mb": heap.getUsed() >> 20,
        "heap_committed_mb": heap.getCommitted() >> 20,
    }


def main() -> int:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from chroma_rs_spark.session import get_spark
    from chroma_rs_spark.suite import all_queries

    spark = get_spark(app_name="r14_firsttouch_probe")
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries(include_extra=True)[name].fn

    prev = jvm_counters(spark)
    for rep in range(reps):
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        cur = jvm_counters(spark)
        print(
            json.dumps(
                {
                    "rep": rep,
                    "wall_sec": round(wall, 3),
                    "d_gc_ms": cur["gc_ms"] - prev["gc_ms"],
                    "d_gc_count": cur["gc_count"] - prev["gc_count"],
                    "d_jit_ms": cur["jit_ms"] - prev["jit_ms"],
                    "heap_used_mb": cur["heap_used_mb"],
                    "heap_committed_mb": cur["heap_committed_mb"],
                }
            ),
            flush=True,
        )
        prev = cur
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
