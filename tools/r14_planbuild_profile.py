#!/usr/bin/env python
"""Round-14 plan-build profiler (VERDICT r13 #3): cProfile the
driver-side DataFrame assembly `fn(spark, sf_dir)` of named declared
queries — no action is run, so the numbers isolate py4j round trips +
Column tree construction, the scale-independent cost bench.py reports
as plan_build_sec.

Usage: python tools/r14_planbuild_profile.py <query> [topN]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    name = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from chroma_rs_spark.session import get_spark
    from chroma_rs_spark.suite import all_queries

    spark = get_spark(app_name="r14_planbuild_profile")
    spark.sparkContext.setLogLevel("ERROR")

    qdefs = all_queries(include_extra=True)
    fn = qdefs[name].fn
    # warm the session caches (first build pays import + table loads)
    t0 = time.time()
    fn(spark, SF_DIR)
    t1 = time.time()
    fn(spark, SF_DIR)
    t2 = time.time()
    print(f"{name}: cold build {t1 - t0:.3f}s, warm build {t2 - t1:.3f}s")

    prof = cProfile.Profile()
    prof.enable()
    fn(spark, SF_DIR)
    prof.disable()
    buf = io.StringIO()
    stats = pstats.Stats(prof, stream=buf).sort_stats("cumulative")
    stats.print_stats(topn)
    print(buf.getvalue())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
