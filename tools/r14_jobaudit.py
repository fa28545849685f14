#!/usr/bin/env python
"""Round-14 job/stage audit: run named declared queries (or all) with
the jobcount probe and print warm jobs/stages per row — the
deterministic counter evidence (host-drift-proof) for plan-shape
claims.

Each query runs twice: the first (cold) run pays lazy-checkpoint
materializations and session caches; the second (warm) run is the
steady-state count that prices the plan. Wall times are printed for
context only.

Usage: python tools/r14_jobaudit.py [names...]
       SPARK_GRAFT_SF_DIR=... to pick the scale (default sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    only = set(sys.argv[1:])
    from chroma_rs_spark.jobcount import count_jobs_stages
    from chroma_rs_spark.session import get_spark
    from chroma_rs_spark.suite import all_queries

    spark = get_spark(app_name="r14_jobaudit")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    qdefs = all_queries(include_extra=True) if only else all_queries()
    names = [n for n in qdefs if not only or n in only]
    unknown = only - set(names)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}")
        return 2
    for name in names:
        fn = qdefs[name].fn

        def run():
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        t0 = time.time()
        cj, cs, _ = count_jobs_stages(spark, run)
        t1 = time.time()
        wj, ws, _ = count_jobs_stages(spark, run)
        t2 = time.time()
        print(
            json.dumps(
                {
                    "query": name,
                    "cold": {"jobs": cj, "stages": cs, "sec": round(t1 - t0, 3)},
                    "warm": {"jobs": wj, "stages": ws, "sec": round(t2 - t1, 3)},
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
