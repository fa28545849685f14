#!/usr/bin/env python
"""Round-14 attribution probe for checkpoint-heavy queries (default curate_report): wraps
DataFrame.localCheckpoint to record, per checkpoint site, the jobs and
wall seconds its build-time AQE stage materialization costs, then runs
the final action and prints the residual. Warm numbers (second run)
are the steady state that prices the plan.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from pyspark.sql.classic.dataframe import DataFrame

    from chroma_rs_spark.session import get_spark
    from chroma_rs_spark.suite import all_queries

    spark = get_spark(app_name="r14_curate_attrib")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def njobs():
        return len(sc.statusTracker().getJobIdsForGroup(None) or [])

    records = []
    orig = DataFrame.localCheckpoint

    def patched(self, eager=True):
        site = None
        for fr in reversed(traceback.extract_stack()):
            if "/chroma_rs_spark/" in fr.filename and "r14_" not in fr.filename:
                site = f"{os.path.basename(fr.filename)}:{fr.lineno}"
                break
        j0, t0 = njobs(), time.time()
        out = orig(self, eager=eager)
        records.append(
            {
                "site": site,
                "eager": eager,
                "jobs": njobs() - j0,
                "sec": round(time.time() - t0, 3),
            }
        )
        return out

    DataFrame.localCheckpoint = patched
    try:
        qname = sys.argv[1] if len(sys.argv) > 1 else "curate_report"
        fn = all_queries(include_extra=True)[qname].fn
        for rep in range(2):
            records.clear()
            j0, t0 = njobs(), time.time()
            df = fn(spark, SF_DIR)
            j1, t1 = njobs(), time.time()
            df.write.format("noop").mode("overwrite").save()
            j2, t2 = njobs(), time.time()
            print(f"--- rep {rep} ---")
            for r in records:
                print(json.dumps(r))
            print(
                json.dumps(
                    {
                        "build_jobs": j1 - j0,
                        "build_sec": round(t1 - t0, 3),
                        "action_jobs": j2 - j1,
                        "action_sec": round(t2 - t1, 3),
                    }
                )
            )
    finally:
        DataFrame.localCheckpoint = orig
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
