#!/usr/bin/env python
"""Capture `.explain("formatted")` for declared suite queries into
plans/r14/<query>_{before,after}.txt — the optimization round's plan
evidence (guide §1: measure first; §7.2: read the plan).

Usage:
  python tools/r14_plan_capture.py before [names...]
  python tools/r14_plan_capture.py after  [names...]

Default (no names): every declared query. SPARK_GRAFT_SF_DIR picks the
data (default sf0.01 — plan SHAPE is scale-independent; pushed
filters/join picks are what we audit, and lifecycle fixture builds are
cheapest there).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in ("before", "after"):
        print(__doc__)
        return 2
    suffix = sys.argv[1]
    only = set(sys.argv[2:])

    from chroma_rs_spark.session import get_spark
    from chroma_rs_spark.suite import all_queries

    spark = get_spark(app_name="r14_plan_capture")
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)

    # extras resolve too when named explicitly; default is declared-only
    qdefs = all_queries(include_extra=True) if only else all_queries()
    names = [n for n in qdefs if not only or n in only]
    unknown = only - set(names)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}")
        return 2
    failed = []
    for name in names:
        try:
            df = qdefs[name].fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture what we can, keep going
            failed.append(name)
            plan = f"EXPLAIN FAILED: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {SF_DIR}\n")
            fh.write(plan)
            if not plan.endswith("\n"):
                fh.write("\n")
        print(f"wrote {path}")
    if failed:
        print(f"FAILED: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
