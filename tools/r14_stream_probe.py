#!/usr/bin/env python
"""Round-14 probe for the stream_watermark_counts low-core anomaly
(VERDICT r13 #4: 21.8 s at 8 CPUs vs 2.91 s at 32 — worse than serial
scaling on a 4x core cut). Runs the EXACT q_stream_watermark_counts
micro-batch drain N times at the current $SPARK_GRAFT_CPUS and prints
per-micro-batch counter evidence from StreamingQueryProgress:
triggerExecution / addBatch / getBatch / walCommit / commitOffsets /
queryPlanning durations plus stateOperators commit times — the
counters that separate state-store commit serialization from host
waves and from plan/dispatch cost.

Usage: SPARK_GRAFT_CPUS=8 python tools/r14_stream_probe.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import shutil

    from chroma_rs_spark.scratch import mkscratch
    from chroma_rs_spark.session import get_spark
    from chroma_rs_spark.streaming.events import tumbling_window_counts
    from chroma_rs_spark.suite.streaming import (
        _WM_DELAY,
        _WM_WIDTH,
        _watermark_inbox,
    )

    spark = get_spark(app_name="r14_stream_probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"cpus": os.environ.get("SPARK_GRAFT_CPUS", "32")}))
    inbox = _watermark_inbox(spark, SF_DIR)

    for rep in range(reps):
        root = mkscratch("wm_probe_")
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            stream = (
                spark.readStream.schema(
                    "event_id long, ts timestamp, event_type string,"
                    " value double"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{inbox}/*")
            )
            agg = tumbling_window_counts(
                stream, width=_WM_WIDTH, watermark=_WM_DELAY
            )
            t0 = time.time()
            q = (
                agg.writeStream.format("parquet")
                .option("path", f"{root}/out")
                .option("checkpointLocation", f"{root}/ckpt")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
            wall = time.time() - t0
            batches = []
            for p in q.recentProgress:
                d = p["durationMs"] if isinstance(p, dict) else None
                if d is None:
                    continue
                so = p.get("stateOperators") or []
                batches.append(
                    {
                        "batchId": p.get("batchId"),
                        "durationMs": d,
                        "numInputRows": p.get("numInputRows"),
                        "stateCommitMs": [
                            s.get("commitTimeMs") for s in so
                        ],
                        "stateRowsTotal": [
                            s.get("numRowsTotal") for s in so
                        ],
                        "droppedByWatermark": [
                            s.get("numRowsDroppedByWatermark") for s in so
                        ],
                    }
                )
            print(
                json.dumps(
                    {"rep": rep, "wall_sec": round(wall, 3), "batches": batches}
                )
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
            shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
