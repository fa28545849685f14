"""Job/stage accounting for a block of Spark work.

Used by bench.py (per-row ``est_floor_sec`` — exchange-chain depth ×
this host's measured dispatch floor) and by the plan-invariant pytest
gate (job-count ceilings on the fused iterative loops, so the round-9
47→12-job Lloyd's fusion can't silently regress).

Implementation: tag the block with a Spark job group and read the
group's jobs back from the public StatusTracker — no listeners, no
JVM internals, works on local and cluster masters alike.

Known blind spot: job groups are thread-local, so work submitted from
OTHER threads inside the block is not counted — in this repo that is
Structured Streaming's microbatch thread (dedup_ingest's foreachBatch
jobs; measured 5 visible of ~54 total). Rows whose work runs in a
stream thread get an UNDER-estimate here; their bench est_floor_sec
is a lower bound, noted where it matters.
"""

from __future__ import annotations

import uuid
from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession


def count_jobs_stages(
    spark: SparkSession, block: Callable[[], Any]
) -> tuple[int, int, Any]:
    """Run ``block()`` under a fresh job group; return
    (n_jobs, n_stages, block_result) for the jobs the block spawned.

    Stage counts include stages Spark later marked skipped (reused
    shuffle output): a skipped stage still cost a dispatch round-trip
    in the job it first ran in, and the floor estimate wants the
    scheduling depth, not the recompute cost.
    """
    sc = spark.sparkContext
    group = f"jobcount-{uuid.uuid4().hex[:12]}"
    sc.setJobGroup(group, "jobcount probe", interruptOnCancel=False)
    try:
        result = block()
    finally:
        sc._jsc.clearJobGroup()
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group)
    n_stages = 0
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is not None:
            n_stages += len(info.stageIds)
    return len(job_ids), n_stages, result
