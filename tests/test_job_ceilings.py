"""Job-count ceilings for the fused iterative loops (VERDICT r9 #7).

The round-9 fusion collapsed the Lloyd's k-means driver loop to ONE
aggregation job per iteration (semantic_dedup 47 → 12 jobs,
knn_ivf_trained 34 → 2, bit-identical results). These gates pin the
win: if a future edit re-splits an iteration into per-step jobs, the
count jumps back toward the pre-fusion numbers and fails here instead
of waiting for a bench diff.

Counts are measured with the same job-group accounting bench.py uses
(chroma_rs_spark/jobcount.py) at sf0.001 — job counts for these rows
are data-size-independent by construction (measured equal at sf0.01
and sf0.1, SCALE.md r9), so the smallest corpus is the honest gate.

Ceilings sit a small slack above today's measurements (warm 12/2, cold
30/17 at sf0.001) and far below the pre-fusion 47/34: they catch a
de-fusion regression, not host jitter. The cold pass includes
training-cache build (k-dependent for semantic_dedup: one fused job
per Lloyd's iteration plus bounded setup).
"""

from __future__ import annotations

SF001_DIR = "/root/testdata/sf0.001"


def _jobs(spark, name: str) -> tuple[int, int]:
    from chroma_rs_spark.jobcount import count_jobs_stages
    from chroma_rs_spark.suite import all_queries

    fn = all_queries(include_extra=True)[name].fn
    cold, _, _ = count_jobs_stages(
        spark,
        lambda: fn(spark, SF001_DIR).write.format("noop").mode("overwrite").save(),
    )
    warm, _, _ = count_jobs_stages(
        spark,
        lambda: fn(spark, SF001_DIR).write.format("noop").mode("overwrite").save(),
    )
    return cold, warm


def test_semantic_dedup_job_ceiling(spark):
    cold, warm = _jobs(spark, "semantic_dedup")
    # warm path: assignment + keeper selection over cached centroids
    assert warm <= 16, f"semantic_dedup warm de-fused: {warm} jobs (was 12)"
    # cold adds the fused Lloyd's loop: ~1 job/iteration + setup
    assert cold <= 40, f"semantic_dedup cold de-fused: {cold} jobs (was 30)"


def test_knn_ivf_trained_job_ceiling(spark):
    cold, warm = _jobs(spark, "knn_ivf_trained")
    assert warm <= 4, f"knn_ivf_trained warm de-fused: {warm} jobs (was 2)"
    assert cold <= 24, f"knn_ivf_trained cold de-fused: {cold} jobs (was 17)"
