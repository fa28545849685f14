"""Fan-out decisions for CPU-bound stages.

A single-row-group parquet file scans as ONE task no matter how many
cores the cluster has — Spark can split files by byte range, but a row
group is the atomic read unit, so a small-file scan feeds every
downstream narrow stage single-threaded. For CPU-heavy operators
(distance evaluation, per-row hashing) that serializes the hot loop.

The counter-move, `repartition(defaultParallelism)`, costs a fixed
shuffle round-trip (~1s on local[32]) — pure waste when the input is a
few MB. So the fan-out is gated on the optimizer's size estimate:

* tiny input  -> leave the plan alone (single core finishes faster
  than the shuffle would take);
* big-but-narrow input -> repartition so the CPU-bound stage runs wide.

On a real cluster large scans are already wide (multiple files / row
groups, `spark.sql.files.maxPartitionBytes` bounds scan-partition
size), so the gate only fires for the narrow-scan corner and is a
no-op otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Below this, a single core beats the cost of a repartition shuffle.
DEFAULT_FAN_OUT_MIN_BYTES = 16 << 20


def plan_size_bytes(df: DataFrame) -> int:
    """Optimizer size estimate for `df` in bytes; -1 if unavailable.

    Reads `optimizedPlan().stats().sizeInBytes` through the JVM handle:
    the statistic the optimizer already derived for join-strategy
    choices (file sizes for scans, scaled through projections/filters).
    ~2ms, vs ~40ms for `df.rdd.getNumPartitions()`.
    """
    try:
        return int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:  # non-JVM plan / API drift — caller treats as unknown
        return -1


def fan_out(df: DataFrame, min_bytes: int = DEFAULT_FAN_OUT_MIN_BYTES) -> DataFrame:
    """Spread `df` across all cores iff it is big enough to benefit."""
    size = plan_size_bytes(df)
    if 0 <= size < min_bytes:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    # Only pay the RDD-lineage materialization when the data is big
    # enough that 40ms is noise against the work saved.
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


# An explicit broadcast hint is honored UNCONDITIONALLY — past
# spark.sql.maxBroadcastTableBytes (8 GB) the job fails instead of
# degrading. Hint only when the optimizer's estimate says the build
# side clearly fits; above (or unknown) leave the join un-hinted so it
# plans as a shuffled equi-join, with AQE still free to auto-broadcast
# small actual sizes at runtime.
DEFAULT_BROADCAST_LIMIT_BYTES = 512 << 20


def maybe_broadcast(
    df: DataFrame, limit_bytes: int = DEFAULT_BROADCAST_LIMIT_BYTES
) -> DataFrame:
    """`F.broadcast(df)` iff the optimizer estimates it under
    `limit_bytes`; the un-hinted `df` otherwise (including unknown
    size: a web-scale vocabulary must degrade to a shuffled join, not
    OOM the driver — ADVICE r6)."""
    from pyspark.sql import functions as F

    size = plan_size_bytes(df)
    if 0 <= size < limit_bytes:
        return F.broadcast(df)
    return df


# compute-bound loops (k-means E-steps, exact-KNN scoring) do k x dim
# work PER ROW, so a single-file input serializes the hot path on one
# core long before its bytes would justify a fan_out. 256 KB keeps the
# pytest-sized inputs (a few rows) from paying an eager checkpoint.
SPREAD_COMPUTE_MIN_BYTES = 256 << 10


def spread_compute(
    df: DataFrame, min_bytes: int = SPREAD_COMPUTE_MIN_BYTES
) -> DataFrame:
    """Spread a narrow-but-nontrivial input across all cores and cut
    its lineage — for inputs an iterative or per-row-compute-bound
    operator will score repeatedly.

    Differs from `fan_out` in both gate and effect: fan_out guards
    byte-bound scans (big bytes, cheap per row) and stays lazy;
    spread_compute guards compute-bound kernels (small bytes, k x dim
    work per row) and eagerly localCheckpoints so every loop iteration
    reuses the spread materialization instead of re-running the
    upstream plan. Bit-safe wherever downstream reductions are exact
    (decimal sums), pre-rounded, or per-row. At cluster scale inputs
    arrive with >= parallelism partitions and this is a no-op.
    """
    size = plan_size_bytes(df)
    if size < min_bytes:  # tiny or unknown (-1): not worth a job
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target).localCheckpoint(eager=True)
