"""Training-shard output: range-partitioned, in-shard-sorted parquet
with an auditable manifest.

The layout every large-scale training pipeline wants its curated
corpus in: N shards whose key ranges are DISJOINT and whose rows are
sorted within each shard — so a data loader can map shard -> worker
deterministically, seek by key, and reproduce the exact global order
(shard ranges ascending, rows ascending inside). On Spark this is
`repartitionByRange` (reservoir-samples the key distribution, so
shards balance even on skewed keys — the planner's own range
exchange) + `sortWithinPartitions`, which needs NO global sort: one
shuffle, each shard sorts locally.

`target_shard_mb` sizes N from the optimizer's own plan estimate
(`plan_size_bytes`, the same statistic the broadcast gates use) so
callers declare intent ("~512 MB shards") instead of hand-counting —
at 100 TB that is the difference between a config constant that rots
and a layout that tracks the data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    sort_by: str = "doc_id",
    target_shard_mb: int = 512,
    mode: str = "error",
) -> int:
    """Write `df` as range-sharded, in-shard-sorted parquet under
    `path`; returns the shard count used.

    `n_shards` explicit, or derived from the optimizer size estimate /
    `target_shard_mb` (minimum 1; unknown estimate falls back to the
    current partition count). One file per shard (each range partition
    writes exactly one parquet part), ranges disjoint by construction.
    """
    if n_shards is None:
        from chroma_rs_spark.plans.partitioning import plan_size_bytes

        est = plan_size_bytes(df)
        # the optimizer reports Long.MaxValue-ish for unknown-size
        # relations — treat anything past 1 PB as unknown, not as a
        # 2-billion-shard request
        if 0 <= est < (1 << 50):
            n_shards = max(1, math.ceil(est / (target_shard_mb * (1 << 20))))
        else:
            n_shards = max(1, df.rdd.getNumPartitions())
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if n_shards > 1_000_000:
        raise ValueError(
            f"n_shards {n_shards} is past any sane layout; pass it explicitly"
        )
    (
        df.repartitionByRange(n_shards, F.col(sort_by))
        .sortWithinPartitions(sort_by)
        .write.mode(mode)
        .parquet(path)
    )
    return n_shards


def shard_manifest(
    spark: SparkSession, path: str, sort_by: str = "doc_id",
    checksum_col: str | None = None,
) -> DataFrame:
    """(shard_file, n_rows, min_key, max_key[, key_sum]) per shard file
    — the audit a consumer runs before trusting a layout: ranges must
    be disjoint and row counts roughly even. One scan, one small
    groupBy (|files| result rows). Pass `checksum_col` to ride a
    per-file sum of that column on the same scan (round 13: the audit
    row paid a second full layout scan for a content checksum the
    manifest aggregation could carry for free)."""
    cols = [F.input_file_name().alias("shard_file"), F.col(sort_by).alias("_k")]
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("_k").alias("min_key"),
        F.max("_k").alias("max_key"),
    ]
    if checksum_col is not None:
        cols.append(F.col(checksum_col).alias("_ck"))
        aggs.append(F.sum("_ck").cast("long").alias("key_sum"))
    return (
        spark.read.parquet(path)
        .select(*cols)
        .groupBy("shard_file")
        .agg(*aggs)
    )


def assert_disjoint_shards(manifest) -> None:
    """Raise if any two shards' [min_key, max_key] ranges overlap.
    Accepts the manifest DataFrame (collects |files| rows only) or an
    already-collected list of its rows — callers that hold the rows
    avoid re-running the manifest scan."""
    if isinstance(manifest, DataFrame):
        manifest = manifest.select(
            "shard_file", "min_key", "max_key"
        ).collect()
    rows = sorted(
        manifest,
        key=lambda r: (r["min_key"], r["max_key"]),
    )
    for prev, cur in zip(rows, rows[1:]):
        if cur["min_key"] <= prev["max_key"]:
            raise ValueError(
                f"overlapping shard ranges: {prev['shard_file']} "
                f"[..{prev['max_key']}] vs {cur['shard_file']} "
                f"[{cur['min_key']}..]"
            )


def _morton_spread16(col_expr: str) -> str:
    """SQL: spread a 16-bit value's bits to even positions (classic
    Morton interleave via shift-or-mask), yielding a 32-bit pattern.
    Pure integer column expressions — no UDF."""
    # mask into the 16-bit domain FIRST: an out-of-domain value must
    # clamp to its low bits, never silently corrupt the interleave
    x = f"(CAST({col_expr} AS BIGINT) & 65535)"
    x = f"(({x} | shiftleft({x}, 8)) & 16711935)"        # 0x00FF00FF
    x = f"(({x} | shiftleft({x}, 4)) & 252645135)"       # 0x0F0F0F0F
    x = f"(({x} | shiftleft({x}, 2)) & 858993459)"       # 0x33333333
    x = f"(({x} | shiftleft({x}, 1)) & 1431655765)"      # 0x55555555
    return x


def zorder_value(cols: tuple[str, str], buckets: int = 1 << 16) -> "F.Column":
    """Z-order (Morton) key over two ALREADY-BUCKETED integer columns
    in [0, buckets): bits interleave so locality in EITHER column is
    locality in the key. Callers bucket their raw values first (rank
    quantiles, hash buckets, day numbers — whatever preserves the
    order that should cluster)."""
    if buckets > (1 << 16):
        raise ValueError("zorder_value interleaves at most 16 bits per column")
    a, b = cols
    return F.expr(
        f"{_morton_spread16(a)} | shiftleft({_morton_spread16(b)}, 1)"
    )


def write_zorder_layout(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_shards: int,
    mode: str = "error",
    bits: int = 6,
) -> None:
    """Write `df` as `n_shards` parquet files laid out along the
    Z-order curve of two numeric columns — the multi-dimensional
    analogue of `write_training_shards`' single-key layout: every file
    covers a small RANGE OF BOTH columns, so min/max row-group stats
    prune scans filtered on EITHER column (a single-column sort prunes
    one column and shreds the other). This is the layout move behind
    Delta/Iceberg Z-ordering, as plain Spark: quantile-bucket each
    column (driver-bounded approxQuantile boundaries — the same
    bounded-collect class as the k-means centroids), interleave bits,
    range-partition + sort on the z key.

    At 100 TB: one sampled range shuffle, no global sort; the z key is
    pure integer expressions. Skipping effectiveness is verified by
    `zorder_prune_stats`, not assumed.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if not 1 <= bits <= 8:
        # 2^bits quantile boundaries become a CASE chain; past 8 bits
        # the chain (and the approxQuantile request) is the wrong tool
        raise ValueError(f"bits must be in [1, 8], got {bits}")
    nb = 1 << bits
    bucketed = df
    bucket_cols = []
    for c in cols:
        qs = df.stat.approxQuantile(c, [i / nb for i in range(1, nb)], 0.01)
        # strictly increasing boundaries (ties collapse buckets)
        bounds = sorted(set(qs))
        expr = F.lit(0)
        for i, bd in enumerate(bounds):
            expr = F.when(F.col(c) > F.lit(bd), F.lit(i + 1)).otherwise(expr)
        bc = f"_zb_{c}"
        # power-of-two shift into the 16-bit interleave domain keeps
        # the bucket's bit structure intact (a non-power scale would
        # still be monotone but smear bits across positions)
        bucketed = bucketed.withColumn(
            bc, F.shiftleft(expr.cast("bigint"), 16 - bits).cast("bigint")
        )
        bucket_cols.append(bc)
    z = zorder_value((bucket_cols[0], bucket_cols[1]))
    (
        bucketed.withColumn("_z", z)
        .repartitionByRange(n_shards, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z", *bucket_cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_prune_stats(
    spark: SparkSession, path: str, col: str, lo, hi
) -> dict:
    """{n_files, n_candidate_files, frac_scanned}: of the layout's
    files, how many could contain rows with `col` in [lo, hi] by their
    min/max — the fraction a stats-based reader (parquet row-group
    skipping, Delta file skipping) would actually scan. One manifest
    aggregation, |files| result rows. For several ranges over the same
    layout, use `zorder_prune_stats_multi` — one scan for all of them."""
    return zorder_prune_stats_multi(spark, path, [(col, lo, hi)])[0]


def zorder_prune_stats_multi(
    spark: SparkSession, path: str, ranges: list[tuple[str, object, object]]
) -> list[dict]:
    """`zorder_prune_stats` for a batch of (col, lo, hi) probes in ONE
    layout scan (round 13: the audit row asked four range questions and
    paid four full scan+aggregate+collect jobs for a manifest that
    never changed between them). The per-file min/max manifest is
    aggregated once over the union of probed columns; every range
    verdict is then a driver-side pass over the |files|-row manifest.
    Results are positionally aligned with `ranges` and identical to
    per-call `zorder_prune_stats` values."""
    if not ranges:
        # zero ranges would otherwise build a groupBy().agg() with no
        # aggregates — a confusing py4j analysis error (ADVICE r13)
        return []
    cols = []
    for c, _, _ in ranges:
        if c not in cols:
            cols.append(c)
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c)).alias(f"mn_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"mx_{c}"))
    man = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"), *[F.col(c) for c in cols])
        .groupBy("f")
        .agg(*aggs)
        .collect()
    )
    out = []
    for c, lo, hi in ranges:
        cand = [r for r in man if r[f"mx_{c}"] >= lo and r[f"mn_{c}"] <= hi]
        out.append(
            {
                "n_files": len(man),
                "n_candidate_files": len(cand),
                "frac_scanned": round(len(cand) / len(man), 6)
                if man
                else None,
            }
        )
    return out


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    seed: int | str = 0,
    n_shards: int | None = None,
    id_col: str = "doc_id",
    target_shard_mb: int = 512,
    mode: str = "error",
) -> int:
    """`write_training_shards`, but in DETERMINISTIC SHUFFLED order —
    the global random permutation a training run reads the corpus in,
    reproducible from (seed, id) alone: the sort key is the engine-
    portable md5 hash of seed||id (the repo's sampling hash family),
    so the same seed yields the same order on any cluster, any
    partitioning, any day, and a different seed is a fresh epoch
    permutation. Same single range shuffle as the sorted layout; the
    shard manifest/disjointness audit applies to the shuffle key's
    hex, not the id."""
    shuffled = df.withColumn(
        "_shuffle_key",
        F.md5(F.concat(F.lit(str(seed)), F.lit("|"), F.col(id_col).cast("string"))),
    )
    n = write_training_shards(
        shuffled,
        path,
        n_shards=n_shards,
        sort_by="_shuffle_key",
        target_shard_mb=target_shard_mb,
        mode=mode,
    )
    return n
