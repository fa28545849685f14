"""SparkSession construction with scale-appropriate defaults.

The session is the in-process analogue of the reference's
`ChromaClient` connection (reference src/client.rs:12-35): where the
client held host/port/headers, we hold Spark config.

Defaults are chosen for the 100 TB design point but harmless locally:
AQE on (runtime re-plan, skew-join splitting, partition coalescing),
Arrow on (fast pandas interchange for the few Pandas-UDF operators),
and an explicit shuffle-partition count sized to the local test rig —
on a real cluster this would be set to ~2-3x total executor cores or
left to AQE's coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "chroma_rs_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or int(cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Keep parquet scans well-sized: at 100 TB this bounds task count
        # and keeps per-task memory predictable. Deployment-tunable
        # (guide §6: large sequential scans on fast storage want
        # 512m-1g splits — fewer map tasks feeding every shuffle);
        # 128m stays the default so small-SF local runs keep their
        # scan parallelism.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
        # local[N] runs everything in the driver JVM: size the heap for
        # N concurrent tasks or GC pauses dominate small-query timings
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # every distinct plan compiles its own codegen classes; a
        # long-lived session running many queries fills the default
        # 256m JIT code cache, after which HotSpot stops compiling and
        # random queries run 5-10x slow. 1g + flushing keeps C2 alive.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        # PySpark 4 wraps every DataFrame API call to capture the
        # Python call site for error context — 3-4 extra py4j round
        # trips per call (pyspark/errors/utils.py:_with_origin). The
        # context only enriches error messages; disabling it cuts
        # driver-side plan-construction time roughly in half on
        # multi-query suites. Re-enable when debugging a failing plan.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # dims up to ~tens of MB are cheaper replicated than shuffled —
        # the conventional production bump from the conservative 10m
        # default (joins against region/nation/supplier/part and the
        # suite's side tables all stay broadcast, no sort-merge)
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.locality.wait", "0s")
    )
    if master.startswith("local"):
        # single-JVM shuffles move bytes through memory/local disk —
        # lz4 framing is pure CPU overhead with no network to save
        # (measured ~10-14% on the shuffle-heavy suite rows). Cluster
        # deploys keep compression: there the network IS the cost.
        builder = (
            builder.config("spark.shuffle.compress", "false")
            .config("spark.shuffle.spill.compress", "false")
            .config("spark.broadcast.compress", "false")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
