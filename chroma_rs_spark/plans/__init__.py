"""Physical-layout helpers (SURVEY.md §4).

Catalyst owns logical optimization — we add zero custom rules. What it
cannot decide for us is the one physical-layout call these helpers
make: whether to fan a narrow scan out to all cores before a CPU-bound
stage (vector distance, hashing). Decisions key off optimizer plan
statistics, which are already computed and free to read, instead of
materializing the RDD lineage (`df.rdd.getNumPartitions()` costs
~40ms per call and builds the whole physical plan twice).
"""

from chroma_rs_spark.plans.partitioning import (
    fan_out,
    maybe_broadcast,
    plan_size_bytes,
)

__all__ = ["fan_out", "maybe_broadcast", "plan_size_bytes"]
