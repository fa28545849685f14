"""Skew-mitigation patterns (SURVEY.md §2.3 / SCALE.md).

AQE's skew-join splitting handles sort-merge join skew at runtime;
these helpers cover the two shapes AQE does not:

* `count_distinct_twophase` — exact COUNT(DISTINCT v) GROUP BY k
  shuffles on k only, so one hot key routes every one of its values
  through a single reducer. Re-keying the first shuffle on (k, v)
  spreads a hot key across all reducers; the second aggregation then
  counts already-deduplicated, already-small rows.

* `salted_join` — equi-join where the big side has hot keys and the
  small side is too big to broadcast: salt the big side into
  `n_salt` sub-keys and replicate the small side once per salt, so a
  hot key's rows land on `n_salt` reducers instead of one. The
  small side pays n_salt x replication — use only when broadcast is
  off the table and AQE's runtime split is unavailable (e.g. a
  deliberately partitioned output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_distinct_twophase(
    df: DataFrame, keys: list[str] | str, value: str, out: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count, hot-key safe (see module doc)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    # COUNT(DISTINCT v) ignores NULLs — drop them before the distinct or
    # a key holding a null would count one extra
    dedup = (
        df.select(*keys, value)
        .where(F.col(value).isNotNull())
        .distinct()  # shuffle on (keys, value)
    )
    return dedup.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted across `n_salt` sub-keys.

    Row-to-salt assignment uses `rand(seed=0)` — deterministic per
    partition, and any assignment is correct (each big row joins its
    key's replicated small rows exactly once).

    Only inner/left are supported: under right/full-outer semantics an
    unmatched small-side row would surface once per salt replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: outer "
            "variants would duplicate unmatched replicated small-side rows"
        )
    keys = [on] if isinstance(on, str) else list(on)
    b = big.withColumn("_salt", F.floor(F.rand(seed=0) * n_salt).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>"))
    )
    return b.join(s, keys + ["_salt"], how).drop("_salt")
