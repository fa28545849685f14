"""Exact fixed-point money aggregation on the int64 fast path.

Spark's `sum(DECIMAL)` widens past precision 18, which drops the
accumulator off the compact-long representation onto boxed BigDecimal
— roughly 4-5x slower per row in whole-stage codegen (measured on the
TPC-H Q1 shape). But every money expression in the suite is fixed
point with a known scale, so the same exact rational arithmetic runs
on int64:

* scale the inputs once: cents = round(price * 100) as BIGINT (exact —
  the source doubles are 2-decimal values well inside 2^53);
* per-row products stay exact int64 (documented bounds below);
* sums use a TWO-LIMB accumulator: sum(p div 1e6) and sum(p mod 1e6).
  Each limb is a plain codegen long sum with map-side partial
  aggregation; the recombine hi*1e6 + lo happens in DECIMAL(38,0) on
  one row per group.
* the boundary cast (value / 10^scale) -> DOUBLE goes through exact
  decimal division, so the final double is bit-identical to
  `CAST(sum(DECIMAL...) AS DOUBLE)` in any engine doing correctly
  rounded decimal-to-double conversion (DuckDB does).

Overflow headroom (two limbs, M = 1e6, non-negative inputs only):
the hi limb carries p/1e6 ≤ ~1.2e8 for the largest product in the
suite (price_cents^2 ≈ 1.2e14), the lo limb < 1e6 per row, so int64
holds exactly to ~1e10 rows per group for second moments and ~1e12
rows per group for first-order money sums — beyond today's 100 TB
design point for every group-by in the suite (TPC-H Q1 at 100 TB is
~4e12 rows over 6 groups, first-order sums only; the stats query's
second moments would add a third limb, a mechanical extension).
A group that could exceed the bound should fall back to the DECIMAL
path — same logical result, slower physical plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# limb modulus: big enough that hi stays small, small enough that a
# lo-limb sum of ~1e12 rows stays far from 2^63
M = 1_000_000


def int_scaled(col: Column | str, decimals: int = 2) -> Column:
    """round(col * 10^decimals) as BIGINT — the exact fixed-point form
    of a money double (round, not truncate: price*100 in binary
    floating point lands a hair under the integer about half the
    time)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(10**decimals)).cast("long")


def split_sum_aggs(p: Column, name: str) -> list[Column]:
    """The two limb aggregates for an exact sum of non-negative int64
    expression `p`. Use with `combine(name, scale)` after the agg."""
    lo = F.pmod(p, F.lit(M))
    # (p - lo) is an exact multiple of M and ≤ ~2^47 per row, so the
    # double division is exact and the cast back to long is safe
    hi = ((p - lo) / F.lit(M)).cast("long")
    return [F.sum(hi).alias(f"_{name}_hi"), F.sum(lo).alias(f"_{name}_lo")]


def combine(name: str, scale: int) -> Column:
    """Recombine the limbs of `split_sum_aggs(name)` into the exact
    total as DECIMAL(38, scale) — one row per group, so the decimal
    math here is off the hot path."""
    total = F.col(f"_{name}_hi").cast("decimal(38,0)") * F.lit(M) + F.col(
        f"_{name}_lo"
    ).cast("decimal(38,0)")
    if scale == 0:
        return total
    return total / F.lit(10**scale)


def combine_double(name: str, scale: int) -> Column:
    """The exact total as DOUBLE (correctly rounded decimal→double,
    bit-identical to CAST(sum(DECIMAL...) AS DOUBLE))."""
    return combine(name, scale).cast("double")


# ---------------------------------------------------------------------------
# SQL-fragment forms of the same builders: parse to the identical
# Catalyst trees in ONE py4j call per output column instead of one per
# node (see functions/vector.py for the measured plan-build motivation).
# `col`/`p` arguments are SQL fragments (caller backticks names).
# ---------------------------------------------------------------------------


def int_scaled_sql(col: str, decimals: int = 2) -> str:
    """SQL form of `int_scaled` (same round-then-cast tree)."""
    return f"CAST(round({col} * {10 ** decimals}) AS BIGINT)"


def split_sum_sql(p: str, name: str) -> list[str]:
    """SQL forms of the two limb aggregates of `split_sum_aggs`."""
    lo = f"pmod({p}, {M})"
    return [
        f"sum(CAST((({p}) - {lo}) / {M} AS BIGINT)) AS _{name}_hi",
        f"sum({lo}) AS _{name}_lo",
    ]


def combine_sql(name: str, scale: int) -> str:
    """SQL form of `combine` (exact DECIMAL(38) recombine)."""
    total = (
        f"CAST(_{name}_hi AS DECIMAL(38,0)) * {M}"
        f" + CAST(_{name}_lo AS DECIMAL(38,0))"
    )
    if scale == 0:
        return f"({total})"
    return f"(({total}) / {10 ** scale})"


def combine_double_sql(name: str, scale: int) -> str:
    """SQL form of `combine_double`."""
    return f"CAST({combine_sql(name, scale)} AS DOUBLE)"
