"""As-of (most-recent-match) join — a temporal operator Spark lacks
as a built-in (SURVEY.md §2.3 [EXT]; the "custom operator as a
composition of existing DataFrame ops" case).

Semantics (pandas `merge_asof` / kdb `aj` / DuckDB `ASOF JOIN`): for
each left row, attach the single right row with the greatest
`right_ts <= left_ts` among rows sharing the join keys — optionally
bounded by a tolerance. Left rows with no qualifying match keep nulls
(left-outer flavor).

Physical strategy — union + running last, NOT a range join:

    union(tagged left, tagged right)
      -> window partitionBy(keys) orderBy(ts, side)
      -> last(right_payload, ignorenulls) over rows unbounded..current
      -> filter side == left

One shuffle on the join keys, each row carried exactly once, state per
window is a single struct. The naive alternative — equi-join on keys
plus `r.ts <= l.ts` then a max-per-left-row — materializes every
(left, earlier-right) pairing first: quadratic per key, unusable at
100 TB. The union trick is how as-of joins are done on MPP engines;
at 1000 executors it is one partitioned sort, the same cost class as
any windowed aggregate.

Determinism: right rows tie-breaking on equal (keys, ts) is resolved
by the full right payload struct ordering (last = greatest payload);
callers wanting a specific winner should pre-aggregate the right side
to one row per (keys, ts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row + payload of the matching right
    row per join key, where the match is (pandas `merge_asof` parity):

    * ``direction="backward"`` (default) — greatest right_ts <= left_ts;
    * ``direction="forward"`` — smallest right_ts >= left_ts;
    * ``direction="nearest"`` — whichever of the two is closer in
      absolute time, ties to the backward match.

    Right payload columns (everything except keys and `right_ts`) are
    appended to the left schema, plus `right_ts` itself. `tolerance`
    (a Column interval, e.g. ``F.expr("INTERVAL 10 MINUTES")``) nulls
    out matches farther than the tolerance in the match direction.

    All directions keep the one-shuffle union+window physical shape
    (module docstring); "nearest" evaluates the backward and forward
    frames over the SAME partitioned sort — two WindowExec passes, one
    exchange.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys and c != right_ts]
    if right_ts in left.columns and right_ts != left_ts:
        raise ValueError(
            f"right_ts {right_ts!r} collides with a left column; alias it first"
        )
    clash = sorted(set(payload_cols) & set(left.columns))
    if clash:
        raise ValueError(
            f"right payload columns {clash} collide with left columns; "
            "alias them first"
        )

    rv = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in payload_cols]
    )
    r_tagged = right.select(
        *keys, F.col(right_ts).alias("__ts"), F.lit(0).alias("__side"), rv.alias("__rv")
    )
    l_tagged = left.select(
        "*", F.col(left_ts).alias("__ts"), F.lit(1).alias("__side")
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # Backward: side orders right-before-left on ts ties so `<=` is
    # inclusive; __rv last in the ordering makes equal-ts right rows
    # deterministic (last = greatest payload). Forward mirrors it with
    # a left-before-right tie order and a following frame (first =
    # smallest payload among equal-ts rights). Both windows share the
    # partitioned sort on (__ts, __side, __rv) — "nearest" therefore
    # costs one exchange, two frames.
    order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__rv").asc()]
    wb = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # __side: right=0, left=1, so in the SAME sort equal-ts right rows
    # precede the left row; the forward frame starts at currentRow
    # which would miss them. Shift the frame start back over the
    # preceding equal-ts right block? No — use a second tag column
    # ordered left-before-right and its own sort; Spark plans one
    # Window per (partition, order) pair, so this adds a sort within
    # the already-exchanged partition, not a new shuffle.
    order_f = [F.col("__ts").asc(), (F.lit(1) - F.col("__side")).asc(), F.col("__rv").asc()]
    wf = (
        Window.partitionBy(*keys)
        .orderBy(*order_f)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        u = u.withColumn("__m", F.last("__rv", ignorenulls=True).over(wb))
    elif direction == "forward":
        u = u.withColumn("__m", F.first("__rv", ignorenulls=True).over(wf))
    else:  # nearest
        mb = F.last("__rv", ignorenulls=True).over(wb)
        mf = F.first("__rv", ignorenulls=True).over(wf)
        u = u.withColumn("__mb", mb).withColumn("__mf", mf)
        if tolerance is not None:
            # pandas semantics: tolerance is applied PER CANDIDATE
            # before choosing, so an out-of-tolerance backward match
            # never shadows an in-tolerance forward one
            u = u.withColumn(
                "__mb",
                F.when(
                    F.col("__mb.__rts") >= F.col("__ts") - tolerance,
                    F.col("__mb"),
                ),
            ).withColumn(
                "__mf",
                F.when(
                    F.col("__mf.__rts") <= F.col("__ts") + tolerance,
                    F.col("__mf"),
                ),
            )
        u = u.withColumn(
            "__m",
            F.when(F.col("__mb").isNull(), F.col("__mf")).when(
                F.col("__mf").isNull(), F.col("__mb")
            )
            # ties go backward (<=): pandas merge_asof semantics
            .when(
                (F.col("__ts") - F.col("__mb.__rts"))
                <= (F.col("__mf.__rts") - F.col("__ts")),
                F.col("__mb"),
            )
            .otherwise(F.col("__mf")),
        ).drop("__mb", "__mf")
    matched = u.filter(F.col("__side") == 1)
    if tolerance is not None and direction != "nearest":
        in_tol = {
            "backward": F.col("__m.__rts") >= F.col(left_ts) - tolerance,
            "forward": F.col("__m.__rts") <= F.col(left_ts) + tolerance,
        }[direction]
        matched = matched.withColumn("__m", F.when(in_tol, F.col("__m")))
    renames = {right_ts: "__rts"}
    return matched.select(
        *left.columns,
        *[
            F.col(f"__m.{renames.get(c, c)}").alias(c)
            for c in ([right_ts] if right_ts not in left.columns else []) + payload_cols
        ],
    )
