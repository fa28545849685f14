"""Custom stateful streaming operator (SURVEY.md §2.3 [EXT]:
"stateful running aggregates"; the brief's `applyInPandasWithState`
slot).

`running_user_totals` keeps one (count, sum) state cell per user and
emits the updated running totals every micro-batch — the canonical
per-key accumulator that built-in windowed aggregation cannot express
(it is cumulative over the whole stream, not a window).

Scale properties: state is keyed by user_id, partitioned by the
groupBy shuffle, stored in the executor-local state store (RocksDB on
a real cluster) and checkpointed incrementally; per-key state is O(1)
(two numbers), so total state = |distinct users| * bytes, independent
of stream length. Arrow batches flow through pandas once per trigger.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (event count, value sum), updated per batch.

    Streaming-only: batch DataFrames have no state store — the batch
    twin is a plain ``groupBy("user_id").agg(count, sum)`` and the two
    must agree once the stream is drained (tests/test_streaming.py).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
