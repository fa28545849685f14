"""Streaming ingestion into a collection (SURVEY.md §2.3 [EXT]
streaming x §2.2 A1: `add` as a continuous process).

`stream_add` wires a streaming DataFrame of item-shaped rows into a
collection through `foreachBatch`: each micro-batch is de-duplicated
against the collection's existing ids (left-anti join on the id
column only — Catalyst prunes everything else from the existing-side
scan) and appended via the same `add_df` bulk path batch callers use.

Replay safety: Structured Streaming may re-deliver a batch after a
failure; the anti-join makes re-adding a no-op, so the sink is
idempotent at the id level — effectively exactly-once for immutable
items — without any transactional storage. The checkpoint directory
lives beside the collection data, so a restarted stream resumes its
offsets.

Scale: each micro-batch is one distributed append; the anti-join
shuffles only ids. At 100 TB the existing-side id scan benefits from
parquet column pruning (a few % of collection bytes).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from chroma_rs_spark.catalog import Collection, Engine


def stream_add(
    engine: Engine,
    coll: Collection,
    stream_items: DataFrame,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Start a streaming query appending `stream_items` to `coll`.

    `stream_items` columns: id, embedding[, document][, metadata].
    Returns the StreamingQuery handle (awaitTermination is the
    caller's choice). `available_now=True` drains the currently
    available input and stops — the batch-backfill mode; pass False
    for a continuously running ingest.
    """
    from chroma_rs_spark import collection as item_ops

    def write_batch(batch_df: DataFrame, _batch_id: int) -> None:
        existing = item_ops.items_df(engine, coll).select("id")
        # dedup within the batch too — one trigger can deliver several
        # files carrying the same id, and the anti-join only sees ids
        # already persisted
        fresh = batch_df.dropDuplicates(["id"]).join(existing, "id", "left_anti")
        # cache: the emptiness probe and the append below would
        # otherwise each run the anti-join against the collection scan
        fresh.persist()
        try:
            if fresh.take(1):
                item_ops.add_df(engine, coll, fresh)
        finally:
            fresh.unpersist()

    checkpoint = checkpoint_dir or os.path.join(
        engine.collection_dir(coll.id), "_ingest_checkpoint"
    )
    writer = (
        stream_items.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
