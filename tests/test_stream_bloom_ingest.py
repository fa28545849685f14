"""Streaming Bloom maintenance (streaming/ingest.py:stream_bloom_ingest):
segments append per micro-batch, readers merge with one DISTINCT, and
the merged filter is bit-equal to a batch build over the same corpus —
the OR merge law on the bit-positions-as-rows layout. The suite row's
DuckDB oracle gates the law end-to-end; these tests pin the replay
and no-false-negative contracts directly."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

K, M = 3, 512


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, f"doc body {i} " + "x " * (i % 5)) for i in range(40)]
        + [(99, None)],
        "doc_id long, text string",
    )


def _run_stream(spark, src_dir, bloom_dir, ckpt):
    from chroma_rs_spark.streaming.ingest import stream_bloom_ingest

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/*")
    )
    q = stream_bloom_ingest(
        spark, stream, bloom_dir, k=K, m=M, checkpoint_dir=ckpt
    )
    q.awaitTermination(600)


def test_stream_final_equals_batch_build_and_replay_is_noop(spark, corpus):
    from chroma_rs_spark.operators.sketch import bloom_build
    from chroma_rs_spark.streaming.ingest import read_bloom

    root = tempfile.mkdtemp(prefix="bloom_stream_test_")
    try:
        # two files -> two micro-batches
        corpus.filter("doc_id < 20").write.parquet(f"{root}/in/f1")
        corpus.filter("doc_id >= 20").write.parquet(f"{root}/in/f2")
        _run_stream(spark, f"{root}/in", f"{root}/bloom", f"{root}/ckpt")
        merged = {
            r["pos"] for r in read_bloom(spark, f"{root}/bloom").collect()
        }
        batch = {
            r["pos"]
            for r in bloom_build(
                corpus.filter("text IS NOT NULL"), "text", k=K, m=M
            ).collect()
        }
        assert merged == batch and merged
        # replay: re-stream the same inbox into the same dir with a
        # FRESH checkpoint (forced re-delivery) — union is idempotent
        _run_stream(spark, f"{root}/in", f"{root}/bloom", f"{root}/ckpt2")
        again = {
            r["pos"] for r in read_bloom(spark, f"{root}/bloom").collect()
        }
        assert again == batch
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_no_false_negatives_through_stream_built_filter(spark, corpus):
    from chroma_rs_spark.operators.sketch import bloom_contains
    from chroma_rs_spark.streaming.ingest import read_bloom

    root = tempfile.mkdtemp(prefix="bloom_stream_fn_")
    try:
        corpus.write.parquet(f"{root}/in/f1")
        _run_stream(spark, f"{root}/in", f"{root}/bloom", f"{root}/ckpt")
        bloom = read_bloom(spark, f"{root}/bloom")
        probed = bloom_contains(
            corpus.filter("text IS NOT NULL"), bloom, "text", k=K, m=M
        )
        assert probed.filter(~F.col("bloom_hit")).count() == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
