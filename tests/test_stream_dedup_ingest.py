"""Streaming near-dup ingest (streaming/ingest.py:stream_dedup_ingest):
the daily-crawl shape — each micro-batch dedups against the
accumulated corpus via the persisted band index, appends only novel
docs, and is replay-safe at the id level."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from chroma_rs_spark.streaming.ingest import stream_dedup_ingest

# 30-token bodies: near-dup variants share all but the last token
# (3-shingle Jaccard ~0.93 >> 0.7); unique docs share nothing (every
# token carries the doc marker)


def _body(tag: str) -> str:
    return " ".join(f"{tag}tok{i}" for i in range(30))


def _near(tag: str) -> str:
    return " ".join(f"{tag}tok{i}" for i in range(29)) + " variant"


@pytest.fixture(scope="module")
def ingested(spark):
    root = tempfile.mkdtemp(prefix="dedup_ingest_")
    inbox = f"{root}/inbox"
    corpus_dir = f"{root}/corpus"
    index_dir = f"{root}/index"

    def write_batch(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(f"{inbox}/{name}", mode="overwrite")

    # batch 0: three unique docs + an in-batch near-dup pair (10, 11)
    write_batch("b0", [
        (0, _body("a")), (1, _body("b")), (2, _body("c")),
        (10, _body("z")), (11, _near("z")),
    ])
    # batch 1: one novel doc, one near-dup of batch-0 doc 1 (corpus
    # wins), one exact re-delivery of doc 2 (id replay, anti-joined)
    write_batch("b1", [
        (20, _body("d")), (21, _near("b")), (2, _body("c")),
    ])
    # batch 2: full replay of batch 0 under the SAME ids — must no-op
    write_batch("b2", [
        (0, _body("a")), (1, _body("b")), (2, _body("c")),
        (10, _body("z")), (11, _near("z")),
    ])

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inbox}/*")
    )
    q = stream_dedup_ingest(
        spark, stream, corpus_dir, index_dir,
        threshold=0.7, checkpoint_dir=f"{root}/ckpt",
    )
    q.awaitTermination(300)
    corpus = {r["doc_id"]: r["text"]
              for r in spark.read.parquet(corpus_dir).collect()}
    index_ids = {r["id"] for r in spark.read.parquet(index_dir)
                 .select("id").distinct().collect()}
    yield corpus, index_ids
    shutil.rmtree(root, ignore_errors=True)


def test_survivors_and_rejects(ingested):
    corpus, _ = ingested
    # batch 0: uniques kept; in-batch near-dup pair keeps min id 10
    assert {0, 1, 2, 10} <= set(corpus)
    assert 11 not in corpus
    # batch 1: novel doc kept; near-dup of corpus doc 1 dropped
    assert 20 in corpus
    assert 21 not in corpus
    assert set(corpus) == {0, 1, 2, 10, 20}


def test_replay_is_noop_and_index_consistent(ingested, spark):
    corpus, index_ids = ingested
    # batch 2 replayed batch 0 wholesale: no duplicate rows, no id twice
    assert len(corpus) == 5
    # the index holds exactly the corpus ids (the two-write contract)
    assert index_ids == set(corpus)


def test_post_hoc_batch_dedups_against_final_index(ingested, spark):
    """A later near-dup of a SURVIVOR from any earlier batch is caught
    by the persisted index alone (no old text re-read)."""
    from chroma_rs_spark.operators.dedup import incremental_minhash_pairs

    corpus, _ = ingested
    new = spark.createDataFrame(
        [(30, _near("d")), (31, _body("e"))], "doc_id long, text string"
    )
    import tempfile

    # mine against a rebuilt in-memory index of the final corpus
    from chroma_rs_spark.operators.dedup import minhash_band_index

    corpus_df = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "doc_id long, text string"
    )
    idx = minhash_band_index(corpus_df)
    hits = (
        incremental_minhash_pairs(new, idx)
        .filter("est_jaccard >= 0.7 AND vs_corpus")
        .collect()
    )
    hit_ids = {r["id_a"] for r in hits} | {r["id_b"] for r in hits}
    assert 30 in hit_ids and 20 in hit_ids  # 30 ~ survivor 20
    assert 31 not in hit_ids
