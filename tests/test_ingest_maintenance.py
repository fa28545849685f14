"""Maintenance ops for the streaming-ingest artifacts:
repair_band_index (heals stream_dedup_ingest's two-write crash window)
and compact_sketch_dir (LSM segment merge for the cms/bloom dirs)."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


def _body(tag: str) -> str:
    return " ".join(f"{tag}tok{i}" for i in range(30))


def test_repair_band_index_heals_crash_window(spark):
    from chroma_rs_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_band_index,
    )
    from chroma_rs_spark.streaming.ingest import repair_band_index

    root = tempfile.mkdtemp(prefix="repair_test_")
    try:
        full = spark.createDataFrame(
            [(1, _body("a")), (2, _body("b")), (3, _body("c"))],
            "doc_id long, text string",
        )
        full.write.parquet(f"{root}/corpus")
        # simulate the crash window: index rows exist for docs 1-2 only
        minhash_band_index(full.filter("doc_id < 3")).write.parquet(
            f"{root}/index"
        )
        n = repair_band_index(spark, f"{root}/corpus", f"{root}/index")
        assert n == 1
        idx = spark.read.parquet(f"{root}/index")
        assert idx.filter("id = 3").count() > 0
        # idempotent
        assert repair_band_index(spark, f"{root}/corpus", f"{root}/index") == 0
        # the healed index now catches a near-dup of the repaired doc
        probe = spark.createDataFrame(
            [(99, _body("c")[:-1] + "x")], "doc_id long, text string"
        )
        pairs = incremental_minhash_pairs(
            probe, spark.read.parquet(f"{root}/index")
        ).filter(F.col("est_jaccard") >= 0.7)
        hit = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (3, 99) in hit or (99, 3) in hit
    finally:
        shutil.rmtree(root, ignore_errors=True)


@pytest.mark.parametrize("kind", ["cms", "bloom"])
def test_compact_sketch_dir_preserves_merge(spark, kind):
    from chroma_rs_spark.operators.sketch import bloom_build, cms_build
    from chroma_rs_spark.streaming.ingest import (
        compact_sketch_dir,
        read_bloom,
        read_cms,
    )

    root = tempfile.mkdtemp(prefix="compact_test_")
    try:
        docs = spark.createDataFrame(
            [(i, f"w{i} w{i+1} w{i+2} shared tail") for i in range(30)],
            "doc_id long, text string",
        )
        # two segments, as two micro-batches would append them
        for half in ("doc_id < 15", "doc_id >= 15"):
            part = docs.filter(half)
            if kind == "cms":
                seg = cms_build(
                    part.select(F.col("text").alias("item")), "item",
                    depth=2, width=64,
                )
            else:
                seg = bloom_build(part, "text", k=3, m=256)
            seg.write.mode("append").parquet(f"{root}/sk")
        reader = read_cms if kind == "cms" else read_bloom
        before = sorted(tuple(r) for r in reader(spark, f"{root}/sk").collect())
        files_before = len(glob.glob(f"{root}/sk/*.parquet"))
        n = compact_sketch_dir(spark, f"{root}/sk", kind=kind)
        after = sorted(tuple(r) for r in reader(spark, f"{root}/sk").collect())
        files_after = len(glob.glob(f"{root}/sk/*.parquet"))
        assert after == before and n == len(before)
        assert files_after < files_before
        assert not glob.glob(f"{root}/sk.__tmp") and not glob.glob(
            f"{root}/sk.__old"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
