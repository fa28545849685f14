"""Training-shard writer: disjoint ranges, in-shard order, round-trip
fidelity, size-derived shard counts."""

from __future__ import annotations

import pytest

from chroma_rs_spark.sources.sharding import (
    assert_disjoint_shards,
    shard_manifest,
    write_training_shards,
)


def test_shards_disjoint_sorted_and_complete(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1000)], "doc_id LONG, text STRING"
    ).repartition(8)  # scrambled input order
    path = str(tmp_path / "shards")
    n = write_training_shards(df, path, n_shards=5)
    assert n == 5
    man = shard_manifest(spark, path)
    rows = man.collect()
    assert len(rows) == 5
    assert sum(r["n_rows"] for r in rows) == 1000
    assert_disjoint_shards(man)
    # balanced within reason (range sampling): no empty shard, largest
    # within 3x of smallest
    sizes = sorted(r["n_rows"] for r in rows)
    assert sizes[0] > 0 and sizes[-1] <= 3 * sizes[0]
    # rows are sorted WITHIN each shard file
    back = spark.read.parquet(path)
    import pyspark.sql.functions as F

    per_file = (
        back.select(F.input_file_name().alias("f"), "doc_id")
        .groupBy("f")
        .agg(F.collect_list("doc_id").alias("ids"))
        .collect()
    )
    for r in per_file:
        assert r["ids"] == sorted(r["ids"])
    # round-trip: nothing lost or duplicated
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(1000))


def test_target_shard_mb_derives_count(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, "x" * 100) for i in range(200)], "doc_id LONG, text STRING"
    ).write.parquet(src)
    # parquet-backed: the optimizer estimate is the real file size, so
    # a tiny corpus with a huge target derives exactly 1 shard
    df = spark.read.parquet(src)
    path = str(tmp_path / "auto_shards")
    n = write_training_shards(df, path, target_shard_mb=1024)
    assert n == 1
    man = shard_manifest(spark, path)
    assert man.count() == 1


def test_overlap_detection_raises(spark, tmp_path):
    # two unranged appends into one dir: two files with overlapping keys
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id LONG")
    path = str(tmp_path / "overlapping")
    df.coalesce(1).write.parquet(path)
    df.coalesce(1).write.mode("append").parquet(path)
    man = shard_manifest(spark, path)
    assert man.count() == 2
    with pytest.raises(ValueError, match="overlapping shard ranges"):
        assert_disjoint_shards(man)


def test_write_training_shards_validates(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "doc_id LONG")
    with pytest.raises(ValueError):
        write_training_shards(df, str(tmp_path / "x"), n_shards=0)
