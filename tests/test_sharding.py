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


def test_zorder_value_interleaves_bits(spark):
    from chroma_rs_spark.sources.sharding import zorder_value

    df = spark.createDataFrame(
        [(0b101, 0b011)], "a LONG, b LONG"
    ).select(zorder_value(("a", "b")).alias("z"))
    # interleave a=101, b=011 -> bits z[2i]=a_i, z[2i+1]=b_i:
    # a bits (LSB first) 1,0,1; b bits 1,1,0 ->
    # z = a0 + 2*b0 + 4*a1 + 8*b1 + 16*a2 + 32*b2 = 1+2+0+8+16+0 = 27
    assert df.collect()[0]["z"] == 27


def test_zorder_layout_prunes_both_columns(spark, tmp_path):
    """The point of the layout: after Z-ordering on (x, y), a narrow
    filter on EITHER column touches a small fraction of files; a
    single-column sort only prunes its own column."""
    import random

    from chroma_rs_spark.sources.sharding import (
        write_zorder_layout,
        zorder_prune_stats,
    )

    rng = random.Random(13)
    rows = [(i, rng.randrange(10_000), rng.randrange(10_000)) for i in range(20_000)]
    df = spark.createDataFrame(rows, "doc_id LONG, x LONG, y LONG")

    zpath = str(tmp_path / "zorder")
    write_zorder_layout(df, zpath, ("x", "y"), n_shards=16)
    lin_path = str(tmp_path / "linear")
    # baseline: single-column range layout on x
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.parquet(lin_path))

    # both columns prune under z-order (narrow 5% band)
    zx = zorder_prune_stats(spark, zpath, "x", 4000, 4500)
    zy = zorder_prune_stats(spark, zpath, "y", 4000, 4500)
    assert zx["n_files"] == 16
    assert zx["frac_scanned"] <= 0.5
    assert zy["frac_scanned"] <= 0.5
    # the linear layout prunes x hard but cannot prune y at all
    lx = zorder_prune_stats(spark, lin_path, "x", 4000, 4500)
    ly = zorder_prune_stats(spark, lin_path, "y", 4000, 4500)
    assert lx["frac_scanned"] <= zx["frac_scanned"]
    assert ly["frac_scanned"] == 1.0
    # z-order strictly beats linear on the unsorted dimension
    assert zy["frac_scanned"] < ly["frac_scanned"]
    # nothing lost
    assert spark.read.parquet(zpath).count() == 20_000


def test_zorder_validates(spark, tmp_path):
    import pytest as _pytest

    from chroma_rs_spark.sources.sharding import (
        write_zorder_layout,
        zorder_value,
    )

    df = spark.createDataFrame([(1, 2, 3)], "doc_id LONG, x LONG, y LONG")
    with _pytest.raises(ValueError):
        write_zorder_layout(df, str(tmp_path / "z1"), ("x", "y"), n_shards=0)
    with _pytest.raises(ValueError):
        write_zorder_layout(
            df, str(tmp_path / "z2"), ("x", "y"), n_shards=2, bits=12
        )
    with _pytest.raises(ValueError):
        zorder_value(("x", "y"), buckets=1 << 20)


def test_shuffled_shards_deterministic_permutation(spark, tmp_path):
    from chroma_rs_spark.sources.sharding import (
        assert_disjoint_shards,
        shard_manifest,
        write_shuffled_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(500)], "doc_id LONG, text STRING"
    )
    p1, p2, p3 = (str(tmp_path / n) for n in ("s1", "s2", "s3"))
    write_shuffled_shards(df, p1, seed=7, n_shards=4)
    write_shuffled_shards(df.repartition(9), p2, seed=7, n_shards=4)
    write_shuffled_shards(df, p3, seed=8, n_shards=4)

    def order(path):
        import pyspark.sql.functions as F

        rows = (
            spark.read.parquet(path)
            .select(F.input_file_name().alias("f"), "doc_id", "_shuffle_key")
            .collect()
        )
        return [r["doc_id"] for r in sorted(rows, key=lambda r: (r["_shuffle_key"]))]

    o1, o2, o3 = order(p1), order(p2), order(p3)
    # same seed -> identical global permutation, regardless of input partitioning
    assert o1 == o2
    # different seed -> different epoch permutation of the same rows
    assert o1 != o3 and sorted(o1) == sorted(o3) == list(range(500))
    # shuffled order is not the identity
    assert o1 != list(range(500))
    assert_disjoint_shards(shard_manifest(spark, p1, sort_by="_shuffle_key"))


def test_manifest_checksum_col_and_row_list_disjointness(spark, tmp_path):
    # round-13 fusion surface: the checksum rides the manifest scan and
    # the disjointness check accepts pre-collected rows
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(300)], "doc_id LONG, text STRING"
    )
    path = str(tmp_path / "shards_ck")
    write_training_shards(df, path, n_shards=3)
    rows = shard_manifest(spark, path, checksum_col="doc_id").collect()
    assert sum(r["key_sum"] for r in rows) == sum(range(300))
    assert sum(r["n_rows"] for r in rows) == 300
    assert_disjoint_shards(rows)  # list form, no re-scan
    # the DataFrame form still works and agrees
    assert_disjoint_shards(shard_manifest(spark, path))


def test_zorder_prune_stats_multi_matches_per_call(spark, tmp_path):
    from chroma_rs_spark.sources.sharding import (
        write_zorder_layout,
        zorder_prune_stats,
        zorder_prune_stats_multi,
    )

    df = spark.createDataFrame(
        [(i, float(i % 97), i % 13) for i in range(2000)],
        "k LONG, x DOUBLE, y LONG",
    )
    path = str(tmp_path / "z")
    write_zorder_layout(df, path, ("x", "y"), n_shards=6)
    ranges = [
        ("x", 0.0, 96.0),      # full
        ("x", -50.0, -1.0),    # empty
        ("x", 10.0, 20.0),     # narrow x band
        ("y", 3, 5),           # narrow y band (other column)
    ]
    multi = zorder_prune_stats_multi(spark, path, ranges)
    for (c, lo, hi), got in zip(ranges, multi):
        assert got == zorder_prune_stats(spark, path, c, lo, hi)
    assert multi[0]["frac_scanned"] == 1.0
    assert multi[1]["n_candidate_files"] == 0
