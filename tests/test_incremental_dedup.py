"""Incremental minhash dedup (operators/dedup.py): a new batch mined
against a persisted band index must reproduce exactly the full-corpus
result — pairs(corpus ∪ new) == pairs-within-corpus ∪ incremental."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from chroma_rs_spark.operators.dedup import (
    incremental_minhash_pairs,
    minhash_band_index,
    minhash_lsh_pairs,
)
from tests.conftest import SF001_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001_DIR}/documents.parquet")


def _pairs_dict(rows):
    return {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in rows}


def test_incremental_equals_full_corpus(spark, docs):
    cutoff = 40
    old = docs.filter(F.col("doc_id") < cutoff)
    new = docs.filter(F.col("doc_id") >= cutoff)

    full = _pairs_dict(minhash_lsh_pairs(docs).collect())
    within_old = _pairs_dict(minhash_lsh_pairs(old).collect())
    idx = minhash_band_index(old)
    inc = incremental_minhash_pairs(new, idx)
    inc_rows = inc.collect()
    inc_pairs = _pairs_dict(inc_rows)

    # disjoint decomposition, exact est_jaccard on both sides
    assert set(within_old) | set(inc_pairs) == set(full)
    assert not (set(within_old) & set(inc_pairs))
    for k, v in inc_pairs.items():
        assert np.float64(v).view(np.int64) == np.float64(full[k]).view(
            np.int64
        ), k
    for k, v in within_old.items():
        assert np.float64(v).view(np.int64) == np.float64(full[k]).view(
            np.int64
        ), k
    # vs_corpus labels orientation correctly
    for r in inc_rows:
        touches_old = r["id_a"] < cutoff or r["id_b"] < cutoff
        assert r["vs_corpus"] == touches_old


def test_index_roundtrips_through_parquet(spark, docs, tmp_path):
    old = docs.filter(F.col("doc_id") < 40)
    new = docs.filter(F.col("doc_id") >= 40)
    path = str(tmp_path / "band_index")
    minhash_band_index(old).write.parquet(path)
    idx = spark.read.parquet(path)
    a = _pairs_dict(incremental_minhash_pairs(new, idx).collect())
    b = _pairs_dict(
        incremental_minhash_pairs(new, minhash_band_index(old)).collect()
    )
    assert a == b


def test_rows_per_band_gt_1_rejected(spark, docs):
    with pytest.raises(ValueError, match="rows-per-band"):
        minhash_band_index(docs, num_hashes=16, bands=4)
    with pytest.raises(ValueError, match="rows-per-band"):
        incremental_minhash_pairs(docs, minhash_band_index(docs), bands=8)


def test_minhash_max_bucket_prunes_hot_buckets_only(spark):
    """max_bucket drops candidate generation from oversize buckets and
    nothing else: a twin pair (bucket size 2) survives max_bucket=2, a
    triplet (all its buckets size 3) is pruned; uncapped finds both."""
    from chroma_rs_spark.operators.dedup import minhash_lsh_pairs

    text_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    text_c = "one two three four five six seven eight nine ten eleven"
    docs = spark.createDataFrame(
        [(1, text_a), (2, text_a), (10, text_c), (11, text_c), (12, text_c)],
        "doc_id long, text string",
    )
    def pairset(**kw):
        return {
            (r["id_a"], r["id_b"], r["est_jaccard"])
            for r in minhash_lsh_pairs(docs, **kw).collect()
        }

    capped = pairset(max_bucket=2)
    assert capped == {(1, 2, 1.0)}
    uncapped = pairset()
    assert {(1, 2, 1.0), (10, 11, 1.0), (10, 12, 1.0), (11, 12, 1.0)} <= uncapped
    # a cap wide enough for the triplet keeps everything, bit-equal
    assert pairset(max_bucket=3) == uncapped
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_bucket"):
        minhash_lsh_pairs(docs, max_bucket=1)


def test_incremental_max_bucket_caps_index_hot_bucket(spark):
    """A degenerate index bucket (12 identical corpus docs) must not
    flood a capped incremental batch; a clean twin pair survives with
    its FULL-agreement est_jaccard."""
    from chroma_rs_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_band_index,
    )

    hot = "same boilerplate page body repeated across the whole corpus"
    corpus = [(i, hot) for i in range(12)]
    corpus.append((20, "a quiet unique document about rivers and stones"))
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    idx = minhash_band_index(cdf)
    new = spark.createDataFrame(
        [(100, "a quiet unique document about rivers and stones"),
         (101, hot)],
        "doc_id long, text string",
    )
    capped = {
        (r["id_a"], r["id_b"]): r
        for r in incremental_minhash_pairs(new, idx, max_bucket=8).collect()
    }
    # the twin of the unique doc survives at full agreement
    assert (20, 100) in capped
    assert capped[(20, 100)]["est_jaccard"] == 1.0
    assert capped[(20, 100)]["vs_corpus"]
    # every pair into the 12-doc hot bucket is pruned
    assert all(a == 20 or b == 20 for a, b in capped)
    # uncapped floods: 12 corpus partners for the hot newcomer
    full = {
        (r["id_a"], r["id_b"])
        for r in incremental_minhash_pairs(new, idx).collect()
    }
    assert sum(1 for a, b in full if b == 101) == 12
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_bucket"):
        incremental_minhash_pairs(new, idx, max_bucket=1)


def test_auto_max_bucket_size_gate(spark, tmp_path):
    """The public default 'auto' resolves via the optimizer estimate:
    provably-small corpora stay uncapped (historical plan bit-compat),
    large or unknown-size corpora get MINHASH_MAX_BUCKET so zipf text
    can't quadratically blow up the default path (VERDICT r7)."""
    import pytest

    from chroma_rs_spark.operators.dedup import (
        MINHASH_AUTO_CAP_BYTES,
        MINHASH_MAX_BUCKET,
        _resolve_max_bucket,
        minhash_lsh_pairs,
    )

    # small parquet-backed corpus: estimate is known and tiny -> uncapped
    p = str(tmp_path / "small_docs")
    spark.createDataFrame(
        [(i, f"doc number {i} with marker m{i}") for i in range(20)],
        "doc_id long, text string",
    ).write.parquet(p)
    small = spark.read.parquet(p).select("doc_id", "text")
    from chroma_rs_spark.plans.partitioning import plan_size_bytes

    est = plan_size_bytes(small)
    assert 0 <= est < MINHASH_AUTO_CAP_BYTES
    assert _resolve_max_bucket(small, "auto") is None

    # local relation: unknown/huge estimate -> capped default
    local = spark.createDataFrame(
        [(1, "hello")], "doc_id long, text string"
    )
    if not (0 <= plan_size_bytes(local) < MINHASH_AUTO_CAP_BYTES):
        assert _resolve_max_bucket(local, "auto") == MINHASH_MAX_BUCKET

    # explicit values pass straight through; bad strings fail loudly
    assert _resolve_max_bucket(small, None) is None
    assert _resolve_max_bucket(small, 7) == 7
    with pytest.raises(ValueError, match="auto"):
        minhash_lsh_pairs(small, max_bucket="always")


def test_minhash_accuracy_planted_pairs(spark):
    """Exact twins estimate 1.0 with zero error; near twins' estimate
    stays within the 16-hash binomial band of the exact Jaccard; the
    error column is |est - exact| rounded like every score."""
    from chroma_rs_spark.operators.dedup import minhash_accuracy

    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(58)) + " zzz yyy"
    rows = [
        (1, base),
        (2, base),                     # exact twin of 1
        (3, near),                     # near twin of 1
        (4, "совершенно unrelated text about nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in minhash_accuracy(df).collect()
    }
    twin = out[(1, 2)]
    assert twin["est_jaccard"] == 1.0
    assert twin["exact_jaccard"] == 1.0
    assert twin["abs_err"] == 0.0
    for pair in ((1, 3), (2, 3)):
        if pair in out:
            r = out[pair]
            assert r["exact_jaccard"] > 0.8
            assert r["abs_err"] == round(
                abs(r["est_jaccard"] - r["exact_jaccard"]), 6
            )
            # 16 hashes: the estimate is coarse but must be in band
            assert abs(r["est_jaccard"] - r["exact_jaccard"]) < 0.4
    # the unrelated doc never pairs with anything
    assert not any(4 in p for p in out)


def test_plan_lsh_bands_midpoint_rule():
    import pytest as _pytest

    from chroma_rs_spark.operators.dedup import (
        lsh_collision_prob,
        plan_lsh_bands,
    )

    # 16 hashes: midpoints are 0.0625 (16x1), 0.354 (8x2), 0.707 (4x4),
    # 0.917 (2x8), 1.0 (1x16)
    assert plan_lsh_bands(0.5, 16) == (8, 2)
    assert plan_lsh_bands(0.7, 16) == (4, 4)
    assert plan_lsh_bands(0.9, 16) == (2, 8)
    assert plan_lsh_bands(0.05, 16) == (16, 1)
    b, r = plan_lsh_bands(0.7, 16)
    # the planned curve actually separates: well above the threshold
    # almost always candidates, well below almost never
    assert lsh_collision_prob(0.95, b, r) > 0.95
    assert lsh_collision_prob(0.2, b, r) < 0.01
    with _pytest.raises(ValueError):
        plan_lsh_bands(0.0)
    with _pytest.raises(ValueError):
        plan_lsh_bands(0.5, 0)


def test_lsh_recall_planted(spark):
    """16x1 banding catches exact twins (est band keys equal) — planted
    twins yield recall 1.0; a threshold with no qualifying pairs yields
    NULL recall."""
    import pytest as _pytest

    from chroma_rs_spark.operators.dedup import lsh_recall

    base = " ".join(f"tok{i}" for i in range(40))
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, " ".join(f"other{i}" for i in range(40))),
        ],
        "doc_id LONG, text STRING",
    )
    row = lsh_recall(df, threshold=0.9).collect()[0]
    assert row["n_true"] == 1
    assert row["n_caught"] == 1
    assert row["recall"] == 1.0
    empty = lsh_recall(
        spark.createDataFrame([(1, "a b c"), (2, "x y z")],
                              "doc_id LONG, text STRING"),
        threshold=0.9,
    ).collect()[0]
    assert empty["n_true"] == 0 and empty["recall"] is None
    with _pytest.raises(ValueError):
        lsh_recall(df, threshold=0.0)
