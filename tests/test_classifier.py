"""Model-based quality classifier: featurization contract, one
hand-computed GD step, learnability on a planted separable corpus,
determinism, and the unscorable/empty-document conventions."""

from __future__ import annotations

import hashlib

import pytest

from chroma_rs_spark.operators.classifier import (
    MICRO,
    featurize_text,
    score_quality_classifier,
    train_quality_classifier,
)


def _bucket(tok: str, d: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % d


def test_featurize_sorted_tf_and_bias(spark):
    df = spark.createDataFrame(
        [(1, "aaa aaa bbb", 1), (2, "", 0), (3, None, 0)],
        "doc_id LONG, text STRING, label INT",
    )
    rows = {
        r["doc_id"]: r["feats"]
        for r in featurize_text(df, n_features=4, extra_cols=("label",)).collect()
    }
    ja, jb = _bucket("aaa", 4), _bucket("bbb", 4)
    assert ja != jb  # chosen not to collide at d=4
    feats1 = [(f["j"], f["x"]) for f in rows[1]]
    expected = sorted([(ja, 2 / 3), (jb, 1 / 3)]) + [(4, 1.0)]
    assert feats1 == expected
    # feature indices ascend (ordered-fold contract), bias last
    assert [f["j"] for f in rows[1]] == sorted(f["j"] for f in rows[1])
    # empty and NULL docs keep only the bias feature — still scoreable
    for empty_id in (2, 3):
        assert [(f["j"], f["x"]) for f in rows[empty_id]] == [(4, 1.0)]


def test_one_gd_step_hand_computed(spark):
    """w0=0 -> p=0.5 -> err=±0.5; token feature x=1.0; gradient
    floor(±0.5e6) = ±500000; update w = -floor(g/2) in micro units."""
    df = spark.createDataFrame(
        [(1, "aaa aaa aaa", 1), (2, "bbb bbb", 0)],
        "doc_id LONG, text STRING, label INT",
    )
    feat = featurize_text(df, n_features=4, extra_cols=("label",))
    w = train_quality_classifier(feat, n_features=4, iters=1, lr=1.0)
    ja, jb = _bucket("aaa", 4), _bucket("bbb", 4)
    expected = [0] * 5
    expected[ja] = 250_000   # -floor(-500000 / 2)
    expected[jb] = -250_000  # -floor(+500000 / 2)
    # bias gradient: floor(-0.5e6) + floor(0.5e6) = 0
    assert w == expected
    scored = {
        r["doc_id"]: r
        for r in score_quality_classifier(feat, w).collect()
    }
    assert scored[1]["score"] > 0.5 > scored[2]["score"]
    assert scored[1]["score_pred"] and not scored[2]["score_pred"]


def test_classifier_learns_separable_vocab(spark):
    """Disjoint good/bad vocabularies: after a few full-batch steps
    every good document outscores every bad one and predictions are
    perfect — the filter actually learns, not just runs."""
    good_vocab = ["alpha", "bravo", "carbon", "delta"]
    bad_vocab = ["zulu", "yankee", "xray", "wombat"]
    rows = []
    for i in range(40):
        v = good_vocab if i % 2 == 0 else bad_vocab
        text = " ".join(v[(i + k) % 4] for k in range(6))
        rows.append((i, text, 1 if i % 2 == 0 else 0))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, label INT")
    feat = featurize_text(df, n_features=32, extra_cols=("label",))
    w = train_quality_classifier(feat, n_features=32, iters=5, lr=1.0)
    out = score_quality_classifier(feat, w).collect()
    good = [r["score"] for r in out if r["label"] == 1]
    bad = [r["score"] for r in out if r["label"] == 0]
    assert min(good) > max(bad)
    assert all(r["score_pred"] == bool(r["label"]) for r in out)


def test_training_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} tok{i % 5}", i % 2) for i in range(30)],
        "doc_id LONG, text STRING, label INT",
    )
    feat = featurize_text(df, n_features=16, extra_cols=("label",))
    w1 = train_quality_classifier(feat, n_features=16, iters=3)
    w2 = train_quality_classifier(
        featurize_text(df, n_features=16, extra_cols=("label",)),
        n_features=16,
        iters=3,
    )
    assert w1 == w2
    assert all(isinstance(v, int) for v in w1)
    # micro-unit weights stay in a sane band (|w| < 1.0 after 3 steps
    # of bounded-by-1 gradients)
    assert all(abs(v) <= MICRO for v in w1)


def test_classifier_validates_params(spark):
    df = spark.createDataFrame([(1, "a", 1)], "doc_id LONG, text STRING, label INT")
    feat = featurize_text(df, n_features=4, extra_cols=("label",))
    with pytest.raises(ValueError):
        train_quality_classifier(feat, n_features=4, iters=0)
    with pytest.raises(ValueError):
        train_quality_classifier(feat, n_features=4, lr=0.0)
    with pytest.raises(ValueError):
        featurize_text(df, n_features=0)
    with pytest.raises(ValueError):
        train_quality_classifier(feat.filter("doc_id < 0"), n_features=4)
