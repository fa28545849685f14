"""Distributed BPE training/application vs a pure-Python Sennrich
reference (ACL 2016 algorithm, greedy left-to-right merge, count-then-
lexicographic tie-break)."""

from __future__ import annotations

from collections import Counter

import pytest

from chroma_rs_spark.operators.bpe import END_WORD, apply_bpe, train_bpe


def _ref_train(texts, n_merges, min_pair=2):
    vocab = []  # [(symbol list, count)] — one row per distinct word
    wc = Counter(
        w for t in texts if t for w in t.split(" ") if w != ""
    )
    for w, c in wc.items():
        vocab.append((list(w) + [END_WORD], c))
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair:
            break
        merges.append((left, right, cnt))
        vocab = [(_ref_merge(s, left, right), c) for s, c in vocab]
    return merges


def _ref_merge(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_apply(text, merges):
    toks = []
    for w in (text or "").split(" "):
        if w == "":
            continue
        syms = list(w) + [END_WORD]
        for left, right, *_ in merges:
            syms = _ref_merge(syms, left, right)
        toks.extend(syms)
    return toks


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "low lower newest"),
    (6, ""),
    (7, None),
]


def test_train_bpe_matches_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id LONG, text STRING")
    got = train_bpe(df, n_merges=8)
    want = _ref_train([t for _, t in CORPUS], 8)
    assert got == want
    # the classic corpus learns 'est</w>' pieces: some merge chain
    # builds the shared suffix of newest/widest
    built = {left + right for left, right, _ in got}
    assert any(p.endswith(END_WORD) for p in built)


def test_train_bpe_greedy_overlap_rule(spark):
    """'aaaa' merging (a,a): greedy left-to-right pairs aa|aa — the
    wrapped-string replace must never produce a|aa|a."""
    df = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id LONG, text STRING"
    )
    merges = train_bpe(df, n_merges=2)
    want = _ref_train(["aaaa aaaa aaaa"], 2)
    assert merges == want
    out = apply_bpe(df, merges).collect()[0]
    assert out["bpe_tokens"] == _ref_apply("aaaa aaaa aaaa", merges)


def test_apply_bpe_matches_reference_and_handles_nulls(spark):
    df = spark.createDataFrame(CORPUS, "doc_id LONG, text STRING")
    merges = train_bpe(df, n_merges=6)
    rows = {r["doc_id"]: r for r in apply_bpe(df, merges).collect()}
    for did, text in CORPUS:
        want = _ref_apply(text, merges)
        assert rows[did]["bpe_tokens"] == want, did
        assert rows[did]["bpe_tokens_n"] == len(want)
    # fewer merges -> more pieces; full merge set compresses the corpus
    n_chars = sum(len(w) + 1 for _, t in CORPUS if t for w in t.split() if w)
    n_bpe = sum(r["bpe_tokens_n"] for r in rows.values())
    assert n_bpe < n_chars


def test_train_bpe_early_stop_and_validation(spark):
    # every word is a hapax single char: best pair count is 1 < 2
    df = spark.createDataFrame(
        [(1, "a b c d")], "doc_id LONG, text STRING"
    )
    assert train_bpe(df, n_merges=5, min_pair_count=2) == []
    with pytest.raises(ValueError):
        train_bpe(df, n_merges=0)
    with pytest.raises(ValueError):
        train_bpe(df, n_merges=1, min_pair_count=0)


def test_train_bpe_deterministic_ties(spark):
    """Equal-count pairs resolve (left, right) lexicographically —
    partition-count independent."""
    df = spark.createDataFrame(
        [(1, "xy xy zw zw")], "doc_id LONG, text STRING"
    )
    m1 = train_bpe(df, n_merges=2)
    m2 = train_bpe(df.repartition(7), n_merges=2)
    assert m1 == m2 == _ref_train(["xy xy zw zw"], 2)
