"""normalize_text (CCNet-style unicode normalization): the unicode
tables of the two engines are independent implementations (Python
unicodedata vs DuckDB's utf8proc), so the oracle pairing is only sound
if they agree on the adversarial codepoint classes the operator's
docstring claims. This gate probes that agreement END-TO-END — the
Spark operator on one side, the oracle's exact expression chain
(nfc_normalize / strip_accents / regexp_replace) on the other — over
decomposed and precomposed accents, singleton compositions (U+212B),
compatibility characters NFC must NOT touch (ligature, fullwidth),
combining marks on multiple bases, and the preserved non-ASCII
whitespace (NBSP, ZWSP)."""

from __future__ import annotations

import duckdb
import pytest

ADVERSARIAL = [
    "école",  # decomposed acute -> NFC composes
    "école",  # precomposed, NFC no-op, fold strips
    "ﬁre",  # fi ligature: NFC must NOT decompose (NFKC would)
    "Ａ１",  # fullwidth: NFC no-op
    "Å",  # A + ring -> U+00C5
    "Å",  # ANGSTROM SIGN -> U+00C5 (singleton)
    "naïve café",
    "x​y",  # ZWSP preserved
    "a b",  # NBSP preserved (ASCII-only collapse class)
    "a \t b\n\nc  d",  # ASCII ws collapses
    "ǭ",  # o + ogonek + macron precomposed; fold leaves o+ogonek? (probe)
    "ṩ",  # s with dot below and dot above
    "q̣̇",  # combining reorder case (canonical ordering)
    "",  # empty stays empty
    "   ",  # whitespace-only folds to empty
]


def _expected(strings):
    con = duckdb.connect()
    out = []
    for s in strings:
        nfc, folded = con.execute(
            "SELECT nfc_normalize(?),"
            " trim(regexp_replace(strip_accents(nfc_normalize(?)),"
            " '[ \\t\\n\\r\\f\\v]+', ' ', 'g'))",
            [s, s],
        ).fetchone()
        out.append((nfc, folded))
    return out


def test_parity_with_duckdb_unicode_tables(spark):
    from chroma_rs_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in normalize_text(df).collect()
    }
    exp = _expected(ADVERSARIAL)
    assert len(got) == len(ADVERSARIAL)
    for i, (s, (nfc, folded)) in enumerate(zip(ADVERSARIAL, exp)):
        row = got[i]
        assert row["nfc_text"] == nfc, (i, s)
        assert row["folded_text"] == folded, (i, s)
        assert row["nfc_changed"] == (nfc != s)
        assert row["fold_changed"] == (folded != nfc)
        assert row["n_chars_folded"] == len(folded)


def test_null_text_dropped_and_singleton_composition(spark):
    from chroma_rs_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(1, None), (2, "Å"), (3, "plain ascii")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert set(rows) == {2, 3}
    # U+212B ANGSTROM SIGN -> U+00C5 under NFC; fold strips the ring
    assert rows[2]["nfc_text"] == "Å"
    assert rows[2]["folded_text"] == "A"
    assert rows[2]["nfc_changed"] and rows[2]["fold_changed"]
    # pure ASCII is a fixpoint of the whole chain
    assert not rows[3]["nfc_changed"] and not rows[3]["fold_changed"]
    assert rows[3]["folded_text"] == "plain ascii"


def test_suite_row_plants_all_three_change_classes(spark):
    """The declared-corpus twin planting must make nfc_changed,
    fold_changed and ws-collapse all observable (an all-ASCII corpus
    would gate nothing)."""
    from chroma_rs_spark.suite.text import q_text_normalize

    out = q_text_normalize(spark, "/root/testdata/sf0.001").collect()
    twins = [r for r in out if r["doc_id"] >= 200000]
    assert twins, "planting produced no twins"
    assert all(r["nfc_changed"] for r in twins)
    assert all(r["fold_changed"] for r in twins)
    originals = [r for r in out if r["doc_id"] < 200000]
    assert originals and all(not r["nfc_changed"] for r in originals)
