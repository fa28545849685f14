"""Cross-engine bit-equality contracts for the round-3 promoted
operators' documented numeric risks (VERDICT r02 next-round #8):

* BM25's idf uses `ln` — if Spark's and DuckDB's ln differed in the
  last ulp on any (N, df) the round-6 score could flip at a boundary.
  Pinned over the full integer (N, df) grid a small corpus can produce.
* temperature_mixture with alpha != 0.5 uses `pow`, where a last-ulp
  difference could move an integer bucket cutoff by one. Pinned by
  replaying the generalized oracle in DuckDB across alphas and skewed
  strata and requiring the SELECTED ROW SETS to be identical.
* the NULL-source sentinel stratum must survive the oracle's equi-join
  (ADVICE r02: the old oracle joined USING (source) and would drop
  NULL-source docs if the testdata ever grew them).
"""

from __future__ import annotations

import struct

import duckdb
import pytest
from pyspark.sql import functions as F


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


def test_bm25_ln_within_one_ulp(spark):
    """Raw `ln` is NOT bit-identical across engines — JVM Math.log and
    DuckDB's libm log disagree by 1 ulp on e.g. ln(8/3) (N=3, df=1;
    found by this test). That measured gap is exactly why every BM25
    score is rounded to 6 dp before ranking/hashing. Pin the gap at
    <= 1 ulp over the full integer (N, df) grid a small corpus can
    produce, so a platform/runtime change that widens it gets caught
    before it can flip a round-6 boundary."""
    import math

    pairs = [(n, d) for n in range(1, 61) for d in range(0, n + 1)]
    sdf = spark.createDataFrame(pairs, "n long, df long")
    got = (
        sdf.select(
            "n",
            "df",
            F.log(
                (F.col("n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ).alias("idf"),
        )
        .orderBy("n", "df")
        .collect()
    )
    con = duckdb.connect()
    want = con.sql(
        "SELECT n, df, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf "
        "FROM (SELECT r1.range AS n, r2.range AS df FROM range(1, 61) r1, "
        "range(0, 61) r2 WHERE r2.range <= r1.range) ORDER BY n, df"
    ).fetchall()
    assert len(got) == len(want)
    n_off = 0
    for g, w in zip(got, want):
        assert (g["n"], g["df"]) == (w[0], w[1])
        db = abs(_bits(g["idf"]) - _bits(w[2]))
        assert db <= 1, (g["n"], g["df"], g["idf"], w[2])
        n_off += db
        # a 1-ulp idf gap must never survive the round-6 contract
        assert round(g["idf"], 6) == round(w[2], 6) or math.isclose(
            g["idf"], w[2], rel_tol=1e-12
        )
    # the grid does contain off-by-one-ulp cases — the risk is real,
    # not hypothetical (if this ever drops to 0 the pin still holds)
    assert n_off >= 1


def test_bm25_round6_scores_match_duckdb_on_adversarial_corpus(spark):
    """The operative contract: the COMPOSED round-6 BM25 score is
    bit-identical across engines on a corpus engineered to sweep many
    (tf, df, dl) combinations of the suite's query terms."""
    from chroma_rs_spark.operators.text import bm25_scores
    from chroma_rs_spark.suite.text import _BM25_K1, _BM25_B, _BM25_TERMS, _bm25_oracle

    rows = []
    for i in range(120):
        toks = ["pad"] * (i % 7)
        # tf sweeps 0..3 per term, decorrelated across terms
        toks += [_BM25_TERMS[0]] * (i % 4)
        toks += [_BM25_TERMS[1]] * ((i // 4) % 4)
        toks += [_BM25_TERMS[2]] * ((i // 16) % 3)
        toks += [f"filler{j}" for j in range(i % 5)]
        rows.append((i, " ".join(toks) if toks else "empty"))
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], _bits(r["bm25"]))
        for r in bm25_scores(sdf, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B).collect()
    )
    con = duckdb.connect()
    con.register("documents", sdf.toPandas())
    want = sorted((r[0], _bits(r[1])) for r in con.sql(_bm25_oracle()).fetchall())
    assert got == want and len(got) == 120


@pytest.mark.parametrize("alpha", [0.3, 0.7, 0.9])
def test_mixture_pow_cutoff_parity(spark, alpha):
    from chroma_rs_spark.operators.sampling import temperature_mixture_sample
    from chroma_rs_spark.suite.pipeline import _temperature_mixture_oracle

    # heavily skewed strata sizes: the rate expression sweeps many
    # magnitudes, so a pow ulp flip at any round() boundary would show
    rows = []
    doc_id = 0
    for s, n in [("a", 1), ("b", 7), ("c", 40), ("d", 333), ("e", 2619)]:
        for _ in range(n):
            rows.append((doc_id, s))
            doc_id += 1
    sdf = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["doc_id"], r["source"])
        for r in temperature_mixture_sample(
            sdf, total_fraction=0.25, alpha=alpha
        ).collect()
    )
    con = duckdb.connect()
    con.register("documents", sdf.toPandas())
    want = sorted(
        tuple(r)
        for r in con.sql(
            _temperature_mixture_oracle(total_fraction=0.25, alpha=alpha)
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_temperature_mixture_oracle_keeps_null_sources(spark):
    from chroma_rs_spark.operators.sampling import temperature_mixture_sample
    from chroma_rs_spark.suite.pipeline import _TEMPERATURE_MIXTURE_ORACLE

    rows = [(i, "a") for i in range(400)] + [(i, None) for i in range(400, 500)]
    sdf = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["doc_id"], r["source"])
        for r in temperature_mixture_sample(
            sdf, total_fraction=0.2, alpha=0.5
        ).collect()
    )
    con = duckdb.connect()
    con.register("documents", sdf.toPandas())
    want = sorted(
        (r[0], r[1]) for r in con.sql(_TEMPERATURE_MIXTURE_ORACLE).fetchall()
    )
    assert got == want
    # and the sentinel stratum actually sampled something
    assert any(s is None for _, s in got)


def test_split_contamination_unknown_train_split_raises(spark):
    from chroma_rs_spark.operators.sampling import split_contamination

    docs = spark.createDataFrame(
        [(i, f"doc text number {i} with several tokens") for i in range(10)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="train_split"):
        split_contamination(
            docs, {"train": 0.8, "val": 0.2}, train_split="trian"
        )
