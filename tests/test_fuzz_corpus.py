"""Seeded random-fuzz corpus gate: generate documents with adversarial
random text (random whitespace runs, unicode, punctuation, digits,
empty/NULL mixes) and require the text-family queries to stay
bit-green against their DuckDB oracles. A randomized generalization of
tests/test_adversarial_corpus.py's curated shapes — any divergence
between Spark and DuckDB string semantics (split, substr, length,
md5, regexp) surfaces here before a regenerated driver corpus finds
it."""

from __future__ import annotations

import os
import random
import shutil
import string

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF001_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

QUERIES = [
    "token_stats",
    "char_entropy",
    "pack_sequences",
    "chunk_documents",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_simhash",
    "quality_score",
    "lang_id",
    "top_tokens",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "repetition_signals",
    "tfidf_topk",
    "bm25_scores",
    "split_contamination",
    "frame_sample",
    "multimodal_features",
    # round-5 additions: anchored span mining + cluster-hashed split +
    # corpus-LM perplexity
    "duplicate_span_stats",
    "leakage_safe_split",
    "lm_perplexity",
    "remove_duplicate_spans",
    # round-7 additions: the quality/dedup/selection operators over the
    # same random unicode/NULL/whitespace text domain
    "gopher_quality",
    "c4_filters",
    "line_dedup",
    "ngram_decontamination",
    "dsir_importance",
    "token_budget_sample",
    "gopher_repetition",
    "domain_cap_sample",
    # round-8 session-2 additions: bigram LM, HTML extraction (random
    # text can contain tag-like '<'/'>' runs — both engines must strip
    # them identically), trained LR classifier, BPE train/apply
    # (merges become inline literals in BOTH engines' apply chains),
    # and the minhash error harness
    "bigram_perplexity",
    "html_extract_text",
    "quality_classifier",
    "bpe_merges",
    "bpe_tokenize",
    "minhash_accuracy",
    "script_profile",
    "lsh_recall",
    "video_near_dup",
]

_ALPHABET = (
    string.ascii_letters
    + string.digits
    + "     "  # weight whitespace heavily
    + ".,;:!?'\"-_()[]{}"
    + "äöüßéèñ日本語😀"
)


def _random_text(rng: random.Random) -> str | None:
    roll = rng.random()
    if roll < 0.05:
        return None
    if roll < 0.10:
        return ""
    if roll < 0.15:
        return " " * rng.randint(1, 6)
    n = rng.randint(1, 120)
    return "".join(rng.choice(_ALPHABET) for _ in range(n))


@pytest.fixture(scope="module", params=[7, 1234, 31337])
def fuzz_dir(request, tmp_path_factory):
    rng = random.Random(request.param)
    dst = str(tmp_path_factory.mktemp(f"fuzz{request.param}"))
    rows = [
        (
            900000 + i,
            _random_text(rng),
            rng.choice(["en", "de", "es", None]),
            rng.choice(["srcA", "srcB", None]),
            rng.randint(0, 200),
        )
        for i in range(120)
    ]
    con = duckdb.connect()
    con.register(
        "_fuzz",
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        ),
    )
    con.execute(
        f"""
COPY (
  SELECT * FROM read_parquet('{SF001_DIR}/documents.parquet')
  UNION ALL SELECT * FROM _fuzz
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
"""
    )
    for t in TABLES:
        if t == "documents":
            continue
        shutil.copyfile(
            os.path.join(SF001_DIR, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
        )
    con.close()
    return dst


@pytest.fixture(scope="module")
def fuzz_con(fuzz_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fuzz_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", QUERIES)
def test_text_query_bit_green_on_fuzz_corpus(spark, fuzz_dir, fuzz_con, name):
    from chroma_rs_spark.suite import all_queries

    qd = all_queries(include_extra=True)[name]
    got = _normalize(qd.fn(spark, fuzz_dir).toPandas())
    want = _normalize(fuzz_con.sql(qd.oracle).df())
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        a, b = got[c], want[c]
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(
            np.asarray(b).dtype, np.floating
        ):
            x = np.asarray(a, dtype=np.float64)
            y = np.asarray(b, dtype=np.float64)
            ok = (x.view(np.int64) == y.view(np.int64)) | (
                np.isnan(x) & np.isnan(y)
            )
            assert ok.all(), f"{name}.{c}: float bits differ"
        else:
            eq = (a.to_numpy() == np.asarray(b)) | (
                pd.isna(a).to_numpy() & pd.isna(b).to_numpy()
            )
            assert np.asarray(eq).all(), f"{name}.{c}: values differ"


# -- vector-family fuzz -------------------------------------------------

VEC_QUERIES = [
    "knn_cosine",
    "knn_l2",
    "knn_ip",
    "vector_index_norms",
    "embedding_near_dup",
    "near_dup_bucketed",
    "ann_signbucket",
    "embedding_quantize",
    "label_centroids",
    "centroid_assign",
    # round-5 addition: JL sketch over the same random-magnitude domain
    "embedding_projection",
    # round-7 addition: k-means-clustered SemDeDup over the same domain
    "semantic_dedup",
]


@pytest.fixture(scope="module")
def fuzz_vec_dir(tmp_path_factory):
    """Random vectors across the REALISTIC embedding magnitude domain
    (1e-6 .. 1e3). Beyond ~1e30 the round-to-6-dp contract is
    mathematically vacuous (double ulp exceeds 1e-6) and the
    micro-unit fixed-point centroid sums exceed DECIMAL(38) — the
    engine's documented numeric domain, not a parity bug."""
    rng = random.Random(99)
    dst = str(tmp_path_factory.mktemp("fuzzvec"))
    rows = [
        (
            900000 + i,
            [rng.uniform(-1, 1) * 10.0 ** rng.randint(-6, 3) for _ in range(64)],
            rng.randint(0, 9),
        )
        for i in range(40)
    ]
    con = duckdb.connect()
    con.register(
        "_fz", pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    )
    con.execute(
        f"""
COPY (
  SELECT * FROM read_parquet('{SF001_DIR}/embeddings.parquet')
  UNION ALL
  SELECT vec_id, CAST(embedding AS FLOAT[]), label FROM _fz
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    for t in TABLES:
        if t == "embeddings":
            continue
        shutil.copyfile(
            os.path.join(SF001_DIR, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
        )
    con.close()
    return dst


@pytest.fixture(scope="module")
def fuzz_vec_con(fuzz_vec_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fuzz_vec_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", VEC_QUERIES)
def test_vector_query_bit_green_on_fuzz_corpus(
    spark, fuzz_vec_dir, fuzz_vec_con, name
):
    from chroma_rs_spark.suite import all_queries

    qd = all_queries(include_extra=True)[name]
    got = _normalize(qd.fn(spark, fuzz_vec_dir).toPandas())
    want = _normalize(fuzz_vec_con.sql(qd.oracle).df())
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        a, b = got[c], want[c]
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(
            np.asarray(b).dtype, np.floating
        ):
            x = np.asarray(a, dtype=np.float64)
            y = np.asarray(b, dtype=np.float64)
            ok = (x.view(np.int64) == y.view(np.int64)) | (
                np.isnan(x) & np.isnan(y)
            )
            assert ok.all(), f"{name}.{c}: float bits differ"
        else:
            eq = (a.to_numpy() == np.asarray(b)) | (
                pd.isna(a).to_numpy() & pd.isna(b).to_numpy()
            )
            assert np.asarray(eq).all(), f"{name}.{c}: values differ"
