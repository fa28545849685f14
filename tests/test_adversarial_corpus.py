"""Adversarial-corpus gate: every oracle-paired query must stay
bit-green when the corpus carries the shapes a regenerated driver
dataset could legally contain — NULL/empty/multi-space/whitespace-only
text, NULL embeddings, the zero vector, NULL event time/type/user and
malformed JSON props, NULL money values/flags and NULL join keys. This is the regression net for
the round-3 `pack_sequences` class of failure (data drift flipping a
previously green row) and the round-4 findings (ANSI DIVIDE_BY_ZERO on
zero-norm cosine, NULL-payload decode crashes, regex-vs-string_split
shingle divergence)."""

from __future__ import annotations

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF001_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# queries exercising text, vector, multimodal, and pair-mining paths
QUERIES = [
    "knn_cosine",
    "knn_l2",
    "chunk_documents",
    "doc_fingerprint",
    "token_stats",
    "pack_sequences",
    "dedup_ngram_jaccard",
    "frame_sample",
    "multimodal_features",
    "near_dup_bucketed",
    "embedding_near_dup",
    "hybrid_search_rrf",
    "char_entropy",
    "vector_index_norms",
    "events_json_stats",
    "events_tumbling",
    "events_sliding",
    "events_session_windows",
    "trending_event_types",
    "dedup_events",
    "pricing_summary",
    "lineitem_stats",
    "high_revenue_parts",
    "approx_distinct_parts",
    "orders_above_avg",
    "lineitem_percentiles_hist",
    # round-5 additions: span mining + cluster-hashed split over the
    # same NULL/empty/multi-space text edges
    "duplicate_span_stats",
    "leakage_safe_split",
    "lm_perplexity",
    "remove_duplicate_spans",
    # round-7 additions: the round-6 snapshot operators, replayed over
    # the same NULL/empty/whitespace text and NULL/zero embedding edges
    "line_dedup",
    "c4_filters",
    "gopher_quality",
    "semantic_dedup",
    "dsir_importance",
    "token_budget_sample",
    "gopher_repetition",
    "domain_cap_sample",
    # round-8 session-2 additions: bigram LM (held-in train split over
    # edge text), HTML extraction (synthetic page wrap of edge text),
    # the trained LR classifier (bias-only empty docs), BPE training/
    # application (degenerate words), and the minhash error harness
    "bigram_perplexity",
    "html_extract_text",
    "quality_classifier",
    "bpe_merges",
    "bpe_tokenize",
    "minhash_accuracy",
    "script_profile",
    "lsh_recall",
    "video_near_dup",
    # round-10 additions: the bounded-state sketches over the same
    # NULL/empty/multi-space text edges (CMS shingling must skip
    # NULL/short docs identically in both engines; Bloom must report
    # bloom_hit=false for NULL probes and never hash NULL corpus text)
    "cms_heavy_hitters",
    "bloom_dedup",
    # round-10 session 3: unicode normalization over the same edges
    # (NULL dropped, empty/whitespace-only fold to empty, multi-space
    # collapses — plus its own planted-unicode twins on top)
    "text_normalize",
    # the composite IVF-PQ index over the NULL/zero-vector edges (both
    # engines drop unscorable vectors from the cosine coarse quantizer)
    "ivfpq_topk",
    "ivfpq_recall",
    # banded-Hamming simhash mining over the same text edges (empty/
    # whitespace-only docs fingerprint into one degenerate bucket —
    # both engines must pair them identically)
    "dedup_simhash_pairs",
    # scale-path hybrid: IVF-PQ candidate leg + BM25 leg, fused — both
    # legs' edge handling composed through one fusion
    "hybrid_search_ivfpq",
    # the dedup ladder's unicode rung over the same text edges (NULL
    # drops, whitespace-only folds to empty — empty docs become ONE
    # duplicate group on both engines)
    "dedup_unicode_normalized",
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("edgecorpus"))
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  SELECT * FROM read_parquet('{SF001_DIR}/documents.parquet')
  UNION ALL
  SELECT * FROM (VALUES
    (900001, '', 'en', 'srcx', 0),
    (900002, 'single', 'en', 'srcx', 6),
    (900003, 'two  spaces  between', 'en', 'srcx', 20),
    (900004, ' leading and trailing ', 'en', 'srcx', 22),
    (900005, NULL, 'en', 'srcx', 0),
    (900006, '    ', 'en', 'srcx', 4)
  ) v(doc_id, text, lang, source, n_chars)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT * FROM read_parquet('{SF001_DIR}/embeddings.parquet')
  UNION ALL
  SELECT 900001, list_transform(range(64), x -> CAST(0.0 AS FLOAT)), 0
  UNION ALL
  SELECT 900002, NULL, 1
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT * FROM read_parquet('{SF001_DIR}/events.parquet')
  UNION ALL
  SELECT 910001, (SELECT max(ts) FROM read_parquet('{SF001_DIR}/events.parquet')),
         NULL, 'click', 1.5, NULL
  UNION ALL
  SELECT 910002, (SELECT min(ts) FROM read_parquet('{SF001_DIR}/events.parquet')),
         42, NULL, NULL, 'not json at all'
  UNION ALL
  SELECT 910003, NULL, 43, 'purchase', 2.5, '{{"k": 7}}'
) TO '{dst}/events.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT * FROM read_parquet('{SF001_DIR}/lineitem.parquet')
  UNION ALL
  SELECT 9900001, 1, 1, 1, NULL, NULL, 0.05, 0.02, NULL, 'O', NULL
  UNION ALL
  SELECT 9900002, NULL, 2, 1, 10.0, 1000.50, NULL, NULL, 'R', 'F',
         (SELECT min(l_shipdate) FROM read_parquet('{SF001_DIR}/lineitem.parquet'))
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT * FROM read_parquet('{SF001_DIR}/orders.parquet')
  UNION ALL
  SELECT 9900101, NULL, NULL, NULL, NULL, NULL
) TO '{dst}/orders.parquet' (FORMAT PARQUET)
"""
    )
    for t in TABLES:
        if t in ("documents", "embeddings", "events", "lineitem", "orders"):
            continue
        shutil.copyfile(
            os.path.join(SF001_DIR, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
        )
    con.close()
    return dst


@pytest.fixture(scope="module")
def oracle_con(edge_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{edge_dir}/{t}.parquet')"
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
def test_query_bit_green_on_adversarial_corpus(spark, edge_dir, oracle_con, name):
    from chroma_rs_spark.suite import all_queries

    qd = all_queries(include_extra=True)[name]
    got = _normalize(qd.fn(spark, edge_dir).toPandas())
    # via Arrow so DATE comes through as datetime.date objects (matching
    # Spark's toPandas) instead of .df()'s datetime64 promotion
    want = _normalize(oracle_con.sql(qd.oracle).arrow().to_pandas())
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    assert sorted(got.columns) == sorted(want.columns)
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
