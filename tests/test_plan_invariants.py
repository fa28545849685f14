"""Physical-plan invariants as a GATE, not just a report: the
properties tools/plan_audit.py documents in PLANS.md — zero unbounded
cartesian products anywhere, broadcasts where the design says
broadcast, parquet filter pushdown where the query filters the scan —
asserted on a spread of declared rows so a plan regression fails CI
instead of waiting for a human to diff PLANS.md.

Plan BUILD only (executedPlan on the sf0.001 tables): no query
executes, so the whole module is seconds. Iterative rows (whose fn()
runs jobs) are exercised by their correctness gates instead.
"""

from __future__ import annotations

import re

import pytest

SF001_DIR = "/root/testdata/sf0.001"

# non-iterative declared rows spanning every family
ROWS = [
    "knn_cosine",
    "lang_id",
    "tfidf_topk",
    "lm_perplexity",
    "gopher_quality",
    "gopher_repetition",
    "bigram_perplexity",
    "html_extract_text",
    "url_dedup",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "near_dup_bucketed",
    "line_dedup",
    "ngram_decontamination",
    "hybrid_search_rrf",
    "leakage_safe_split",
    "pricing_summary",
    "shipping_priority",
    "top_customers_per_nation",
    "order_window_frames",
    "asof_purchase_attribution",
    "events_session_windows",
]


def _plan(spark, name: str) -> str:
    from chroma_rs_spark.suite import all_queries

    qd = all_queries(include_extra=True)[name]
    return str(
        qd.fn(spark, SF001_DIR)._jdf.queryExecution().executedPlan()
    )


@pytest.mark.parametrize("name", ROWS)
def test_no_cartesian_product(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, (
        f"{name}: unbounded cartesian product entered the plan"
    )


def test_knn_broadcasts_the_probe_side(spark):
    # the KNN design point: the tiny query set broadcasts; the
    # collection never shuffles for the cross score
    plan = _plan(spark, "knn_cosine")
    assert "BroadcastExchange" in plan
    # the item scan must not read columns the query never uses
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "embedding" in m.group(1)


def test_filter_pushdown_reaches_the_scan(spark):
    # a source-column filter must reach the parquet scan as a pushed
    # filter, not a post-scan Filter only
    from chroma_rs_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF001_DIR, "documents")
    plan = str(
        docs.filter(F.col("n_chars") > 200)
        .select("doc_id", "lang")
        ._jdf.queryExecution()
        .executedPlan()
    )
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan\(n_chars", plan), plan
    # and column pruning: the scan schema carries only what's needed
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "text" not in m.group(1), m.group(1) if m else plan


def test_small_dims_broadcast_in_relational_joins(spark):
    plan = _plan(spark, "top_customers_per_nation")
    assert "BroadcastExchange" in plan, "nation-side dim should broadcast"
