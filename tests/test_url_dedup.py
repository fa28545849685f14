"""URL canonicalization + URL-level dedup (operators/text.py:
canonicalize_url/url_dedup — RefinedWeb §3.2 / CCNet stage-1 dedup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chroma_rs_spark.operators.text import canonicalize_url, url_dedup


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "doc_id long, url string")
    return [r["c"] for r in
            df.select(canonicalize_url("url").alias("c")).orderBy("doc_id").collect()]


def test_canonicalize_noise_classes(spark):
    noisy = [
        # host case + default port + fragment + tracking + order + slash
        "HTTPS://WWW.Ex.COM:443/A/b/?b=2&utm_source=x&a=1#frag",
        "https://www.ex.com/A/b?a=1&b=2",
        # http default port
        "http://ex.com:80/x",
        # non-default port KEPT
        "http://ex.com:8080/x",
        # tracking-only query dropped entirely
        "https://ex.com/p?utm_medium=m&fbclid=F",
        # root path keeps its slash; empty path becomes root
        "https://ex.com/",
        "https://ex.com",
        # path case preserved
        "https://ex.com/CaseSensitive",
    ]
    c = _canon(spark, noisy)
    assert c[0] == c[1] == "https://www.ex.com/A/b?a=1&b=2"
    assert c[2] == "http://ex.com/x"
    assert c[3] == "http://ex.com:8080/x"
    assert c[4] == "https://ex.com/p"
    assert c[5] == c[6] == "https://ex.com/"
    assert c[7] == "https://ex.com/CaseSensitive"


def test_canonicalize_schemeless_and_null(spark):
    df = spark.createDataFrame(
        [(0, "www.bare/path#frag"), (1, None), (2, "  https://ex.com/a  ")],
        "doc_id long, url string",
    )
    c = {r["doc_id"]: r["c"] for r in
         df.select("doc_id", canonicalize_url("url").alias("c")).collect()}
    # scheme-less: defragmented + trimmed, otherwise untouched
    assert c[0] == "www.bare/path"
    assert c[1] is None
    assert c[2] == "https://ex.com/a"


def test_url_dedup_keeper_and_nulls(spark):
    rows = [
        (10, "https://EX.com/a/?utm_source=t"),
        (11, "https://ex.com/a"),          # same page, lower id loses? no: 10 < 11
        (12, "https://ex.com/b"),
        (13, None),
        (14, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r for r in url_dedup(df).collect()}
    assert out[10]["canonical_url"] == out[11]["canonical_url"]
    assert out[10]["keep"] is True and out[11]["keep"] is False
    assert out[12]["keep"] is True
    # NULL urls: no key, all kept
    assert out[13]["keep"] is True and out[14]["keep"] is True
    assert out[13]["canonical_url"] is None
