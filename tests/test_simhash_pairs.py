"""simhash_near_pairs (operators/dedup.py): banded-Hamming candidate
generation + exact bit_count verify, and its collection-surface
reachability via find_duplicates(method="simhash")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _body(tag: str) -> str:
    return " ".join(f"{tag}tok{i}" for i in range(30))


def test_identical_docs_pair_at_hamming_zero(spark):
    from chroma_rs_spark.operators.dedup import simhash_near_pairs

    df = spark.createDataFrame(
        [(1, _body("a")), (2, _body("a")), (3, _body("zz"))],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"], r["hamming"])
             for r in simhash_near_pairs(df).collect()}
    assert (1, 2, 0) in pairs
    assert not any({a, b} == {1, 3} or {a, b} == {2, 3} for a, b, _ in pairs
                   if True) or all(h <= 3 for _, _, h in pairs)


def test_near_variant_pairs_small_hamming(spark):
    from chroma_rs_spark.operators.dedup import simhash, simhash_near_pairs

    a = _body("x")
    b = " ".join(f"xtok{i}" for i in range(29)) + " variant"
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    fps = {r["doc_id"]: r["simhash"] for r in simhash(df, bits=64).collect()}
    true_h = bin(fps[1] ^ fps[2]).count("1")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_near_pairs(df, max_hamming=32).collect()}
    if true_h <= 3:  # banded mining is complete up to bands-1 flips
        assert got.get((1, 2)) == true_h
    # the reported hamming, when present, must equal the exact one
    for h in got.values():
        assert h == true_h


def test_hot_bucket_cap_skips_degenerate_groups(spark):
    from chroma_rs_spark.operators.dedup import simhash_near_pairs

    df = spark.createDataFrame(
        [(i, _body("same")) for i in range(6)], "doc_id long, text string"
    )
    assert len(simhash_near_pairs(df).collect()) == 15  # 6 choose 2
    assert simhash_near_pairs(df, max_bucket=2).count() == 0


def test_collection_bridge_simhash(engine):
    c = engine.create_collection("simhash_bridge")
    c.add(
        ids=["a", "b", "c", "n"],
        documents=[_body("p"), _body("p"), _body("q"), None],
        embeddings=None,
    )
    ks = {r["id"]: r["keep"]
          for r in c.find_duplicates(method="simhash").collect()}
    # identical pair: lexicographic min-id keeper wins; NULL doc keeps
    assert ks == {"a": True, "b": False, "c": True, "n": True}


def test_cross_bridge_simhash(engine):
    ref = engine.create_collection("simhash_ref")
    ref.add(ids=["r"], documents=[_body("m")])
    new = engine.create_collection("simhash_new")
    new.add(ids=["k", "l"], documents=[_body("m"), _body("other")])
    ks = {r["id"]: r["keep"]
          for r in new.find_duplicates_against(ref, method="simhash").collect()}
    assert ks == {"k": False, "l": True}
