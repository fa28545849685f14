"""Cross-collection dedup bridge (collection.py:find_duplicates_against):
items of a new collection judged against a reference collection —
"corpus wins", coll-internal duplicates out of scope."""

from __future__ import annotations

import numpy as np
import pytest


def _body(tag: str) -> str:
    return " ".join(f"{tag}tok{i}" for i in range(30))


def _near(tag: str) -> str:
    return " ".join(f"{tag}tok{i}" for i in range(29)) + " variant"


@pytest.fixture()
def pair_colls(engine):
    rng = np.random.default_rng(23)
    base = {f"v{i}": [float(x) for x in rng.normal(size=32)] for i in range(4)}
    ref = engine.create_collection("xref", {"hnsw:space": "cosine"})
    ref.add(
        ids=["r1", "r2", "r3", "r4"],
        documents=[_body("a"), _body("b"), _body("c"), _body("d")],
        embeddings=[base["v0"], base["v1"], base["v2"], base["v3"]],
    )
    new = engine.create_collection("xnew", {"hnsw:space": "cosine"})
    jit = [x + 1e-4 for x in base["v1"]]  # near-identical to r2's vector
    fresh = [float(x) for x in rng.normal(size=32)]
    new.add(
        ids=["n1", "n2", "n3", "n4"],
        documents=[
            _body("a"),  # exact copy of r1's text
            _near("c"),  # near-dup of r3's text (jaccard ~0.93)
            None,  # unscorable
            _body("zz"),  # novel
        ],
        embeddings=[fresh, fresh, jit, fresh],
    )
    return new, ref


def _keeps(df):
    return {r["id"]: r["keep"] for r in df.collect()}


def test_exact_cross(pair_colls):
    new, ref = pair_colls
    out = new.find_duplicates_against(ref, method="exact")
    ks = _keeps(out)
    assert ks == {"n1": False, "n2": True, "n3": True, "n4": True}
    rows = {r["id"]: r for r in out.collect()}
    assert rows["n3"]["text_sha"] is None  # NULL doc: unscorable row kept


def test_minhash_cross(pair_colls):
    new, ref = pair_colls
    ks = _keeps(new.find_duplicates_against(ref, method="minhash", threshold=0.7))
    # n1 exact text copy and n2 near-dup both match the reference
    assert ks == {"n1": False, "n2": False, "n3": True, "n4": True}


def test_embedding_cross(pair_colls):
    new, ref = pair_colls
    ks = _keeps(
        new.find_duplicates_against(ref, method="embedding", threshold=0.95)
    )
    # only n3's vector near-dups the reference (r2's vector jittered)
    assert ks == {"n1": True, "n2": True, "n3": False, "n4": True}


def test_internal_duplicates_out_of_scope(pair_colls, engine):
    new, ref = pair_colls
    # two identical NEW docs that match nothing in the reference: both
    # keep=True here (find_duplicates is the within-collection verdict)
    new.add(ids=["n5", "n6"], documents=[_body("q"), _body("q")],
            embeddings=[[1.0] * 32, [1.0] * 32])
    ks = _keeps(new.find_duplicates_against(ref, method="exact"))
    assert ks["n5"] and ks["n6"]
    within = {r["id"]: r["keep"] for r in new.find_duplicates("exact").collect()}
    assert within["n5"] != within["n6"]


def test_shared_id_strings_do_not_collide(engine):
    # same id in both collections must not confuse pair orientation
    a = engine.create_collection("xa")
    b = engine.create_collection("xb")
    a.add(ids=["same"], documents=[_body("x")], embeddings=[[1.0, 0.0]])
    b.add(ids=["same"], documents=[_body("y")], embeddings=[[0.0, 1.0]])
    ks = _keeps(a.find_duplicates_against(b, method="minhash"))
    assert ks == {"same": True}


def test_unknown_method(pair_colls):
    new, ref = pair_colls
    with pytest.raises(ValueError):
        new.find_duplicates_against(ref, method="soundex")
