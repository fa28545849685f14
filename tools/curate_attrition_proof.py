#!/usr/bin/env python
"""Round-8 curation attrition proof at 10x (VERDICT r7 next-step #7).

Runs the full `curate_corpus` recipe end-to-end on the 50k-doc zipf
corpus (the same text distribution whose hot LSH buckets round 7
found, measured and capped) with a PLANTED victim population for every
data-driven stage, and pins the per-stage survivor counts against the
planted expectations:

  * a NAV boilerplate line prepended to EVERY doc       -> line_dedup
    (docs survive; the line vanishes corpus-wide, so the token count
    must drop by ~|NAV| x n_docs)
  * 500 exact twins of every-100th doc                  -> exact_dedup
    (after the NAV line is stripped the twin is byte-identical)
  * 500 near twins (base text + one unique 4-token line)-> near_dup
    (3-shingle Jaccard ~0.97 >> the 0.7 threshold)
  * a 25-token span planted INLINE mid-body into 250 PAIRS of
    otherwise-fresh docs                                 -> span CUT
    (docs survive; the non-keeper occurrence's single anchored
    20-token window is cut: exactly 20 tokens per pair. Planting the
    span as its own LINE instead would be self-defeating — 500 docs
    sharing a line puts it over line_dedup's min_df and it never
    reaches the span stage; the first draft of this proof measured
    exactly that, 0 span tokens cut)
  * the r7 BOILER 13-gram in 30% of base docs           -> decontam
    (every carrier landing outside train must drop once any carrier
    lands in train)

The run uses `checkpoint_dir=` (round-8 durable parquet spill), so
this is also the 10x exercise of the restartable path: each stage's
survivor parquet is re-read and re-counted from disk after the run
and must match the report.

Usage: python tools/curate_attrition_proof.py
Prints one JSON line with the report, the planted expectations, and
the wall time. Exit 1 on any expectation violation.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# CURATE_PROOF_DOCS overrides the corpus size (round-11 stress ask:
# the same recipe at 10x this tool's own 10x). At non-default sizes
# the zipf-BACKGROUND bands (span keeper count, decontam background
# drops) scale with the corpus and are REPORTED instead of asserted;
# every size-independent planted expectation stays a hard failure.
import os as _os

N_DOCS = int(_os.environ.get("CURATE_PROOF_DOCS", 50_000))
STRICT_BANDS = N_DOCS == 50_000
TOKENS_PER_DOC = 100
VOCAB = 20_000
ZIPF_S = 1.3
BOILER_FRAC_DEN = 3  # every 3rd base doc carries the 13-gram
BOILER = " ".join(f"boiler{i}" for i in range(13))
NAV = "home about contact support terms privacy careers help"
SPAN = " ".join(f"span{i}" for i in range(25))
N_EXACT_TWINS = 500
N_NEAR_TWINS = 500
N_SPAN_PAIRS = 250
CKPT = os.path.join(ROOT, "_scaletmp", "curate10_ckpt")


def build_rows() -> list[tuple[int, str]]:
    rng = np.random.default_rng(42)
    ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
    probs = ranks**-ZIPF_S
    probs /= probs.sum()
    n_span_docs = 2 * N_SPAN_PAIRS
    toks = rng.choice(
        VOCAB, size=(N_DOCS + n_span_docs, TOKENS_PER_DOC), p=probs
    )
    rows: list[tuple[int, str]] = []
    bodies: dict[int, str] = {}
    for d in range(N_DOCS):
        body = " ".join(f"w{t}" for t in toks[d])
        if d % BOILER_FRAC_DEN == 0:
            body = BOILER + " " + body
        bodies[d] = body
        rows.append((d, NAV + "\n" + body))
    # exact twins: byte-identical once the NAV line is line-deduped
    for j in range(N_EXACT_TWINS):
        base = j * 100
        rows.append((1_000_000 + base, NAV + "\n" + bodies[base]))
    # near twins: one extra unique line -> Jaccard ~0.97
    for j in range(N_NEAR_TWINS):
        base = j * 100 + 1
        rows.append(
            (
                2_000_000 + base,
                NAV + "\n" + bodies[base] + f"\nnear nt{j} twin marker",
            )
        )
    # span pairs: FRESH bodies (shingle overlap with everything else
    # stays far under the 0.7 near-dup threshold) sharing only the
    # 25-token span, spliced INLINE after token 50 so it is part of a
    # longer unique line. Of the 6 windows fully inside the shared
    # run, exactly one is content-anchored (md5("span1") % 5 == 0 —
    # checked below), so the CUT removes exactly that window's 20
    # tokens from the non-keeper doc: 20 tokens per pair.
    for j in range(n_span_docs):
        t = [f"w{x}" for x in toks[N_DOCS + j]]
        body = " ".join(t[:50]) + " " + SPAN + " " + " ".join(t[50:])
        rows.append((3_000_000 + j, NAV + "\n" + body))
    return rows


def main() -> int:
    from pyspark.sql import functions as F

    from chroma_rs_spark.curate import curate_corpus
    from chroma_rs_spark.session import get_spark

    spark = get_spark(
        app_name="curate_attrition_proof",
        master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = build_rows()
    docs = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).localCheckpoint()
    n_input = docs.count()

    shutil.rmtree(CKPT, ignore_errors=True)
    t0 = time.time()
    corpus, report = curate_corpus(
        docs,
        skip={"c4_filters", "gopher_quality", "gopher_repetition"},
        checkpoint_dir=CKPT,
    )
    rep = {
        r["stage"]: (r["stage_no"], r["n_docs"], r["n_tokens"])
        for r in report.collect()
    }
    wall = round(time.time() - t0, 1)

    failures: list[str] = []

    def expect(cond: bool, msg: str) -> None:
        if not cond:
            failures.append(msg)

    # sanity: exactly one of the 6 in-run window starts is anchored
    import hashlib

    anchored = [
        i
        for i in range(6)
        if int(hashlib.md5(f"span{i}".encode()).hexdigest()[:8], 16) % 5
        == 0
    ]
    expect(anchored == [1], f"span anchor layout changed: {anchored}")

    nd = {k: v[1] for k, v in rep.items()}
    nt = {k: v[2] for k, v in rep.items()}
    expect(
        nd["input"] == n_input == N_DOCS + 1500,
        f"input count {nd['input']}",
    )
    # line_dedup: NAV banned corpus-wide; every doc keeps its body.
    # Tokens are single-space-split, so the \n between the banned NAV
    # line and the body merges NAV's last token with the body's first:
    # the measured drop is |NAV|-1 = 7 per doc, exactly.
    expect(nd["line_dedup"] == n_input, "line_dedup keeps all docs")
    nav_tokens = (len(NAV.split()) - 1) * n_input
    expect(
        nt["input"] - nt["line_dedup"] == nav_tokens,
        f"line_dedup token drop {nt['input'] - nt['line_dedup']} != "
        f"{nav_tokens}",
    )
    # exact_dedup: exactly the 500 planted twins vanish
    expect(
        nd["line_dedup"] - nd["exact_dedup"] == N_EXACT_TWINS,
        f"exact_dedup drop {nd['line_dedup'] - nd['exact_dedup']}",
    )
    # near_dup: the 500 planted near twins (higher id loses to the
    # cluster-min rule) -- spurious zipf merges would overshoot
    expect(
        nd["exact_dedup"] - nd["near_dup_clusters"] == N_NEAR_TWINS,
        f"near_dup drop {nd['exact_dedup'] - nd['near_dup_clusters']}",
    )
    # span CUT: no doc dies. The keeper is GLOBAL per span hash (Lee
    # et al.'s CUT keeps the first occurrence corpus-wide, not one per
    # pair), and all 500 planted docs carry the SAME span — so exactly
    # ONE doc corpus-wide keeps it and the other 499 each lose their
    # one anchored 20-token window (the first draft of this proof
    # expected a per-pair keeper and measured the correction). Beyond
    # the planted floor, zipf text YIELDS real duplicated spans: the
    # 13-token BOILER prefix plus a colliding 7-token continuation
    # (top zipf token p ~ 0.25) forms genuinely shared 20-token
    # windows, so the measured cut may exceed the floor — it is
    # measured and reported, never silently absorbed.
    expect(
        nd["remove_duplicate_spans"] == nd["near_dup_clusters"],
        "span CUT must not drop docs",
    )
    span_cut = nt["near_dup_clusters"] - nt["remove_duplicate_spans"]
    # a handful of docs beyond THE keeper may retain the full span:
    # on zipf text a doc can also be the keeper of OVERLAPPING
    # duplicated windows (e.g. "span6..span24 w50" shared because two
    # docs draw the same hot continuation token), and keeper intervals
    # are inviolate — measured 4 full-span survivors at 50k, so the
    # planted expectation is a tight band, not an exact 1
    span_floor = (2 * N_SPAN_PAIRS - 10) * 20
    expect(
        span_cut >= span_floor,
        f"span CUT tokens {span_cut} < planted floor {span_floor}",
    )
    s4 = spark.read.parquet(f"{CKPT}/stage_04_remove_duplicate_spans")
    n_full_span = s4.filter(F.col("text").contains(SPAN)).count()
    if STRICT_BANDS:
        expect(
            1 <= n_full_span <= 10,
            f"global-keeper rule: {n_full_span} docs kept the full span",
        )
    expect(
        nd["leakage_safe_split"] == nd["remove_duplicate_spans"],
        "split must not drop docs",
    )
    # decontamination: every surviving non-train BOILER carrier MUST
    # drop (subset check on ids, not just a count). Zipf text also
    # produces a handful of TRUE background contaminations (shared
    # boiler-continuation 13-grams whose full-BOILER prefix was cut at
    # stage 4); they are measured and bounded, not absorbed into the
    # planted expectation.
    surv = spark.read.parquet(f"{CKPT}/stage_05_leakage_safe_split")
    carriers = {
        r["doc_id"]
        for r in surv.filter(
            (F.col("split") != "train") & F.col("text").contains(BOILER)
        )
        .select("doc_id")
        .collect()
    }
    final_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{CKPT}/stage_06_ngram_decontamination")
        .select("doc_id")
        .collect()
    }
    leaked = carriers & final_ids
    expect(not leaked, f"{len(leaked)} non-train carriers survived")
    got_drop = nd["leakage_safe_split"] - nd["ngram_decontamination"]
    extra_drops = got_drop - len(carriers)
    if STRICT_BANDS:
        expect(
            0 <= extra_drops <= 50,
            f"decontam background drops {extra_drops} out of bounds",
        )
    else:
        expect(extra_drops >= 0, "decontam dropped fewer than carriers")
    n_nontrain_carriers = len(carriers)

    # durable-path contract at 10x: every stage parquet re-reads to
    # the doc count the report claims (pairs_minhash is the reused
    # pair-list artifact, not a stage)
    for d in sorted(os.listdir(CKPT)):
        if not d.startswith("stage_"):
            continue
        name = d.split("_", 2)[2]
        n_disk = spark.read.parquet(f"{CKPT}/{d}").count()
        expect(n_disk == nd[name], f"checkpoint {d} count {n_disk}")

    print(
        json.dumps(
            {
                "wall_sec": wall,
                "report": {k: list(v) for k, v in rep.items()},
                "n_nontrain_carriers": n_nontrain_carriers,
                "decontam_background_drops": extra_drops,
                "span_cut_tokens": span_cut,
                "span_cut_planted_floor": span_floor,
                "n_full_span_survivors": n_full_span,
                "failures": failures,
            }
        )
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
