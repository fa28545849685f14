#!/usr/bin/env python
"""Round-8 scale proof (VERDICT r7 missing #3): ANN recall on a
CLUSTERED corpus.

The round-7 recall harness honestly showed that on the isotropic
synthetic gate corpus every ANN's recall ~= the fraction of the corpus
it scores (sign-bucket radius 2 probes ~14% -> 0.39, IVF probes 4/16
cells -> 0.62) — which left the "IVF is the serious scale path" claim
resting on theory. Real embedding spaces are heavily clustered, and on
clustered data an IVF whose cells track the clusters concentrates each
query's true neighbors into the query's own cell, so recall at a fixed
probe fraction should rise far above that fraction. This script
MEASURES that on a deterministic mixture-of-gaussians corpus.

Corpus (md5-seeded, replayable anywhere — no RNG state):
  * K_TRUE=16 cluster centers in dim=64: center[c][d] =
    2*u(md5("c|{c}|{d}")) - 1, u = first-8-hex-chars / 16^8.
  * n=4096 points round-robin over clusters: point[i][d] =
    center[i % K][d] + NOISE * (u(md5("p|{i}|{d}")) - 0.5).
    NOISE=0.4 against unit-scale centers: clusters overlap enough
    that k-means is non-trivial but neighborhoods are real.

Measured (all through the repo's own operators — ivf_topk /
train_centroids_kmeans / signbucket_ann / recall_vs_exact, the same
code the oracle-checked `ivf_recall`/`ann_recall` rows pin):
  * IVF recall@10 at n_probe = 1, 2, 4 of 16 k-means cells, with the
    ACTUAL probed corpus fraction (sum of probed cell sizes / n,
    averaged over queries) next to it.
  * sign-bucket recall@10 at Hamming radius 0 / 2 / 3 at 8 planes.
  * the isotropic control: the same pipeline on an unclustered
    md5-uniform corpus of the same size, where recall ~= probe
    fraction is expected (reproduces the round-7 finding).

Usage: python tools/clustered_ann_proof.py
Prints one JSON line per corpus; paste the table into SCALE.md.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 4096
DIM = 64
K_TRUE = 16
NOISE = 0.4
N_PROBES = 32
TOP_K = 10


def _u(key: str) -> float:
    """Deterministic uniform [0,1): first 8 hex chars of md5(key)."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 16**8


def _clustered_rows() -> list[tuple[int, list[float]]]:
    centers = [
        [2.0 * _u(f"c|{c}|{d}") - 1.0 for d in range(DIM)]
        for c in range(K_TRUE)
    ]
    return [
        (
            i,
            [
                centers[i % K_TRUE][d]
                + NOISE * (_u(f"p|{i}|{d}") - 0.5)
                for d in range(DIM)
            ],
        )
        for i in range(N)
    ]


def _isotropic_rows() -> list[tuple[int, list[float]]]:
    return [
        (i, [2.0 * _u(f"iso|{i}|{d}") - 1.0 for d in range(DIM)])
        for i in range(N)
    ]


def _avg_recall(df) -> float:
    rows = [r["recall"] for r in df.collect() if r["recall"] is not None]
    return round(sum(rows) / len(rows), 3)


def _probed_fraction(emb, centroids, n_probe) -> float:
    """Average (over the probe queries) fraction of the corpus living
    in the query's n_probe nearest cells — the honest denominator for
    'recall vs probe fraction'."""
    import numpy as np

    from chroma_rs_spark.operators.ivf import assign_cells

    sizes = {
        r["cell"]: r["n"]
        for r in assign_cells(emb, centroids)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    cids = np.array([c for c, _ in centroids], dtype=np.int64)
    cmat = np.array([v for _, v in centroids], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1)
    probes = [
        (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        for r in emb.filter(F.col("vec_id") < N_PROBES).collect()
    ]
    fracs = []
    for _, qv in probes:
        d = np.round(1.0 - (cmat @ qv) / (cnorm * np.linalg.norm(qv)), 6)
        order = np.lexsort((cids, d))
        probed = {int(cids[c]) for c in order[:n_probe]}
        fracs.append(sum(sizes.get(c, 0) for c in probed) / float(N))
    return round(sum(fracs) / len(fracs), 3)


def measure(spark, name: str, rows) -> dict:
    from chroma_rs_spark.operators.ivf import ivf_topk, train_centroids_kmeans
    from chroma_rs_spark.operators.similarity import (
        ann_recall,
        recall_vs_exact,
    )

    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint()
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    out: dict = {"corpus": name, "n": N, "dim": DIM}

    # strict=False: a Lloyd's cell emptying on a hard corpus is the
    # realistic index-build outcome; the probed-fraction column keeps
    # the comparison honest whatever the surviving cell count
    trained = train_centroids_kmeans(
        emb, n_centroids=16, max_iter=5, strict=False
    )
    out["cells_trained"] = len(trained)
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < N_PROBES).collect()
    ]
    for n_probe in (1, 2, 4):
        approx = ivf_topk(
            emb,
            k=TOP_K,
            n_centroids=16,
            n_probe=n_probe,
            precollected=(trained, queries),
        )
        rec = _avg_recall(recall_vs_exact(emb, probes, approx, k=TOP_K))
        frac = _probed_fraction(emb, trained, n_probe)
        out[f"ivf_recall@10_probe{n_probe}"] = rec
        out[f"ivf_probed_frac_probe{n_probe}"] = frac

    for radius in (0, 2, 3):
        rec = _avg_recall(
            ann_recall(
                emb, probes, k=TOP_K, n_planes=8, hamming_probes=radius
            )
        )
        out[f"signbucket_recall@10_radius{radius}"] = rec
    return out


def main() -> int:
    from chroma_rs_spark.session import get_spark

    spark = get_spark(app_name="clustered_ann_proof")
    spark.sparkContext.setLogLevel("ERROR")
    for name, rows in (
        ("clustered_mog16", _clustered_rows()),
        ("isotropic_control", _isotropic_rows()),
    ):
        print(json.dumps(measure(spark, name, rows)), flush=True)
    return 0


from pyspark.sql import functions as F  # noqa: E402  (after docstring)

if __name__ == "__main__":
    raise SystemExit(main())
