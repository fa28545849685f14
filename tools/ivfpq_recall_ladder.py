#!/usr/bin/env python
"""Round-11 recall ladder (VERDICT r10 next-round #8): IVF-PQ through
the PRODUCTION collection path on the CLUSTERED corpus.

The round-10 ladder measured the composite index on iid synthetic
embeddings (the structureless worst case for PQ) and topped out at
0.78@10. Real embedding spaces are clustered; this script reruns the
ladder on the deterministic mixture-of-16-gaussians corpus from
tools/clustered_ann_proof.py, through the real API surface
(Engine -> create_collection -> add -> build_ivfpq_index ->
query(index="ivfpq")), sweeping n_probe x oversample x m, plus two
cheap OPQ-style deterministic pre-rotations applied to the corpus AND
queries before indexing:

  * perm — a md5-seeded dimension permutation (balances which
    coordinates land in which subspace; costs one gather per vector);
  * qr — a dense random-orthogonal rotation (numpy QR of a md5-seeded
    Gaussian matrix; the classic OPQ-lite move — decorrelates
    subspaces; costs one 64x64 matvec per vector).

Recall@10 is measured against the EXACT cosine top-10 on the SAME
(rotated) corpus — rotations are orthogonal, so the exact neighbor
sets are identical up to float noise and the comparison isolates the
quantizer. Queries are the first 16 corpus points (one per true
cluster under round-robin assignment).

Usage: python tools/ivfpq_recall_ladder.py
Prints one JSON line per config; paste the table into RECALL.md.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 4096
DIM = 64
K_TRUE = 16
NOISE = 0.4
TOP_K = 10
N_QUERIES = 16


def _u(key: str) -> float:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 16**8


def _clustered() -> np.ndarray:
    centers = np.array(
        [
            [2.0 * _u(f"c|{c}|{d}") - 1.0 for d in range(DIM)]
            for c in range(K_TRUE)
        ]
    )
    return np.array(
        [
            centers[i % K_TRUE]
            + NOISE * np.array([_u(f"p|{i}|{d}") - 0.5 for d in range(DIM)])
            for i in range(N)
        ]
    )


def _rotation(kind: str) -> np.ndarray | None:
    if kind == "none":
        return None
    if kind == "perm":
        # md5-seeded permutation: argsort of per-dimension hashes
        keys = [_u(f"perm|{d}") for d in range(DIM)]
        p = np.argsort(keys)
        r = np.zeros((DIM, DIM))
        r[np.arange(DIM), p] = 1.0
        return r
    if kind == "qr":
        g = np.array(
            [
                [2.0 * _u(f"rot|{i}|{j}") - 1.0 for j in range(DIM)]
                for i in range(DIM)
            ]
        )
        q, _ = np.linalg.qr(g)
        return q
    raise ValueError(kind)


def main() -> int:
    from chroma_rs_spark.catalog import Engine
    from chroma_rs_spark.session import get_spark

    spark = get_spark(app_name="ivfpq_ladder")
    spark.sparkContext.setLogLevel("ERROR")
    base = _clustered()

    for rot_kind in ("none", "perm", "qr"):
        r = _rotation(rot_kind)
        vecs = base @ r if r is not None else base
        ids = [f"v{i:05d}" for i in range(N)]
        root = tempfile.mkdtemp(prefix=f"ivfpq_ladder_{rot_kind}_")
        eng = Engine(spark, root)
        c = eng.create_collection("ladder", {"hnsw:space": "cosine"})
        c.add(ids=ids, embeddings=[[float(x) for x in v] for v in vecs])
        probes = [[float(x) for x in vecs[i]] for i in range(N_QUERIES)]
        exact = c.query(probes, n_results=TOP_K, index="exact").collect()
        truth: dict[int, set] = {}
        for row in exact:
            truth.setdefault(row["query_id"], set()).add(row["id"])
        for m in (8, 16):
            # the strict builder refuses when Lloyd's empties a cell on
            # this corpus/rotation; step down until every cell survives
            # and report the count actually used
            n_cells = 16
            while True:
                try:
                    c.build_ivfpq_index(
                        n_centroids=n_cells, max_iter=5, m=m, k=16,
                        sample_size=N,
                    )
                    break
                except ValueError:
                    n_cells -= 1
                    if n_cells < 8:
                        raise
            for n_probe in (2, 4, 8):
                for oversample in (5, 10, 20):
                    got = c.query(
                        probes,
                        n_results=TOP_K,
                        index="ivfpq",
                        n_probe=n_probe,
                        oversample=oversample,
                    ).collect()
                    hits = 0
                    for row in got:
                        if row["id"] in truth[row["query_id"]]:
                            hits += 1
                    recall = hits / (TOP_K * N_QUERIES)
                    print(
                        json.dumps(
                            {
                                "rotation": rot_kind,
                                "m": m,
                                "n_cells": n_cells,
                                "n_probe": n_probe,
                                "oversample": oversample,
                                "recall@10": round(recall, 3),
                                "probe_frac": round(n_probe / n_cells, 3),
                            }
                        ),
                        flush=True,
                    )
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
