#!/usr/bin/env python
"""Round-12 iid recall push (VERDICT r11 next-round #7 / missing #3):
the ladder topped at 0.78@10 on iid embeddings with the driver rows'
tiny codebooks (m=8, k=16 = 32 bits/vector — sized for SQL-replayable
oracles, not for recall). This sweep measures the two levers the
verdict names on the SAME iid corpus:

  * capacity — k in {16, 64, 256} and m in {8, 16} (k=256, m=16 is
    the standard Faiss IVFPQ configuration: 128 bits/vector);
  * a TRAINED rotation — PCA over a corpus sample with deterministic
    eigen ordering (descending eigenvalue, sign fixed by first
    nonzero component), applied to corpus and queries before
    indexing.

Expected and previously-recorded null: on an ISOTROPIC iid corpus the
covariance is ~I, so PCA has no preferred basis and cannot help — the
leg is included to close the verdict item with a measurement rather
than an argument. Capacity is the honest lever on structureless data.

Usage: python tools/ivfpq_iid_recall.py
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
TOP_K = 10
N_QUERIES = 16


def _iid() -> np.ndarray:
    # the round-10 ladder's corpus rule: iid uniform via md5
    def u(key: str) -> float:
        return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 16**8

    return np.array(
        [
            [2.0 * u(f"iid|{i}|{d}") - 1.0 for d in range(DIM)]
            for i in range(N)
        ]
    )


def _pca_rotation(vecs: np.ndarray) -> np.ndarray:
    """Deterministic PCA basis: eigenvectors of the sample covariance,
    descending eigenvalue order, sign fixed so each vector's first
    nonzero component is positive."""
    sample = vecs[:2048]
    cov = np.cov(sample, rowvar=False)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1]
    v = v[:, order]
    for j in range(v.shape[1]):
        col = v[:, j]
        nz = col[np.abs(col) > 1e-12]
        if len(nz) and nz[0] < 0:
            v[:, j] = -col
    return v


def main() -> int:
    from chroma_rs_spark.catalog import Engine
    from chroma_rs_spark.session import get_spark

    spark = get_spark(app_name="ivfpq_iid_recall")
    spark.sparkContext.setLogLevel("ERROR")
    base = _iid()

    for rot_kind in ("none", "pca"):
        vecs = base @ _pca_rotation(base) if rot_kind == "pca" else base
        ids = [f"v{i:05d}" for i in range(N)]
        root = tempfile.mkdtemp(prefix=f"ivfpq_iid_{rot_kind}_")
        eng = Engine(spark, root)
        c = eng.create_collection("iid", {"hnsw:space": "cosine"})
        c.add(ids=ids, embeddings=[[float(x) for x in v] for v in vecs])
        probes = [[float(x) for x in vecs[i]] for i in range(N_QUERIES)]
        exact = c.query(probes, n_results=TOP_K, index="exact").collect()
        truth: dict[int, set] = {}
        for row in exact:
            truth.setdefault(row["query_id"], set()).add(row["id"])
        for m in (8, 16):
            for k_codes in (16, 64, 256):
                if rot_kind == "pca" and (m, k_codes) not in (
                    (8, 16), (16, 256)
                ):
                    continue  # the null needs endpoints, not the grid
                n_cells = 16
                while True:
                    try:
                        c.build_ivfpq_index(
                            n_centroids=n_cells, max_iter=5, m=m,
                            k=k_codes, sample_size=N,
                        )
                        break
                    except ValueError:
                        n_cells -= 1
                        if n_cells < 8:
                            raise
                for n_probe in (4, 8):
                    for oversample in (10, 20):
                        got = c.query(
                            probes,
                            n_results=TOP_K,
                            index="ivfpq",
                            n_probe=n_probe,
                            oversample=oversample,
                        ).collect()
                        hits = sum(
                            1 for row in got
                            if row["id"] in truth[row["query_id"]]
                        )
                        recall = hits / (TOP_K * N_QUERIES)
                        print(
                            json.dumps(
                                {
                                    "rotation": rot_kind,
                                    "m": m,
                                    "k": k_codes,
                                    "bits_per_vec": m
                                    * int(np.log2(k_codes)),
                                    "n_cells": n_cells,
                                    "n_probe": n_probe,
                                    "oversample": oversample,
                                    "recall@10": round(recall, 3),
                                }
                            ),
                            flush=True,
                        )
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
