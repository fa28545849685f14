"""IVF-PQ composite index (operators/pq.py:ivfpq_adc_topk_df):
residual encoding + per-probed-cell ADC. The suite row's DuckDB twin
is the primary gate (tools/check.py ivfpq_topk); these tests pin the
structural contracts that a value-hash alone wouldn't localize."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from tests.conftest import SF001_DIR


def _result(spark):
    from chroma_rs_spark.suite.vector import q_ivfpq_topk

    return q_ivfpq_topk(spark, SF001_DIR).collect()


def test_oracle_parity_sf0001(spark):
    from chroma_rs_spark.suite.vector import _ivfpq_oracle

    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cell"], r["adc_dist"])
        for r in _result(spark)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF001_DIR}/embeddings.parquet')"
    )
    exp = sorted(tuple(t) for t in con.sql(_ivfpq_oracle()).fetchall())
    assert got == exp


def test_neighbors_come_from_probed_cells_only(spark):
    """Every returned neighbor must sit in one of its query's n_probe
    coarse cells — the candidate-generation contract that makes the
    scan bound |corpus| x n_probe / n_cells."""
    from chroma_rs_spark.operators.ivf import assign_cells
    from chroma_rs_spark.suite.vector import (
        IVF_CENTROIDS,
        IVF_PROBE,
        _small_vectors,
    )

    rows = _result(spark)
    emb = spark.read.parquet(f"{SF001_DIR}/embeddings.parquet")
    cents = _small_vectors(spark, SF001_DIR, IVF_CENTROIDS)
    cell_of = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(emb, cents).select("vec_id", "cell").collect()
    }
    # probed cells per query, replayed with numpy on the same doubles
    cmat = {cid: np.asarray(v, dtype=np.float64) for cid, v in cents}
    by_q = {}
    for r in emb.filter("vec_id < 5").collect():
        q = np.asarray(r["embedding"], dtype=np.float64)
        dists = sorted(
            (
                round(
                    1.0
                    - float(q @ c) / (np.linalg.norm(q) * np.linalg.norm(c)),
                    6,
                ),
                cid,
            )
            for cid, c in cmat.items()
        )
        by_q[r["vec_id"]] = {cid for _, cid in dists[:IVF_PROBE]}
    for r in rows:
        assert r["cell"] in by_q[r["query_id"]], r
        assert cell_of[r["neighbor_id"]] == r["cell"], r


def test_ranks_contiguous_and_monotone(spark):
    rows = _result(spark)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 5
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        dists = [r["adc_dist"] for r in rs]
        assert dists == sorted(dists)
        assert len(rs) == 10


def test_ivfpq_codes_arrow_gear_matches_sql_gear(spark):
    """The encode op's two physical gears (SQL expression pipeline vs
    Arrow numpy batch) produce identical (cell, codes) on a seeded
    corpus with no rounding ties. 33 cells x 64 dims = 2112 flops/row
    crosses ARROW_ENCODE_THRESHOLD so the default call takes the Arrow
    gear; the SQL gear is forced by raising the threshold."""
    import numpy as np

    from chroma_rs_spark.operators import pq as pqmod
    from chroma_rs_spark.operators.pq import hash_codebooks, ivfpq_codes_df

    rng = np.random.RandomState(42)
    vecs = rng.uniform(-1, 1, size=(200, 64))
    items = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cents = [(int(i), vecs[i].tolist()) for i in range(33)]
    books = hash_codebooks(8, 16, 8)

    def rows(df):
        return sorted(
            (r["vec_id"], r["cell"], tuple(r["codes"]))
            for r in df.collect()
        )

    arrow = rows(ivfpq_codes_df(items, books, cents))
    old = pqmod.ARROW_ENCODE_THRESHOLD
    try:
        pqmod.ARROW_ENCODE_THRESHOLD = 10**9
        sql = rows(ivfpq_codes_df(items, books, cents))
    finally:
        pqmod.ARROW_ENCODE_THRESHOLD = old
    assert len(arrow) == 200
    assert arrow == sql
