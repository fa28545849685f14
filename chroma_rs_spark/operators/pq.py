"""IVF-PQ-style product quantization for vector collections.

Product quantization (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — the index family behind Faiss
IVF-PQ) compresses a dim-d vector into M uint8 codes by splitting it
into M subspaces and k-means-quantizing each subspace independently.
At the 100 TB design point this is the memory lever exact KNN and IVF
lack: dim=64 float32 vectors (256 B) become M=8 one-byte codes — a
32x shrink — so a 100 TB raw corpus's index fits ~3 TB and each
executor scans codes, not vectors. Search uses ADC (asymmetric
distance computation): per query, an M x K lookup table of exact
subspace distances is built once (tiny), and each candidate's
approximate distance is M table lookups + adds.

Spark shapes (matching the repo's discipline):

* **train** — on a bounded, md5-deterministic SAMPLE collected to the
  driver (the universal PQ practice: Faiss trains codebooks on a
  sample, not the corpus; the artifact is M*K*(dim/M) doubles — tiny
  by contract, like the IVF centroid collects in operators/ivf.py).
  numpy Lloyd's with deterministic seeds; bit-reproducible.
* **encode** — distributed, shuffle-free: one vectorized Arrow pass
  (mapInPandas) computes all-subspace argmins with numpy matmuls.
  This is the justified Pandas-UDF case: M*K per-row distance argmins
  would otherwise be an interpreted HOF tree.
* **search (ADC)** — broadcast the per-query LUTs inside the task
  closure, np.take + sum per subspace, local top-k per partition,
  then one tiny window over |partitions| x |queries| x k candidates —
  the same bounded-shuffle shape as knn_exact_local_topk.
* **rescore** — the production pattern: PQ retrieves an oversampled
  candidate set, an id-join against the raw vectors re-scores them
  exactly (distances identical to the exact path's doubles), and the
  final top-k ranks on exact distances. Recall is then a property of
  the oversample factor, not of quantization error alone.

Verification: tests/test_pq.py pins encode codes and ADC distances
bit-for-bit against a pure-numpy reference, checks determinism, and
holds a measured recall band for PQ+rescore vs exact KNN. Every suite
seat is FULLY oracle-checked (round 11 retired the last rows-only
row): `pq_adc_topk` runs `pq_adc_topk_df` over `hash_codebooks`
(data-independent md5-derived literals a DuckDB oracle embeds
verbatim), and `pq_topk` runs the TRAINED chain end to end —
`train_pq_codebooks_df` uses the knn_ivf_trained fixed-point
discipline (micro-unit HUGEINT means, in-order round-6 folds), so
the DuckDB twin unrolls the full training and replays
encode + LUT + ADC + exact rescore on the trained tables. The numpy
`train_pq_codebooks`/`pq_topk_rescored` kernels remain as the
vectorized production alternative, recall-banded rather than
hash-gated (BLAS pairwise summation is not SQL-replayable).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chroma_rs_spark.operators.knn import DIST_DECIMALS


def train_pq_codebooks(
    items: DataFrame,
    m: int = 8,
    k: int = 16,
    max_iter: int = 10,
    sample_size: int = 4096,
    item_id: str = "vec_id",
    item_emb: str = "embedding",
):
    """Train M codebooks of K centroids each on a deterministic sample.

    Returns a numpy array of shape (m, k, dim//m) — the persisted
    index artifact (M*K*(dim/M) doubles; 8 KiB at m=8, k=16, dim=64).

    The sample is the `sample_size` ids with the smallest
    (md5(id), id) — uniform, engine-independent, reproducible. Seeds
    per subspace are the first k sample rows in that order. Lloyd's
    runs in float64 numpy; empty clusters keep their previous centroid
    (deterministic, matches the DataFrame kmeans' fixed-point
    convention of never inventing centroids).
    """
    import numpy as np

    rows = (
        items.filter(F.col(item_emb).isNotNull())
        .select(
            F.col(item_id).alias("id"),
            F.col(item_emb).cast("array<double>").alias("emb"),
        )
        .withColumn("_h", F.md5(F.col("id").cast("string")))
        .orderBy("_h", "id")
        .limit(int(sample_size))
        .collect()
    )
    if not rows:
        raise ValueError("train_pq_codebooks: no vectors to train on")
    sample = np.asarray([r["emb"] for r in rows], dtype=np.float64)
    dim = sample.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    # tiny corpora: fewer centroids than asked-for is the only sound
    # choice (deterministic — seeds are then ALL sample rows in order)
    k = min(k, len(sample))
    books = np.empty((m, k, sub), dtype=np.float64)
    for mi in range(m):
        x = sample[:, mi * sub : (mi + 1) * sub]
        cents = x[:k].copy()
        for _ in range(max_iter):
            # (n, k) squared L2 via the expansion — exact enough for
            # training (codebooks are data, not a checked contract)
            d = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            lab = np.argmin(d, axis=1)
            new = cents.copy()
            for ci in range(k):
                mask = lab == ci
                if mask.any():
                    new[ci] = x[mask].mean(axis=0)
            if np.array_equal(new, cents):
                break
            cents = new
        books[mi] = cents
    return books


def pq_encode(
    items: DataFrame,
    codebooks,
    item_id: str = "vec_id",
    item_emb: str = "embedding",
    id_type: str = "long",
) -> DataFrame:
    """(id, codes ARRAY<INT>): nearest-centroid code per subspace.

    One shuffle-free Arrow pass; ties break to the lower code index
    (numpy argmin's first-occurrence rule — the repo convention).
    """
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, k, sub = books.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            emb = np.stack(pdf[item_emb].to_numpy()).astype(np.float64)
            n = emb.shape[0]
            codes = np.empty((n, m), dtype=np.int32)
            for mi in range(m):
                x = emb[:, mi * sub : (mi + 1) * sub]
                c = books[mi]
                d = (
                    (x * x).sum(axis=1)[:, None]
                    - 2.0 * (x @ c.T)
                    + (c * c).sum(axis=1)[None, :]
                )
                codes[:, mi] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {"id": pdf[item_id], "codes": list(codes)}
            )

    out = items.filter(F.col(item_emb).isNotNull()).select(item_id, item_emb)
    return out.mapInPandas(encode, schema=f"id {id_type}, codes array<int>")


def pq_adc_topk(
    codes: DataFrame,
    codebooks,
    queries: Sequence[tuple],
    k: int = 10,
    id_type: str = "long",
) -> DataFrame:
    """(query_id, rank, id, adc_dist): approximate top-k by ADC over
    PQ codes. `queries` is a driver-side list of (qid, vector) — small
    by contract, like every probe set in the engine.

    Per task: LUT[m][j] = exact squared L2 between the query's m-th
    subvector and codebook[m][j]; candidate distance = sum of M
    lookups (np.take, vectorized). Local top-k per Arrow batch, then
    one window over the bounded candidate set. Distances are rounded
    to DIST_DECIMALS with -0.0 folded, ranks tie-break on id — the
    engine-wide determinism contract.
    """
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, kk_, sub = books.shape
    qids = [q[0] for q in queries]
    qmat = np.asarray([q[1] for q in queries], dtype=np.float64)
    # (nq, m, k) LUTs, built once on the driver (tiny) and shipped in
    # the task closure like the IVF centroid matrices
    luts = np.empty((len(qids), m, kk_), dtype=np.float64)
    for j in range(len(qids)):
        for mi in range(m):
            diff = books[mi] - qmat[j, mi * sub : (mi + 1) * sub][None, :]
            luts[j, mi] = (diff * diff).sum(axis=1)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy()
            if ids.dtype == object:
                ids = ids.astype(str)
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            rows = []
            for j, qid in enumerate(qids):
                # d[i] = sum_m LUT[j, m, codes[i, m]]
                d = np.zeros(len(ids), dtype=np.float64)
                for mi in range(m):
                    d += luts[j, mi][codes[:, mi]]
                d = np.round(d, DIST_DECIMALS) + 0.0
                kk = min(k, len(ids))
                sel = np.lexsort((ids, d))[:kk]
                rows.append(
                    pd.DataFrame(
                        {"query_id": qid, "id": ids[sel], "adc_dist": d[sel]}
                    )
                )
            if rows:
                yield pd.concat(rows, ignore_index=True)

    cands = codes.mapInPandas(
        score, schema=f"query_id long, id {id_type}, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("id").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"),
                "id", "adc_dist")
    )


def pq_topk_rescored(
    items: DataFrame,
    codebooks,
    queries: Sequence[tuple],
    k: int = 10,
    oversample: int = 4,
    item_id: str = "vec_id",
    item_emb: str = "embedding",
    id_type: str = "long",
) -> DataFrame:
    """Production PQ search: ADC retrieves k*oversample candidates,
    an id-join against the raw vectors re-scores them with the EXACT
    squared-L2 (same rounded doubles as the exact KNN path), and the
    final top-k ranks on exact distances.

    Scale shape: the candidate set is |queries| x k x oversample rows
    — the only thing joined back against the corpus (a semi-join-sized
    probe of the id index / bucketed layout at 100 TB), so the raw
    vectors of non-candidates are never read twice.
    """
    from chroma_rs_spark.functions.vector import l2_distance, vector_lit_sql

    if not queries:
        raise ValueError("pq_topk_rescored: queries must be non-empty")
    cand = pq_adc_topk(
        pq_encode(items, codebooks, item_id, item_emb, id_type=id_type),
        codebooks,
        queries,
        k=int(k) * int(oversample),
        id_type=id_type,
    ).select(F.col("id").alias(item_id), "query_id")
    raw = items.select(item_id, item_emb)
    joined = cand.join(raw, item_id)
    exact = None
    for qid, qv in queries:
        d = F.round(
            l2_distance(f"`{item_emb}`", vector_lit_sql(qv)), DIST_DECIMALS
        ) + F.lit(0.0)
        cond = F.col("query_id") == F.lit(qid)
        exact = F.when(cond, d) if exact is None else exact.when(cond, d)
    scored = joined.select(
        "query_id", F.col(item_id).alias("id"), exact.alias("distance")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"),
                "id", "distance")
    )


def train_pq_codebooks_df(
    items: DataFrame,
    m: int = 8,
    k: int = 16,
    max_iter: int = 10,
    sample_size: int = 4096,
    item_id: str = "vec_id",
    item_emb: str = "embedding",
    dim: int | None = None,
):
    """Oracle-REPLAYABLE PQ training: Lloyd's per subspace as ONE fused
    grouped loop — the knn_ivf_trained discipline (micro-unit
    fixed-point centroid sums, in-order round-6 fold distances,
    lower-label tie-breaks, fixpoint early stop that an unrolled
    replay always equals) applied with (mi, label) compound keys, so
    all m subspaces train together in one Spark job per iteration
    instead of m independent loops.

    Numeric contract (every rounding decision happens in Spark with
    the exact expressions the SQL oracle mirrors):
    * sample = the `sample_size` ids with the smallest (md5(id), id)
      — uniform, engine-independent (same rule as train_pq_codebooks);
    * seeds per subspace = the first k sample rows in that order;
      seed centroid component = round(val * 1e6) / 1e6;
    * E-step distance = in-order fold of (sv[i]-cvec[i])^2, round-6,
      -0.0 folded, ties to the LOWER label;
    * M-step mean = exact integer micro-unit sum (decimal(38,0) /
      HUGEINT in the oracle) with half-away-from-zero integer
      division — the label_centroids formula.

    Returns a dense numpy (m, k, sub) array; raises if any subspace
    lost a cluster during training (the dense-codebook contract the
    ADC search needs — lower k or dedup the input). Unlike the numpy
    `train_pq_codebooks` (float64 means, BLAS expansion distances —
    NOT SQL-replayable), this artifact supports a full DuckDB oracle
    over the trained search chain.
    """
    import numpy as np

    from chroma_rs_spark.operators.centroids import MICRO

    spark = items.sparkSession
    if dim is None:
        probe = (
            items.filter(F.col(item_emb).isNotNull())
            .select(F.size(item_emb))
            .first()
        )
        if probe is None:
            raise ValueError("train_pq_codebooks_df: no vectors to train on")
        dim = int(probe[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    sample = (
        items.filter(
            F.col(item_emb).isNotNull() & (F.size(item_emb) == dim)
        )
        .select(
            F.col(item_id).alias("_id"),
            F.col(item_emb).cast("array<double>").alias("_e"),
        )
        .orderBy(F.md5(F.col("_id").cast("string")), "_id")
        .limit(int(sample_size))
    )
    # the (row, subspace) training relation, materialized once for the
    # whole loop (<= sample_size * m small rows)
    subr = sample.selectExpr(
        "_id", _subspace_sql("_e", m, sub)
    ).localCheckpoint()

    # seeds: label = rank in (md5, id) order (array_sort trick — no
    # window); initial centroids = micro-rounded seed components via
    # the SAME M-step aggregation with n = 1 per group
    seeded = (
        sample.limit(k)
        .groupBy()
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.md5(F.col("_id").cast("string")).alias("h"),
                        F.col("_id").alias("i"),
                        F.col("_e").alias("v"),
                    )
                )
            ).alias("xs")
        )
        .select(F.posexplode("xs").alias("label", "_x"))
        .select("label", F.col("_x.v").alias("_v"))
        .selectExpr("label", _subspace_sql("_v", m, sub))
    )
    micro = F.round(F.col("_val").cast("double") * F.lit(MICRO)).cast(
        "decimal(38,0)"
    )

    def _mstep_rows(assigned):
        return (
            assigned.select(
                "mi", "label", F.posexplode("sv").alias("pos", "_val")
            )
            .groupBy("mi", "label", "pos")
            .agg(F.sum(micro).alias("_s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )

    def _update(rows):
        st = []
        for r in rows:
            s_int, n = int(r["_s"]), int(r["n"])
            q = (2 * abs(s_int) + n) // (2 * n)
            c = float(-q if s_int < 0 else q) / MICRO + 0.0
            st.append((int(r["mi"]), int(r["label"]), int(r["pos"]), c))
        return sorted(st)

    state = _update(_mstep_rows(seeded))

    def _mats(st):
        by_key: dict[tuple[int, int], list[tuple[int, float]]] = {}
        for mi, lbl, pos, c in st:
            by_key.setdefault((mi, lbl), []).append((pos, c))
        return spark.createDataFrame(
            [
                (mi, lbl, [c for _p, c in sorted(pcs)])
                for (mi, lbl), pcs in sorted(by_key.items())
            ],
            "mi int, label int, cvec array<double>",
        )

    def _term(i):
        d = F.element_at(F.col("sv"), i) - F.element_at(F.col("cvec"), i)
        return d * d

    sq = _term(1)
    for i in range(2, sub + 1):
        sq = sq + _term(i)
    sqr = F.round(sq, 6) + F.lit(0.0)

    prev_assign = None
    for _ in range(max_iter):
        scored = subr.join(F.broadcast(_mats(state)), "mi").select(
            "_id", "mi", "sv", "label", sqr.alias("_d")
        )
        best = scored.groupBy("_id", "mi").agg(
            F.min(F.struct("_d", "label")).alias("_b"),
            F.first("sv").alias("sv"),
        )
        rows = (
            best.select(
                "mi",
                F.col("_b.label").alias("label"),
                F.xxhash64("_id", "mi", F.col("_b.label")).alias("_hh"),
                "sv",
            )
            .select(
                "mi", "label", "_hh",
                F.posexplode("sv").alias("pos", "_val"),
            )
            .groupBy("mi", "label", "pos")
            .agg(
                F.sum(micro).alias("_s"),
                F.count(F.lit(1)).alias("n"),
                F.bit_xor("_hh").alias("_x"),
            )
            .collect()
        )
        sig = 0
        for r in rows:
            if int(r["pos"]) == 0:
                sig ^= int(r["_x"]) & ((1 << 64) - 1)
        if sig == prev_assign:
            break
        prev_assign = sig
        state = _update(rows)

    import numpy as _np

    books = _np.full((m, k, sub), _np.nan, dtype=_np.float64)
    for mi, lbl, pos, c in state:
        books[mi, lbl, pos] = c
    if _np.isnan(books).any():
        missing = sorted(
            {
                (mi, lbl)
                for mi in range(m)
                for lbl in range(k)
                if _np.isnan(books[mi, lbl]).any()
            }
        )
        raise ValueError(
            f"train_pq_codebooks_df: clusters emptied during training "
            f"(missing {missing[:4]}...); lower k or deduplicate input"
        )
    return books


def pq_topk_rescored_df(
    items: DataFrame,
    codebooks,
    probes: DataFrame,
    k: int = 10,
    oversample: int = 4,
    item_id: str = "vec_id",
    item_emb: str = "embedding",
    probe_id: str = "query_id",
    probe_emb: str = "query_embedding",
) -> DataFrame:
    """Production PQ search, end-to-end SQL-replayable: the DataFrame
    ADC chain (pq_adc_topk_df — packed codes, broadcast flat LUT,
    unrolled in-order folds) retrieves k*oversample candidates, the
    id-join against the raw vectors re-scores them with the exact
    round-6 squared L2, and the final top-k ranks on exact distances
    (ties to the lower id). With `codebooks` from
    train_pq_codebooks_df every stage — training included — replays
    in ANSI SQL, unlike pq_topk_rescored whose numpy ADC kernels use
    pairwise summation no SQL engine reproduces bitwise.

    Returns (probe_id, rank, neighbor_id, distance)."""
    from chroma_rs_spark.functions.vector import l2_distance

    cand = pq_adc_topk_df(
        items,
        codebooks,
        probes,
        k=int(k) * int(oversample),
        item_id=item_id,
        item_emb=item_emb,
        probe_id=probe_id,
        probe_emb=probe_emb,
    ).select(probe_id, "neighbor_id")
    raw = items.select(
        F.col(item_id).alias("neighbor_id"), F.col(item_emb).alias("_re")
    )
    pr = probes.select(probe_id, F.col(probe_emb).alias("_qe"))
    scored = (
        cand.join(raw, "neighbor_id")
        .join(F.broadcast(pr), probe_id)
        .select(
            probe_id,
            "neighbor_id",
            (F.round(l2_distance(F.col("_re"), F.col("_qe")), 6) + F.lit(0.0)).alias(
                "distance"
            ),
        )
    )
    w = Window.partitionBy(probe_id).orderBy(
        F.col("distance").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            probe_id,
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            "distance",
        )
    )


def hash_codebooks(m: int = 8, k: int = 16, sub: int = 8):
    """Data-INDEPENDENT deterministic PQ codebooks: component (mi, ci,
    pos) is derived from md5 of its coordinates — full-rank
    pseudo-random centroids reproducible from the formula alone, so an
    ANSI-SQL oracle can embed the identical literal doubles and replay
    the whole encode/ADC pipeline (suite/vector.py:pq_adc_topk). The
    TRAINED codebooks (train_pq_codebooks) stay the production path;
    these exist to make the ADC machinery itself hash-checkable."""
    import hashlib

    import numpy as np

    books = np.empty((m, k, sub), dtype=np.float64)
    for mi in range(m):
        for ci in range(k):
            for pos in range(sub):
                h = int(
                    hashlib.md5(f"{mi}:{ci}:{pos}".encode()).hexdigest()[:8],
                    16,
                )
                books[mi, ci, pos] = (h / 4294967296.0) * 2.0 - 1.0
    return books


def _subspace_sql(emb_col: str, m: int, sub: int) -> str:
    """inline() projection of a dim-(m*sub) array column into
    (mi, sv) subspace rows — shared by the encode and LUT stages."""
    return "inline(array({}))".format(
        ",".join(
            f"struct({mi} AS mi, slice(`{emb_col}`, {mi * sub + 1}, {sub})"
            " AS sv)"
            for mi in range(m)
        )
    )


_SUB_DIST_SQL = (
    "round(aggregate(transform(sequence(1, {sub}),"
    " i -> (element_at(sv, i) - element_at(cvec, i))"
    " * (element_at(sv, i) - element_at(cvec, i))),"
    " 0D, (a, x) -> a + x), {nd})"
)


def _codebook_df(spark, books) -> DataFrame:
    """(mi, ci, cvec): one row per codeword — the tiny broadcast
    relation the LUT stages join (m*k rows; the encode side uses
    codebook literals instead, see _code_col_sql)."""
    m, kk, _sub = books.shape
    return spark.createDataFrame(
        [
            (mi, ci, [float(x) for x in books[mi, ci]])
            for mi in range(m)
            for ci in range(kk)
        ],
        "mi INT, ci INT, cvec ARRAY<DOUBLE>",
    )


def _books_by_mi_df(spark, books) -> DataFrame:
    """One row PER SUBSPACE (mi, cb ARRAY<ARRAY<DOUBLE>>): the
    broadcast relation the shuffle-free encode joins — k centroids per
    row instead of _codebook_df's k rows per codeword, so the argmin
    runs as one per-row least() instead of a min-struct aggregate."""
    m, kk, _sub = books.shape
    return spark.createDataFrame(
        [
            (mi, [[float(x) for x in books[mi, ci]] for ci in range(kk)])
            for mi in range(m)
        ],
        "mi INT, cb ARRAY<ARRAY<DOUBLE>>",
    )


def _code_least_sql(kk: int, sub: int, nd: int) -> str:
    """Codeword argmin as ONE map-side expression — the assign_cells
    least-struct discipline applied to the encode stage. Evaluated per
    (row, subspace) after the inline() explode, against the joined
    per-subspace centroid list `cb`. Bit-identical doubles to the old
    broadcast-join + min-struct-aggregate form: per ci the squared
    terms accumulate left-to-right from 0D exactly like
    _SUB_DIST_SQL's in-order fold, the same round(, nd) lands before
    the argmin, and least() over (d, ci) structs breaks ties to the
    lower code like min(struct(_d, ci)).

    Sizing (hard-won, keep): the k*sub multiply-adds here (128 at the
    8x16 default) compile fine, but fusing all m subspaces into one
    projection — as array()/stack() of least()s over centroid
    LITERALS, whether as one expression or m separate columns — blows
    janino's method limit once whole-stage codegen pipelines the
    encode with the assign/residual stages into a single
    processNext(), and the silent interpreted fallback ran ~3x
    slower end to end. The per-subspace explode keeps every generated
    method small at the cost of an m-row Generate."""
    cands = []
    for ci in range(kk):
        acc = "0D"
        for i in range(sub):
            e = f"element_at(sv, {i + 1})"
            c = f"element_at(element_at(cb, {ci + 1}), {i + 1})"
            acc = f"({acc} + ({e} - {c}) * ({e} - {c}))"
        cands.append(f"struct(round({acc}, {nd}) AS d, {ci} AS c)")
    if len(cands) == 1:
        return f"{cands[0]}.c"
    return f"least({', '.join(cands)}).c"


def _codes_long(df: DataFrame, emb_col: str, books, nd: int) -> DataFrame:
    """Append (mi, code) rows per input row: inline the m (mi, sv)
    subspace slices (a map-side Generate — m small rows per vector,
    never m*k), broadcast-join the m-row per-subspace codebook
    relation, then one least-struct argmin per row. One shuffle-free
    codegen stage; all non-emb columns are carried through. Replaces
    the k-rows-per-codeword join + min-struct groupBy that shuffled
    |rows|*m*k exploded rows through an exchange."""
    m, kk, sub = books.shape
    carried = [f"`{c}`" for c in df.columns if c != emb_col]
    bmi = _books_by_mi_df(df.sparkSession, books)
    return (
        df.selectExpr(*carried, _subspace_sql(emb_col, m, sub))
        .join(F.broadcast(bmi), "mi")
        .selectExpr(
            *carried, "mi", f"{_code_least_sql(kk, sub, nd)} AS code"
        )
    )


def _collect_codes_array(long: DataFrame, keys: list[str]) -> DataFrame:
    """(keys..., codes ARRAY<INT>) from _codes_long rows — codes[i] is
    subspace i's codeword (array_sort over (mi, code) structs pins the
    order). One exchange of |rows|*m tiny int rows; the packed array
    is what makes ADC m lookups per candidate instead of an m-row join
    fan, so the search side never explodes codes again."""
    return (
        long.groupBy(*keys)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("mi", F.col("code").alias("c")))
                ),
                lambda s: s["c"],
            ).alias("codes")
        )
    )


def _lut_flat(lut: DataFrame, keys: list[str]) -> DataFrame:
    """Flatten long LUT rows (keys..., mi, code, _d) into ONE
    m*k-double array L per key group, ordered by (mi, code) so
    element_at(L, mi*k + code + 1) is subspace mi's distance for
    `code`. Tiny by contract: |probes| x n_probe groups."""
    return lut.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("mi", "code", "_d"))),
            lambda s: s["_d"],
        ).alias("L")
    )


def _adc_fold_sql(m: int, kk: int, nd: int) -> str:
    """The ADC distance as an unrolled in-order fold of m LUT lookups
    — element_at(L, mi*k + codes[mi] + 1) accumulated left-to-right
    from 0D, round(nd) + 0.0 exactly like the aggregate() fold over
    the mi-sorted collect_list it replaces (same addition order, same
    doubles), but as one codegen expression per candidate row with no
    groupBy behind it."""
    acc = "0D"
    for mi in range(m):
        acc = (
            f"({acc} + element_at(L,"
            f" {mi * kk} + element_at(codes, {mi + 1}) + 1))"
        )
    return f"round({acc}, {nd}) + 0.0D"


def pq_codes_df(
    items: DataFrame,
    codebooks,
    item_id: str = "vec_id",
    item_emb: str = "embedding",
    bdf: DataFrame | None = None,
) -> DataFrame:
    """(_vid, mi, code): the DataFrame-native encode stage of
    `pq_adc_topk_df`, exposed so tests can pin its code assignments
    directly against the numpy `pq_encode` kernel. One shuffle-free
    codegen stage (_codes_long): inline to (row, mi) rows, broadcast
    per-subspace codebooks, per-row least-struct argmin — the old
    k-rows join + min-struct groupBy shuffled |rows|*m*k rows."""
    import numpy as np

    books = np.asarray(codebooks, dtype=np.float64)
    m, _kk, sub = books.shape
    dim = m * sub
    it = items.filter(
        F.col(item_emb).isNotNull() & (F.size(item_emb) == dim)
    ).select(F.col(item_id).alias("_vid"), F.col(item_emb).alias("_e"))
    return _codes_long(it, "_e", books, DIST_DECIMALS)


def pq_adc_topk_df(
    items: DataFrame,
    codebooks,
    probes: DataFrame,
    k: int = 10,
    item_id: str = "vec_id",
    item_emb: str = "embedding",
    probe_id: str = "query_id",
    probe_emb: str = "query_embedding",
) -> DataFrame:
    """(query_id, rank, neighbor_id, adc_dist): PQ encode + ADC top-k
    expressed ENTIRELY in DataFrame operators — the oracle-checkable
    twin of pq_encode + pq_adc_topk (whose numpy kernels use pairwise
    summation a SQL engine cannot replay bitwise).

    Every float reduction is an IN-ORDER left fold over a
    deterministically ordered list (the bm25/centroid discipline):
    subspace distances fold positions 1..sub left-to-right and are
    rounded to DIST_DECIMALS before the (dist, code) argmin; the ADC
    sum folds the m per-subspace LUT entries in subspace order and is
    rounded again with -0.0 folded. Parity of this plan with the numpy
    production path on the same codebooks is pinned by
    tests/test_pq.py.

    Scale shape: the per-subspace codebook relation is broadcast to
    both the encode join and the LUT join; the encode argmin is one
    map-side least-struct per (row, subspace); codes are packed into
    an m-int array per candidate (one tiny-row exchange) and the ADC
    distance is an unrolled m-lookup codegen fold against the
    broadcast per-query flat LUT — each candidate row is touched
    exactly once, no per-candidate join fan, no aggregate behind the
    distance; the final top-k is a bounded per-query window. No
    driver collect of corpus data.
    """
    import numpy as np

    books = np.asarray(codebooks, dtype=np.float64)
    m, kk, sub = books.shape
    dim = m * sub
    bdf = _codebook_df(items.sparkSession, books)
    dist_expr = _SUB_DIST_SQL.format(sub=sub, nd=DIST_DECIMALS)
    codes = _collect_codes_array(
        pq_codes_df(items, books, item_id=item_id, item_emb=item_emb),
        ["_vid"],
    )
    pr = probes.filter(
        F.col(probe_emb).isNotNull() & (F.size(probe_emb) == dim)
    ).selectExpr(f"`{probe_id}` AS _qid", _subspace_sql(probe_emb, m, sub))
    lut = (
        pr.join(F.broadcast(bdf), "mi")
        .withColumn("_d", F.expr(dist_expr))
        .select("_qid", "mi", F.col("ci").alias("code"), "_d")
    )
    adc = codes.crossJoin(F.broadcast(_lut_flat(lut, ["_qid"]))).selectExpr(
        "_qid",
        "_vid",
        f"{_adc_fold_sql(m, kk, DIST_DECIMALS)} AS adc_dist",
    )
    wq = Window.partitionBy("_qid").orderBy(
        F.col("adc_dist").asc(), F.col("_vid").asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(probe_id),
            F.col("rank").cast("long").alias("rank"),
            F.col("_vid").alias("neighbor_id"),
            "adc_dist",
        )
    )


# Above this many interpreted flops per row (|cells| x dim for the
# assignment's HOF dot products), the SQL-expression encode gear is
# dominated by lambda-interpretation overhead and the Arrow gear takes
# over. 16 cells x 64 dims = 1024 (every oracle-checked config) stays
# SQL; the 64-cell scale configs (4096) go Arrow. Round-12 scale-proof
# measurement behind the constant: materializing 409.6k codes took
# 136 s through the HOF expression vs ~8 s through numpy.
ARROW_ENCODE_THRESHOLD = 2048


def _ivfpq_codes_arrow(
    items: DataFrame,
    books,
    cent_mat,
    cent_ids,
    item_id: str,
    item_emb: str,
) -> DataFrame:
    """Arrow-batch encode gear: numpy matmul assignment + per-subspace
    argmin over a broadcast codebook, one mapInPandas pass. Argmins
    run on UNROUNDED float64 (np.argmin takes the first minimum, and
    centroid/code columns are ordered by ascending id, so exact ties
    break low — the SQL gear's convention); the SQL gear argmins over
    round-6 distances, so assignments may differ within a 1e-6 tie
    window. Recall-neutral by construction: returned distances always
    come from the exact rescore, never from codes."""
    import numpy as np

    m, _kk, sub = books.shape
    dim = m * sub
    id_type = dict(items.dtypes)[item_id]
    b_books = books.copy()
    b_cents = np.asarray(cent_mat, dtype=np.float64)
    b_cids = np.asarray(cent_ids, dtype=np.int64)
    cnorm = np.sqrt((b_cents * b_cents).sum(axis=1))

    def encode(batches: "object") -> "object":
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = _np.asarray(
                [_np.asarray(e, dtype=_np.float64) for e in pdf[item_emb]]
            )
            xnorm = _np.sqrt((x * x).sum(axis=1))
            ok = xnorm != 0.0
            x, ids, xnorm = x[ok], pdf[item_id].to_numpy()[ok], xnorm[ok]
            if not len(x):
                continue
            d = 1.0 - (x @ b_cents.T) / (xnorm[:, None] * cnorm[None, :])
            pick = _np.argmin(d, axis=1)
            cells = b_cids[pick]
            resid = x - b_cents[pick]
            codes = _np.empty((len(x), m), dtype=_np.int32)
            for mi in range(m):
                r = resid[:, mi * sub : (mi + 1) * sub]
                c = b_books[mi]  # (k, sub)
                dd = ((r[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                codes[:, mi] = _np.argmin(dd, axis=1)
            yield _pd.DataFrame(
                {
                    item_id: ids,
                    "cell": cells.astype("int32"),
                    "codes": [row.tolist() for row in codes],
                }
            )

    return items.select(item_id, item_emb).mapInPandas(
        encode,
        schema=f"{item_id} {id_type}, cell int, codes array<int>",
    )


def ivfpq_codes_df(
    items: DataFrame,
    codebooks,
    centroids: list[tuple[int, list[float]]],
    item_id: str = "vec_id",
    item_emb: str = "embedding",
    bdf: DataFrame | None = None,
    cent_df: DataFrame | None = None,
) -> DataFrame:
    """(item_id, cell, codes ARRAY<INT>): the composite index's encode
    stage — cosine cell assignment (map-side least-struct over centroid
    literals), residual subtraction against the broadcast centroid
    relation, the shuffle-free per-subspace argmin (_codes_long), then
    one tiny-row exchange packing codes[i] = subspace i's codeword
    (_collect_codes_array). This is the materializable scan tier:
    persisted, a query reads m bytes per candidate instead of raw
    vectors. Zero-norm/NULL/wrong-dim vectors are unscorable under the
    cosine quantizer and are dropped.

    Two physical gears, one logical op: below ARROW_ENCODE_THRESHOLD
    interpreted flops per row the SQL-expression pipeline runs (fully
    oracle-replayable — every driver row lives here); above it the
    Arrow gear (_ivfpq_codes_arrow) does the same math as numpy
    matmuls — the round-12 scale proof measured the HOF expression at
    17x the Arrow wall on a 409.6k x 64-cell encode."""
    import numpy as np

    from chroma_rs_spark.operators.ivf import assign_cells

    books = np.asarray(codebooks, dtype=np.float64)
    m, _kk, sub = books.shape
    dim = m * sub
    spark = items.sparkSession
    scorable = items.filter(
        F.col(item_emb).isNotNull() & (F.size(item_emb) == dim)
    )
    if len(centroids) * dim > ARROW_ENCODE_THRESHOLD:
        order = sorted(range(len(centroids)), key=lambda i: centroids[i][0])
        return _ivfpq_codes_arrow(
            scorable,
            books,
            [centroids[i][1] for i in order],
            [centroids[i][0] for i in order],
            item_id,
            item_emb,
        )
    if cent_df is None:
        cent_df = spark.createDataFrame(
            [(int(cid), [float(x) for x in vec]) for cid, vec in centroids],
            "cell INT, cvec ARRAY<DOUBLE>",
        )
    assigned = assign_cells(scorable, centroids, item_emb=item_emb).select(
        F.col(item_id).alias("_vid"),
        F.col(item_emb).cast("array<double>").alias("_e"),
        F.col("cell").cast("int").alias("cell"),
    )
    resid = assigned.join(F.broadcast(cent_df), "cell").select(
        "_vid",
        "cell",
        F.expr("zip_with(_e, cvec, (x, y) -> x - y)").alias("_r"),
    )
    long = _codes_long(resid, "_r", books, DIST_DECIMALS)
    return _collect_codes_array(long, ["_vid", "cell"]).select(
        F.col("_vid").alias(item_id), "cell", "codes"
    )


def ivfpq_probe_cells(
    probes: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n_probe: int = 4,
    dim: int | None = None,
    probe_id: str = "query_id",
    probe_emb: str = "query_embedding",
    cent_df: DataFrame | None = None,
) -> DataFrame:
    """(_qid, cell, _qr): each query's `n_probe` nearest cells by
    rounded cosine (ties to the lower cell id — the oracle's ROW_NUMBER
    contract) with the per-cell query residual. |queries| x |cells| is
    tiny; both relations broadcast. Factored out of ivfpq_adc_topk_df
    so a caller holding a cell-partitioned materialized code tier can
    collect the probed cell ids (n_queries x n_probe ints) and push an
    isin() partition-pruning filter into the code scan before a byte
    of codes is read. Zero-norm / NULL / wrong-dim probes drop."""
    from chroma_rs_spark.functions.vector import dot_product_sql, l2_norm_sql

    pr = probes
    if dim is not None:
        pr = pr.filter(
            F.col(probe_emb).isNotNull() & (F.size(probe_emb) == dim)
        )
    else:
        pr = pr.filter(F.col(probe_emb).isNotNull())
    pr = pr.select(
        F.col(probe_id).alias("_qid"),
        F.col(probe_emb).cast("array<double>").alias("_qe"),
    )
    if cent_df is None:
        cent_df = pr.sparkSession.createDataFrame(
            [(int(cid), [float(x) for x in vec]) for cid, vec in centroids],
            "cell INT, cvec ARRAY<DOUBLE>",
        )
    qnorm = pr.withColumn(
        "_qnorm", F.expr(l2_norm_sql("_qe"))
    ).filter(F.col("_qnorm") != F.lit(0.0))
    qc = qnorm.crossJoin(F.broadcast(cent_df)).withColumn(
        "_cd",
        F.expr(
            f"round(1.0D - {dot_product_sql('_qe', 'cvec')}"
            f" / (_qnorm * {l2_norm_sql('cvec')}),"
            f" {DIST_DECIMALS}) + 0.0D"
        ),
    )
    wp = Window.partitionBy("_qid").orderBy(
        F.col("_cd").asc(), F.col("cell").asc()
    )
    return (
        qc.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= n_probe)
        .select(
            "_qid",
            "cell",
            F.expr("zip_with(_qe, cvec, (x, y) -> x - y)").alias("_qr"),
        )
    )


def ivfpq_adc_topk_df(
    items: DataFrame,
    codebooks,
    centroids: list[tuple[int, list[float]]],
    n_probe: int = 4,
    k: int = 10,
    probes: DataFrame | None = None,
    item_id: str = "vec_id",
    item_emb: str = "embedding",
    probe_id: str = "query_id",
    probe_emb: str = "query_embedding",
    codes: DataFrame | None = None,
    probed: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the composite Faiss index
    (Jégou et al. TPAMI 2011 §IV; the `IndexIVFPQ` everyone runs at
    billion scale): a coarse quantizer routes each vector to its
    nearest centroid cell, PQ encodes the RESIDUAL (vector − cell
    centroid) rather than the raw vector — residuals concentrate near
    the origin, so the same codebook budget spends its resolution
    where the data actually lives — and a query scans only its
    `n_probe` nearest cells with a PER-CELL ADC lookup table built
    from the query's residual against that cell.

    Returns (query_id, rank, neighbor_id, cell, adc_dist).

    Why this matters at 100 TB: IVF alone still reads raw vectors in
    the probed cells (256 B/vector at dim=64 float32); PQ alone scans
    every code. IVF-PQ reads codes only (m bytes/vector), only in the
    probed cells — |corpus| × n_probe/n_cells × m bytes per query.

    Physical shape (all DataFrame, oracle-replayable):
    * cell assignment: one map-side `least(struct(...))` expression
      over broadcast centroid literals (operators/ivf.py:assign_cells)
      — no shuffle;
    * residuals: broadcast join on the ≤|cells| centroid relation,
      `zip_with` subtract (exact binary doubles both engines share);
    * encode: per-subspace least-struct argmin (_codes_long, one
      shuffle-free codegen stage), packed to an m-int array per
      candidate by one tiny-row exchange (ivfpq_codes_df — the same
      relation the persisted tier stores);
    * search: the LUT is flattened to ONE m*k-double array per
      (query, probed cell) and broadcast; candidates join on `cell`
      only, so each probed-cell code row is touched exactly once and
      its ADC distance is an unrolled m-lookup in-order fold
      (round-6 + -0.0, the bm25 discipline — _adc_fold_sql) inside
      codegen; the final top-k is one bounded per-query window.

    Determinism contract: `centroids` is a driver-tiny list (the
    persisted index artifact; lowest-id placeholder or trained
    k-means — same as ivf_topk), codebooks may be `hash_codebooks`
    (data-independent md5 literals) for full SQL replay or trained.
    Zero-norm and NULL embeddings are unscorable under the cosine
    coarse quantizer and are dropped on both the item and probe side
    (the ann_recall universe rule).

    `codes`: optional precomputed `ivfpq_codes_df` output (the
    materialized 100 TB scan tier — id, cell, codes ARRAY<INT>);
    when given, the assignment+encode stages are skipped entirely and
    the search reads m bytes per candidate instead of raw vectors.
    """
    import numpy as np

    books = np.asarray(codebooks, dtype=np.float64)
    m, kk, sub = books.shape
    dim = m * sub
    spark = items.sparkSession
    bdf = _codebook_df(spark, books)
    cent_df = spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in centroids],
        "cell INT, cvec ARRAY<DOUBLE>",
    )
    dist_expr = _SUB_DIST_SQL.format(sub=sub, nd=DIST_DECIMALS)

    if codes is None:
        codes = ivfpq_codes_df(
            items, books, centroids, item_id=item_id, item_emb=item_emb,
            cent_df=cent_df,
        )
    codes = codes.select(
        F.col(item_id).alias("_vid"),
        F.col("cell").cast("int").alias("cell"),
        "codes",
    )

    if probes is None:
        raise ValueError("ivfpq_adc_topk_df: probes DataFrame required")
    if probed is None:
        # `probed`: optional precomputed ivfpq_probe_cells output
        # (_qid, cell, _qr). A caller that already collected the probe
        # assignment to build a partition-pruning isin() over the code
        # tier (q_ivfpq_topk's shape) passes the same rows back here
        # instead of paying the |queries| x |cells| assignment branch
        # a second time in-plan (round 13). Doubles round-trip the
        # collect/createDataFrame boundary bit-exactly, so the LUT is
        # identical either way.
        probed = ivfpq_probe_cells(
            probes,
            centroids,
            n_probe=n_probe,
            dim=dim,
            probe_id=probe_id,
            probe_emb=probe_emb,
            cent_df=cent_df,
        )
    lut = (
        probed.selectExpr("_qid", "cell", _subspace_sql("_qr", m, sub))
        .join(F.broadcast(bdf), "mi")
        .withColumn("_d", F.expr(dist_expr))
        .select("_qid", "cell", "mi", F.col("ci").alias("code"), "_d")
    )
    # codes stay PACKED: the broadcast join on cell already restricts
    # the scan to probed-cell candidates, and the ADC distance is an
    # unrolled m-lookup codegen fold per candidate row — no m-way
    # explode of the code tier, no collect_list aggregate behind the
    # distance (same in-order doubles; _adc_fold_sql).
    adc = codes.join(
        F.broadcast(_lut_flat(lut, ["_qid", "cell"])), "cell"
    ).selectExpr(
        "_qid",
        "_vid",
        "cell",
        f"{_adc_fold_sql(m, kk, DIST_DECIMALS)} AS adc_dist",
    )
    wq = Window.partitionBy("_qid").orderBy(
        F.col("adc_dist").asc(), F.col("_vid").asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(probe_id),
            F.col("rank").cast("long").alias("rank"),
            F.col("_vid").alias("neighbor_id"),
            F.col("cell").cast("int").alias("cell"),
            "adc_dist",
        )
    )
