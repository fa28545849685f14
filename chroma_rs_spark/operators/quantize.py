"""Scalar (int8) embedding quantization (SURVEY.md §2.3 [EXT]
similarity-search support — the storage/bandwidth lever of a 100 TB
vector corpus: 4x smaller vectors, 4x more of the collection in
executor memory per KNN pass).

Symmetric per-vector quantization: scale = max|v|/127,
q_i = floor(v_i/scale + 0.5) (explicit round-half-up — spelled as
floor(x+0.5) so every engine computes the identical integer; bare
`round` differs across engines on .5 ties and numpy rounds half-even).

All JVM-side HOF expressions, staged so each is O(dim) per row:
`scale` and `q_embedding` are materialized as named columns in their
own projections before the lambdas that consume them. Composing the
raw Column objects instead would embed the array-max subtree inside
every per-element lambda — O(dim^2) interpreted ops per row (HOF
lambdas are not whole-stage-codegen'd) — and Catalyst has no
cross-lambda common-subexpression elimination to undo that.
CollapseProject keeps the staging: it does not re-inline a non-cheap
alias referenced more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_MAX = 127  # int8 symmetric range


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Quantize + report: (id, scale, quantized array, reconstruction
    error). `recon_err` is the l2 distance between the original vector
    and its dequantized form — the quality metric a pipeline would
    monitor before switching KNN to the compact representation."""
    embd = F.col(emb_col).cast("array<double>")
    staged = df.select(
        F.col(id_col),
        embd.alias("_embd"),
        (F.array_max(F.transform(embd, F.abs)) / float(QUANT_MAX)).alias("scale"),
    )
    scale = F.col("scale")
    # all-zero vector -> scale 0: quantize to zeros instead of x/0 NaN
    qv = F.transform(
        F.col("_embd"),
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.floor(x / scale + 0.5).cast("int"))
        .cast("int"),
    )
    staged = staged.select(F.col(id_col), "_embd", scale, qv.alias("q_embedding"))
    recon = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("_embd"),
                F.col("q_embedding"),
                lambda v, q: (v - q.cast("double") * scale) ** 2,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return staged.select(
        F.col(id_col), scale, F.col("q_embedding"), recon.alias("recon_err")
    )


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, projected ARRAY<DOUBLE>): deterministic sparse random
    projection — the Johnson-Lindenstrauss dimensionality reducer in
    Achlioptas' database-friendly form (Achlioptas, JCSS 2003:
    entries drawn from {+1, 0, -1} with probabilities {1/6, 2/3, 1/6},
    scaled by sqrt(3/out_dim), preserve pairwise distances in
    expectation like the Gaussian matrix at a third of the work).

    The projection matrix is DERIVED, not stored: entry (j, i) comes
    from md5(f"rp:{j}:{i}") reduced mod 6 (0 -> +1, 1 -> -1, else 0) —
    the same engine-portable hash family as the minhash parameters, so
    a SQL oracle regenerates the identical matrix and the artifact
    needs no persistence or broadcast. Each output component is a
    LEFT-ASSOCIATED sum over input positions in order (the engine's
    float-order discipline) with -0.0 folded — NOT rounded: the
    pipeline is pure +/-/x (no libm), so the doubles are bit-identical
    across engines as-is, and a round-6 would only introduce
    decimal-repr boundary divergence.

    Use: a 64-dim corpus projects to out_dim doubles for a cheap
    pre-filter pass (bucket or score in the sketch space, exact-rescore
    survivors in the original space — the same two-stage recall pattern
    as PQ's ADC + rescore). NULL or wrong-dimension embeddings keep
    their row with a NULL projection (the engine's unscorable-row
    convention).
    """
    import math

    from chroma_rs_spark.plans.partitioning import fan_out

    # NULL / wrong-dimension rows keep their row with NULL projection —
    # the engine's unscorable convention (char_entropy, lm_perplexity,
    # duplicate_span_stats all preserve rows the same way).
    #
    # Each component is a zip_with(signs) + in-order aggregate fold,
    # NOT the unrolled out_dim x in_dim literal sum the oracle replays:
    # the unrolled tree blows past whole-stage-codegen's method limits
    # and falls back to interpreted eval (measured 2x slower — the same
    # codegen-limit lesson as the PQ literal-inlining negative result).
    # Bit-equality with the oracle's skip-zero literal sums holds: the
    # only extra terms are x*0 products (+/-0.0), and IEEE v + (+/-0.0)
    # == v for every v except a sign flip on an exactly-zero
    # accumulator, which the final `+ 0.0D` fold washes either way.
    scale = math.sqrt(3.0 / out_dim)
    comps = []
    for j in range(out_dim):
        signs = ", ".join(
            str(projection_sign(j, i)) for i in range(in_dim)
        )
        comps.append(
            f"(aggregate(zip_with(_e, array({signs}),"
            " (x, s) -> x * CAST(s AS DOUBLE)),"
            f" 0.0D, (a, x) -> a + x) * {scale!r}D) + 0.0D"
        )
    # unconditional fan-out (min_bytes=0): out_dim x in_dim arithmetic
    # terms per ROW make this ~1000x more CPU per scan byte than a
    # scan-bound query, so the tiny-input repartition always pays for
    # itself (measured 1.05 s -> parallel at sf0.1's single 780 KB
    # file); once the scan has >= cores partitions it is a no-op
    return fan_out(
        df.select(
            F.col(id_col),
            # sum over the DOUBLE-cast array: float32 elements would
            # otherwise accumulate in float32 on this side while a SQL
            # oracle casting to DOUBLE[] first accumulates in double
            F.col(emb_col).cast("array<double>").alias("_e"),
        ),
        min_bytes=0,
    ).selectExpr(
        f"`{id_col}`",
        f"CASE WHEN _e IS NULL OR size(_e) != {in_dim} THEN NULL"
        " ELSE array({}) END AS projected".format(
            ", ".join(comps)
        ),
    )


def projection_sign(j: int, i: int) -> int:
    """Achlioptas matrix entry (j, i) from md5 of its coordinates:
    0 -> +1, 1 -> -1, else 0 (probabilities 1/6, 1/6, 2/3). ONE
    definition shared by the operator and its SQL oracle (the
    minhash_params single-source-of-truth convention)."""
    import hashlib

    h = int(hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()[:8], 16) % 6
    return 1 if h == 0 else (-1 if h == 1 else 0)


def projection_sums(out_dim: int, in_dim: int, elem) -> list:
    """[(left-associated ± term expression, scale)] per output
    component, with `elem(i)` formatting the i-th input element — the
    shared expression builder for the Spark plan and the DuckDB oracle
    (identical term order and association on both sides)."""
    scale = (3.0 / out_dim) ** 0.5
    out = []
    for j in range(out_dim):
        terms = [
            f"{'+' if s > 0 else '-'} {elem(i)}"
            for i, s in ((i, projection_sign(j, i)) for i in range(in_dim))
            if s != 0
        ]
        if terms:
            # first term keeps a unary minus, drops a leading plus
            first = terms[0][2:] if terms[0].startswith("+ ") else terms[0]
            out.append((" ".join([first] + terms[1:]), scale))
        else:
            out.append(("0.0", scale))
    return out
