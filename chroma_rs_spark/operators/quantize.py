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
