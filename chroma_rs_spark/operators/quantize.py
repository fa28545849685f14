"""Scalar (int8) embedding quantization (SURVEY.md §2.3 [EXT]
similarity-search support — the storage/bandwidth lever of a 100 TB
vector corpus: 4x smaller vectors, 4x more of the collection in
executor memory per KNN pass).

Symmetric per-vector quantization: scale = max|v|/127,
q_i = floor(v_i/scale + 0.5) (explicit round-half-up — spelled as
floor(x+0.5) so every engine computes the identical integer; bare
`round` differs across engines on .5 ties and numpy rounds half-even).

All JVM-side HOF expressions. NB the `scale` subexpression is inlined
into the per-element lambdas by CollapseProject, so the array-max is
recomputed per element — O(dim^2) float ops per row, negligible next
to scan I/O for dim <= a few hundred; for very wide vectors move the
same math into an Arrow batch (`mapInPandas`) like knn_exact_local_topk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_MAX = 127  # int8 symmetric range


def quantize_cols(emb: Column) -> tuple[Column, Column]:
    """(scale, quantized int array) for one embedding column."""
    embd = emb.cast("array<double>")
    scale = F.array_max(F.transform(embd, F.abs)) / float(QUANT_MAX)
    # all-zero vector -> scale 0: quantize to zeros instead of x/0 NaN
    qv = F.transform(
        embd,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.floor(x / scale + 0.5).cast("int"))
        .cast("int"),
    )
    return scale, qv


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Quantize + report: (id, scale, quantized array, reconstruction
    error). `recon_err` is the l2 distance between the original vector
    and its dequantized form — the quality metric a pipeline would
    monitor before switching KNN to the compact representation."""
    embd = F.col(emb_col).cast("array<double>")
    scale, qv = quantize_cols(F.col(emb_col))
    recon = F.sqrt(
        F.aggregate(
            F.zip_with(embd, qv, lambda v, q: (v - q.cast("double") * scale) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        qv.alias("q_embedding"),
        recon.alias("recon_err"),
    )
