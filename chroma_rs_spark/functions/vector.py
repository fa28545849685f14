"""Vector distance expressions as pure Column functions.

These implement the three distance metrics of the Chroma API's
`hnsw:space` collection option — l2 / ip / cosine (SURVEY.md §2.2
A9-A11; the option itself is representable in the reference's
create-collection metadata map, reference src/client.rs:97).

Everything here is JVM-side — no Python in the hot path, no
serialization boundary. Elements are cast to double *before*
multiplying, and accumulated strictly left-to-right, which makes the
result bit-reproducible and matchable against an ANSI-SQL oracle doing
the same sequential math.

Two formulations, same bits:

* generic (dim unknown): higher-order functions (`zip_with` +
  `aggregate`). Correct for any length; HOF lambdas are
  CodegenFallback, so each element evaluates interpreted.
* unrolled (`dim=` given): a fixed chain of `a[i]*b[i]` terms folded
  left-to-right — ordinary expressions inside the whole-stage-codegen
  loop. The association order is identical to the sequential HOF fold,
  so the resulting double is bit-identical.

Measured tradeoff (local[32], dim=64): the unrolled form's win is
per-ROW execution cost, but its ~200-node tree costs more per ACTION —
every DataFrame action re-runs the optimizer and regenerates codegen
source over the big tree (~0.2 s at dim=64 vs ~0.02 s for the compact
HOF tree, plus a one-time ~2 s Janino compile). So the unrolled path
pays off when partitions are large (millions of pairs per action —
the collection-API / cluster regime, where per-row interpretation
dominates), while small interactive queries are faster with the HOF
form. The suite queries (2k-row embeddings at sf0.1) therefore keep
dim=None; `collection.query()` passes the registered dim.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def vector_lit(vec: Sequence[float]) -> Column:
    """A literal ARRAY<DOUBLE> column from a Python vector."""
    return F.array(*[F.lit(float(v)) for v in vec])


def _fold(terms: list[Column]) -> Column:
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def dot_product(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sum_i a[i]*b[i] in double precision, sequential accumulation.

    With `dim`, unrolls to codegen-friendly element terms (see module
    docstring); arrays shorter than dim yield NULL on both paths.
    """
    if dim is not None:
        return _fold(
            [
                F.element_at(a, i).cast("double")
                * F.element_at(b, i).cast("double")
                for i in range(1, dim + 1)
            ]
        )
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column, dim: int | None = None) -> Column:
    """Euclidean norm; precomputed at add-time as the 'index build'."""
    return F.sqrt(dot_product(a, a, dim))


def l2_distance(a: Column, b: Column, dim: int | None = None) -> Column:
    """Squared L2 distance (Chroma's `l2` space is squared L2)."""
    if dim is not None:
        def sq(i: int) -> Column:
            d = F.element_at(a, i).cast("double") - F.element_at(b, i).cast("double")
            return d ** 2

        return _fold([sq(i) for i in range(1, dim + 1)])
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def ip_distance(a: Column, b: Column, dim: int | None = None) -> Column:
    """Inner-product distance: 1 - <a, b>."""
    return F.lit(1.0) - dot_product(a, b, dim)


def cosine_distance(
    a: Column,
    b: Column,
    a_norm: Column | None = None,
    b_norm: Column | None = None,
    dim: int | None = None,
) -> Column:
    """Cosine distance: 1 - <a,b> / (|a|·|b|).

    Pass precomputed norms (stored columns) to skip recomputing them
    per candidate pair — that precomputation is the batch "vector
    index build" of BASELINE.md.
    """
    a_norm = a_norm if a_norm is not None else l2_norm(a, dim)
    b_norm = b_norm if b_norm is not None else l2_norm(b, dim)
    return F.lit(1.0) - dot_product(a, b, dim) / (a_norm * b_norm)
