"""Vector distance expressions as pure Column functions.

These implement the three distance metrics of the Chroma API's
`hnsw:space` collection option — l2 / ip / cosine (SURVEY.md §2.2
A9-A11; the option itself is representable in the reference's
create-collection metadata map, reference src/client.rs:97).

Everything here is built from higher-order functions
(`zip_with` + `aggregate`), so the whole distance computation stays
JVM-side inside whole-stage codegen — no Python in the hot path, no
serialization boundary. Elements are cast to double *before*
multiplying, and accumulated strictly left-to-right, which makes the
result bit-reproducible and matchable against an ANSI-SQL oracle doing
the same sequential math.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def vector_lit(vec: Sequence[float]) -> Column:
    """A literal ARRAY<DOUBLE> column from a Python vector."""
    return F.array(*[F.lit(float(v)) for v in vec])


def dot_product(a: Column, b: Column) -> Column:
    """Sum_i a[i]*b[i] in double precision, sequential accumulation."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    """Euclidean norm; precomputed at add-time as the 'index build'."""
    return F.sqrt(dot_product(a, a))


def l2_distance(a: Column, b: Column) -> Column:
    """Squared L2 distance (Chroma's `l2` space is squared L2)."""
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def ip_distance(a: Column, b: Column) -> Column:
    """Inner-product distance: 1 - <a, b>."""
    return F.lit(1.0) - dot_product(a, b)


def cosine_distance(
    a: Column,
    b: Column,
    a_norm: Column | None = None,
    b_norm: Column | None = None,
) -> Column:
    """Cosine distance: 1 - <a,b> / (|a|·|b|).

    Pass precomputed norms (stored columns) to skip recomputing them
    per candidate pair — that precomputation is the batch "vector
    index build" of BASELINE.md.
    """
    a_norm = a_norm if a_norm is not None else l2_norm(a)
    b_norm = b_norm if b_norm is not None else l2_norm(b)
    return F.lit(1.0) - dot_product(a, b) / (a_norm * b_norm)
