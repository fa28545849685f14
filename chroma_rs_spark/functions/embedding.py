"""Pluggable embedding functions (SURVEY.md §2.3 "UDF surface").

Chroma clients attach an `EmbeddingFunction` to a collection so `add`
can take raw documents and embed them client-side; our analogue is a
vectorized `pandas_udf` column factory: any callable
`list[str] -> np.ndarray[(n, dim)]` becomes an `array<float>` column
usable in `add_df`.

Real model inference (sentence-transformers etc.) is not available in
this container, so the default is `hash_embedding`: a deterministic
feature-hashing embedder (token md5 -> bucket, l2-normalized counts).
It is a real embedding in the IR sense (cosine similarity reflects
token overlap) and is engine-independent, so tests can assert exact
values. The integration point for a model is the same decorator with a
different `embed_batch`.

Scale: pandas_udf ships text to Python workers in Arrow batches —
one round trip per ~10k rows, vectorized numpy inside; this is the
sanctioned slow path (still ~10-100x faster than per-row Python UDFs)
and it runs fully parallel per partition.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def hash_embed_batch(texts, dim: int = 64):
    """Feature-hash each text into a unit-l2 `dim`-vector (numpy)."""
    import numpy as np

    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        for tok in (t or "").split(" "):
            if not tok:
                continue
            h = int.from_bytes(
                hashlib.md5(tok.encode()).digest()[:8], "big"
            )
            out[i, h % dim] += 1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


def embedding_udf(dim: int = 64, embed_batch=hash_embed_batch) -> Column:
    """Factory: a pandas_udf column function embedding a string column.

    >>> docs.withColumn("embedding", embedding_udf(64)(F.col("text")))
    """

    @pandas_udf("array<float>")
    def embed(texts: pd.Series) -> pd.Series:
        mat = embed_batch(texts.tolist(), dim)
        return pd.Series(list(mat))

    return embed


def embed_text(df, text_col: str = "text", out_col: str = "embedding", dim: int = 64):
    """Attach an embedding column to `df` (default hash embedder)."""
    return df.withColumn(out_col, embedding_udf(dim)(F.col(text_col)))


# ---------------------------------------------------------------------------
# Named embedder registry: Chroma clients attach an EmbeddingFunction
# OBJECT to a collection; a registry of NAMES is the engine-side
# analogue that survives the persisted collection metadata (strings
# only) — create a collection with {"embedding_function": "hash64"}
# and add(documents=...) / query(query_texts=...) resolve the same
# deterministic embedder on every session. "hash{dim}" is the built-in
# family; register_embedder() plugs a real model in under any name.
# ---------------------------------------------------------------------------

_EMBEDDERS: dict = {}


def register_embedder(name: str, embed_batch, dim: int) -> None:
    """Register `embed_batch: list[str] -> np.ndarray[(n, dim)]` under
    `name` for collections to reference in their metadata."""
    _EMBEDDERS[name] = (embed_batch, int(dim))


def resolve_embedder(name: str):
    """(embed_batch, dim) for a registered or built-in name.

    Built-ins: "hash{dim}" (e.g. hash64) — the deterministic
    feature-hashing embedder at that dimension. Unknown names raise
    KeyError with the registration hint.
    """
    if name in _EMBEDDERS:
        return _EMBEDDERS[name]
    if name.startswith("hash"):
        try:
            dim = int(name[4:])
        except ValueError:
            dim = -1
        if dim > 0:
            def batch(texts, _dim=dim):
                return hash_embed_batch(texts, _dim)

            return batch, dim
    raise KeyError(
        f"unknown embedding function {name!r}; use 'hash<dim>' or "
        "register_embedder(name, fn, dim)"
    )
