"""chroma_rs_spark — a PySpark-native vector analytics engine.

Re-realizes the capabilities of the `chroma-rs` reference client
(collection management, vector similarity search, metadata filtering —
see SURVEY.md) as idiomatic Spark DataFrame / SQL / Structured
Streaming, extended with LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Design point: 100 TB batch on a multi-executor cluster. Everything is
declared as DataFrame logical plans so Catalyst handles pushdown,
pruning, join strategy and AQE; Python UDFs appear only where built-in
operators cannot express the semantics (and then always Arrow-batched).
"""

__version__ = "0.1.0"

from chroma_rs_spark.errors import (
    CollectionExistsError,
    CollectionNotFoundError,
    DimensionMismatchError,
    DuplicateIDError,
    EngineError,
    IDNotFoundError,
    InvalidFilterError,
    ResetDisabledError,
)
from chroma_rs_spark.catalog import Collection, Engine
from chroma_rs_spark.collection import decode_meta_value

__all__ = [
    "Engine",
    "Collection",
    "decode_meta_value",
    "EngineError",
    "CollectionExistsError",
    "CollectionNotFoundError",
    "InvalidFilterError",
    "DimensionMismatchError",
    "DuplicateIDError",
    "IDNotFoundError",
    "ResetDisabledError",
]
