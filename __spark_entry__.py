"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries live in ``chroma_rs_spark/suite/`` (one module per operator
family, each entry bundling the PySpark callable + DuckDB oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001: batch KNN (A8) — 5 probe vectors,
    cosine top-10 over `embeddings`, joined to document text."""
    from pyspark.sql import functions as F

    from chroma_rs_spark.sources.tables import load_table
    from chroma_rs_spark.suite.vector import q_knn_cosine

    sf_dir = "/root/testdata/sf0.001"
    knn = q_knn_cosine(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return (
        knn.join(docs, knn.neighbor_id == docs.doc_id, "left")
        .select("query_id", "rank", "neighbor_id", "distance", F.col("text"))
        .orderBy("query_id", "rank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from chroma_rs_spark.suite import all_queries

    return {name: qd.fn for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from chroma_rs_spark.suite import all_queries

    return {
        name: qd.oracle
        for name, qd in all_queries().items()
        if qd.oracle is not None
    }
