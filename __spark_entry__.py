"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship operation (MinHash-LSH near-duplicate detection +
union-find clustering) over the driver's ``documents`` table at sf0.001;
``queries``/``oracle_sql`` expose every implemented operator family from
SURVEY.md §2 plus the training-data operators, DuckDB-oracle-checked at
sf0.01 (see datasketches_pig_spark/queries.py for the registry).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: near-dup doc clusters."""
    import pyspark.sql.functions as F

    from datasketches_pig_spark.operators.unionfind import connected_components
    from datasketches_pig_spark.textops.dedup import minhash_dedup_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_dedup_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    edges = pairs.select(
        F.col("a").cast("string").alias("a"), F.col("b").cast("string").alias("b")
    )
    vertices = docs.select(F.col("doc_id").cast("string").alias("clip_id"))
    clusters = connected_components(edges, vertices)
    return clusters.select(
        F.col("clip_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datasketches_pig_spark.queries import registry

    return {name: fn for name, (fn, _) in registry().items()}


def oracle_sql() -> dict[str, str]:
    from datasketches_pig_spark.queries import registry

    return {name: sql for name, (_, sql) in registry().items() if sql is not None}
