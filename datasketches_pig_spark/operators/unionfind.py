"""Distributed union-find: connected components over verified dup pairs via
iterative min-label propagation (DataFrame self-joins to a fixpoint).

Each round every vertex takes the minimum label among itself and its
neighbors; convergence needs O(component diameter) rounds — dup clusters are
shallow (star/chain topology from LSH star-linking), so a handful of rounds
suffices.  Each round is localCheckpoint()ed to cut the growing lineage (the
same reason the reference serializes compact sketches between stages rather
than re-deriving them).

Deterministic output: cluster_id = min clip_id of the component.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datasketches_pig_spark.config import DedupConfig


def connected_components(
    edges: DataFrame, vertices: DataFrame, cfg: DedupConfig | None = None
) -> DataFrame:
    """edges(a, b) + vertices(clip_id) → clusters(clip_id, cluster_id).

    Vertices not touched by any edge become singleton clusters.
    """
    max_rounds = cfg.max_unionfind_rounds if cfg else 50

    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )

    labels = (
        sym.select(F.col("src").alias("clip_id"))
        .distinct()
        .withColumn("label", F.col("clip_id"))
        .localCheckpoint()
    )

    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(labels, sym.src == labels.clip_id)
            .groupBy("dst")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.clip_id == neighbor_min.dst, "left")
            .select(
                "clip_id",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
                (F.col("nmin") < F.col("label")).alias("changed"),
            )
        ).localCheckpoint()
        n_changed = new_labels.filter(F.col("changed")).limit(1).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break

    return (
        vertices.select("clip_id")
        .join(labels, "clip_id", "left")
        .select(
            "clip_id",
            F.coalesce("label", F.col("clip_id")).alias("cluster_id"),
        )
    )
