"""LSH candidate-pair generation — pure DataFrame algebra, no Python in the
hot path.

Scale design (the part that must survive 1000 executors × 100 TB):

* ONE shuffle: ``groupBy(band_key).agg(array_sort(collect_list(clip_id)))``,
  then pair expansion happens inside whole-stage-codegen'd array expressions
  (nested ``transform``/``slice``) — no bucket-size side table, no join back,
  no self-join.  (The previous size-table + equi-self-join form cost 4
  shuffles and dominated the 4N-core profile; this form is 1 shuffle + the
  final distinct.)
* **Hot buckets** (thousands of identical-content clips — silence, jingles)
  would make all-pairs O(n²) per bucket.  Buckets above ``max_bucket_size``
  emit *star links* only — every member pairs with the bucket's minimum
  clip_id; connectivity through the center is preserved for union-find and
  pair count drops to O(n).  The cap also bounds the per-group state of the
  aggregation (an adversarial single-key bucket holds one array of member
  ids — megabytes, not the O(n²) a join would shuffle).
* AQE skew-join handling stays relevant for the *verify* joins downstream;
  candidate generation itself no longer joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from datasketches_pig_spark.config import DedupConfig


def _all_pairs(m: Column) -> Column:
    """members (sorted array) → array<struct<a,b>> of all pairs a < b."""
    return F.flatten(
        F.transform(
            m,
            lambda x, i: F.transform(
                F.slice(m, i + 2, F.size(m)), lambda y: F.struct(x.alias("a"), y.alias("b"))
            ),
        )
    )


def _star_pairs(m: Column) -> Column:
    """members (sorted array) → array<struct<a,b>> pairing min with the rest."""
    center = F.element_at(m, 1)
    return F.transform(
        F.slice(m, 2, F.size(m)),
        lambda y: F.struct(center.alias("a"), y.alias("b")),
    )


def _expand_groups(grouped: DataFrame, cap: int) -> DataFrame:
    """(key, members:array) rows → (a, b) pair rows (all-pairs ≤ cap, star above)."""
    m = F.array_sort(F.col("members"))
    pairs = F.when(F.size(m) <= cap, _all_pairs(m)).otherwise(_star_pairs(m))
    return (
        grouped.filter(F.size("members") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )


def candidate_pairs(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(clip_id, band_key) → candidate (a, b) pairs with a < b (NOT distinct:
    the caller unions exact-dup pairs and dedupes once)."""
    grouped = bands.groupBy("band_key").agg(F.collect_list("clip_id").alias("members"))
    return _expand_groups(grouped, cfg.max_bucket_size)


def exact_dup_pairs(signatures: DataFrame) -> DataFrame:
    """Byte-identical payload fast path: star-link every clip group sharing an
    exact payload key (one shuffle, O(n) pairs per group)."""
    grouped = signatures.groupBy("exact_key").agg(
        F.collect_list("clip_id").alias("members")
    )
    # always star: exact groups are cliques by construction, the star carries
    # full connectivity
    return _expand_groups(grouped, cap=1)
