"""LSH candidate-pair generation — pure DataFrame algebra, no Python in the
hot path.

Scale design (the part that must survive 1000 executors × 100 TB):

* The bucket join is an equi self-join on a single 64-bit ``band_key`` —
  sort-merge/shuffled-hash joinable, AQE skew-split friendly.
* **Hot buckets** (thousands of identical-content clips — silence, jingles)
  would make the naive self-join O(n²) per bucket.  We split buckets by size
  first (one cheap count aggregation):
    - small buckets (≤ max_bucket_size): all-pairs via self-join — exact;
    - big buckets: *star linking* — every member pairs with the bucket's
      minimum clip_id only.  Connectivity through the center is preserved for
      union-find, pair count drops from O(n²) to O(n).
* The bucket-size table is small (one row per distinct bucket that has ≥ 2
  members) and is broadcast when it fits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datasketches_pig_spark.config import DedupConfig


def candidate_pairs(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(clip_id, band_key) → distinct candidate (a, b) pairs with a < b."""
    sizes = (
        bands.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("bucket_n"), F.min("clip_id").alias("center"))
        .filter(F.col("bucket_n") >= 2)
    )

    tagged = bands.join(sizes, "band_key")  # drops singleton buckets early

    small = tagged.filter(F.col("bucket_n") <= cfg.max_bucket_size)
    left = small.select("band_key", F.col("clip_id").alias("a"))
    right = small.select("band_key", F.col("clip_id").alias("b"))
    small_pairs = left.join(right, "band_key").filter(F.col("a") < F.col("b"))

    big_pairs = (
        tagged.filter(
            (F.col("bucket_n") > cfg.max_bucket_size)
            & (F.col("clip_id") != F.col("center"))
        )
        .select(F.col("center").alias("a"), F.col("clip_id").alias("b"))
    )

    return (
        small_pairs.select("a", "b")
        .unionByName(big_pairs)
        .distinct()
    )


def exact_dup_pairs(signatures: DataFrame) -> DataFrame:
    """Byte-identical payload fast path: pair every clip with the min clip_id
    sharing its exact_key (star linking — O(n) pairs per group)."""
    centers = (
        signatures.groupBy("exact_key")
        .agg(F.count(F.lit(1)).alias("n"), F.min("clip_id").alias("a"))
        .filter(F.col("n") >= 2)
    )
    return (
        signatures.join(centers, "exact_key")
        .filter(F.col("clip_id") != F.col("a"))
        .select("a", F.col("clip_id").alias("b"))
    )
