"""datasketches_pig_spark — a from-scratch PySpark-native analytics engine with
the query capabilities of apache/datasketches-pig, re-expressed Spark-first.

Core product: a near-duplicate detection + clustering pipeline (MinHash /
SimHash / LSH banding / exact-Jaccard + substring verification / distributed
union-find) over tables of audio clip + transcript pairs, plus DataFrame-native
analogs of the reference's sketch operator library (theta/HLL/CPC distinct
counting with set algebra, KLL/classic quantiles, frequent items,
reservoir/VarOpt sampling, tuple sketches) and the large-scale training-data
operators (dedup, similarity search, text analysis) built on the same
primitives.
"""

from datasketches_pig_spark.config import DedupConfig, DEFAULT_CONFIG

__all__ = ["DedupConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
