from datasketches_pig_spark.functions.murmur3 import (
    DEFAULT_SEED,
    murmur3_bytes_batch,
    murmur3_long_batch,
    murmur3_x64_128,
    murmur3_x64_128_fixed,
)

__all__ = [
    "DEFAULT_SEED",
    "murmur3_bytes_batch",
    "murmur3_long_batch",
    "murmur3_x64_128",
    "murmur3_x64_128_fixed",
]
