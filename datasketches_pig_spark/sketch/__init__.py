from datasketches_pig_spark.sketch import (  # noqa: F401
    distinct,
    frequencies,
    quantiles,
    sampling,
    theta,
    tuple_sketch,
)
