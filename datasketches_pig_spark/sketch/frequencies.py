"""Frequent-items operators — the ``pig/frequencies`` package analog.

The reference builds an ItemsSketch<String> (space-saving style) and extracts
(item, estimate, ub, lb) rows with a NO_FALSE_POSITIVES / NO_FALSE_NEGATIVES
error-type switch (``FrequentStringsSketchToEstimates.java:42-74``).

Spark-first: a groupBy-count is the *exact* sketch at any scale Spark can
shuffle (partial aggregation keeps the map-side state bounded per executor);
lb == est == ub then.  For bounded-memory per-partition summaries (the true
space-saving semantics) ``frequent_items_approx`` runs a per-partition
space-saving pass inside ``mapInPandas`` and merges partials — same
partial→final contract as the reference's Algebraic plumbing, with the
classic merged-error bound: est ± sum of per-partition maxError.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def frequent_items(
    df: DataFrame,
    item_col: str,
    top_n: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact heavy hitters: top_n by count with deterministic tie-break
    (count desc, item asc).  Output: [group_cols,] item, est, lb, ub."""
    keys = group_cols or []
    counted = df.groupBy(*keys, F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).alias("est")
    )
    if keys:
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(F.desc("est"), F.asc("item"))
        ranked = counted.withColumn("__rn", F.row_number().over(w))
        out = ranked.filter(F.col("__rn") <= top_n).drop("__rn")
    else:
        out = counted.orderBy(F.desc("est"), F.asc("item")).limit(top_n)
    return out.withColumn("lb", F.col("est")).withColumn("ub", F.col("est"))


def _space_saving(items: pd.Series, max_map_size: int) -> dict[str, list]:
    """Classic space-saving over one partition: counters + maxError."""
    counters: dict[str, int] = {}
    errors: dict[str, int] = {}
    for it in items:
        if it is None:
            continue
        if it in counters:
            counters[it] += 1
        elif len(counters) < max_map_size:
            counters[it] = 1
            errors[it] = 0
        else:
            victim = min(counters, key=counters.get)
            verr = counters.pop(victim)
            errors.pop(victim)
            counters[it] = verr + 1
            errors[it] = verr
    return {
        "item": list(counters),
        "est": [counters[i] for i in counters],
        "err": [errors[i] for i in counters],
    }


def frequent_items_approx(
    df: DataFrame, item_col: str, top_n: int, max_map_size: int = 1024
) -> DataFrame:
    """Bounded-memory heavy hitters: per-partition space-saving partials →
    merge (sum est / sum err per item) → top_n.  NO_FALSE_NEGATIVES set:
    ub = est, lb = est - err (``FrequentStringsSketchToEstimates.java:44-59``)."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        errors: dict[str, int] = {}
        for pdf in batches:
            for it in pdf[item_col]:
                if it is None:
                    continue
                if it in counters:
                    counters[it] += 1
                elif len(counters) < max_map_size:
                    counters[it] = 1
                    errors[it] = 0
                else:
                    victim = min(counters, key=counters.get)
                    verr = counters.pop(victim)
                    errors.pop(victim)
                    counters[it] = verr + 1
                    errors[it] = verr
        yield pd.DataFrame(
            {
                "item": list(counters),
                "est": [counters[i] for i in counters],
                "err": [errors[i] for i in counters],
            }
        )

    partials = df.select(item_col).mapInPandas(partial, "item string, est long, err long")
    merged = partials.groupBy("item").agg(
        F.sum("est").alias("est"), F.sum("err").alias("err")
    )
    return (
        merged.orderBy(F.desc("est"), F.asc("item"))
        .limit(top_n)
        .select(
            "item",
            "est",
            (F.col("est") - F.col("err")).alias("lb"),
            F.col("est").alias("ub"),
        )
    )
