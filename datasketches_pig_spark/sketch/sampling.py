"""Sampling operators — the ``pig/sampling`` package analog.

* ``reservoir_sample`` — uniform fixed-k per group, with the reference's
  shortcut: if a group has ≤ k rows, all rows are returned unchanged
  (``sampling/ReservoirSampling.java:82-86``).  Implemented relationally:
  row_number over a seeded-random order — one shuffle, no Python.
* ``varopt_sample`` — weighted VarOpt: all heavy items (w > τ) kept with
  their own weight, light items sampled with probability w/τ and assigned
  weight τ, where τ solves |heavy| + Σ_light w/τ = k.  Output columns
  ``vo_weight`` + the record, mirroring ``sampling/VarOptCommonImpl.java:45-46``.
  Per-group solve runs in ``applyInPandas`` (deterministic per-group seed);
  the n ≤ k shortcut returns originals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DEFAULT_TARGET_K = 1024  # sampling/VarOptCommonImpl.java:42


def reservoir_sample(
    df: DataFrame,
    k: int,
    group_cols: list[str] | None = None,
    seed: int = 9001,
) -> DataFrame:
    """Uniform fixed-k sample per group (k ≥ 2, as the reference enforces —
    ``ReservoirSampling.java:63-70``)."""
    if k < 2:
        raise ValueError("reservoir k must be >= 2")
    if not group_cols:
        # Ungrouped: orderBy+limit compiles to TakeOrderedAndProject —
        # per-partition bottom-k then one k-row merge.  Never a
        # single-partition global window (that was a one-task sort of the
        # whole table).  The <= k shortcut falls out: limit keeps all rows.
        return df.orderBy(F.rand(seed)).limit(k)
    w = Window.partitionBy(*group_cols).orderBy(F.rand(seed), *group_cols)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    return out.drop("__rn")


def reservoir_union(
    reservoirs: DataFrame,
    k: int,
    n_col: str = "n",
    samples_col: str = "samples",
    seed: int = 9001,
) -> DataFrame:
    """Merge partial reservoirs — the ``sampling.ReservoirUnion`` analog
    (``pig/sampling/ReservoirUnion.java:48,73-81``).

    Input: one row per partial reservoir, ``(n: long, samples: array<T>)``
    where ``n`` is the population size the reservoir was drawn from.  Each
    retained sample stands in for ``n / |samples|`` population rows, so the
    merge is weighted sampling without replacement over all retained samples
    (A-ExpJ: key = U^(1/w), keep top-k).  When the total retained count is
    ≤ k the top-k keeps everything — the reference's exact-mode shortcut
    falls out for free, and in exact mode (every n == |samples|) the merge
    is exactly the union of the inputs.
    """
    if k < 2:
        raise ValueError("reservoir k must be >= 2")
    exploded = reservoirs.select(
        F.col(n_col).alias("__n"),
        F.size(samples_col).alias("__sz"),
        F.explode(samples_col).alias("__s"),
    )
    keyed = exploded.withColumn(
        "__key", F.pow(F.rand(seed), F.col("__sz").cast("double") / F.col("__n"))
    )
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition top-k,
    # then a single k-row merge — no global sort, no single-partition window
    return keyed.orderBy(F.desc("__key")).limit(k).select("__s.*")


def reservoir_state(
    df: DataFrame,
    k: int,
    group_cols: list[str] | None = None,
    seed: int = 9001,
) -> DataFrame:
    """Persistable reservoir partial — the ``sampling.DataToSketch`` analog
    (``ReservoirSampling.java:82``): one row per group with
    ``(n: population count, samples: array<struct<record>>)``.  The struct
    array is a plain parquet-writable column, so a daily job can persist its
    state and a later job can merge states across days with
    ``reservoir_union_states`` — the reference's Algebraic intermediate as a
    native Spark type instead of sketch bytes."""
    keys = group_cols or []
    rec_cols = [c for c in df.columns if c not in keys]
    sample = reservoir_sample(df, k, group_cols, seed)
    rec = F.struct(*rec_cols)
    if keys:
        samples = sample.groupBy(*keys).agg(F.collect_list(rec).alias("samples"))
        counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
        return counts.join(samples, keys)
    samples = sample.agg(F.collect_list(rec).alias("samples"))
    counts = df.agg(F.count(F.lit(1)).alias("n"))
    return counts.crossJoin(samples)


def reservoir_union_states(
    states: DataFrame,
    k: int,
    group_cols: list[str] | None = None,
    n_col: str = "n",
    samples_col: str = "samples",
    seed: int = 9001,
) -> DataFrame:
    """Merge persisted reservoir states per group (``ReservoirUnion.java:48``
    over ``reservoir_state`` rows): weighted sampling without replacement
    (A-ExpJ keys) over all retained samples.  Exact mode (every state's
    n == |samples|) returns the union of the inputs — rows, not state."""
    if k < 2:
        raise ValueError("reservoir k must be >= 2")
    keys = group_cols or []
    exploded = states.select(
        *keys,
        F.col(n_col).alias("__n"),
        F.size(samples_col).alias("__sz"),
        F.explode(samples_col).alias("__s"),
    )
    keyed = exploded.withColumn(
        "__key", F.pow(F.rand(seed), F.col("__sz").cast("double") / F.col("__n"))
    )
    if not keys:
        return keyed.orderBy(F.desc("__key")).limit(k).select("__s.*")
    w = Window.partitionBy(*keys).orderBy(F.desc("__key"))
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(*keys, "__s.*")
    )


def varopt_state(
    df: DataFrame,
    k: int = DEFAULT_TARGET_K,
    weight_col: str = "weight",
    group_cols: list[str] | None = None,
    seed: int = 9001,
) -> DataFrame:
    """Persistable VarOpt partial — the ``sampling.DataToVarOptSketch``
    analog (``DataToVarOptSketch.java:45``): one row per group with
    ``state: array<struct<record, vo_weight>>`` (≤ k entries).  Parquet-
    writable; merge later states with ``varopt_union_states``."""
    keys = group_cols or []
    sample = varopt_sample(df, k, weight_col, group_cols, seed)
    rec_cols = [c for c in sample.columns if c not in keys]
    rec = F.struct(*rec_cols)
    if keys:
        return sample.groupBy(*keys).agg(F.collect_list(rec).alias("state"))
    return sample.agg(F.collect_list(rec).alias("state"))


def varopt_union_states(
    states: DataFrame,
    k: int = DEFAULT_TARGET_K,
    group_cols: list[str] | None = None,
    state_col: str = "state",
    seed: int = 9001,
) -> DataFrame:
    """Merge persisted VarOpt states per group (``VarOptUnion.java:46``):
    explode back to weighted rows and VarOpt over the union keyed on the
    adjusted weights (unbiasedness argument as in ``varopt_union``)."""
    exploded = get_varopt_samples(states, group_cols, state_col)
    return varopt_sample(
        exploded, k=k, weight_col="vo_weight", group_cols=group_cols, seed=seed
    )


def get_varopt_samples(
    states: DataFrame,
    group_cols: list[str] | None = None,
    state_col: str = "state",
) -> DataFrame:
    """Unpack a persisted VarOpt state back to weighted rows — the
    ``sampling.GetVarOptSamples`` analog (``GetVarOptSamples.java:46``):
    (vo_weight, record...) per retained entry, flattened relationally."""
    keys = group_cols or []
    return states.select(*keys, F.explode(state_col).alias("__r")).select(
        *keys, "__r.*"
    )


def varopt_union(
    partials: DataFrame,
    k: int = DEFAULT_TARGET_K,
    weight_col: str = "vo_weight",
    seed: int = 9001,
) -> DataFrame:
    """Merge partial VarOpt samples — the ``sampling.VarOptUnion`` analog
    (``pig/sampling/VarOptUnion.java:46``).  A VarOpt sample is itself a
    weighted population whose adjusted weights (``vo_weight``) are unbiased
    for the originals, so the merge is VarOpt over the union of the partial
    samples keyed on those adjusted weights.  The n ≤ k shortcut makes the
    exact mode exact: merging exact-mode partials returns every row with its
    original weight."""
    return varopt_sample(partials, k=k, weight_col=weight_col, seed=seed)


def _varopt_group(pdf: pd.DataFrame, k: int, weight_col: str, seed: int) -> pd.DataFrame:
    n = len(pdf)
    if n <= k:
        out = pdf.copy()
        out["vo_weight"] = out[weight_col].astype(float)
        return out
    w = pdf[weight_col].to_numpy(dtype=np.float64)
    order = np.argsort(-w, kind="stable")
    ws = w[order]
    # find τ: keep heavy prefix of size h where ws[h-1] > τ,
    # τ = (Σ light weights) / (k - h); scan h from 0 upward
    suffix = np.concatenate([np.cumsum(ws[::-1])[::-1], [0.0]])
    tau = None
    h = 0
    for h in range(k):
        t = suffix[h] / (k - h)
        if ws[h] <= t if h < n else True:
            tau = t
            break
    if tau is None:
        h = k
        tau = suffix[k - 1] if k - 1 < n else 0.0
    heavy_idx = order[:h]
    light_idx = order[h:]
    m = k - h  # expected (and exact) number of light picks
    lw = w[light_idx]
    # systematic sampling: exactly m picks with inclusion prob w/τ
    rng = np.random.default_rng(seed)
    cum = np.cumsum(lw / tau)
    targets = rng.uniform(0, 1) + np.arange(m)
    picks = np.searchsorted(cum, targets, side="left")
    picks = np.clip(picks, 0, len(light_idx) - 1)
    picks = np.unique(picks)  # τ-solve makes collisions measure-zero
    chosen = light_idx[picks]
    out = pd.concat([pdf.iloc[heavy_idx], pdf.iloc[chosen]])
    vo = np.concatenate([w[heavy_idx], np.full(len(chosen), tau)])
    out = out.copy()
    out["vo_weight"] = vo
    return out


def varopt_sample(
    df: DataFrame,
    k: int = DEFAULT_TARGET_K,
    weight_col: str = "weight",
    group_cols: list[str] | None = None,
    seed: int = 9001,
) -> DataFrame:
    """Weighted VarOpt sample per group → original columns + vo_weight.

    Ungrouped path is the reference's Algebraic split
    (``sampling/DataToVarOptSketch.java:45`` initial / ``VarOptUnion.java:46``
    final): a per-partition partial VarOpt runs in ``mapInPandas`` with state
    bounded at k + one Arrow batch, then a single bounded merge over at most
    n_partitions * k partial rows — the full table never ships to one Python
    worker.  VarOpt-of-VarOpt is unbiased because adjusted weights are
    unbiased for the originals.
    """
    keys = group_cols or []
    schema_fields = [f for f in df.schema.fields if f.name != "vo_weight"]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema_fields
    ) + ", vo_weight double"

    if keys:
        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            return _varopt_group(pdf, k, weight_col, seed)

        return df.groupBy(*keys).applyInPandas(run, schema=out_schema)

    def partial(batches):
        cur = None
        for pdf in batches:
            pdf = pdf.copy()
            pdf["vo_weight"] = pdf[weight_col].astype(float)
            pool = pdf if cur is None else pd.concat([cur, pdf], ignore_index=True)
            cur = _varopt_group(pool, k, "vo_weight", seed)
        if cur is not None and len(cur):
            yield cur

    partials = df.mapInPandas(partial, schema=out_schema)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        return _varopt_group(pdf.drop(columns=["__g"]), k, "vo_weight", seed)

    return (
        partials.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(final, schema=out_schema)
    )
