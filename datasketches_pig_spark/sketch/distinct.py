"""HLL / CPC package analogs — distinct counting without set algebra.

The reference's hll (``pig/hll/DataToSketch.java:43``, lgK=12 default) and cpc
(``pig/cpc/DataToSketch.java:43``) packages build mergeable cardinality
sketches.  Spark's native ``approx_count_distinct`` is an HLL++ aggregate with
the same Algebraic partial→final contract, executed fully JVM-side; lgK maps
to a relative standard deviation rsd ≈ 1.04 / sqrt(2^lgK).  The exact path is
``countDistinct`` (what the oracle checks).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DEFAULT_LGK = 12  # hll/DataToSketch.java:45-46


def _check_lgk(lg_k: int, lo: int, hi: int, family: str) -> None:
    """Plan-time ctor validation, mirroring the reference sketches' lgK
    range checks (HllSketch: [4, 21]; CpcSketch: [4, 26]) — fail at
    construction, not mid-job."""
    if not isinstance(lg_k, int) or not (lo <= lg_k <= hi):
        raise ValueError(
            f"{family} lgK must be an int in [{lo}, {hi}], got {lg_k!r}"
        )


def lgk_to_rsd(lg_k: int) -> float:
    return 1.04 / math.sqrt(2.0**lg_k)


def hll_estimate(col, lg_k: int = DEFAULT_LGK) -> Column:
    """approx distinct estimate (hll/SketchToEstimate.java:35 analog)."""
    _check_lgk(lg_k, 4, 21, "HLL")
    return F.approx_count_distinct(col, lgk_to_rsd(lg_k))


def hll_distinct(df: DataFrame, value_col: str, group_cols: list[str] | None = None,
                 lg_k: int = DEFAULT_LGK, exact: bool = False) -> DataFrame:
    """Grouped distinct count; exact=True switches to countDistinct (the
    exact-mode/oracle path)."""
    _check_lgk(lg_k, 4, 21, "HLL")
    agg = (
        F.countDistinct(value_col) if exact else hll_estimate(value_col, lg_k)
    ).cast("double").alias("estimate")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def hll_estimate_with_bounds(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None,
    lg_k: int = DEFAULT_LGK, exact: bool = False,
) -> DataFrame:
    """(est, lb, ub) at ±2σ / 95.5% confidence
    (``hll/SketchToEstimateAndErrorBounds.java:43``).

    ``exact=True`` is the oracle path: below sketch capacity the DataSketches
    HLL sketch answers from its exact coupon list and
    ``getLowerBound == getEstimate == getUpperBound`` — the same exact-mode
    collapse the theta bounds oracle relies on."""
    _check_lgk(lg_k, 4, 21, "HLL")
    if exact:
        est = F.countDistinct(value_col).cast("double")
        aggs = [est.alias("est"), est.alias("lb"), est.alias("ub")]
    else:
        rsd = lgk_to_rsd(lg_k)
        est = F.approx_count_distinct(value_col, rsd).cast("double")
        aggs = [
            est.alias("est"),
            (est * (1 - 2 * rsd)).alias("lb"),
            (est * (1 + 2 * rsd)).alias("ub"),
        ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


# CPC: same Spark mapping, different accuracy constant (cpc is ~1.4× more
# accurate per bit than HLL; map lgK to an equivalent rsd).
DEFAULT_CPC_LGK = 11  # cpc/DataToSketch.java default lgK


def cpc_rsd(lg_k: int) -> float:
    """CPC relative standard error ≈ 0.588/sqrt(2^lgK) (Lang 2017, the
    published compressed-probabilistic-counting accuracy constant)."""
    return 0.588 / math.sqrt(2.0**lg_k)


def cpc_estimate(col, lg_k: int = DEFAULT_CPC_LGK) -> Column:
    _check_lgk(lg_k, 4, 26, "CPC")
    return F.approx_count_distinct(col, max(cpc_rsd(lg_k), 0.01))


def hll_to_string(
    df: DataFrame, value_col: str, lg_k: int = DEFAULT_LGK, exact: bool = False
) -> DataFrame:
    """Debug summary — ``hll/SketchToString.java`` analog: formatted lgK /
    estimate / rsd line.  Deterministic (hence oracle-checkable) in exact
    mode."""
    _check_lgk(lg_k, 4, 21, "HLL")
    est = (
        F.countDistinct(value_col) if exact else hll_estimate(value_col, lg_k)
    ).cast("double")
    return df.agg(
        F.concat(
            F.lit(f"HLL sketch: lgK={lg_k}, rsd="),
            F.lit(round(lgk_to_rsd(lg_k), 6)).cast("string"),
            F.lit(", estimate="),
            F.round(est, 1).cast("string"),
        ).alias("summary")
    )


def cpc_to_string(
    df: DataFrame, value_col: str, lg_k: int = 11, exact: bool = False
) -> DataFrame:
    """Debug summary — ``cpc/SketchToString.java`` analog."""
    _check_lgk(lg_k, 4, 26, "CPC")
    est = (
        F.countDistinct(value_col) if exact else cpc_estimate(F.col(value_col), lg_k)
    ).cast("double")
    return df.agg(
        F.concat(
            F.lit(f"CPC sketch: lgK={lg_k}, rse="),
            F.lit(round(cpc_rsd(lg_k), 6)).cast("string"),
            F.lit(", estimate="),
            F.round(est, 1).cast("string"),
        ).alias("summary")
    )


def cpc_distinct(df: DataFrame, value_col: str, group_cols: list[str] | None = None,
                 lg_k: int = DEFAULT_CPC_LGK, exact: bool = False) -> DataFrame:
    """Grouped distinct count via the CPC accuracy mapping
    (``cpc/GetEstimate.java:40`` analog); exact=True is the oracle path."""
    _check_lgk(lg_k, 4, 26, "CPC")
    agg = (
        F.countDistinct(value_col) if exact else cpc_estimate(F.col(value_col), lg_k)
    ).cast("double").alias("estimate")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def cpc_estimate_with_bounds(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lg_k: int = DEFAULT_CPC_LGK,
    kappa: int = 2,
    exact: bool = False,
) -> DataFrame:
    """(est, lb, ub) at kappa ∈ {1,2,3} standard deviations — the
    ``cpc/GetEstimateAndErrorBounds.java:45,79-84`` analog (kappa is the
    number of σ from the mean; default 2, ``:47``).

    exact=True is the unsaturated-sketch collapse (countDistinct, lb == ub ==
    est) — the oracle-checkable mode, same contract as ``theta_bounds``.
    """
    if kappa not in (1, 2, 3):
        raise ValueError(f"kappa must be 1, 2 or 3, got {kappa}")
    _check_lgk(lg_k, 4, 26, "CPC")
    rsd = cpc_rsd(lg_k)
    est = (
        F.countDistinct(value_col) if exact else F.approx_count_distinct(value_col, max(rsd, 0.01))
    ).cast("double")
    spread = 0.0 if exact else kappa * rsd
    aggs = [
        est.alias("est"),
        (est * (1.0 - spread)).alias("lb"),
        (est * (1.0 + spread)).alias("ub"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)
