"""Per-operator execution-path tests in the reference's per-UDF style
(`theta/DataToSketchTest.java` et al.): every operator family gets its
build / merge / persisted-state / approximate paths and output-schema checks
exercised, not just the oracle query's happy path."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# frequencies: cross-job partial-state merge + exact-mode collapse
# ---------------------------------------------------------------------------

def test_freq_partials_parquet_roundtrip_merge(spark, tmp_path):
    """UnionFrequentStringsSketch analog: two jobs persist space-saving
    partials to parquet, a third merges them; NO_FALSE_NEGATIVES bounds must
    cover the true counts of every heavy item."""
    from datasketches_pig_spark.sketch.frequencies import _space_saving_partials

    items = ["a"] * 500 + ["b"] * 300 + [f"t{i}" for i in range(200)]
    pdf = pd.DataFrame({"item": items, "slice": [i % 2 for i in range(len(items))]})
    df = spark.createDataFrame(pdf)
    for s in (0, 1):
        part = _space_saving_partials(
            df.filter(F.col("slice") == s).select("item"), "item", 64
        )
        part.write.parquet(str(tmp_path / f"freq{s}"))
    merged = (
        spark.read.parquet(str(tmp_path / "freq0"))
        .unionByName(spark.read.parquet(str(tmp_path / "freq1")))
        .groupBy("item")
        .agg(F.sum("est").alias("est"), F.sum("err").alias("err"))
    )
    got = merged.toPandas().set_index("item")
    for item, true_c in (("a", 500), ("b", 300)):
        assert item in got.index
        est, err = got.loc[item, "est"], got.loc[item, "err"]
        assert est - err <= true_c <= est  # lb <= truth <= ub (=est)


def test_freq_space_saving_exact_below_map_size(spark):
    """Unsaturated map = exact counts with zero error — the exact-mode
    collapse every freq oracle relies on."""
    from datasketches_pig_spark.sketch.frequencies import _space_saving_partials

    pdf = pd.DataFrame({"item": ["x"] * 7 + ["y"] * 3 + ["z"]})
    out = (
        _space_saving_partials(spark.createDataFrame(pdf).coalesce(1), "item", 64)
        .toPandas()
        .set_index("item")
    )
    assert out.loc["x", "est"] == 7 and out.loc["x", "err"] == 0
    assert out.loc["y", "est"] == 3 and out.loc["z", "est"] == 1
    assert (out["err"] == 0).all()


# ---------------------------------------------------------------------------
# quantiles: approximate path, grouped paths
# ---------------------------------------------------------------------------

def test_quantiles_approx_path_within_rank_error(spark):
    """exact=False routes through percentile_approx; at accuracy=10000 the
    rank error bound is ~1/10000, so on 20k uniform values the value error
    at the median is tiny."""
    from datasketches_pig_spark.sketch.quantiles import get_quantiles

    df = spark.range(20000).select(F.col("id").cast("double").alias("v"))
    row = get_quantiles(df, "v", [0.5], exact=False).collect()[0]
    assert abs(row["q_0_5"] - 10000) <= 50


def test_quantiles_grouped_paths(spark):
    from datasketches_pig_spark.sketch.quantiles import get_cdf, get_pmf, get_quantiles, get_rank

    df = spark.range(1000).select(
        (F.col("id") % 2).cast("int").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    q = get_quantiles(df, "v", [0.0, 1.0], group_cols=["g"]).toPandas().set_index("g")
    assert q.loc[0, "q_0_0"] == 0.0 and q.loc[1, "q_0_0"] == 1.0
    assert q.loc[0, "q_1_0"] == 998.0 and q.loc[1, "q_1_0"] == 999.0
    pmf = get_pmf(df, "v", [500.0], group_cols=["g"]).toPandas().set_index("g")
    assert pmf.loc[0, "pmf_0"] == pytest.approx(0.5)
    cdf = get_cdf(df, "v", [500.0], group_cols=["g"]).toPandas().set_index("g")
    assert cdf.loc[1, "cdf_0"] == pytest.approx(0.5)
    assert cdf.loc[1, "cdf_1"] == 1.0
    r = get_rank(df, "v", 100.0, group_cols=["g"]).toPandas().set_index("g")
    assert r.loc[0, "rank"] == pytest.approx(0.1)


# ---------------------------------------------------------------------------
# distinct: approximate estimates within rsd, kappa bound ordering
# ---------------------------------------------------------------------------

def test_hll_cpc_approx_estimates_within_rsd(spark):
    from datasketches_pig_spark.sketch.distinct import (
        cpc_distinct,
        cpc_rsd,
        hll_distinct,
        lgk_to_rsd,
    )

    n = 100_000
    df = spark.range(n).select(F.col("id").alias("v"))
    hll = hll_distinct(df, "v").collect()[0]["estimate"]
    assert abs(hll - n) / n <= 4 * lgk_to_rsd(12)
    cpc = cpc_distinct(df, "v").collect()[0]["estimate"]
    assert abs(cpc - n) / n <= 4 * max(cpc_rsd(11), 0.01)


def test_cpc_kappa_bounds_nested(spark):
    """GetEstimateAndErrorBounds.java:79-84 — wider kappa ⇒ wider interval,
    and every interval contains the estimate."""
    from datasketches_pig_spark.sketch.distinct import cpc_estimate_with_bounds

    df = spark.range(50000).select(F.col("id").alias("v"))
    rows = {
        k: cpc_estimate_with_bounds(df, "v", kappa=k).collect()[0]
        for k in (1, 2, 3)
    }
    for k in (1, 2, 3):
        assert rows[k]["lb"] <= rows[k]["est"] <= rows[k]["ub"]
    assert rows[1]["lb"] >= rows[2]["lb"] >= rows[3]["lb"]
    assert rows[1]["ub"] <= rows[2]["ub"] <= rows[3]["ub"]
    # same estimate across kappas (only the spread changes)
    assert rows[1]["est"] == rows[2]["est"] == rows[3]["est"]


# ---------------------------------------------------------------------------
# tuple: null handling, multi-value columns
# ---------------------------------------------------------------------------

def test_aod_nulls_skipped_in_sums(spark):
    """The reference's update path skips null values; F.sum must agree —
    nulls contribute nothing, keys with only nulls still appear (they were
    'seen') with null sums."""
    from datasketches_pig_spark.sketch.tuple_sketch import aod_sketch

    pdf = pd.DataFrame(
        {"k": ["a", "a", "b"], "v1": [1.0, None, None], "v2": [2.0, 3.0, None]}
    )
    out = (
        aod_sketch(spark.createDataFrame(pdf), "k", ["v1", "v2"])
        .toPandas()
        .set_index("key")
    )
    assert out.loc["a", "sum_v1"] == 1.0 and out.loc["a", "sum_v2"] == 5.0
    assert pd.isna(out.loc["b", "sum_v1"]) and pd.isna(out.loc["b", "sum_v2"])


# ---------------------------------------------------------------------------
# theta: disjoint group sets across persisted jobs
# ---------------------------------------------------------------------------

def test_theta_union_disjoint_groups(spark, tmp_path):
    """A group present in only one day's state must survive the cross-job
    union unchanged (theta.Union neutral element: union with nothing)."""
    from datasketches_pig_spark.sketch.theta import (
        theta_estimate,
        theta_sketch_agg,
        theta_union_agg,
    )

    df = spark.range(600).select(
        F.when(F.col("id") < 500, "both").otherwise("only_d2").alias("g"),
        F.col("id").alias("v"),
    )
    d1 = df.filter((F.col("g") == "both") & (F.col("id") % 2 == 0))
    d2 = df.filter((F.col("g") == "only_d2") | (F.col("id") % 2 == 1))
    p1, p2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    theta_sketch_agg(d1, ["g"], "v", 4096).write.parquet(p1)
    theta_sketch_agg(d2, ["g"], "v", 4096).write.parquet(p2)
    states = spark.read.parquet(p1).unionByName(spark.read.parquet(p2))
    out = (
        theta_union_agg(states, ["g"], "sketch", 4096)
        .select("g", theta_estimate("sketch", 4096).alias("est"))
        .toPandas()
        .set_index("g")["est"]
    )
    assert out["both"] == 500.0
    assert out["only_d2"] == 100.0


# ---------------------------------------------------------------------------
# output schemas (the reference's outputSchema contracts)
# ---------------------------------------------------------------------------

def test_operator_output_schemas(spark):
    from datasketches_pig_spark.sketch.frequencies import frequent_items
    from datasketches_pig_spark.sketch.quantiles import get_quantiles
    from datasketches_pig_spark.sketch.sampling import varopt_state
    from datasketches_pig_spark.sketch.theta import theta_sketch_agg

    df = spark.range(100).select(
        (F.col("id") % 3).cast("int").alias("g"),
        F.col("id").alias("v"),
        F.col("id").cast("double").alias("w"),
        F.col("id").cast("string").alias("item"),
    )
    sk = theta_sketch_agg(df, ["g"], "v", 64)
    assert dict(sk.dtypes)["sketch"] == "array<bigint>"
    q = get_quantiles(df, "w", [0.5])
    assert dict(q.dtypes)["q_0_5"] == "double"
    fi = frequent_items(df, "item", top_n=5)
    assert dict(fi.dtypes)["est"] == "bigint"
    st = varopt_state(df.select("g", "v", "w"), 16, "w", ["g"])
    dt = dict(st.dtypes)
    assert dt["k"] == "int" and dt["state"].startswith("array<struct<")
