"""Unit tests for the DataFrame-native sketch library, in the reference's
style: tiny deterministic inputs, exact-mode assertions with delta 0.0
(``theta/DataToSketchTest.java:137``)."""

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def kv_df(spark):
    rows = [("g1", i) for i in range(64)] + [("g2", i) for i in range(32, 96)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["g", "v"])).cache()


def test_theta_exact_mode_estimate(spark, kv_df):
    from datasketches_pig_spark.sketch.theta import theta_estimate, theta_sketch_agg

    sk = theta_sketch_agg(kv_df, ["g"], "v", k=256)
    out = {
        r["g"]: r["est"]
        for r in sk.select("g", theta_estimate("sketch", 256).alias("est")).collect()
    }
    assert out == {"g1": 64.0, "g2": 64.0}  # delta 0.0


def test_theta_estimate_above_k(spark):
    from datasketches_pig_spark.sketch.theta import theta_estimate, theta_sketch_agg

    df = spark.range(20000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    sk = theta_sketch_agg(df, ["g"], "v", k=256)
    est = sk.select(theta_estimate("sketch", 256).alias("e")).collect()[0]["e"]
    assert abs(est - 20000) / 20000 < 0.3


def test_theta_set_algebra_exact(spark, kv_df):
    from datasketches_pig_spark.sketch.theta import (
        theta_a_not_b,
        theta_intersect,
        theta_jaccard,
        theta_sketch_agg,
        theta_union_sketches,
    )

    sk = theta_sketch_agg(kv_df, ["g"], "v", k=256)
    a = sk.filter(F.col("g") == "g1").select(F.col("sketch").alias("ska"))
    b = sk.filter(F.col("g") == "g2").select(F.col("sketch").alias("skb"))
    pair = a.crossJoin(b)
    row = pair.select(
        F.size(theta_intersect(F.col("ska"), F.col("skb"), 256)).alias("i"),
        F.size(theta_a_not_b(F.col("ska"), F.col("skb"), 256)).alias("anb"),
        F.size(theta_union_sketches(F.col("ska"), F.col("skb"), 256)).alias("u"),
        theta_jaccard(F.col("ska"), F.col("skb"), 256).alias("j"),
    ).collect()[0]
    # g1 = 0..63, g2 = 32..95 → ∩ = 32, A\B = 32, ∪ = 96, J = 32/96
    assert (row["i"], row["anb"], row["u"]) == (32, 32, 96)
    assert row["j"] == pytest.approx(32 / 96, abs=1e-12)


def test_theta_jaccard_bounds_exact_mode(spark, kv_df):
    from datasketches_pig_spark.sketch.theta import theta_jaccard_bounds, theta_sketch_agg

    sk = theta_sketch_agg(kv_df, ["g"], "v", k=256)
    a = sk.filter(F.col("g") == "g1").select(F.col("sketch").alias("ska"))
    b = sk.filter(F.col("g") == "g2").select(F.col("sketch").alias("skb"))
    row = a.crossJoin(b).select(
        theta_jaccard_bounds(F.col("ska"), F.col("skb"), 256).alias("jb")
    ).collect()[0]["jb"]
    assert row["lb"] == row["est"] == row["ub"] == pytest.approx(32 / 96)


def test_quantiles_pmf_cdf_rank(spark):
    from datasketches_pig_spark.sketch.quantiles import get_cdf, get_pmf, get_quantiles, get_rank

    df = spark.createDataFrame(pd.DataFrame({"x": list(range(1, 101))}))
    q = get_quantiles(df, "x", [0.5]).collect()[0][0]
    assert q == pytest.approx(50.5)  # interpolated median of 1..100
    pmf = get_pmf(df, "x", [51.0]).collect()[0]
    assert pmf["pmf_0"] == pytest.approx(0.5) and pmf["pmf_1"] == pytest.approx(0.5)
    cdf = get_cdf(df, "x", [26.0]).collect()[0]
    assert cdf["cdf_0"] == pytest.approx(0.25)
    r = get_rank(df, "x", 76.0).collect()[0]["rank"]
    assert r == pytest.approx(0.75)


def test_frequent_items_exact_and_approx(spark):
    from datasketches_pig_spark.sketch.frequencies import (
        frequent_items,
        frequent_items_approx,
    )

    items = ["a"] * 50 + ["b"] * 30 + ["c"] * 15 + [f"x{i}" for i in range(20)]
    df = spark.createDataFrame(pd.DataFrame({"item": items})).repartition(4)
    top = frequent_items(df, "item", 3).collect()
    assert [(r["item"], r["est"]) for r in top] == [("a", 50), ("b", 30), ("c", 15)]
    assert all(r["lb"] == r["est"] == r["ub"] for r in top)

    approx = frequent_items_approx(df, "item", 3, max_map_size=8).collect()
    by_item = {r["item"]: r for r in approx}
    # NO_FALSE_NEGATIVES: true heavy hitters must appear, true count within [lb, ub]
    for item, true_c in [("a", 50), ("b", 30), ("c", 15)]:
        assert item in by_item
        assert by_item[item]["lb"] <= true_c <= by_item[item]["ub"]


def test_reservoir_shortcut_and_fixed_k(spark):
    from datasketches_pig_spark.sketch.sampling import reservoir_sample

    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 5 + ["b"] * 50, "v": list(range(55))})
    )
    out = reservoir_sample(df, k=10, group_cols=["g"]).toPandas()
    # group a: n ≤ k → all 5 returned unchanged; group b: exactly k
    assert (out[out.g == "a"].v.sort_values().tolist()) == [0, 1, 2, 3, 4]
    assert len(out[out.g == "b"]) == 10
    assert set(out[out.g == "b"].v).issubset(set(range(5, 55)))
    with pytest.raises(ValueError):
        reservoir_sample(df, k=1)


def test_varopt_shortcut_and_weighting(spark):
    from datasketches_pig_spark.sketch.sampling import varopt_sample

    pdf = pd.DataFrame({"w": [1.0, 2.0, 3.0], "payload": ["x", "y", "z"]})
    df = spark.createDataFrame(pdf)
    out = varopt_sample(df, k=10, weight_col="w").toPandas().sort_values("payload")
    # n ≤ k → all rows, vo_weight == original weight
    assert out["vo_weight"].tolist() == [1.0, 2.0, 3.0]

    # n > k: total weight preserved (VarOpt preserves it exactly: heavy keep
    # their weight, the m light picks each carry τ with Σ light w = m·τ)
    rng = np.random.default_rng(0)
    big = pd.DataFrame({"w": rng.uniform(0.1, 10.0, 500), "payload": [str(i) for i in range(500)]})
    # plant genuinely heavy items (w > τ) that VarOpt must keep exactly
    big.loc[:2, "w"] = [500.0, 400.0, 300.0]
    bdf = spark.createDataFrame(big)
    res = varopt_sample(bdf, k=64, weight_col="w").toPandas()
    assert len(res) == 64
    total = big.w.sum()
    assert res.vo_weight.sum() == pytest.approx(total, rel=1e-9)
    for _, hr in big.nlargest(3, "w").iterrows():
        m = res[res.payload == hr.payload]
        assert len(m) == 1 and m.iloc[0].vo_weight == pytest.approx(hr.w)


def test_tuple_sketch_pvalues(spark):
    from datasketches_pig_spark.sketch.tuple_sketch import aod_p_values

    rng = np.random.default_rng(1)
    a = pd.DataFrame({"k": range(200), "v": rng.normal(10, 1, 200)})
    b_same = pd.DataFrame({"k": range(200), "v": rng.normal(10, 1, 200)})
    b_diff = pd.DataFrame({"k": range(200), "v": rng.normal(14, 1, 200)})
    da, ds, dd_ = (spark.createDataFrame(x) for x in (a, b_same, b_diff))
    p_same = aod_p_values(da, ds, "k", ["v"])[0]
    p_diff = aod_p_values(da, dd_, "k", ["v"])[0]
    assert p_same > 0.01
    assert p_diff < 1e-10


def test_hll_bounds_cover_truth(spark):
    from datasketches_pig_spark.sketch.distinct import hll_estimate_with_bounds

    df = spark.range(50000).select(F.col("id").alias("v"))
    row = hll_estimate_with_bounds(df, "v").collect()[0]
    assert row["lb"] <= 50000 <= row["ub"]

    # exact mode: bounds collapse onto the exact count (the oracle path)
    ex = hll_estimate_with_bounds(df, "v", exact=True).collect()[0]
    assert ex["lb"] == ex["est"] == ex["ub"] == 50000.0


def test_reservoir_union_exact_and_sampled(spark):
    import pyspark.sql.functions as F

    from datasketches_pig_spark.sketch.sampling import reservoir_union

    df = spark.range(200).withColumn("g", (F.col("id") % 4).cast("int"))
    partials = df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.collect_list(F.struct("id", "g")).alias("samples"),
    )
    # exact mode: k >= total retained -> union returns everything
    exact = reservoir_union(partials, k=1000).toPandas()
    assert sorted(exact["id"]) == list(range(200))
    # sampled mode: exactly k rows, all drawn from the retained samples
    sampled = reservoir_union(partials, k=50).toPandas()
    assert len(sampled) == 50
    assert sampled["id"].is_unique and set(sampled["id"]) <= set(range(200))
    # ReservoirSampling.java:63-70 k>=2 rule
    import pytest

    with pytest.raises(ValueError):
        reservoir_union(partials, k=1)
