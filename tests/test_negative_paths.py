"""Error-path and edge-case tests for the sketch layer, mirroring the
reference's negative-test style (bad k / bad args / null-heavy / empty
inputs — ``theta/DataToSketchTest.java:36-69``)."""

import pandas as pd
import pyspark.sql.functions as F
import pytest


# --- bad parameters raise, eagerly, before any job runs --------------------

def test_reservoir_bad_k_raises(spark):
    from datasketches_pig_spark.sketch.sampling import reservoir_sample

    df = spark.range(10)
    with pytest.raises(ValueError, match="k must be >= 2"):
        reservoir_sample(df, 1)


def test_reservoir_union_bad_k_raises(spark):
    from datasketches_pig_spark.sketch.sampling import reservoir_union_states

    df = spark.range(1)
    with pytest.raises(ValueError, match="k must be >= 2"):
        reservoir_union_states(df, 0)


def test_cpc_bounds_bad_kappa_raises(spark):
    from datasketches_pig_spark.sketch.distinct import cpc_estimate_with_bounds

    df = spark.range(10)
    with pytest.raises(ValueError, match="kappa"):
        cpc_estimate_with_bounds(df, "id", kappa=4)


def test_frequent_items_bad_error_type_raises(spark):
    from datasketches_pig_spark.sketch.frequencies import frequent_items_estimates

    df = spark.range(10).select(F.col("id").cast("string").alias("item"))
    with pytest.raises(ValueError, match="error type"):
        frequent_items_estimates(df, "item", threshold=1, error_type="NO_SUCH_TYPE")


def test_train_centroids_empty_corpus_raises(spark):
    from datasketches_pig_spark.ann.knn import train_centroids

    empty = spark.createDataFrame([], schema="embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        train_centroids(empty, "embedding", n_centroids=4)


def test_verify_pairs_bad_transcripts_frame_raises(spark):
    from datasketches_pig_spark.config import DedupConfig
    from datasketches_pig_spark.operators.verify import verify_pairs

    pairs = spark.createDataFrame(pd.DataFrame({"a": ["x"], "b": ["y"]}))
    bad = spark.createDataFrame(pd.DataFrame({"clip_id": ["x"], "oops": ["?"]}))
    with pytest.raises(ValueError, match="transcript"):
        verify_pairs(pairs, pairs, DedupConfig(), transcripts=bad)


# --- null / empty-group behavior -------------------------------------------

def test_theta_null_values_ignored(spark):
    from datasketches_pig_spark.sketch.theta import theta_estimate, theta_sketch_agg

    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 4, "v": ["x", None, "y", None]})
    )
    sk = theta_sketch_agg(df, ["g"], "v", k=64)
    est = sk.select(theta_estimate("sketch", 64).alias("e")).collect()[0]["e"]
    assert est == 2.0  # nulls contribute nothing, exactly (delta 0.0)


def test_theta_empty_input_empty_sketch_frame(spark):
    from datasketches_pig_spark.sketch.theta import theta_sketch_agg

    df = spark.createDataFrame(pd.DataFrame({"g": ["a"], "v": ["x"]})).filter(
        F.lit(False)
    )
    assert theta_sketch_agg(df, ["g"], "v", k=64).count() == 0


def test_frequent_items_nulls_not_counted(spark):
    from datasketches_pig_spark.sketch.frequencies import frequent_items_approx

    df = spark.createDataFrame(
        pd.DataFrame({"item": ["a", "a", None, "b", None, None]})
    )
    rows = {r["item"]: r["est"] for r in frequent_items_approx(df, "item", 10).collect()}
    assert rows == {"a": 2, "b": 1}  # None never becomes an item


def test_kll_rank_empty_input_null_rank(spark):
    from datasketches_pig_spark.sketch.quantiles import get_rank

    df = spark.createDataFrame(pd.DataFrame({"v": [1.0]})).filter(F.lit(False))
    assert get_rank(df, "v", 0.5).collect()[0][0] is None


# --- mergeable persisted state: non-exact mode -----------------------------

def test_varopt_state_roundtrip_preserves_total_weight(spark, tmp_path):
    from datasketches_pig_spark.sketch.sampling import (
        varopt_state,
        varopt_union_states,
    )

    pdf = pd.DataFrame({"k": range(400), "w": [1.0 + (i % 7) for i in range(400)]})
    df = spark.createDataFrame(pdf)
    d1 = df.filter(F.col("k") % 2 == 0)
    d2 = df.filter(F.col("k") % 2 == 1)
    varopt_state(d1, k=64, weight_col="w").write.parquet(str(tmp_path / "d1"))
    varopt_state(d2, k=64, weight_col="w").write.parquet(str(tmp_path / "d2"))
    states = spark.read.parquet(str(tmp_path / "d1")).unionByName(
        spark.read.parquet(str(tmp_path / "d2"))
    )
    merged = varopt_union_states(states, k=64)
    rows = merged.collect()
    assert len(rows) == 64  # saturated: exactly k survivors
    # VarOpt invariant: adjusted weights are unbiased for the population
    # total (here deterministic up to the systematic-sampling residual)
    total = sum(r["vo_weight"] for r in rows)
    assert abs(total - pdf["w"].sum()) / pdf["w"].sum() < 0.05


def test_reservoir_state_roundtrip_size_and_membership(spark, tmp_path):
    from datasketches_pig_spark.sketch.sampling import (
        reservoir_state,
        reservoir_union_states,
    )

    df = spark.range(500).select(F.col("id").alias("k"))
    d1 = df.filter(F.col("k") < 250)
    d2 = df.filter(F.col("k") >= 250)
    reservoir_state(d1, 32).write.parquet(str(tmp_path / "r1"))
    reservoir_state(d2, 32).write.parquet(str(tmp_path / "r2"))
    states = spark.read.parquet(str(tmp_path / "r1")).unionByName(
        spark.read.parquet(str(tmp_path / "r2"))
    )
    merged = reservoir_union_states(states, 32).collect()
    ids = [r["k"] for r in merged]
    assert len(ids) == 32 and len(set(ids)) == 32
    assert all(0 <= i < 500 for i in ids)
    # both halves should be represented (p(miss) ~ (1/2)^32)
    assert any(i < 250 for i in ids) and any(i >= 250 for i in ids)


def test_quantile_fraction_out_of_range_raises(spark):
    from datasketches_pig_spark.sketch.quantiles import get_quantiles

    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="outside"):
        get_quantiles(df, "v", [0.5, 1.5])
    with pytest.raises(ValueError, match="non-empty"):
        get_quantiles(df, "v", [])


def test_even_quantiles_n_lt_2_raises(spark):
    from datasketches_pig_spark.sketch.quantiles import get_even_quantiles

    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="n must be >= 2"):
        get_even_quantiles(df, "v", 1)


def test_pmf_cdf_unsorted_splits_raise(spark):
    from datasketches_pig_spark.sketch.quantiles import get_cdf, get_pmf

    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="strictly increasing"):
        get_pmf(df, "v", [5.0, 2.0])
    with pytest.raises(ValueError, match="strictly increasing"):
        get_cdf(df, "v", [3.0, 3.0])
    with pytest.raises(ValueError, match="non-empty"):
        get_pmf(df, "v", [])


def test_theta_bad_k_raises(spark):
    from datasketches_pig_spark.sketch.theta import theta_sketch_agg

    df = spark.range(10).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    for bad in (0, 8, 100):  # too small / too small / not a power of 2
        with pytest.raises(ValueError, match="power of 2"):
            theta_sketch_agg(df, ["g"], "v", k=bad)


def test_frequent_items_approx_bad_map_size_raises(spark):
    from datasketches_pig_spark.sketch.frequencies import frequent_items_approx

    df = spark.range(10).select(F.col("id").cast("string").alias("item"))
    with pytest.raises(ValueError, match="power of 2"):
        frequent_items_approx(df, "item", 3, max_map_size=100)
    with pytest.raises(ValueError, match="top_n"):
        frequent_items_approx(df, "item", 0)


def test_aod_sketch_empty_value_cols_raises(spark):
    from datasketches_pig_spark.sketch.tuple_sketch import aod_sketch

    df = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="non-empty"):
        aod_sketch(df, "k", [])


def test_dedup_ops_empty_input(spark):
    """Dedup operators on an empty documents frame return empty, not error."""
    from datasketches_pig_spark.textops import dedup as dd

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dd.minhash_dedup_pairs(empty, "doc_id", "text").count() == 0
    assert dd.simhash_near_pairs(empty, "doc_id", "text").count() == 0


def test_bucket_pairs_singleton_buckets_empty(spark):
    """Buckets of size 1 produce no pairs at either salting level."""
    from datasketches_pig_spark.operators.lsh import bucket_pairs

    keyed = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, id string"
    )
    assert bucket_pairs(keyed, "k", "id", cap=8).count() == 0


def test_embedding_near_pairs_empty_corpus(spark):
    from datasketches_pig_spark.ann.knn import embedding_near_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert embedding_near_pairs(empty, method="exact").count() == 0
