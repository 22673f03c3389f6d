"""Driver-contract query registry: every implemented operator family from
SURVEY.md §2 (plus the training-data operators) as a (spark_builder,
oracle_sql) pair over the driver's parquet tables.

Conventions that make the driver's order-insensitive value-hash comparison
work:
* every computed column is aliased identically in the DataFrame code and SQL;
* every floating result is ROUND()ed the same way on both sides (absorbs
  summation-order ulps);
* every top-k has a total deterministic tie-break;
* sketch operators run in exact mode at test scale (retained < k ⇒ zero
  error — the reference's own testing contract, theta/DataToSketchTest.java:137),
  so their oracle is plain COUNT(DISTINCT …)/quantile SQL.

Queries with no SQL-expressible oracle (murmur hashes, SimHash, LSH-bucketed
ANN) are registered without an oracle entry → the driver records the weaker
rows-only check; their semantics are pytest-verified instead.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datasketches_pig_spark.sketch.theta import (
    theta_a_not_b,
    theta_estimate,
    theta_intersect,
    theta_jaccard,
    theta_sketch_agg,
    theta_union_agg,
)
from datasketches_pig_spark.textops.analysis import (
    LANG_MARKERS,
    bpe_ish_token_count,
    lang_id,
    quality_features,
    token_count,
)
from datasketches_pig_spark.textops import dedup as dd
from datasketches_pig_spark.ann.knn import cosine_topk, rhp_lsh_topk

THETA_K = 4096


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# theta / distinct-counting family
# ---------------------------------------------------------------------------

def q_theta_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    sk = theta_sketch_agg(li, ["l_returnflag"], "l_partkey", THETA_K)
    return sk.select(
        "l_returnflag", F.round(theta_estimate("sketch", THETA_K), 1).alias("estimate")
    )


SQL_THETA_DISTINCT = """
SELECT l_returnflag, ROUND(CAST(COUNT(DISTINCT l_partkey) AS DOUBLE), 1) AS estimate
FROM lineitem GROUP BY l_returnflag
"""


def q_theta_union(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    per = theta_sketch_agg(li, ["l_linestatus"], "l_partkey", THETA_K)
    merged = theta_union_agg(per.withColumn("g", F.lit(1)), ["g"], "sketch", THETA_K)
    return merged.select(F.round(theta_estimate("sketch", THETA_K), 1).alias("estimate"))


SQL_THETA_UNION = """
SELECT ROUND(CAST(COUNT(DISTINCT l_partkey) AS DOUBLE), 1) AS estimate FROM lineitem
"""


def _flag_sketches(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    sk = theta_sketch_agg(
        li.filter(F.col("l_returnflag").isin("A", "R")), ["l_returnflag"], "l_partkey", THETA_K
    )
    a = sk.filter(F.col("l_returnflag") == "A").select(F.col("sketch").alias("ska"))
    r = sk.filter(F.col("l_returnflag") == "R").select(F.col("sketch").alias("skr"))
    return a.crossJoin(r)


def q_theta_intersect(spark, sf_dir):
    pair = _flag_sketches(spark, sf_dir)
    return pair.select(
        F.size(theta_intersect(F.col("ska"), F.col("skr"), THETA_K))
        .cast("long")
        .alias("n_common")
    )


SQL_THETA_INTERSECT = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_common FROM (
  SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A'
  INTERSECT
  SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R'
)
"""


def q_theta_anotb(spark, sf_dir):
    pair = _flag_sketches(spark, sf_dir)
    return pair.select(
        F.size(theta_a_not_b(F.col("ska"), F.col("skr"), THETA_K))
        .cast("long")
        .alias("n_a_not_b")
    )


SQL_THETA_ANOTB = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_a_not_b FROM (
  SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A'
  EXCEPT
  SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R'
)
"""


def q_theta_jaccard(spark, sf_dir):
    pair = _flag_sketches(spark, sf_dir)
    return pair.select(
        F.round(theta_jaccard(F.col("ska"), F.col("skr"), THETA_K), 6).alias("jaccard")
    )


SQL_THETA_JACCARD = """
WITH a AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A'),
     r AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
     i AS (SELECT COUNT(*) n FROM (SELECT * FROM a INTERSECT SELECT * FROM r)),
     u AS (SELECT COUNT(*) n FROM (SELECT * FROM a UNION SELECT * FROM r))
SELECT ROUND(i.n * 1.0 / u.n, 6) AS jaccard FROM i, u
"""


def q_theta_jaccard_bounds(spark, sf_dir):
    from datasketches_pig_spark.sketch.theta import theta_jaccard_bounds

    pair = _flag_sketches(spark, sf_dir)
    b = theta_jaccard_bounds(F.col("ska"), F.col("skr"), THETA_K)
    # exact mode at sf0.01 (distinct partkeys per flag < k) → lb == est == ub
    return pair.select(
        F.round(b["lb"], 6).alias("lb"),
        F.round(b["est"], 6).alias("est"),
        F.round(b["ub"], 6).alias("ub"),
    )


SQL_THETA_JACCARD_BOUNDS = """
WITH a AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A'),
     r AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
     i AS (SELECT COUNT(*) n FROM (SELECT * FROM a INTERSECT SELECT * FROM r)),
     u AS (SELECT COUNT(*) n FROM (SELECT * FROM a UNION SELECT * FROM r))
SELECT ROUND(i.n * 1.0 / u.n, 6) AS lb,
       ROUND(i.n * 1.0 / u.n, 6) AS est,
       ROUND(i.n * 1.0 / u.n, 6) AS ub
FROM i, u
"""


def q_rollup_agg(spark, sf_dir):
    """Grouping-sets coverage (SURVEY §2.10): rollup over (returnflag,
    linestatus) with grouping-level marker."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().alias("gid"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round("sum_qty", 2).alias("sum_qty"),
            "n",
            "gid",
        )
    )


SQL_ROLLUP_AGG = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_hll_bounds(spark, sf_dir):
    from datasketches_pig_spark.sketch.distinct import hll_estimate_with_bounds

    orders = _t(spark, sf_dir, "orders")
    out = hll_estimate_with_bounds(orders, "o_custkey", ["o_orderpriority"])
    return out.select(
        "o_orderpriority",
        F.round("est", 1).alias("est"),
        F.round("lb", 1).alias("lb"),
        F.round("ub", 1).alias("ub"),
    )


def q_hll_distinct(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    from datasketches_pig_spark.sketch.distinct import hll_distinct

    return hll_distinct(orders, "o_custkey", ["o_orderpriority"], exact=True)


SQL_HLL_DISTINCT = """
SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS estimate
FROM orders GROUP BY o_orderpriority
"""


def q_cpc_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(F.countDistinct("l_suppkey").cast("double").alias("estimate"))


SQL_CPC_DISTINCT = (
    "SELECT CAST(COUNT(DISTINCT l_suppkey) AS DOUBLE) AS estimate FROM lineitem"
)


# ---------------------------------------------------------------------------
# quantiles family (KLL / classic analogs)
# ---------------------------------------------------------------------------

def q_kll_quantiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("q25"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("q50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("q75"),
    )


SQL_KLL_QUANTILES = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS q50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS q75
FROM lineitem GROUP BY l_returnflag
"""


def q_kll_pmf(spark, sf_dir):
    from datasketches_pig_spark.sketch.quantiles import get_pmf

    li = _t(spark, sf_dir, "lineitem")
    out = get_pmf(li, "l_quantity", [10.0, 25.0, 40.0], ["l_linestatus"])
    return out.select(
        "l_linestatus", *[F.round(f"pmf_{i}", 6).alias(f"pmf_{i}") for i in range(4)]
    )


SQL_KLL_PMF = """
SELECT l_linestatus,
       ROUND(SUM(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) * 1.0 / COUNT(l_quantity), 6) AS pmf_0,
       ROUND(SUM(CASE WHEN l_quantity >= 10 AND l_quantity < 25 THEN 1 ELSE 0 END) * 1.0 / COUNT(l_quantity), 6) AS pmf_1,
       ROUND(SUM(CASE WHEN l_quantity >= 25 AND l_quantity < 40 THEN 1 ELSE 0 END) * 1.0 / COUNT(l_quantity), 6) AS pmf_2,
       ROUND(SUM(CASE WHEN l_quantity >= 40 THEN 1 ELSE 0 END) * 1.0 / COUNT(l_quantity), 6) AS pmf_3
FROM lineitem GROUP BY l_linestatus
"""


def q_kll_cdf(spark, sf_dir):
    from datasketches_pig_spark.sketch.quantiles import get_cdf

    li = _t(spark, sf_dir, "lineitem")
    out = get_cdf(li, "l_discount", [0.02, 0.05, 0.08])
    return out.select(*[F.round(f"cdf_{i}", 6).alias(f"cdf_{i}") for i in range(4)])


SQL_KLL_CDF = """
SELECT ROUND(SUM(CASE WHEN l_discount < 0.02 THEN 1 ELSE 0 END) * 1.0 / COUNT(l_discount), 6) AS cdf_0,
       ROUND(SUM(CASE WHEN l_discount < 0.05 THEN 1 ELSE 0 END) * 1.0 / COUNT(l_discount), 6) AS cdf_1,
       ROUND(SUM(CASE WHEN l_discount < 0.08 THEN 1 ELSE 0 END) * 1.0 / COUNT(l_discount), 6) AS cdf_2,
       ROUND(CAST(1.0 AS DOUBLE), 6) AS cdf_3
FROM lineitem
"""


def q_kll_rank(spark, sf_dir):
    from datasketches_pig_spark.sketch.quantiles import get_rank

    li = _t(spark, sf_dir, "lineitem")
    return get_rank(li, "l_quantity", 36.0).select(F.round("rank", 6).alias("rank"))


SQL_KLL_RANK = """
SELECT ROUND(SUM(CASE WHEN l_quantity < 36.0 THEN 1 ELSE 0 END) * 1.0 / COUNT(l_quantity), 6) AS rank
FROM lineitem
"""


def q_quantiles_strings(spark, sf_dir):
    """Lexicographic string quantile (ItemsSketch<String> analog): the value
    at rank ceil(q*n) of the sorted p_type values."""
    part = _t(spark, sf_dir, "part")
    w = Window.orderBy("p_type")
    ranked = part.select(
        "p_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return (
        ranked.filter(F.col("rn") == F.ceil(F.col("n") * 0.5))
        .select(F.col("p_type").alias("median_type"))
    )


SQL_QUANTILES_STRINGS = """
SELECT p_type AS median_type FROM (
  SELECT p_type, ROW_NUMBER() OVER (ORDER BY p_type) rn, COUNT(*) OVER () n FROM part
) WHERE rn = CEIL(n * 0.5)
"""


# ---------------------------------------------------------------------------
# frequent items
# ---------------------------------------------------------------------------

def q_freq_items(spark, sf_dir):
    from datasketches_pig_spark.sketch.frequencies import frequent_items

    li = _t(spark, sf_dir, "lineitem")
    return frequent_items(li.withColumn("item", F.col("l_suppkey").cast("string")), "item", 10)


SQL_FREQ_ITEMS = """
SELECT CAST(l_suppkey AS VARCHAR) AS item, COUNT(*) AS est, COUNT(*) AS lb, COUNT(*) AS ub
FROM lineitem GROUP BY l_suppkey
ORDER BY est DESC, item ASC LIMIT 10
"""


def q_freq_events(spark, sf_dir):
    from datasketches_pig_spark.sketch.frequencies import frequent_items

    ev = _t(spark, sf_dir, "events")
    return frequent_items(ev, "event_type", 5)


SQL_FREQ_EVENTS = """
SELECT event_type AS item, COUNT(*) AS est, COUNT(*) AS lb, COUNT(*) AS ub
FROM events GROUP BY event_type ORDER BY est DESC, item ASC LIMIT 5
"""


# ---------------------------------------------------------------------------
# sampling (exact-mode shortcuts: n ≤ k returns everything)
# ---------------------------------------------------------------------------

def q_reservoir_shortcut(spark, sf_dir):
    from datasketches_pig_spark.sketch.sampling import reservoir_sample

    sup = _t(spark, sf_dir, "supplier")
    out = reservoir_sample(sup, k=100000, group_cols=["s_nationkey"])
    return out.select("s_suppkey", "s_nationkey")


SQL_RESERVOIR_SHORTCUT = "SELECT s_suppkey, s_nationkey FROM supplier"


def q_varopt_union(spark, sf_dir):
    from datasketches_pig_spark.sketch.sampling import varopt_sample, varopt_union

    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", F.col("s_acctbal").cast("double").alias("weight")
    )
    # partial VarOpt per nation, exact mode (k ≫ group size), then merge —
    # also exact mode, so the union returns every row at its original weight
    partials = varopt_sample(
        sup, k=100000, weight_col="weight", group_cols=["s_nationkey"]
    )
    merged = varopt_union(partials.drop("weight"), k=100000)
    return merged.select("s_suppkey", F.round("vo_weight", 2).alias("vo_weight"))


SQL_VAROPT_UNION = (
    "SELECT s_suppkey, ROUND(CAST(s_acctbal AS DOUBLE), 2) AS vo_weight FROM supplier"
)


def q_kll_even_quantiles(spark, sf_dir):
    from datasketches_pig_spark.sketch.quantiles import get_even_quantiles

    li = _t(spark, sf_dir, "lineitem")
    out = get_even_quantiles(li, "l_extendedprice", 5)
    return out.select(
        *[F.round(c, 2).alias(f"q{i}") for i, c in enumerate(out.columns)]
    )


SQL_KLL_EVEN_QUANTILES = """
SELECT ROUND(quantile_cont(l_extendedprice, 0.00), 2) AS q0,
       ROUND(quantile_cont(l_extendedprice, 0.25), 2) AS q1,
       ROUND(quantile_cont(l_extendedprice, 0.50), 2) AS q2,
       ROUND(quantile_cont(l_extendedprice, 0.75), 2) AS q3,
       ROUND(quantile_cont(l_extendedprice, 1.00), 2) AS q4
FROM lineitem
"""


def q_strings_pmf(spark, sf_dir):
    from datasketches_pig_spark.sketch.quantiles import get_pmf

    part = _t(spark, sf_dir, "part")
    out = get_pmf(part, "p_type", ["LARGE", "PROMO", "STANDARD"])
    return out.select(
        *[F.round(f"pmf_{i}", 6).alias(f"pmf_{i}") for i in range(4)]
    )


SQL_STRINGS_PMF = """
SELECT ROUND(SUM(CASE WHEN p_type < 'LARGE' THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS pmf_0,
       ROUND(SUM(CASE WHEN p_type >= 'LARGE' AND p_type < 'PROMO' THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS pmf_1,
       ROUND(SUM(CASE WHEN p_type >= 'PROMO' AND p_type < 'STANDARD' THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS pmf_2,
       ROUND(SUM(CASE WHEN p_type >= 'STANDARD' THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS pmf_3
FROM part
"""


def q_theta_bounds(spark, sf_dir):
    from datasketches_pig_spark.sketch.theta import theta_error_bounds, theta_sketch_agg

    li = _t(spark, sf_dir, "lineitem")
    sk = theta_sketch_agg(li, ["l_returnflag"], "l_partkey", THETA_K)
    b = theta_error_bounds("sketch", THETA_K)
    return sk.select(
        "l_returnflag",
        F.round(b["est"], 1).alias("est"),
        F.round(b["ub"], 1).alias("ub"),
        F.round(b["lb"], 1).alias("lb"),
    )


# exact mode (distinct l_partkey per flag < k=4096 at sf0.01): ub == lb == est
SQL_THETA_BOUNDS = """
SELECT l_returnflag,
       ROUND(CAST(COUNT(DISTINCT l_partkey) AS DOUBLE), 1) AS est,
       ROUND(CAST(COUNT(DISTINCT l_partkey) AS DOUBLE), 1) AS ub,
       ROUND(CAST(COUNT(DISTINCT l_partkey) AS DOUBLE), 1) AS lb
FROM lineitem GROUP BY l_returnflag
"""


def q_freq_approx(spark, sf_dir):
    from datasketches_pig_spark.sketch.frequencies import frequent_items_approx

    li = _t(spark, sf_dir, "lineitem")
    # map size > distinct supplier count at this sf → exact mode, err = 0
    return frequent_items_approx(
        li.withColumn("item", F.col("l_suppkey").cast("string")), "item", 10, 4096
    )


SQL_FREQ_APPROX = """
SELECT CAST(l_suppkey AS VARCHAR) AS item, COUNT(*) AS est, COUNT(*) AS lb, COUNT(*) AS ub
FROM lineitem GROUP BY l_suppkey
ORDER BY est DESC, item ASC LIMIT 10
"""


def q_reservoir_union(spark, sf_dir):
    from datasketches_pig_spark.sketch.sampling import reservoir_union

    cust = _t(spark, sf_dir, "customer")
    # per-nation partial reservoirs in exact mode (k ≫ rows per nation), then
    # merge in exact mode (k ≫ total) → the union returns every customer
    partials = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.collect_list(F.struct("c_custkey", "c_nationkey")).alias("samples"),
    )
    merged = reservoir_union(partials, k=1000000)
    return merged.select("c_custkey", "c_nationkey")


SQL_RESERVOIR_UNION = "SELECT c_custkey, c_nationkey FROM customer"


def q_aod_ttest(spark, sf_dir):
    from datasketches_pig_spark.sketch.tuple_sketch import aod_p_values_df

    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A")
    b = li.filter(F.col("l_returnflag") == "N")
    out = aod_p_values_df(a, b, "l_partkey", ["l_quantity", "l_extendedprice"])
    return out.select(
        F.round("p_l_quantity", 6).alias("p_qty"),
        F.round("p_l_extendedprice", 6).alias("p_price"),
    )


def q_varopt_shortcut(spark, sf_dir):
    from datasketches_pig_spark.sketch.sampling import varopt_sample

    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_acctbal").cast("double").alias("weight")
    )
    out = varopt_sample(sup, k=100000, weight_col="weight")
    return out.select("s_suppkey", F.round("vo_weight", 2).alias("vo_weight"))


SQL_VAROPT_SHORTCUT = (
    "SELECT s_suppkey, ROUND(CAST(s_acctbal AS DOUBLE), 2) AS vo_weight FROM supplier"
)


# ---------------------------------------------------------------------------
# tuple sketch analogs
# ---------------------------------------------------------------------------

def q_aod_sums(spark, sf_dir):
    from datasketches_pig_spark.sketch.tuple_sketch import aod_sketch

    li = _t(spark, sf_dir, "lineitem")
    sk = aod_sketch(li, "l_partkey", ["l_quantity", "l_extendedprice"])
    return sk.select(
        F.col("key").alias("l_partkey"),
        F.round("sum_l_quantity", 2).alias("sum_qty"),
        F.round("sum_l_extendedprice", 2).alias("sum_price"),
    )


SQL_AOD_SUMS = """
SELECT l_partkey, ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem GROUP BY l_partkey
"""


def q_aod_estimates(spark, sf_dir):
    from datasketches_pig_spark.sketch.tuple_sketch import aod_estimates

    li = _t(spark, sf_dir, "lineitem")
    out = aod_estimates(li, "l_partkey", ["l_quantity"])
    return out.select(
        F.col("est").alias("est"), F.round("sum_l_quantity", 2).alias("sum_qty")
    )


SQL_AOD_ESTIMATES = """
SELECT CAST(COUNT(DISTINCT l_partkey) AS DOUBLE) AS est,
       ROUND(SUM(l_quantity), 2) AS sum_qty FROM lineitem
"""


def q_aod_means(spark, sf_dir):
    from datasketches_pig_spark.sketch.tuple_sketch import aod_means

    li = _t(spark, sf_dir, "lineitem")
    out = aod_means(li, "l_partkey", ["l_quantity", "l_extendedprice"])
    return out.select(
        F.round("mean_l_quantity", 4).alias("mean_qty"),
        F.round("mean_l_extendedprice", 2).alias("mean_price"),
    )


SQL_AOD_MEANS = """
WITH sums AS (
  SELECT l_partkey, SUM(l_quantity) sq, SUM(l_extendedprice) sp
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(AVG(sq), 4) AS mean_qty, ROUND(AVG(sp), 2) AS mean_price FROM sums
"""


def q_aod_variances(spark, sf_dir):
    from datasketches_pig_spark.sketch.tuple_sketch import aod_variances

    li = _t(spark, sf_dir, "lineitem")
    out = aod_variances(li, "l_partkey", ["l_quantity"])
    return out.select(F.round("var_l_quantity", 2).alias("var_qty"))


SQL_AOD_VARIANCES = """
WITH sums AS (SELECT l_partkey, SUM(l_quantity) sq FROM lineitem GROUP BY l_partkey)
SELECT ROUND(VAR_SAMP(sq), 2) AS var_qty FROM sums
"""


def q_double_summary_percentile(spark, sf_dir):
    from datasketches_pig_spark.sketch.tuple_sketch import double_summary_percentile

    li = _t(spark, sf_dir, "lineitem")
    out = double_summary_percentile(li, "l_partkey", "l_quantity", 95.0)
    return out.select(F.round("pctile", 4).alias("pctile"))


SQL_DOUBLE_SUMMARY_PERCENTILE = """
WITH sums AS (SELECT l_partkey, SUM(l_quantity) sq FROM lineitem GROUP BY l_partkey)
SELECT ROUND(quantile_cont(sq, 0.95), 4) AS pctile FROM sums
"""


# ---------------------------------------------------------------------------
# table-level set ops / window top-k / streaming-analog event queries
# ---------------------------------------------------------------------------

def q_setop_intersect(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return a.intersect(b).select(F.col("o_custkey").alias("custkey"))


SQL_SETOP_INTERSECT = """
SELECT o_custkey AS custkey FROM orders WHERE YEAR(o_orderdate) = 1996
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE YEAR(o_orderdate) = 1997
"""


def q_setop_except(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return a.distinct().exceptAll(b.distinct()).select(F.col("o_custkey").alias("custkey"))


SQL_SETOP_EXCEPT = """
SELECT o_custkey AS custkey FROM orders WHERE YEAR(o_orderdate) = 1996
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE YEAR(o_orderdate) = 1997
"""


def q_topk_window(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rnk")
    )


SQL_TOPK_WINDOW = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders WHERE o_custkey < 100
) WHERE rnk <= 3
"""


def q_events_tumbling(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.col("ts"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


SQL_EVENTS_TUMBLING = """
SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_sessions(spark, sf_dir):
    """Sessionization analog: sessions = gaps > 30 min, per user (< 200)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts")
    lagged = ev.withColumn("prev_ts", F.lag("ts").over(w))
    new_sess = F.when(
        F.col("prev_ts").isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > 1800),
        1,
    ).otherwise(0)
    return (
        lagged.withColumn("ns", new_sess)
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


SQL_EVENTS_SESSIONS = """
WITH lagged AS (
  SELECT user_id, ts, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events WHERE user_id < 200
)
SELECT user_id,
       CAST(SUM(CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM lagged GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# training-data ops: dedup / text analysis / ANN
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dd.exact_dedup(docs, "doc_id", "text")


SQL_DEDUP_EXACT = """
WITH keyed AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
  FROM documents
), canon AS (SELECT norm, MIN(doc_id) canonical_id FROM keyed GROUP BY norm)
SELECT k.doc_id, c.canonical_id FROM keyed k JOIN canon c USING (norm)
"""

_NGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
), grams AS (
  SELECT DISTINCT doc_id, t[i.i] || ' ' || t[i.i+1] || ' ' || t[i.i+2] AS sh
  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, greatest(len(t)-1, 1))) AS i) i
  WHERE len(t) >= 3
), sizes AS (SELECT doc_id, COUNT(*) n FROM grams GROUP BY 1),
common AS (
  SELECT a.doc_id a, b.doc_id b, COUNT(*) c FROM grams a JOIN grams b USING (sh)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT a, b, ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard FROM common
JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
"""


def q_dedup_ngram(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = dd.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    return out.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_minhash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = dd.minhash_dedup_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    return out.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_simhash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dd.simhash_near_pairs(docs, "doc_id", "text", n=3, max_hamming=6)


def q_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id("text").alias("pred_lang"))


def _sql_marker(words: list[str]) -> str:
    pat = "|".join(rf"\b{w}\b" for w in words)
    return f"len(regexp_extract_all(lower(text), '{pat}'))"


def _sql_lang_id() -> str:
    langs = list(LANG_MARKERS)
    score_cols = ", ".join(
        f"{_sql_marker(ws)} AS s_{lang}" for lang, ws in LANG_MARKERS.items()
    )
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} >= 1"]
        conds += [f"s_{lang} > s_{o}" for o in langs[:i]]
        conds += [f"s_{lang} >= s_{o}" for o in langs[i + 1 :]]
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return f"""
WITH scored AS (SELECT doc_id, {score_cols} FROM documents)
SELECT doc_id, {case} AS pred_lang FROM scored
"""


def q_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = quality_features(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.round("mean_word_len", 4).alias("mean_word_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("quality_score", 6).alias("quality_score"),
    )


def _sql_quality() -> str:
    all_markers = [w for ws in LANG_MARKERS.values() for w in ws]
    stop = _sql_marker(all_markers)
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS INT) AS n_tokens,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         {stop} AS n_stop
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
  ROUND(CASE WHEN n_tokens > 0 THEN (n_chars - (n_tokens - 1)) * 1.0 / n_tokens ELSE 0.0 END, 4) AS mean_word_len,
  ROUND(CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0.0 END, 6) AS punct_ratio,
  ROUND(CASE WHEN n_tokens > 0 THEN n_stop * 1.0 / n_tokens ELSE 0.0 END, 6) AS stopword_ratio,
  ROUND(LEAST(n_tokens / 50.0, 1.0) * 0.4
    + CASE WHEN n_tokens > 0 AND (n_chars - (n_tokens - 1)) * 1.0 / n_tokens BETWEEN 3 AND 10 THEN 0.3 ELSE 0.0 END
    + CASE WHEN (CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0.0 END) <= 0.2 THEN 0.2 ELSE 0.0 END
    + LEAST((CASE WHEN n_tokens > 0 THEN n_stop * 1.0 / n_tokens ELSE 0.0 END) * 2, 0.1), 6) AS quality_score
FROM base
"""


def q_token_count(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").cast("int").alias("n_ws_tokens"),
        bpe_ish_token_count("text").cast("int").alias("n_bpe_tokens"),
    )


SQL_TOKEN_COUNT = """
SELECT doc_id,
  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(string_split_regex(trim(text), '\\s+')) END AS INT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens
FROM documents
"""


def q_fingerprint(spark, sf_dir):
    from datasketches_pig_spark.textops.analysis import doc_fingerprints

    docs = _t(spark, sf_dir, "documents")
    return doc_fingerprints(docs, "doc_id", "text")


def q_ann_cosine(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3)
    out = cosine_topk(corpus, queries, k=5)
    return out.select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")


SQL_ANN_COSINE = """
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id >= 3
), q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 3
), scored AS (
  SELECT q.query_id, c.vec_id,
         list_dot_product(c.e, q.e)
           / (SQRT(list_dot_product(c.e, c.e)) * SQRT(list_dot_product(q.e, q.e)) + 1e-30)
           AS cosine
  FROM c CROSS JOIN q
)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, vec_id ASC) AS rank FROM scored
) WHERE rank <= 5
"""


def q_ann_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3)
    out = rhp_lsh_topk(corpus, queries, k=5, n_bits=16, max_hamming=6)
    return out.select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")


def q_ann_ivf(spark, sf_dir):
    from datasketches_pig_spark.ann.knn import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3)
    out = ivf_topk(corpus, queries, k=5, n_centroids=8, n_probe=4)
    return out.select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")


def q_murmur3(spark, sf_dir):
    from datasketches_pig_spark.functions.spark_udfs import murmur3_128

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return part.select(
        "p_partkey", murmur3_128(F.col("p_name"), seed=9001, divisor=7).alias("h")
    ).select("p_partkey", "h.h0", "h.h1", "h.mod")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def registry() -> dict[str, tuple[Callable, str | None]]:
    return {
        "theta_distinct": (q_theta_distinct, SQL_THETA_DISTINCT),
        "theta_union": (q_theta_union, SQL_THETA_UNION),
        "theta_intersect": (q_theta_intersect, SQL_THETA_INTERSECT),
        "theta_anotb": (q_theta_anotb, SQL_THETA_ANOTB),
        "theta_jaccard": (q_theta_jaccard, SQL_THETA_JACCARD),
        "hll_distinct": (q_hll_distinct, SQL_HLL_DISTINCT),
        "cpc_distinct": (q_cpc_distinct, SQL_CPC_DISTINCT),
        "kll_quantiles": (q_kll_quantiles, SQL_KLL_QUANTILES),
        "kll_pmf": (q_kll_pmf, SQL_KLL_PMF),
        "kll_cdf": (q_kll_cdf, SQL_KLL_CDF),
        "kll_rank": (q_kll_rank, SQL_KLL_RANK),
        "quantiles_strings": (q_quantiles_strings, SQL_QUANTILES_STRINGS),
        "freq_items": (q_freq_items, SQL_FREQ_ITEMS),
        "freq_events": (q_freq_events, SQL_FREQ_EVENTS),
        "reservoir_shortcut": (q_reservoir_shortcut, SQL_RESERVOIR_SHORTCUT),
        "reservoir_union": (q_reservoir_union, SQL_RESERVOIR_UNION),
        "varopt_shortcut": (q_varopt_shortcut, SQL_VAROPT_SHORTCUT),
        "varopt_union": (q_varopt_union, SQL_VAROPT_UNION),
        "kll_even_quantiles": (q_kll_even_quantiles, SQL_KLL_EVEN_QUANTILES),
        "strings_pmf": (q_strings_pmf, SQL_STRINGS_PMF),
        "theta_bounds": (q_theta_bounds, SQL_THETA_BOUNDS),
        "theta_jaccard_bounds": (q_theta_jaccard_bounds, SQL_THETA_JACCARD_BOUNDS),
        "rollup_agg": (q_rollup_agg, SQL_ROLLUP_AGG),
        "hll_bounds": (q_hll_bounds, None),
        "freq_approx": (q_freq_approx, SQL_FREQ_APPROX),
        "aod_ttest": (q_aod_ttest, None),
        "aod_sums": (q_aod_sums, SQL_AOD_SUMS),
        "aod_estimates": (q_aod_estimates, SQL_AOD_ESTIMATES),
        "aod_means": (q_aod_means, SQL_AOD_MEANS),
        "aod_variances": (q_aod_variances, SQL_AOD_VARIANCES),
        "double_summary_percentile": (
            q_double_summary_percentile,
            SQL_DOUBLE_SUMMARY_PERCENTILE,
        ),
        "setop_intersect": (q_setop_intersect, SQL_SETOP_INTERSECT),
        "setop_except": (q_setop_except, SQL_SETOP_EXCEPT),
        "topk_window": (q_topk_window, SQL_TOPK_WINDOW),
        "events_tumbling": (q_events_tumbling, SQL_EVENTS_TUMBLING),
        "events_sessions": (q_events_sessions, SQL_EVENTS_SESSIONS),
        "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
        "dedup_ngram": (q_dedup_ngram, _NGRAM_ORACLE),
        "dedup_minhash": (q_dedup_minhash, _NGRAM_ORACLE),
        "dedup_simhash": (q_dedup_simhash, None),
        "lang_id": (q_lang_id, _sql_lang_id()),
        "quality_score": (q_quality, _sql_quality()),
        "token_count": (q_token_count, SQL_TOKEN_COUNT),
        "doc_fingerprint": (q_fingerprint, None),
        "ann_cosine": (q_ann_cosine, SQL_ANN_COSINE),
        "ann_lsh": (q_ann_lsh, None),
        "ann_ivf": (q_ann_ivf, None),
        "murmur3": (q_murmur3, None),
    }
