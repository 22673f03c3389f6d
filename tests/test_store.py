"""Bucketed signature store: the stored side of a clip_id join must carry no
Exchange (co-located sort-merge join), and verify-against-store must produce
the same verified pairs as the in-job path."""

import pyspark.sql.functions as F
import pytest

from datasketches_pig_spark.config import DedupConfig
from datasketches_pig_spark.data.clips import generate_clips_pandas
from datasketches_pig_spark.operators.stages import signature_stage
from datasketches_pig_spark.operators.verify import verify_pairs
from datasketches_pig_spark.store import (
    load_signatures_bucketed,
    save_signatures_bucketed,
)


@pytest.fixture(scope="module")
def sig_store(spark, tmp_path_factory):
    clips_pdf, _, _ = generate_clips_pandas(30, seed=77)
    clips = spark.createDataFrame(clips_pdf)
    cfg = DedupConfig()
    sigs = signature_stage(clips, cfg).localCheckpoint()
    d = tmp_path_factory.mktemp("store")
    spark.sql("DROP TABLE IF EXISTS sig_store_test")
    save_signatures_bucketed(sigs, "sig_store_test", str(d / "sigs"), num_buckets=8)
    return clips, cfg, sigs


def test_bucketed_join_no_exchange_on_stored_side(spark, sig_store):
    clips, cfg, sigs = sig_store
    stored = load_signatures_bucketed(spark, "sig_store_test")

    ids = [r["clip_id"] for r in sigs.select("clip_id").limit(20).collect()]
    probe = spark.createDataFrame([(i,) for i in ids], "a string")
    joined = probe.join(
        stored.withColumnRenamed("clip_id", "a").hint("merge"), "a"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the stored side scans with its bucket spec and needs NO shuffle: the
    # only hash-partitioning Exchange is the probe side being shuffled INTO
    # the table's bucketing; a non-bucketed read would need two
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Bucketed: true" in plan, plan
    assert "SelectedBucketsCount" in plan, plan


def test_verify_against_store_matches_in_job_path(spark, sig_store):
    clips, cfg, sigs = sig_store
    stored = load_signatures_bucketed(spark, "sig_store_test")

    ids = [r["clip_id"] for r in sigs.select("clip_id").limit(12).collect()]
    pairs = spark.createDataFrame(
        [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]], "a string, b string"
    )
    tr = clips.select("clip_id", "transcript")

    in_job = verify_pairs(pairs, sigs, cfg, transcripts=tr).toPandas()
    from_store = verify_pairs(pairs, stored, cfg, transcripts=tr).toPandas()
    key = ["a", "b"]
    assert (
        in_job.sort_values(key).reset_index(drop=True).equals(
            from_store.sort_values(key).reset_index(drop=True)
        )
    )
