"""r5 test-depth round: per-operator ctor/arg validation for the ToString
analogs (the reference validates every UDF arg at construction —
``theta/DataToSketchTest.java:519-523`` style), streaming watermark/session
edge cases, and journal corruption states beyond injected crashes."""

import json

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# ToString analogs + ctor validation
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame(
        [(float(i % 7), str(i % 5)) for i in range(40)], "v double, s string"
    ).localCheckpoint()


def test_hll_cpc_lgk_validation(spark, small):
    from datasketches_pig_spark.sketch.distinct import (
        cpc_distinct,
        cpc_estimate_with_bounds,
        cpc_to_string,
        hll_distinct,
        hll_estimate_with_bounds,
        hll_to_string,
    )

    for bad in (3, 22, 0, -1, "12", 12.5):
        with pytest.raises(ValueError, match="HLL lgK"):
            hll_distinct(small, "s", lg_k=bad)
        with pytest.raises(ValueError, match="HLL lgK"):
            hll_to_string(small, "s", lg_k=bad)
        with pytest.raises(ValueError, match="HLL lgK"):
            hll_estimate_with_bounds(small, "s", lg_k=bad)
    for bad in (3, 27):
        with pytest.raises(ValueError, match="CPC lgK"):
            cpc_distinct(small, "s", lg_k=bad)
        with pytest.raises(ValueError, match="CPC lgK"):
            cpc_to_string(small, "s", lg_k=bad)
        with pytest.raises(ValueError, match="CPC lgK"):
            cpc_estimate_with_bounds(small, "s", lg_k=bad)
    # boundary values are legal
    hll_to_string(small, "s", lg_k=4, exact=True).collect()
    cpc_to_string(small, "s", lg_k=26, exact=True).collect()


def test_to_string_schemas_and_content(spark, small):
    """Every ToString analog returns exactly one (summary: string) row whose
    content carries the family tag and the exact-mode estimate."""
    from datasketches_pig_spark.sketch.distinct import cpc_to_string, hll_to_string
    from datasketches_pig_spark.sketch.frequencies import frequent_items_to_string
    from datasketches_pig_spark.sketch.quantiles import kll_to_string

    for fn, tag in ((hll_to_string, "HLL sketch:"), (cpc_to_string, "CPC sketch:")):
        out = fn(small, "s", exact=True)
        assert out.columns == ["summary"]
        rows = out.collect()
        assert len(rows) == 1
        assert rows[0]["summary"].startswith(tag)
        assert "estimate=5.0" in rows[0]["summary"]  # 5 distinct strings

    out = kll_to_string(small, "v").collect()
    assert len(out) == 1
    assert out[0]["summary"].startswith("KLL sketch: k=200, n=40")

    out = frequent_items_to_string(small, "s").collect()
    assert len(out) == 1
    s = out[0]["summary"]
    assert s.startswith("FrequentItems sketch:")
    assert "streamLen=40" in s and "totalError=0" in s  # exact mode


def test_kll_freq_theta_arg_validation(spark, small):
    from datasketches_pig_spark.sketch.frequencies import frequent_items_to_string
    from datasketches_pig_spark.sketch.quantiles import kll_to_string
    from datasketches_pig_spark.sketch.theta import theta_sketch_to_string

    for bad in (7, 65536, 0):
        with pytest.raises(ValueError, match="KLL k"):
            kll_to_string(small, "v", k=bad)
    for bad in (0, 1, 3, 1000):
        with pytest.raises(ValueError, match="power of 2"):
            frequent_items_to_string(small, "s", max_map_size=bad)
    for bad in (8, 100, 0):
        with pytest.raises(ValueError, match="power of 2"):
            theta_sketch_to_string(F.array(F.lit(1).cast("long")), k=bad)


# ---------------------------------------------------------------------------
# streaming edge cases
# ---------------------------------------------------------------------------

def _run_stream(spark, stream_df, name, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def test_watermark_drops_late_event(spark, tmp_path):
    """An event older than (max ts seen − watermark) arriving in a LATER
    micro-batch must not resurrect its window (append mode emits only
    closed windows; the late row is dropped by the watermark)."""
    from datasketches_pig_spark.streaming.ops import streaming_windowed_counts

    d = tmp_path / "src"
    d.mkdir()
    schema = "ts timestamp, event_type string, value double"
    fresh = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 10:10:00", "2024-01-01 10:20:00", "2024-01-01 15:00:00"]
            ),
            "event_type": ["a", "a", "a"],
            "value": [1.0, 1.0, 1.0],
        }
    )
    late = pd.DataFrame(
        {
            # 10:15 is inside the 10:00 window, but by the time this file is
            # read the watermark sits at 15:00 − 2h = 13:00 → dropped
            "ts": pd.to_datetime(["2024-01-01 10:15:00", "2024-01-01 15:30:00"]),
            "event_type": ["a", "a"],
            "value": [100.0, 1.0],
        }
    )
    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def run_once():
        # two separate availableNow runs over one checkpoint: the watermark
        # persists in the checkpoint, so the second run sees the late file
        # with the first run's 13:00 watermark already in force — a
        # deterministic micro-batch boundary
        stream = spark.readStream.schema(schema).parquet(str(d))
        q = (
            streaming_windowed_counts(stream, window="1 hour", watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    spark.createDataFrame(fresh).coalesce(1).write.mode("append").parquet(str(d))
    run_once()
    spark.createDataFrame(late).coalesce(1).write.mode("append").parquet(str(d))
    run_once()
    out = spark.read.parquet(str(out_dir)).toPandas()
    w10 = out[out["window_start"] == pd.Timestamp("2024-01-01 10:00:00")]
    # the 10:00 window closed with its TWO on-time events; the late 100.0
    # never entered it
    assert len(w10) == 1
    assert w10.iloc[0]["n"] == 2
    assert w10.iloc[0]["sum_value"] == 2.0


def test_session_gap_boundary(spark):
    """Session-window boundary semantics (pinned by this test so a Spark
    upgrade that changes them fails loudly): an event exactly ``gap`` after
    the previous one still MERGES (Spark merges touching sessions —
    [10:00, 10:30] + [10:30, 11:00] coalesce), and only gap + 1s starts a
    new session.  (Batch-mode session_window shares the streaming
    operator's semantics.)"""
    from datasketches_pig_spark.streaming.ops import streaming_sessions

    rows = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [
                    "2024-01-01 10:00:00",
                    "2024-01-01 10:30:00",  # exactly gap after → still merged
                    "2024-01-01 11:00:01",  # gap + 1s after prev → new session
                ]
            ),
            "user_id": ["u"] * 3,
        }
    )
    df = spark.createDataFrame(rows)
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    assert sorted(r["n_events"] for r in out) == [1, 2]
    # and the streaming operator builds the same plan shape without error
    streaming_sessions(df, gap="30 minutes")


def test_empty_stream_terminates_cleanly(spark, tmp_path):
    from datasketches_pig_spark.streaming.ops import streaming_windowed_counts

    d = tmp_path / "empty"
    d.mkdir()
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(str(d))
    out = _run_stream(
        spark, streaming_windowed_counts(stream), "wm_empty", "append"
    )
    assert out.count() == 0


def test_streaming_theta_ignores_null_values(spark, tmp_path):
    """Null values must not count toward the distinct estimate (the
    reference's DataToSketch skips null tuple fields) and must not crash
    the Arrow state update."""
    from datasketches_pig_spark.streaming.ops import streaming_theta_distinct

    d = tmp_path / "nulls"
    pdf = pd.DataFrame(
        {"key": ["k"] * 6, "value": ["a", None, "b", None, "a", "c"]}
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(d))
    stream = spark.readStream.schema("key string, value string").parquet(str(d))
    out = _run_stream(
        spark, streaming_theta_distinct(stream), "theta_nulls", "update"
    ).toPandas()
    assert float(out[out["key"] == "k"]["estimate"].iloc[-1]) == 3.0


# ---------------------------------------------------------------------------
# journal corruption (beyond injected crashes)
# ---------------------------------------------------------------------------

def test_corrupt_marker_raises_loudly(spark, tmp_path):
    from datasketches_pig_spark.config import DedupConfig
    from datasketches_pig_spark.incremental import pending_fold, repair_fold

    base = tmp_path / "store"
    j = base / "_fold_journal"
    j.mkdir(parents=True)
    (j / "marker.json").write_text("{not json")
    with pytest.raises(ValueError, match="corrupted"):
        pending_fold(str(base))
    with pytest.raises(ValueError, match="corrupted"):
        repair_fold(spark, DedupConfig(), str(base), "whatever")


def test_marker_without_inputs_fails_loudly(spark, tmp_path):
    """A marker whose journaled inputs are missing (partially deleted
    journal) must fail the repair with the missing path named — silently
    treating it as clean would re-expose the lost-fold hazard."""
    from datasketches_pig_spark.config import DedupConfig
    from datasketches_pig_spark.incremental import repair_fold

    base = tmp_path / "store2"
    j = base / "_fold_journal"
    j.mkdir(parents=True)
    (j / "marker.json").write_text(json.dumps({"n": 1, "idhash": 2}))
    with pytest.raises(Exception, match="new_sigs"):
        repair_fold(spark, DedupConfig(), str(base), "whatever")
