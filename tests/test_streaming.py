"""Structured Streaming tests: file source + availableNow trigger, results
compared against the equivalent batch computation (FIXTURES.md F3 events)."""

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")


def _run_stream_to_memory(spark, stream_df, name, output_mode="update"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


@pytest.fixture(scope="module")
def events_stream(spark, tmp_path_factory):
    # file streaming source needs a directory, testdata is a single file
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    batch = spark.read.parquet(str(d))
    return spark.readStream.schema(batch.schema).parquet(str(d)), batch


def test_streaming_windowed_counts_matches_batch(spark, events_stream):
    from datasketches_pig_spark.streaming.ops import streaming_windowed_counts

    stream, batch = events_stream
    got = (
        _run_stream_to_memory(
            spark, streaming_windowed_counts(stream), "win_counts", "append"
        )
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    want = (
        batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    # append mode withholds windows still inside the final watermark horizon
    # (≤ watermark + window = 3h of tail windows); everything emitted must
    # match the batch result exactly
    assert len(want) - 5 <= len(got) <= len(want)
    merged = got.merge(
        want, on=["window_start", "event_type"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(got)
    assert (merged["n_s"] == merged["n_b"]).all()
    assert np.allclose(merged["sum_value_s"], merged["sum_value_b"])


def test_streaming_sessions_runs(spark, events_stream):
    from datasketches_pig_spark.streaming.ops import streaming_sessions

    stream, batch = events_stream
    got = _run_stream_to_memory(
        spark,
        streaming_sessions(stream.filter(F.col("user_id") < 50)),
        "sessions",
        "append",
    ).toPandas()
    assert len(got) > 0
    assert (got["session_end"] > got["session_start"]).all()
    # session count per user matches the batch lag-based definition
    w_batch = (
        batch.filter(F.col("user_id") < 50)
        .withColumn(
            "prev",
            F.lag("ts").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy("ts")
            ),
        )
        .withColumn(
            "ns",
            F.when(
                F.col("prev").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev") > 1800),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"))
        .toPandas()
        .set_index("user_id")["n_sessions"]
    )
    got_counts = got.groupby("user_id").size()
    for uid, n in got_counts.items():
        # append mode may withhold each user's final (unclosed) session
        assert w_batch[uid] - 1 <= n <= w_batch[uid], (
            f"user {uid}: stream {n} vs batch {w_batch[uid]}"
        )


def test_streaming_theta_distinct_accumulates(spark):
    """The Accumulator contract: feed two chunks, running estimate is exact
    below k and identical to a batch distinct count at the end."""
    from datasketches_pig_spark.streaming.ops import streaming_theta_distinct

    d = tempfile.mkdtemp(prefix="dsps_stream_")
    try:
        chunk1 = pd.DataFrame({"key": ["a"] * 50 + ["b"] * 30, "value": [str(i) for i in range(50)] + [str(i) for i in range(30)]})
        chunk2 = pd.DataFrame({"key": ["a"] * 40, "value": [str(i) for i in range(25, 65)]})
        spark.createDataFrame(chunk1).coalesce(1).write.parquet(f"{d}/in", mode="overwrite")
        spark.createDataFrame(chunk2).coalesce(1).write.parquet(f"{d}/in", mode="append")

        stream = spark.readStream.schema("key string, value string").parquet(f"{d}/in")
        out = _run_stream_to_memory(
            spark, streaming_theta_distinct(stream, k=256), "theta_stream", "update"
        ).toPandas()
        # last update per key = final running estimate (exact mode, < k)
        final = out.groupby("key").last()
        assert final.loc["a", "estimate"] == 65.0  # 0..64 distinct
        assert final.loc["b", "estimate"] == 30.0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_first_seen_dedup(spark, tmp_path):
    """Two micro-batches with overlapping keys: each key emitted exactly once,
    on its first appearance."""
    import pandas as pd

    from datasketches_pig_spark.streaming.ops import streaming_first_seen

    src = tmp_path / "src"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def run_batch():
        stream = (
            spark.readStream.schema("dedup_key string, doc_id string")
            .json(str(src))
        )

        def sink(batch_df, _id):
            batch_df.write.mode("append").parquet(str(out))

        q = (
            streaming_first_seen(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    pd.DataFrame({"dedup_key": ["k1", "k2", "k1"], "doc_id": ["a", "b", "c"]}).to_json(
        src / "batch0.json", orient="records", lines=True
    )
    run_batch()
    # second batch: k2 repeats (must not re-emit), k3 is new
    pd.DataFrame({"dedup_key": ["k2", "k3"], "doc_id": ["d", "e"]}).to_json(
        src / "batch1.json", orient="records", lines=True
    )
    run_batch()

    got = {
        (r.dedup_key, r.doc_id)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert {k for k, _ in got} == {"k1", "k2", "k3"}
    assert ("k2", "d") not in got  # second occurrence suppressed


def test_streaming_sliding_counts_matches_batch(spark, events_stream):
    from datasketches_pig_spark.streaming.ops import streaming_sliding_counts

    stream, batch = events_stream
    got = (
        _run_stream_to_memory(
            spark, streaming_sliding_counts(stream), "slide_counts", "append"
        )
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    want = (
        batch.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .toPandas()
    )
    # every emitted (window, key) must match batch exactly; the tail inside
    # the final watermark horizon may be withheld in append mode
    merged = got.merge(want, on=["window_start", "event_type"], suffixes=("_s", "_b"))
    assert len(merged) == len(got) > 0
    assert (merged["n_s"] == merged["n_b"]).all()


def test_streaming_dedup_exact_matches_batch_distinct(spark, tmp_path):
    from datasketches_pig_spark.streaming.ops import streaming_dedup_exact

    # craft a small directory with duplicated rows
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:01", "2024-01-01 00:00:01", "2024-01-01 00:10:00",
                 "2024-01-01 00:10:00", "2024-01-01 01:00:00"]
            ),
            "k": ["a", "a", "a", "b", "a"],
        }
    )
    d = tmp_path / "dupsrc"
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(d))
    batch = spark.read.parquet(str(d))
    stream = spark.readStream.schema(batch.schema).parquet(str(d))
    got = _run_stream_to_memory(
        spark, streaming_dedup_exact(stream, ["k"]), "dedup_exact_stream", "append"
    ).toPandas()
    # 4 distinct (k, ts) pairs out of 5 rows
    assert len(got) == 4
    assert got.duplicated(subset=["k", "ts"]).sum() == 0
