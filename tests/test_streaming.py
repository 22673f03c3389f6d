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
    # per-KEY dedup within the 2h watermark horizon: all five rows fall inside
    # one horizon, so exactly one row survives per key regardless of timestamp
    assert sorted(got["k"]) == ["a", "b"]
    # the survivor is the first-seen event per key
    assert got.set_index("k")["ts"]["a"] == pd.Timestamp("2024-01-01 00:00:01")


def test_streaming_ingest_dedup_matches_from_scratch(spark, tmp_path):
    """Two streamed micro-batches folded into persisted history must leave
    the cluster state identical to the from-scratch batch run over all
    clips (modulo transcript-less borderline pairs, which this corpus has
    none of)."""
    import pyspark.sql.functions as F

    from datasketches_pig_spark.config import DedupConfig
    from datasketches_pig_spark.data.clips import generate_clips_pandas
    from datasketches_pig_spark.incremental import save_history
    from datasketches_pig_spark.pipeline import run_pipeline
    from datasketches_pig_spark.streaming.ingest import streaming_ingest_dedup

    cfg = DedupConfig()
    clips_pdf, _, truth = generate_clips_pandas(24, seed=55)
    by_cluster = truth.groupby("cluster_id")["clip_id"].apply(list)
    order = sorted(clips_pdf["clip_id"])
    # history = first 60% of ids; two stream batches split the rest, so some
    # groups straddle history/batch and batch/batch boundaries
    n = len(order)
    hist_ids = set(order[: int(n * 0.6)])
    b1_ids = set(order[int(n * 0.6): int(n * 0.8)])
    hist = clips_pdf[clips_pdf["clip_id"].isin(hist_ids)]
    b1 = clips_pdf[clips_pdf["clip_id"].isin(b1_ids)]
    b2 = clips_pdf[~clips_pdf["clip_id"].isin(hist_ids | b1_ids)]

    for t in ("sing_signatures", "sing_band_buckets", "sing_clusters"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    r0 = run_pipeline(spark, spark.createDataFrame(hist), cfg)
    save_history(
        spark, r0.stage_frames["signatures"], r0.clusters, cfg,
        str(tmp_path / "hist"), "sing", num_buckets=8,
    )

    src = tmp_path / "stream_in"
    src.mkdir()
    schema = spark.createDataFrame(clips_pdf).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = streaming_ingest_dedup(
        spark, stream, cfg, "sing", str(tmp_path / "hist"),
        str(tmp_path / "assign_out"), str(tmp_path / "ckpt"),
    )
    try:
        spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["clip_id"]: r["cluster_id"]
        for r in spark.table("sing_clusters").collect()
    }
    full = run_pipeline(spark, spark.createDataFrame(clips_pdf), cfg)
    want = {r["clip_id"]: r["cluster_id"] for r in full.clusters.collect()}
    assert got == want

    sink = spark.read.parquet(str(tmp_path / "assign_out"))
    assert sink.select("batch_id").distinct().count() == 2
    assert sink.count() == len(b1) + len(b2)

    # the incrementally-folded band store (append + sketch-style summary
    # merge, never an O(history) band re-scan) must be semantically equal to
    # a from-scratch bucket_summaries over ALL band rows: bucket_n and
    # center always; the full member list whenever the bucket is under cap
    from datasketches_pig_spark.incremental import all_bands
    from datasketches_pig_spark.operators.lsh import bucket_summaries

    cap = cfg.max_bucket_size
    want_b = bucket_summaries(
        all_bands(spark.table("sing_signatures"), cfg), "band_key", "clip_id", cap
    ).toPandas().set_index("band_key")
    got_b = spark.table("sing_band_buckets").toPandas().set_index("band_key")
    assert sorted(got_b.index) == sorted(want_b.index)
    for bk in want_b.index:
        assert got_b.loc[bk, "bucket_n"] == want_b.loc[bk, "bucket_n"]
        assert got_b.loc[bk, "center"] == want_b.loc[bk, "center"]
        if want_b.loc[bk, "bucket_n"] <= cap:
            assert sorted(got_b.loc[bk, "members"]) == sorted(
                want_b.loc[bk, "members"]
            )


def test_streaming_ingest_transcript_store_plumbing(spark, tmp_path):
    """With a transcript_store path configured, each micro-batch appends its
    (clip_id, transcript) rows and later batches read the store back for the
    cross-batch substring check (the batch-equivalent verify contract)."""
    import pyspark.sql.functions as F

    from datasketches_pig_spark.config import DedupConfig
    from datasketches_pig_spark.data.clips import generate_clips_pandas
    from datasketches_pig_spark.incremental import save_history
    from datasketches_pig_spark.pipeline import run_pipeline
    from datasketches_pig_spark.streaming.ingest import streaming_ingest_dedup

    cfg = DedupConfig()
    clips_pdf, _, _ = generate_clips_pandas(12, seed=77)
    order = sorted(clips_pdf["clip_id"])
    n = len(order)
    hist_ids = set(order[: n // 2])
    b1_ids = set(order[n // 2 : 3 * n // 4])
    hist = clips_pdf[clips_pdf["clip_id"].isin(hist_ids)]
    b1 = clips_pdf[clips_pdf["clip_id"].isin(b1_ids)]
    b2 = clips_pdf[~clips_pdf["clip_id"].isin(hist_ids | b1_ids)]

    for t in ("ts_signatures", "ts_band_buckets", "ts_clusters"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    r0 = run_pipeline(spark, spark.createDataFrame(hist), cfg)
    save_history(
        spark, r0.stage_frames["signatures"], r0.clusters, cfg,
        str(tmp_path / "hist"), "ts", num_buckets=8,
    )

    src = tmp_path / "stream_in"
    src.mkdir()
    tstore = str(tmp_path / "transcripts")
    schema = spark.createDataFrame(clips_pdf).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = streaming_ingest_dedup(
        spark, stream, cfg, "ts", str(tmp_path / "hist"),
        str(tmp_path / "assign_out"), str(tmp_path / "ckpt"),
        transcript_store=tstore,
    )
    try:
        spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        store_after_b1 = spark.read.parquet(tstore)
        assert sorted(r["clip_id"] for r in store_after_b1.collect()) == sorted(
            b1["clip_id"]
        )
        spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    store = spark.read.parquet(tstore).toPandas()
    assert sorted(store["clip_id"]) == sorted(list(b1["clip_id"]) + list(b2["clip_id"]))
    # transcripts round-trip byte-identically (the substring check's input)
    want = clips_pdf.set_index("clip_id")["transcript"]
    got = store.set_index("clip_id")["transcript"]
    assert all(got[cid] == want[cid] for cid in store["clip_id"])
