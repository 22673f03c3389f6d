"""Incremental-vs-from-scratch benchmark: dedup a small daily batch against a
large persisted history and compare with re-running the full pipeline over
history ∪ batch.

Usage: python tools/incremental_bench.py <history_clips_parquet_dir> [batch_groups]
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(history_dir: str, batch_groups: int = 2000) -> None:
    import pyspark.sql.functions as F

    from datasketches_pig_spark.config import DedupConfig
    from datasketches_pig_spark.data.clips import generate_clips_spark
    from datasketches_pig_spark.incremental import incremental_dedup, save_history
    from datasketches_pig_spark.pipeline import run_pipeline
    from datasketches_pig_spark.session import get_spark, warm_python_workers

    spark = get_spark("inc-bench", cores=8, shuffle_partitions=16)
    warm_python_workers(spark)

    history = spark.read.parquet(f"{history_dir}/clips.parquet")
    batch = (
        generate_clips_spark(
            spark, batch_groups, seed=4242, out_dir="/tmp/inc_bench_batch"
        )
        .withColumn("clip_id", F.concat(F.lit("batch_"), F.col("clip_id")))
        .localCheckpoint()
    )
    n_hist, n_batch = history.count(), batch.count()
    cfg = DedupConfig()

    # build + persist history once (not part of either timed path)
    for t in ("incb_signatures", "incb_band_buckets", "incb_clusters"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree("/tmp/inc_bench_hist", ignore_errors=True)
    r1 = run_pipeline(spark, history, cfg)
    save_history(
        spark, r1.stage_frames["signatures"], r1.clusters, cfg,
        "/tmp/inc_bench_hist", "incb",
    )

    # timed: incremental batch vs persisted history
    t0 = time.time()
    inc = incremental_dedup(
        spark, batch, cfg, "incb",
        old_transcripts=history.select("clip_id", "transcript"),
    )
    n_assigned = inc.assignments.count()
    inc_wall = time.time() - t0

    # timed: the persistence fold — O(batch) append+summary-merge
    # (incremental.fold_history) vs the legacy full-history rewrite
    from datasketches_pig_spark.incremental import fold_history

    a = inc.assignments.localCheckpoint()
    m = inc.merges.localCheckpoint()
    t0 = time.time()
    fold_history(spark, inc.new_sigs, a, m, cfg, "/tmp/inc_bench_hist", "incb")
    fold_wall = time.time() - t0

    t0 = time.time()
    save_history(
        spark,
        spark.table("incb_signatures").localCheckpoint(),
        spark.table("incb_clusters").localCheckpoint(),
        cfg,
        "/tmp/inc_bench_hist_rewrite",
        "incb_rw",
    )
    rewrite_wall = time.time() - t0

    # timed: from-scratch over history ∪ batch
    both = history.unionByName(batch)
    t0 = time.time()
    full = run_pipeline(spark, both, cfg)
    n_full = full.clusters.count()
    full_wall = time.time() - t0

    print(
        json.dumps(
            {
                "history_clips": n_hist,
                "batch_clips": n_batch,
                "incremental_wall_s": round(inc_wall, 2),
                "from_scratch_wall_s": round(full_wall, 2),
                "speedup": round(full_wall / inc_wall, 1),
                "fold_append_wall_s": round(fold_wall, 2),
                "fold_full_rewrite_wall_s": round(rewrite_wall, 2),
                "fold_speedup": round(rewrite_wall / fold_wall, 1),
                "batch_assigned": n_assigned,
                "full_rows": n_full,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 2000)
