"""Job-timeline profiler: run the pipeline once (warm) + once timed with the
Spark event log on, then print per-job wall and the driver-side gaps between
jobs — the serial fraction that caps N->4N scaling efficiency.

Usage: python tools/profile_jobs.py <in_dir> <cores>
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(in_dir: str, cores: int) -> None:
    from datasketches_pig_spark.config import DedupConfig
    from datasketches_pig_spark.pipeline import run_pipeline
    from datasketches_pig_spark.session import get_spark, warm_python_workers

    log_dir = "/tmp/dsps_eventlog"
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)

    spark = get_spark(
        f"profile-{cores}",
        cores=cores,
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            **json.loads(os.environ.get("PROFILE_EXTRA_CONF", "{}")),
        },
    )
    warm_python_workers(spark)
    clips = spark.read.parquet(f"{in_dir}/clips.parquet")
    clips.count()
    run_pipeline(spark, clips, DedupConfig()).clusters.count()  # warm

    t0 = time.time()
    res = run_pipeline(spark, clips, DedupConfig())
    res.clusters.count()
    wall = time.time() - t0
    t_end = time.time()
    print(json.dumps({"wall_s": round(wall, 2),
                      "stages": [{k: e[k] for k in ("stage", "wall_s") if k in e}
                                 for e in res.lineage]}))
    spark.stop()

    # parse event log (rolling zstd format): jobs inside the timed window
    import glob
    import subprocess

    jobs = {}
    for fp in sorted(glob.glob(f"{log_dir}/eventlog_v2_*/events_*")):
        text = subprocess.run(
            ["zstd", "-dc", fp], capture_output=True, text=True
        ).stdout
        for line in text.splitlines():
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e.get("Event") == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {
                    "start": e["Submission Time"] / 1000.0,
                    "desc": (e.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:80]
                    or (e["Stage Infos"][-1]["Stage Name"][:80] if e.get("Stage Infos") else ""),
                }
            elif e.get("Event") == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["end"] = e["Completion Time"] / 1000.0

    window = [
        (jid, j) for jid, j in sorted(jobs.items())
        if "end" in j and j["start"] >= t0 - 0.5 and j["end"] <= t_end + 0.5
    ]
    prev_end = t0
    total_gap = total_job = 0.0
    for jid, j in window:
        gap = j["start"] - prev_end
        dur = j["end"] - j["start"]
        total_gap += max(gap, 0)
        total_job += dur
        print(f"job {jid:3d}  gap {gap:6.2f}s  dur {dur:7.2f}s  {j['desc']}")
        prev_end = j["end"]
    print(f"jobs={len(window)} total_job={total_job:.2f}s "
          f"total_gap={total_gap:.2f}s wall={wall:.2f}s")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
