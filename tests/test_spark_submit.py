"""North-rule launch shape, exercised for real: package the library with
``tools/package_pyfiles.sh``, launch ``spark-submit --py-files
dist/datasketches_pig_spark.zip tools/submit_pipeline.py`` as a subprocess
(its own JVM + driver, exactly the cluster invocation with a different
``--master``), and assert the clusters output + checkpoint manifest.

Slow (~1-2 min: a second Spark JVM boots) but it is the only test that
proves the shipped artifact — not the repo on sys.path — drives a run."""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]


def _spark_submit() -> str:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    from datasketches_pig_spark.data.clips import generate_clips_pandas

    # package the --py-files artifact from the current tree
    subprocess.run(
        ["sh", "tools/package_pyfiles.sh"], cwd=REPO, check=True,
        capture_output=True,
    )
    zip_path = REPO / "dist" / "datasketches_pig_spark.zip"
    assert zip_path.exists()

    clips_pdf, _, _ = generate_clips_pandas(25, seed=77)
    inp = tmp_path / "clips"
    spark.createDataFrame(clips_pdf).write.parquet(str(inp))
    run_dir = tmp_path / "ckpt"
    out = tmp_path / "clusters"

    env = dict(os.environ)
    # the submitted app must resolve the package from the zip, so do NOT
    # hand it the repo via PYTHONPATH; keep the JVM small next to the test
    # session's
    env.pop("PYTHONPATH", None)
    env.setdefault("SPARK_SUBMIT_OPTS", "-Xmx1g")
    p = subprocess.run(
        [
            _spark_submit(),
            "--master",
            "local[4]",
            "--driver-memory",
            "2g",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--py-files",
            str(zip_path),
            str(REPO / "tools" / "submit_pipeline.py"),
            "--input",
            str(inp),
            "--run-dir",
            str(run_dir),
            "--output",
            str(out),
        ],
        cwd=str(tmp_path),  # NOT the repo — imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert p.returncode == 0, f"spark-submit failed:\n{p.stderr[-4000:]}"

    # the driver printed its result line
    result = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    assert result, p.stdout[-2000:]
    rec = json.loads(result[-1])
    assert rec["clusters_rows"] == len(clips_pdf)
    stages = [e["stage"] for e in rec["lineage"]]
    assert stages == ["signatures", "bands", "candidates", "verified", "clusters"]

    # clusters parquet is readable without Spark and covers every clip
    table = pq.read_table(str(out))
    assert table.num_rows == len(clips_pdf)
    assert set(table.column_names) == {"clip_id", "cluster_id"}

    # checkpoint manifest committed with per-partition lineage + metrics
    with open(run_dir / "manifest.json") as f:
        m = json.load(f)
    assert set(m["stages"]) == {"signatures", "bands", "candidates", "verified", "clusters"}
    assert m["stages"]["signatures"]["lineage"]["signature_metrics"]["clips"] == len(
        clips_pdf
    )
    assert m["stages"]["candidates"]["lineage"]["band_metrics"]
