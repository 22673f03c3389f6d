"""spark-submit entrypoint for the near-dup pipeline (north-rule launch shape:
``spark-submit --py-files dist/datasketches_pig_spark.zip tools/submit_pipeline.py
--input <clips parquet/iceberg> --run-dir <checkpoint dir>``).

On a real cluster the same invocation works unchanged with ``--master
yarn``/``k8s`` etc.; the session factory only sets master when none is
configured, so spark-submit's cluster choice wins.  Package the library with
``tools/package_pyfiles.sh`` first.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _check_pyfiles_freshness() -> None:
    """Warn when the shipped --py-files zip is older than the source tree.

    The zip is a build artifact (not in version control); a stale one means
    executors run outdated code while the driver-side import (repo on
    sys.path) runs current code — a silent skew.  Best-effort: skipped when
    the repo layout isn't present (e.g. cluster-mode where only the zip
    exists)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = os.path.join(here, "dist", "datasketches_pig_spark.zip")
    pkg = os.path.join(here, "datasketches_pig_spark")
    if not (os.path.exists(zip_path) and os.path.isdir(pkg)):
        return
    zt = os.path.getmtime(zip_path)
    newest = max(
        (
            os.path.getmtime(os.path.join(r, f))
            for r, _, files in os.walk(pkg)
            for f in files
            if f.endswith(".py")
        ),
        default=0.0,
    )
    if newest > zt:
        print(
            "WARNING: dist/datasketches_pig_spark.zip is older than the source "
            "tree — rebuild with tools/package_pyfiles.sh before spark-submit",
            file=sys.stderr,
        )


def main() -> None:
    _check_pyfiles_freshness()
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="clips table path (parquet dir)")
    ap.add_argument("--run-dir", required=True, help="checkpoint/lineage directory")
    ap.add_argument("--output", default=None, help="optional clusters output path")
    args = ap.parse_args()

    # imports after arg parsing so --help works without the zip on sys.path
    from pyspark.sql import SparkSession

    from datasketches_pig_spark.config import DedupConfig
    from datasketches_pig_spark.pipeline import run_pipeline

    spark = SparkSession.builder.appName("dsps-near-dup").getOrCreate()
    clips = spark.read.parquet(args.input)
    res = run_pipeline(spark, clips, DedupConfig(), run_dir=args.run_dir)
    n = res.clusters.count()
    if args.output:
        res.clusters.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"clusters_rows": n, "lineage": res.lineage}))
    spark.stop()


if __name__ == "__main__":
    main()
