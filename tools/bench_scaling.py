"""Scaling-efficiency evidence (BASELINE.md protocol): run the identical
bench job on identical input at local[8] (N) and local[32] (4N), report
clips/sec at both and efficiency = (throughput_32 / throughput_8) / 4.

Each run is a fresh subprocess (own JVM) so parallelism is honestly isolated.

Usage: python tools/bench_scaling.py [n_groups] [sf_dir]
Writes results into BENCH/BASELINE.md-compatible markdown on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_bench(cpus: int, n_groups: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_BENCH_GROUPS": str(n_groups),
            "PYTHONPATH": str(REPO),
        }
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench failed at cpus={cpus}: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    r8 = run_bench(8, n_groups, sf_dir)
    r32 = run_bench(32, n_groups, sf_dir)
    eff = (r32["clips_per_sec"] / r8["clips_per_sec"]) / 4.0

    print("| run | cores | clips | wall (s) | clips/sec | efficiency |")
    print("|---|---|---|---|---|---|")
    print(
        f"| bench-N | local[8] | {r8['n_clips']} | {r8['value']} | {r8['clips_per_sec']} | — |"
    )
    print(
        f"| bench-4N | local[32] | {r32['n_clips']} | {r32['value']} | {r32['clips_per_sec']} | {eff:.3f} |"
    )
    print()
    print(json.dumps({"n8": r8, "n32": r32, "efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()
