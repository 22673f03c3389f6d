"""Long-document evidence for the text prefix screen (VERDICT r5 §3).

The corpus-adaptive gate in ``textops/dedup.py:minhash_dedup_pairs``
auto-disables the prefix screen below ``4 * prefix_verify`` mean shingles,
resting on a measured short-doc LOSS (~80-shingle docs: ON 93s vs OFF
83-88s).  The asymptotic win the screen exists for — 10³–10⁴-shingle web
pages, where the gram join it displaces shuffles thousands of shingles per
candidate side — was argued, not measured.  This tool measures it:

  gen   <dir> <n_docs>   seeded corpus of 1.5k-4k-WORD docs (~1.5k-4k
                         shingles at n=3), 8%% near-dup rate
  run   <dir> <cores> <mode>   one timed minhash_dedup_pairs run; mode =
                         on (prefix_min_mean_shingles=0, screen forced) |
                         off (prefix_verify=None, join-everything baseline) |
                         auto (default gate — must pick ON here)
  all   [n_docs]         gen + interleaved taskset-pinned on/off pairs
                         (the same steal-hygiene as scaling_bench.py)

Output: one JSON line per run with wall, pair count (must be identical
across modes — parity), and the chosen mode.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def gen(out_dir: str, n_docs: int) -> None:
    import numpy as np

    from datasketches_pig_spark.session import get_spark

    rng = np.random.default_rng(777)
    vocab = np.array([f"w{i:05d}" for i in range(30000)])
    texts: list[str] = []
    for i in range(n_docs):
        if i > 50 and rng.random() < 0.08:
            src = int(rng.integers(0, i))
            words = texts[src].split()
            # edit 1 in 12 words — keeps pairs near/above J=0.8
            for pos in rng.integers(0, len(words), size=max(len(words) // 12, 1)):
                words[pos] = str(vocab[rng.integers(0, len(vocab))])
            texts.append(" ".join(words))
        else:
            ln = int(rng.integers(1500, 4000))
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), size=ln)]))
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})
    spark = get_spark("longdoc-gen", cores=32, shuffle_partitions=64)
    spark.createDataFrame(pdf).repartition(64).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    mean_words = float(np.mean([len(t.split()) for t in texts]))
    print(json.dumps({"generated": n_docs, "mean_words": round(mean_words, 1), "dir": out_dir}))
    spark.stop()


def run(in_dir: str, cores: int, mode: str) -> None:
    from datasketches_pig_spark.session import get_spark, warm_python_workers
    from datasketches_pig_spark.textops.dedup import minhash_dedup_pairs

    kw = {
        "on": {"prefix_verify": 64, "prefix_min_mean_shingles": 0},
        "off": {"prefix_verify": None},
        "auto": {},
    }[mode]
    spark = get_spark(f"longdoc-{mode}-{cores}", cores=cores, shuffle_partitions=2 * cores)
    warm_python_workers(spark)
    docs = spark.read.parquet(f"{in_dir}/documents.parquet")
    n = docs.count()
    minhash_dedup_pairs(docs, "doc_id", "text", 3, 0.8, **kw).count()  # warm
    trials = int(os.environ.get("SPARK_GRAFT_LONGDOC_TRIALS", "1"))
    walls, n_pairs = [], 0
    for _ in range(trials):
        t0 = time.time()
        n_pairs = minhash_dedup_pairs(docs, "doc_id", "text", 3, 0.8, **kw).count()
        walls.append(round(time.time() - t0, 2))
    print(
        json.dumps(
            {
                "mode": mode,
                "cores": cores,
                "docs": n,
                "dup_pairs": n_pairs,
                "wall_s": min(walls),
                "trials": walls,
            }
        )
    )
    spark.stop()


def all_(n_docs: int) -> None:
    d = tempfile.mkdtemp(prefix="dsps_longdoc_")
    me = str(REPO / "tools" / "longdoc_bench.py")

    def sub(args: list[str], cpus: int | None = None) -> dict:
        cmd = [sys.executable, me, *args]
        if cpus is not None:
            cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
        p = subprocess.run(cmd, capture_output=True, text=True, cwd=str(REPO), check=False)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"subprocess {args} produced no JSON")
        return json.loads(line[-1])

    print(json.dumps(sub(["gen", d, str(n_docs)])), file=sys.stderr)
    cores = int(os.environ.get("SPARK_GRAFT_LONGDOC_CORES", "8"))
    pairs = int(os.environ.get("SPARK_GRAFT_LONGDOC_PAIRS", "3"))
    results = []
    for _ in range(pairs):
        r_on = sub(["run", d, str(cores), "on"], cpus=cores)
        r_off = sub(["run", d, str(cores), "off"], cpus=cores)
        assert r_on["dup_pairs"] == r_off["dup_pairs"], "parity violated"
        results.append(
            {
                "on": r_on,
                "off": r_off,
                "speedup_on_over_off": round(r_off["wall_s"] / r_on["wall_s"], 3),
            }
        )
        print(json.dumps(results[-1]), file=sys.stderr)
    # the auto gate must pick ON for this corpus (mean shingles >> 4*prefix)
    r_auto = sub(["run", d, str(cores), "auto"], cpus=cores)
    print(
        json.dumps(
            {
                "pairs": results,
                "auto": r_auto,
                "speedups": [r["speedup_on_over_off"] for r in results],
            }
        )
    )


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "gen":
        gen(sys.argv[2], int(sys.argv[3]))
    elif cmd == "run":
        run(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    else:
        all_(int(sys.argv[2]) if len(sys.argv) > 2 else 40000)
