"""Local emulation of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count + column names + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(9)
        elif np.issubdtype(pdf[c].dtype, np.integer):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from datasketches_pig_spark.queries import registry
    from datasketches_pig_spark.session import get_spark

    spark = get_spark("correctness", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, (fn, sql) in registry().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if sql is None:
            print(f"ok   {name}: rows-only ({len(got)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            failures.append(name)
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures.append(name)
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            failures.append(name)
            continue
        eq = True
        for c in g.columns:
            if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(
                w[c].dtype, np.floating
            ):
                if not np.allclose(
                    g[c].astype(float), w[c].astype(float), atol=1e-9, equal_nan=True
                ):
                    eq = False
            else:
                if not (g[c].astype(str) == w[c].astype(str)).all():
                    eq = False
            if not eq:
                print(f"FAIL {name}: column {c} differs")
                print("  spark:", g[c].head(5).tolist())
                print("  duck :", w[c].head(5).tolist())
                mism = g[c].astype(str) != w[c].astype(str)
                if mism.any():
                    i = int(np.flatnonzero(mism)[0])
                    print(f"  first mismatch row {i}: {g.iloc[i].to_dict()} vs {w.iloc[i].to_dict()}")
                break
        if eq:
            print(f"PASS {name} ({len(g)} rows, {time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
