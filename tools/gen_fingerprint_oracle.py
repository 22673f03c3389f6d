"""Generate the DuckDB oracle for the `doc_fingerprint` query.

Independent scalar replication of the winnowing-style fingerprint: per-token
scalar-spec murmur3 (pytest-verified vs public vectors), Karp-Rabin rolling
hash over 8-token windows mod 2^64, fingerprint = unsigned-min window hash
reinterpreted as int64.  The production kernel is vectorized numpy; this is
plain Python ints, so it cross-checks the modular arithmetic end to end.

Usage: python tools/gen_fingerprint_oracle.py [sf_dir]   # prints the SQL
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datasketches_pig_spark.functions.murmur3 import murmur3_x64_128  # noqa: E402

BASE = 1000003
WINDOW = 8
MASK = (1 << 64) - 1


def fingerprint(text: str) -> int:
    # ASCII-whitespace byte tokens — the flat_token_hashes tokenizer contract
    toks = (text or "").lower().encode("utf-8").split()
    th = [murmur3_x64_128(w, 9001)[0] for w in toks]
    if not th:
        return 0
    w = min(WINDOW, len(th))
    best = None
    for p in range(len(th) - w + 1):
        acc = 0
        for j in range(w):
            acc = (acc * BASE + th[p + j]) & MASK
        best = acc if best is None else min(best, acc)
    return best - (1 << 64) if best >= (1 << 63) else best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()
    body = ",\n  ".join(f"({did}, {fingerprint(t)})" for did, t in rows)
    print(
        "SELECT CAST(doc_id AS BIGINT) AS doc_id,"
        " CAST(fingerprint AS BIGINT) AS fingerprint FROM (VALUES\n  "
        + body
        + "\n) t(doc_id, fingerprint)"
    )


if __name__ == "__main__":
    main()
