"""Generate the DuckDB oracle for the `dedup_simhash` query.

Independent (Spark-free, scalar) replication of the shingle-hash contract
(`operators/signatures.py:word_ngram_hash_sets`): lowercased-utf8 ASCII-
whitespace tokens → scalar-spec murmur3 per token (`murmur3_x64_128`,
pytest-verified against the public reference vectors) → word-3-gram hash =
scalar murmur3 over the 24-byte little-endian concat of the three token
hashes → distinct gram hashes → SimHash bit-majority (bit j set iff strictly
more than half the gram hashes have bit j set) → brute-force all-pairs
Hamming ≤ 6.  The production path runs the vectorized flat-array kernel +
Manku banded join instead, so this cross-checks both the fingerprint math
and the banding completeness.  Output: VALUES list of the expected
(a, b, hamming) rows.

Usage: python tools/gen_simhash_oracle.py [sf_dir]   # prints the SQL
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datasketches_pig_spark.functions.murmur3 import murmur3_x64_128  # noqa: E402

N = 3
CHAR_FALLBACK_N = 5
MAX_HAMMING = 6
SEED = 9001


def gram_hashes(text: str) -> set[int]:
    """Scalar replication of ``word_ngram_hash_sets`` incl. the r4
    no-space-script fallback: < N whitespace tokens → char
    CHAR_FALLBACK_N-grams over the ws-normalized text (tokens = chars)."""
    toks = (text or "").lower().encode("utf-8").split()
    if len(toks) >= N:
        th = [murmur3_x64_128(w, SEED)[0] for w in toks]
        n = N
    else:
        norm = b" ".join(toks).decode("utf-8")
        th = [murmur3_x64_128(c.encode("utf-8"), SEED)[0] for c in norm]
        n = CHAR_FALLBACK_N
    return {
        murmur3_x64_128(
            b"".join(h.to_bytes(8, "little") for h in th[i : i + n]), SEED
        )[0]
        for i in range(max(len(th) - n + 1, 0))
    }


def simhash(text: str) -> int:
    hs = gram_hashes(text)
    if not hs:
        return 0
    fp = 0
    for j in range(64):
        ones = sum((h >> j) & 1 for h in hs)
        if 2 * ones > len(hs):
            fp |= 1 << j
    return fp


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()
    fps = [(did, simhash(t)) for did, t in rows]
    out = []
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            ham = bin(fps[i][1] ^ fps[j][1]).count("1")
            if ham <= MAX_HAMMING:
                a, b = sorted((fps[i][0], fps[j][0]))
                out.append((a, b, ham))
    out.sort()
    body = ",\n  ".join(f"({a}, {b}, {h})" for a, b, h in out)
    print(
        "SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,"
        " CAST(hamming AS INT) AS hamming FROM (VALUES\n  "
        + body
        + "\n) t(a, b, hamming)"
    )


if __name__ == "__main__":
    main()
