"""Generate the DuckDB oracle for the `ann_lsh` query.

Independent (Spark-free) numpy replication of the RHP-LSH pipeline —
signatures, chunk banding, Hamming filter, exact cosine re-rank — over the
same sf0.01 embeddings table.  The output is the candidate top-k *pair list*
as a SQL VALUES clause; the oracle SQL then recomputes cosine and rank for
those pairs inside DuckDB (so float rounding semantics stay DuckDB's, exactly
as in the passing ann_cosine oracle).

The hyperplanes are the operator's parameter (seeded RNG, shared by both
implementations, like a hash seed); everything downstream here is an
independent reimplementation used to cross-check the Spark path.

Usage: python tools/gen_ann_lsh_oracle.py [sf_dir]   # prints the SQL
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datasketches_pig_spark.ann.knn import make_hyperplanes  # noqa: E402

N_BITS = 64
MAX_HAMMING = 16
N_CHUNKS = 4
K = 5
_M64 = (1 << 64) - 1  # popcount on the 64-bit pattern, not the signed value


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    x = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])

    # queries = deterministically perturbed copies of the first 3 corpus
    # vectors (the high-similarity regime the LSH prefilter serves); the
    # same elementwise transform is applied by the Spark query and the
    # DuckDB oracle SQL, so all three implementations see identical doubles
    q_mask = ids < 3
    qids = ids[q_mask]
    factor = 1 + 0.01 * ((np.arange(x.shape[1]) % 7) - 3)
    qx = x[q_mask] * factor
    cids, cx = ids, x  # corpus keeps all rows incl. the query sources

    planes = make_hyperplanes(x.shape[1], N_BITS, 9001)
    weights = 1 << np.arange(N_BITS, dtype=np.int64)

    def sigs(v: np.ndarray) -> np.ndarray:
        return (((v @ planes.T) >= 0).astype(np.int64) * weights).sum(axis=1)

    qsig, csig = sigs(qx), sigs(cx)
    bits_per = N_BITS // N_CHUNKS
    mask = (1 << bits_per) - 1

    pairs = []
    for qi, qs, qv in zip(qids, qsig, qx):
        # banding: candidate iff some chunk matches, then Hamming filter
        shares = np.zeros(len(cids), dtype=bool)
        for c in range(N_CHUNKS):
            shares |= ((csig >> (bits_per * c)) & mask) == ((int(qs) >> (bits_per * c)) & mask)
        ham = np.array(
            [bin((int(qs) ^ int(s)) & _M64).count("1") for s in csig]
        )
        cand = shares & (ham <= MAX_HAMMING)
        if not cand.any():
            continue
        cv, cc = cx[cand], cids[cand]
        cos = (cv @ qv) / (
            np.linalg.norm(cv, axis=1) * np.linalg.norm(qv) + 1e-30
        )
        order = np.lexsort((cc, -cos))[:K]
        for vid in cc[order]:
            pairs.append((int(qi), int(vid)))

    values = ",\n  ".join(f"({a}, {b})" for a, b in pairs)
    sql = f"""WITH cand(query_id, vec_id) AS (VALUES
  {values}
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), q AS (
  SELECT vec_id AS query_id,
         list_transform(range(1, len(e)+1), i -> e[i] * (1 + 0.01*((i-1)%7 - 3))) AS e
  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id < 3)
), scored AS (
  SELECT cand.query_id, cand.vec_id,
         list_dot_product(c.e, q.e)
           / (SQRT(list_dot_product(c.e, c.e)) * SQRT(list_dot_product(q.e, q.e)) + 1e-30)
           AS cosine
  FROM cand JOIN c ON cand.vec_id = c.vec_id JOIN q ON cand.query_id = q.query_id
)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
FROM scored"""
    print(sql)


if __name__ == "__main__":
    main()
