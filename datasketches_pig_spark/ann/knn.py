"""Approximate-nearest-neighbor search over an embedding column.

* ``cosine_topk`` — exact brute-force baseline: broadcast the (small) query
  set, dot product via JVM higher-order functions (``aggregate``/``zip_with``
  — whole-stage codegen, no Python), window top-k per query.
* ``rhp_lsh_topk`` — the scale path: random-hyperplane (SimHash-for-cosine)
  signatures bucket the corpus; candidates = rows whose signature is within
  ``max_hamming`` of the query's (chunk-banded join, no full scan), exact
  cosine re-rank on candidates only.  Recall is tunable via n_bits /
  max_hamming and is asserted against the brute-force baseline in tests.

At 100 TB the corpus side stays partitioned; only signatures + band keys
shuffle.  Queries are assumed broadcastable (typical ANN-serving shape).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine per query: (query_id, vec_id, cosine, rank)."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        (
            _dot(F.col("cvec"), F.col("qvec"))
            / (F.col("cnorm") * F.col("qnorm") + F.lit(1e-30))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def make_hyperplanes(dim: int, n_bits: int = 16, seed: int = 9001) -> np.ndarray:
    return np.random.default_rng([seed, dim, n_bits]).normal(size=(n_bits, dim))


def rhp_signature_df(
    df: DataFrame, id_col: str, vec_col: str, planes: np.ndarray
) -> DataFrame:
    """Random-hyperplane signature as an int64 column — computed with JVM
    array algebra (one aggregate per bit over a broadcast plane literal)."""
    sig = F.lit(0).cast("long")
    for b in range(planes.shape[0]):
        plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        bit = (_dot(F.col(vec_col), plane) >= 0).cast("long")
        sig = sig + F.shiftleft(bit, b)
    return df.select(F.col(id_col).alias("id"), sig.alias("rhp_sig"))


def rhp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_bits: int = 16,
    max_hamming: int = 4,
    seed: int = 9001,
) -> DataFrame:
    """LSH-bucketed ANN: candidates within signature Hamming ≤ max_hamming
    (pigeonhole over 4 chunks), exact cosine re-rank."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = make_hyperplanes(dim, n_bits, seed)
    nchunks = 4
    bits_per = n_bits // nchunks
    mask = (1 << bits_per) - 1

    csig = rhp_signature_df(corpus, id_col, vec_col, planes)
    qsig = rhp_signature_df(queries, query_id_col, vec_col, planes)

    def chunked(sig_df, idname):
        return sig_df.select(
            F.col("id").alias(idname),
            F.col("rhp_sig").alias(f"{idname}_sig"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("chunk"),
                            F.shiftright("rhp_sig", bits_per * i)
                            .bitwiseAND(F.lit(mask))
                            .alias("val"),
                        )
                        for i in range(nchunks)
                    ]
                )
            ).alias("c"),
        ).select(idname, f"{idname}_sig", "c.chunk", "c.val")

    cc = chunked(csig, "vec_id")
    qc = chunked(qsig, "query_id")
    cand = (
        cc.join(F.broadcast(qc), ["chunk", "val"])
        .filter(
            F.bit_count(F.col("vec_id_sig").bitwiseXOR(F.col("query_id_sig")))
            <= max_hamming
        )
        .select("query_id", "vec_id")
        .distinct()
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    scored = (
        cand.join(c, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("cvec"), F.col("qvec"))
                / (F.col("cnorm") * F.col("qnorm") + F.lit(1e-30))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
