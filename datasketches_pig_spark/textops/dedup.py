"""Document-level deduplication operators for training-data pipelines.

Four families, all built on the same primitives as the clip pipeline:

* exact dedup        — hash-groupBy on normalized text (pure relational)
* n-gram Jaccard     — relational shingle self-join with exact Jaccard
* MinHash + LSH      — our murmur/minhash kernels + band join, exact verify
* SimHash            — 64-bit fingerprints, chunk-banded Hamming join

The relational forms (exact, n-gram) are DuckDB-oracle-checkable; MinHash-LSH
output equals the brute-force n-gram Jaccard pairs at the same threshold when
banding recall is ~1 (b=32, r=4 → miss prob ≈ 5e-8 at J=0.8), which the
driver's oracle comparison exercises.

Scale notes: the shingle self-join joins on the shingle value — Catalyst
shuffles both sides on the shingle, so frequency-skewed shingles are the hot
keys; ``ngram_jaccard_pairs`` drops top-frequency shingles (stopword-gram
pruning, standard at corpus scale) before the join when ``max_doc_freq`` is
set.  MinHash-LSH is the 100 TB path: candidate generation touches only
(band_key, doc_id) pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datasketches_pig_spark.functions.murmur3 import murmur3_x64_128_fixed
from datasketches_pig_spark.operators.signatures import band_hashes, minhash_signatures, simhash64


def tokens_expr(text_col: str):
    """Whitespace tokens of lowercased text — same in Spark and ANSI SQL."""
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def word_ngrams(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) distinct word n-grams, relationally (no UDF)."""
    toks = df.select(F.col(id_col).alias("id"), tokens_expr(text_col).alias("toks"))
    # guard size < n: F.sequence would count *down* for a negative end
    gram_arr = F.when(
        F.size("toks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select("id", F.explode(gram_arr).alias("shingle"))
    return grams.distinct()


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate mapping on normalized text: every doc → canonical
    (min id with identical normalized text).  Pure groupBy — the cheapest
    dedup pass; at 100 TB this is one shuffle on a 64-bit text hash."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    keyed = df.select(F.col(id_col).alias("doc_id"), norm.alias("__norm"))
    canon = keyed.groupBy("__norm").agg(F.min("doc_id").alias("canonical_id"))
    return keyed.join(canon, "__norm").select("doc_id", "canonical_id")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All pairs (a < b) with word-n-gram Jaccard ≥ threshold — the
    brute-force-exact dedup (quadratic in co-shingled docs; the oracle for
    the MinHash path).  The default is EXACT (no shingle dropped) so this
    operator stays a valid oracle.

    At corpus scale, pass ``max_doc_freq`` (e.g. 1000) to drop shingles
    appearing in more docs than that before the self-join — without it one
    stopword-gram ("of the and") makes the join quadratic in corpus size.
    With it set, Jaccard values over hot-shingled pairs are approximate
    (stopword-gram pruning); the MinHash-LSH path is the production dedup."""
    grams = word_ngrams(df, id_col, text_col, n)
    if max_doc_freq:
        hot = grams.groupBy("shingle").count().filter(F.col("count") > max_doc_freq)
        grams = grams.join(hot.select("shingle"), "shingle", "left_anti")
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = grams.select(F.col("id").alias("a"), "shingle")
    b = grams.select(F.col("id").alias("b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


MINHASH_SCHEMA = "id long, minhash array<long>, simhash long, n_shingles int"


def minhash_stage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 128,
    seed: int = 9001,
) -> DataFrame:
    """(id, minhash, simhash, n_shingles) via the vectorized murmur kernel
    over word n-grams — one Arrow pass, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sets: list[np.ndarray] = []
            for t in pdf[text_col]:
                toks = (t or "").lower().split()
                grams = {
                    " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
                }
                if not grams:
                    sets.append(np.empty(0, dtype=np.uint64))
                    continue
                raw = sorted(g.encode("utf-8") for g in grams)
                by_len: dict[int, list[bytes]] = {}
                for r in raw:
                    by_len.setdefault(len(r), []).append(r)
                hs = []
                for length, items in by_len.items():
                    buf = np.frombuffer(b"".join(items), dtype=np.uint8).reshape(
                        len(items), length
                    )
                    h1, _ = murmur3_x64_128_fixed(buf, seed)
                    hs.append(h1)
                sets.append(np.unique(np.concatenate(hs)))
            counts = np.array([len(s) for s in sets], dtype=np.int64)
            concat = (
                np.concatenate(sets) if counts.sum() else np.empty(0, dtype=np.uint64)
            )
            mh = minhash_signatures(concat, counts, num_perm, seed)
            sh = simhash64(concat, counts)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "minhash": list(mh.view(np.int64)),
                    "simhash": sh,
                    "n_shingles": counts.astype(np.int32),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=MINHASH_SCHEMA)


def minhash_lsh_candidates(
    sigs: DataFrame,
    band_count: int = 32,
    rows_per_band: int = 4,
    seed: int = 9001,
) -> DataFrame:
    """(a, b) candidate pairs from band-bucket equality.

    Recall contract (same shape as ``simhash_near_pairs``): complete while no
    band bucket exceeds the expansion cap.  Band keys are 64-bit hashes of
    r=4 minhash rows, so an over-cap bucket means > cap docs agree on a full
    band — a mass-duplicate cluster, where the salted expansion star-links
    and the downstream Jaccard verify may drop borderline (non-center) pairs;
    pair recall above the cap is approximate."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["n_shingles"] > 0]
            if not len(pdf):
                continue
            sig = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["minhash"]]).view(
                np.uint64
            )
            bh = band_hashes(sig, band_count, rows_per_band, seed)
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].values, band_count),
                    "band_key": bh.reshape(-1).view(np.int64),
                }
            )

    bands = sigs.select("id", "minhash", "n_shingles").mapInPandas(
        run, "id long, band_key long"
    )
    # salted single-shuffle bucket expansion (same operator as the clip
    # pipeline: hot buckets star-link, small buckets exact all-pairs)
    from datasketches_pig_spark.operators.lsh import bucket_pairs

    return bucket_pairs(bands, "band_key", "id", cap=64).distinct()


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_perm: int = 128,
    seed: int = 9001,
) -> DataFrame:
    """MinHash-LSH candidates, exact-verified by a shingle join restricted to
    candidates (the scale path: quadratic work only inside LSH buckets)."""
    sigs = minhash_stage(df, id_col, text_col, n, num_perm, seed)
    cands = minhash_lsh_candidates(sigs, seed=seed).localCheckpoint()
    grams = word_ngrams(df, id_col, text_col, n).localCheckpoint()
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    ga = grams.select(F.col("id").alias("a"), "shingle")
    gb = grams.select(F.col("id").alias("b"), "shingle")
    common = (
        cands.join(ga, "a")
        .join(gb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# Manku-style block keys (WWW'07 near-duplicate detection).  For a Hamming
# budget h, split the 64 bits into h+3 blocks; any pair within Hamming <= h
# leaves >= 3 blocks untouched, so it shares at least one choose(h+3, 3)
# concatenated 3-block key exactly.  h=3 → 6 blocks / 20 combos / ~32-bit
# keys (the classic setting); larger h trades explode factor C(h+3,3) and
# coarser keys for the wider guarantee.


def _simhash_blocks(max_hamming: int) -> tuple[tuple[int, ...], tuple[int, ...]]:
    n_blocks = max_hamming + 3
    base, extra = divmod(64, n_blocks)
    bits = tuple(base + (1 if i < extra else 0) for i in range(n_blocks))
    offs = tuple(sum(bits[:i]) for i in range(n_blocks))
    return bits, offs


def _simhash_combo_keys(sim_col, max_hamming: int = 3):
    """choose(h+3, 3) combo-key expressions over a 64-bit simhash column;
    each key packs three block values plus the combo index (key ranges are
    disjoint across combos)."""
    from itertools import combinations

    bits, offs = _simhash_blocks(max_hamming)
    key_bits = 3 * max(bits)
    keys = []
    for idx, combo in enumerate(combinations(range(len(bits)), 3)):
        key = F.lit(0).cast("long")
        shift = 0
        for b in combo:
            blk = F.shiftright(sim_col, offs[b]).bitwiseAND(
                F.lit((1 << bits[b]) - 1)
            )
            key = key + F.shiftleft(blk, shift)
            shift += bits[b]
        keys.append(key + F.shiftleft(F.lit(idx).cast("long"), key_bits + 1))
    return keys


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_hamming: int = 3,
    seed: int = 9001,
    bucket_cap: int = 256,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints, Manku 3-of-(h+3)-block
    keys (pigeonhole: Hamming ≤ h ⇒ some 3 blocks untouched ⇒ shared key),
    exact Hamming verify (codegen'd ``bit_count(xor)``, never Python).

    Recall contract: complete while no (combo, key) bucket exceeds
    ``bucket_cap``.  At h=3 keys are ~32 bits, so buckets are fine-grained —
    an over-cap bucket means > cap docs agree on 33 fingerprint bits, i.e. a
    mass-duplicate cluster; there the salted expansion degrades to star-links
    and pair recall above the cap is approximate (a missed pair must land
    over-cap in *every* one of its ≥ 1 shared combos).  Larger h widens the
    guarantee but multiplies band rows by C(h+3,3) and coarsens keys; h ≤ 3
    is the recommended 100 TB setting."""
    from datasketches_pig_spark.operators.lsh import bucket_pairs

    # zero-shingle docs (empty/whitespace/null text) all fingerprint to 0 and
    # would pair as mutual "near dups"; they are the exact-dedup path's
    # business, same contract as minhash_lsh_candidates
    sigs = (
        minhash_stage(df, id_col, text_col, n, num_perm=8, seed=seed)
        .filter(F.col("n_shingles") > 0)
        .localCheckpoint()
    )
    chunks = sigs.select(
        "id",
        F.explode(
            F.array(*_simhash_combo_keys(F.col("simhash"), max_hamming))
        ).alias("ckey"),
    )
    cand = bucket_pairs(chunks, "ckey", "id", cap=bucket_cap).distinct()
    sa = sigs.select(F.col("id").alias("a"), F.col("simhash").alias("sim_a"))
    sb = sigs.select(F.col("id").alias("b"), F.col("simhash").alias("sim_b"))
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
