"""Candidate-pair verification — the analog of the reference's
``theta.JaccardSimilarity`` (``pig/theta/JaccardSimilarity.java:115-136``)
computed over bottom-k KMV sketches, with the reference's exact-mode rule:
when both sketches retained fewer than k values they *are* the full shingle
sets, so the estimate is the exact Jaccard (``dictionary.html:62-63``).

Pipeline shape: pairs ⋈ signatures (a-side) ⋈ signatures (b-side) →
Arrow-batched verifier.  Only fixed-size sketches + the (small) transcript
travel into this stage — audio payloads never do.

Composite verification rule (each dup class leaves one modality near-exact —
byte-copy/ulaw/trim/gain keep the transcript, a transcript edit keeps the
audio — while unrelated clips score near zero on BOTH):
  exact_key equal                                      → dup
  text_jaccard ≥ near_exact AND audio_jaccard ≥ weak   → dup
  audio_jaccard ≥ near_exact AND (text_jaccard ≥ weak
                                  OR substring containment) → dup
  text_jaccard ≥ jaccard_threshold AND audio_jaccard ≥ 0.6  → dup
with a generous SimHash Hamming prefilter (skips the KMV set math for clear
negatives without risking recall).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datasketches_pig_spark.config import DedupConfig
from datasketches_pig_spark.operators.shingle import normalize_text
from datasketches_pig_spark.operators.signatures import hamming64, kmv_jaccard

AUDIO_JACCARD_THRESHOLD = 0.5
PREFILTER_HAMMING = 26  # of 64 bits; clear-negative cutoff, recall-safe

VERIFIED_SCHEMA = (
    "a string, b string, text_jaccard double, audio_jaccard double, "
    "text_hamming int, audio_hamming int, substr_ok boolean, is_dup boolean"
)


# ---------------------------------------------------------------------------
# suffix-array longest-common-substring (transcript containment verifier)
# ---------------------------------------------------------------------------

def _suffix_array(s: bytes) -> np.ndarray:
    """O(n log² n) suffix array via repeated radix ranking (numpy argsort)."""
    n = len(s)
    rank = np.frombuffer(s, dtype=np.uint8).astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        key2 = np.where(np.arange(n) + k < n, np.roll(rank, -k), -1)
        order = np.lexsort((key2, rank))
        tmp[order[0]] = 0
        prev_r, prev_k2 = rank[order[:-1]], key2[order[:-1]]
        cur_r, cur_k2 = rank[order[1:]], key2[order[1:]]
        tmp[order[1:]] = np.cumsum((cur_r != prev_r) | (cur_k2 != prev_k2))
        rank = tmp.copy()
        sa = order
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def _lcp_kasai(s: bytes, sa: np.ndarray) -> np.ndarray:
    n = len(s)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring(x: str, y: str) -> int:
    """Length of the longest common substring, via suffix array + Kasai LCP
    over x + sep + y (adjacent suffixes from different halves)."""
    if not x or not y:
        return 0
    bx = x.encode("utf-8")
    by = y.encode("utf-8")
    s = bx + b"\x00" + by
    sa = _suffix_array(s)
    lcp = _lcp_kasai(s, sa)
    split = len(bx)
    from_x = sa < split
    cross = from_x[1:] != from_x[:-1]
    if not cross.any():
        return 0
    return int(lcp[1:][cross].max())


def substring_containment(x: str, y: str, min_frac: float = 0.8) -> bool:
    """True if the shorter normalized transcript is (mostly) contained in the
    longer one: LCS ≥ min_frac × len(shorter)."""
    nx, ny = normalize_text(x or ""), normalize_text(y or "")
    if not nx or not ny:
        return False
    shorter = min(len(nx.encode()), len(ny.encode()))
    if shorter == 0:
        return False
    return longest_common_substring(nx, ny) >= min_frac * shorter


# ---------------------------------------------------------------------------
# verify stage
# ---------------------------------------------------------------------------

_PAYLOAD_COLS = ["clip_id", "exact_key", "text_kmv", "audio_kmv", "text_simhash", "audio_simhash", "transcript"]


def verify_pairs(pairs: DataFrame, signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    """candidate (a, b) pairs + signatures → verified pairs with scores."""
    payload = signatures.select(*_PAYLOAD_COLS)
    pa = payload.select(*[F.col(c).alias(f"a_{c}") for c in _PAYLOAD_COLS])
    pb = payload.select(*[F.col(c).alias(f"b_{c}") for c in _PAYLOAD_COLS])
    joined = (
        pairs.join(pa, pairs.a == pa.a_clip_id)
        .join(pb, pairs.b == pb.b_clip_id)
        .drop("a_clip_id", "b_clip_id")
    )

    kmv_k = cfg.kmv_k
    text_thr = cfg.jaccard_threshold
    near = cfg.near_exact_threshold
    weak = cfg.weak_support_threshold

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            t_ham = hamming64(pdf["a_text_simhash"].values, pdf["b_text_simhash"].values)
            a_ham = hamming64(pdf["a_audio_simhash"].values, pdf["b_audio_simhash"].values)
            exact = pdf["a_exact_key"].values == pdf["b_exact_key"].values

            # prefilter: clear negatives skip set math (recall-safe: dup pairs
            # at J≥0.5 sit far below this Hamming bar)
            needs = (~exact) & ((t_ham <= PREFILTER_HAMMING) | (a_ham <= PREFILTER_HAMMING))

            t_j = np.zeros(n)
            a_j = np.zeros(n)
            substr = np.zeros(n, dtype=bool)
            idx = np.flatnonzero(needs)
            for i in idx:
                ta = np.asarray(pdf["a_text_kmv"].iloc[i], dtype=np.int64).view(np.uint64)
                tb = np.asarray(pdf["b_text_kmv"].iloc[i], dtype=np.int64).view(np.uint64)
                aa = np.asarray(pdf["a_audio_kmv"].iloc[i], dtype=np.int64).view(np.uint64)
                ab = np.asarray(pdf["b_audio_kmv"].iloc[i], dtype=np.int64).view(np.uint64)
                t_j[i] = kmv_jaccard(ta, tb, kmv_k)
                a_j[i] = kmv_jaccard(aa, ab, kmv_k)
                if a_j[i] >= 0.6 and 0.05 <= t_j[i] < text_thr:
                    # borderline text: run the suffix-array containment check
                    substr[i] = substring_containment(
                        pdf["a_transcript"].iloc[i], pdf["b_transcript"].iloc[i]
                    )

            t_j[exact] = 1.0
            a_j[exact] = 1.0
            is_dup = (
                exact
                | ((t_j >= near) & (a_j >= weak))
                | ((a_j >= near) & ((t_j >= weak) | substr))
                | ((t_j >= text_thr) & (a_j >= 0.6))
            )
            yield pd.DataFrame(
                {
                    "a": pdf["a"].values,
                    "b": pdf["b"].values,
                    "text_jaccard": t_j,
                    "audio_jaccard": a_j,
                    "text_hamming": t_ham.astype(np.int32),
                    "audio_hamming": a_ham.astype(np.int32),
                    "substr_ok": substr,
                    "is_dup": is_dup,
                }
            )

    return joined.mapInPandas(run, schema=VERIFIED_SCHEMA)
