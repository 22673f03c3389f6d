"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Everything except the fingerprint is pure JVM column algebra (whole-stage
codegen; identical ANSI-SQL forms exist for the DuckDB oracle).  The
fingerprint is a Karp-Rabin rolling hash over tokens inside an Arrow batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# marker-word profiles for the deterministic n-gram/stopword language
# heuristic.  ASCII markers match as whole words (\b); non-ASCII markers
# (no-space scripts) match as plain characters — see _marker_pattern.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "die", "und", "ist", "das"],
    "es": ["el", "la", "los", "es", "de"],
    "fr": ["le", "les", "est", "une", "des"],
    "zh": ["的", "是", "了", "在", "我"],
    "ja": ["の", "は", "を", "た", "です"],
    # r5 additions (VERDICT r4): ko is the interesting class — Hangul is
    # space-delimited but the markers are non-ASCII, so they must match as
    # plain characters (RE2 \b is ASCII-only and would never fire); ru/ar/hi
    # are likewise non-ASCII-marker languages matched without \b
    "ko": ["의", "는", "이", "을", "가"],
    "ru": ["и", "в", "не", "на", "что"],
    "ar": ["في", "من", "على", "أن", "هذا"],
    "hi": ["है", "की", "में", "और", "का"],
}


def _marker_pattern(words: list[str]) -> str:
    """ASCII markers match as whole words; non-ASCII markers (CJK — no word
    boundaries in a no-space script, and Java/RE2 ``\\b`` is ASCII-only so
    ``\\b的\\b`` can never match) match as plain characters."""
    return "|".join(rf"\b{w}\b" if w.isascii() else w for w in words)


def _marker_count(text_col: Column, words: list[str]) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text_col), F.lit(_marker_pattern(words)), 0))


def lang_id(text_col: str = "text") -> Column:
    """Deterministic language-ID: argmax of marker-word hits as an explicit
    CASE cascade (profile order breaks ties; 'und' when no marker hits) —
    the same cascade is expressible verbatim in ANSI SQL for the oracle."""
    t = F.col(text_col)
    langs = list(LANG_MARKERS)
    scores = {lang: _marker_count(t, ws) for lang, ws in LANG_MARKERS.items()}
    expr = F.lit("und")
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        cond = scores[lang] >= F.lit(1)
        for other in langs[i + 1 :]:
            cond = cond & (scores[lang] >= scores[other])
        for other in langs[:i]:
            cond = cond & (scores[lang] > scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count."""
    t = F.trim(F.col(text_col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """BPE-ish subword count: alpha runs + digit runs + individual symbols."""
    return F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality features: length, token count, mean word length,
    punctuation ratio, stopword ratio, and a composite [0,1] score."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(text_col)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    n_stop = _marker_count(t, [w for ws in LANG_MARKERS.values() for w in ws])
    mean_wl = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
    score = (
        F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.when((mean_wl >= 3) & (mean_wl <= 10), 0.3).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.2).otherwise(0.0)
        + F.least(stop_ratio * 2, F.lit(0.1))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_wl.cast("double").alias("mean_word_len"),
        punct_ratio.cast("double").alias("punct_ratio"),
        stop_ratio.cast("double").alias("stopword_ratio"),
        score.cast("double").alias("quality_score"),
    )


FP_SCHEMA = "doc_id long, fingerprint long"
_FP_BASE = np.uint64(1000003)
_FP_WINDOW = 8


def _fingerprint_batch(texts: list[str | None]) -> np.ndarray:
    """Vectorized winnowing fingerprints for a batch: flat token murmur
    hashes (``flat_token_hashes`` — no per-token Python), then the Karp-Rabin
    fold runs once per window POSITION (w steps over all windows of all docs
    at once) and the per-doc min falls out of ``minimum.reduceat``.  Docs
    with fewer than ``_FP_WINDOW`` tokens use one whole-doc window, computed
    the same way per token-count bucket (≤ 7 tiny groups).  Scalar
    replication: ``tools/gen_fingerprint_oracle.py``."""
    from datasketches_pig_spark.operators.signatures import flat_token_hashes

    n_docs = len(texts)
    out = np.zeros(n_docs, dtype=np.int64)
    th, tok_counts = flat_token_hashes(texts, seed=9001)
    if len(th) == 0:
        return out
    doc_start = np.concatenate([[0], np.cumsum(tok_counts)[:-1]])

    # full-window docs: every window of _FP_WINDOW consecutive tokens that
    # stays inside one doc
    full = tok_counts >= _FP_WINDOW
    if full.any():
        total = len(th)
        w = _FP_WINDOW
        win = np.lib.stride_tricks.sliding_window_view(th, w)  # (total-w+1, w)
        doc_id = np.repeat(np.arange(n_docs, dtype=np.int64), tok_counts)
        valid = doc_id[: total - w + 1] == doc_id[w - 1 :]
        vw = win[valid]
        acc = np.zeros(len(vw), dtype=np.uint64)
        for j in range(w):
            acc = acc * _FP_BASE + vw[:, j]
        vdoc = doc_id[: total - w + 1][valid]
        starts = np.concatenate([[0], np.flatnonzero(vdoc[1:] != vdoc[:-1]) + 1])
        mins = np.minimum.reduceat(acc, starts)
        out[vdoc[starts]] = mins.view(np.int64)

    # short docs (1 <= n < _FP_WINDOW): a single whole-doc window each,
    # bucketed by token count
    for w in range(1, _FP_WINDOW):
        sel = tok_counts == w
        if not sel.any():
            continue
        mat = th[doc_start[sel][:, None] + np.arange(w)[None, :]]
        acc = np.zeros(sel.sum(), dtype=np.uint64)
        for j in range(w):
            acc = acc * _FP_BASE + mat[:, j]
        out[sel] = acc.view(np.int64)
    return out


def doc_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Winnowing-style fingerprint: Karp-Rabin rolling hash over token windows,
    fingerprint = min window hash (robust to local edits outside the min)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "fingerprint": _fingerprint_batch(list(pdf[text_col])),
                }
            )

    from datasketches_pig_spark.textops.dedup import _spread_scan

    # a one-file test corpus otherwise runs the whole Arrow pass in 1 task
    return _spread_scan(df.select(id_col, text_col)).mapInPandas(
        run, schema=FP_SCHEMA
    )
