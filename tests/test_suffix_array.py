"""Unit + property tests for the suffix-array substring verifier
(operators/verify.py) — the north-rule's 'suffix-array substring matching'
primitive, cross-checked against a brute-force O(n*m) LCS and (for the
vectorized sparse-table LCP) a scalar Kasai reference kept here test-side."""

import time

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from datasketches_pig_spark.operators.verify import (
    _chunked_containment,
    _lcp_adjacent,
    _suffix_array,
    longest_common_substring,
    substring_containment,
)


def _brute_lcs(x: str, y: str) -> int:
    bx, by = x.encode("utf-8"), y.encode("utf-8")
    best = 0
    for i in range(len(bx)):
        for j in range(len(by)):
            k = 0
            while i + k < len(bx) and j + k < len(by) and bx[i + k] == by[j + k]:
                k += 1
            best = max(best, k)
    return best


def _lcp_kasai_reference(s: bytes, sa: np.ndarray) -> np.ndarray:
    """The r1 per-character Kasai loop, kept as the scalar reference the
    vectorized sparse-table walk is checked against."""
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


def test_suffix_array_is_sorted_permutation():
    s = b"banana"
    sa, levels = _suffix_array(s)
    assert sorted(sa.tolist()) == list(range(len(s)))
    suffixes = [s[i:] for i in sa]
    assert suffixes == sorted(suffixes)
    # vectorized LCP: lcp[t] = common prefix of suffix sa[t] and sa[t+1]
    lcp = _lcp_adjacent(sa, levels)
    for t in range(len(s) - 1):
        a, b = s[sa[t]:], s[sa[t + 1]:]
        k = 0
        while k < min(len(a), len(b)) and a[k] == b[k]:
            k += 1
        assert lcp[t] == k


@given(st.binary(min_size=1, max_size=200))
@settings(max_examples=80, deadline=None)
def test_vectorized_lcp_matches_kasai(s):
    sa, levels = _suffix_array(s)
    got = _lcp_adjacent(sa, levels)
    ref = _lcp_kasai_reference(s, sa)[1:]  # Kasai indexes by rank, [0] unused
    assert np.array_equal(got, ref)


def test_lcs_known_cases():
    assert longest_common_substring("hello world", "world peace") == 5  # "world"
    assert longest_common_substring("abc", "xyz") == 0
    assert longest_common_substring("", "abc") == 0
    assert longest_common_substring("same", "same") == 4
    # the separator byte must never bridge the two halves
    assert longest_common_substring("a", "a") == 1


@given(
    st.text(alphabet="abcN ", max_size=30),
    st.text(alphabet="abcN ", max_size=30),
)
@settings(max_examples=60, deadline=None)
def test_lcs_matches_bruteforce(x, y):
    assert longest_common_substring(x, y) == _brute_lcs(x, y)


def test_substring_containment_rule():
    long = "the quick brown fox jumps over the lazy dog again and again"
    # shorter transcript fully inside the longer (after normalization)
    assert substring_containment("  The QUICK  brown fox", long)
    # unrelated short text is not contained
    assert not substring_containment("completely unrelated words", long)
    # empty / whitespace never contained
    assert not substring_containment("", long)
    assert not substring_containment("   ", long)
    assert not substring_containment(long, "")


# ---------------------------------------------------------------------------
# max_verify_chars cap (SURVEY §7 hard-part (d) / VERDICT r6 item 1)
# ---------------------------------------------------------------------------

def _long_transcript(rng, n_words):
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "tau", "phi"]
    return " ".join(words[i] for i in rng.integers(0, len(words), n_words))


def test_cap_parity_on_short_transcripts():
    """Transcripts under the cap must decide identically with and without
    it — this is the pair-for-pair parity the existing corpora rely on."""
    rng = np.random.default_rng(17)
    cases = []
    for _ in range(30):
        longer = _long_transcript(rng, 80)
        start = int(rng.integers(0, 200))
        cases.append((longer[start:start + 180], longer))
        cases.append((_long_transcript(rng, 30), longer))
    for x, y in cases:
        assert substring_containment(x, y) == substring_containment(
            x, y, max_chars=65536
        )


def test_chunked_containment_over_cap():
    """≥10⁵-char transcripts: a mostly-contained shorter accepts, an
    unrelated one rejects, and the decision is bounded-time (the whole
    100-pair batch must finish in seconds, not minutes — the uncapped
    suffix array at this length costs ~1 s per pair just to sort)."""
    rng = np.random.default_rng(23)
    episode = _long_transcript(rng, 40_000)          # ~2.4e5 chars
    assert len(episode) > 100_000
    # a clip whose transcript is a verbatim interior slice of the episode
    clip = episode[50_000:90_000]
    # an edited clip: contained except for a corrupted head+tail (inside
    # the 80% rule)
    edited = "xyzzy " * 200 + episode[50_000:90_000] + " plugh" * 200
    unrelated = _long_transcript(rng, 15_000)

    t0 = time.monotonic()
    assert substring_containment(clip, episode, max_chars=65536)
    assert substring_containment(edited, episode, max_chars=65536)
    assert not substring_containment(unrelated, episode, max_chars=65536)
    # 100 borderline pairs against the same episode: bounded per-pair cost
    for i in range(100):
        s = episode[i * 1000:i * 1000 + 30_000]
        assert substring_containment(s, episode, max_chars=65536)
    wall = time.monotonic() - t0
    assert wall < 30.0, f"capped containment took {wall:.1f}s for 103 pairs"


def test_chunked_threshold_is_recall_safe():
    """A contiguous common substring covering exactly min_frac of the
    shorter must always accept under the probe relaxation."""
    rng = np.random.default_rng(5)
    longer = _long_transcript(rng, 30_000)
    n = len(longer)
    assert n > 65536 * 2
    for frac in (0.8, 0.85, 0.95):
        keep = int(100_000 * frac)
        # shorter = contained block + unrelated tail filling (1-frac)
        block = longer[n // 3:n // 3 + keep]
        tail = _long_transcript(rng, 30_000)[: 100_000 - keep]
        s = block + tail
        assert _chunked_containment(s, longer, min_frac=frac)


def test_config_knob_validation():
    from datasketches_pig_spark.config import DedupConfig

    assert DedupConfig().max_verify_chars == 65536
    with pytest.raises(ValueError, match="max_verify_chars"):
        DedupConfig(max_verify_chars=1000)
