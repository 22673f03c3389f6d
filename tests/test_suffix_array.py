"""Unit + property tests for the suffix-array substring verifier
(operators/verify.py) — the north-rule's 'suffix-array substring matching'
primitive, cross-checked against a brute-force O(n*m) LCS."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from datasketches_pig_spark.operators.verify import (
    _lcp_kasai,
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


def test_suffix_array_is_sorted_permutation():
    s = b"banana"
    sa = _suffix_array(s)
    assert sorted(sa.tolist()) == list(range(len(s)))
    suffixes = [s[i:] for i in sa]
    assert suffixes == sorted(suffixes)
    # Kasai LCP: lcp[r] = common prefix of suffix sa[r] and sa[r-1]
    lcp = _lcp_kasai(s, sa)
    for r in range(1, len(s)):
        a, b = s[sa[r] :], s[sa[r - 1] :]
        k = 0
        while k < min(len(a), len(b)) and a[k] == b[k]:
            k += 1
        assert lcp[r] == k


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
