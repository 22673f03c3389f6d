"""Tests for the hand-rolled t-distribution / Welch t-test."""

import numpy as np
import pytest

from datasketches_pig_spark.functions.stats import (
    betainc_reg,
    t_sf_two_sided,
    welch_t_test,
    welch_t_test_arrays,
)


def test_betainc_endpoints_and_symmetry():
    assert betainc_reg(2, 3, 0.0) == 0.0
    assert betainc_reg(2, 3, 1.0) == 1.0
    # I_x(a,b) = 1 - I_{1-x}(b,a)
    for a, b, x in [(2.0, 3.0, 0.3), (0.5, 5.0, 0.1), (4.0, 0.5, 0.7)]:
        assert betainc_reg(a, b, x) == pytest.approx(1 - betainc_reg(b, a, 1 - x), abs=1e-12)
    # I_x(1,1) = x (uniform)
    assert betainc_reg(1, 1, 0.42) == pytest.approx(0.42, abs=1e-12)


@pytest.mark.parametrize(
    "t,df,p",
    [
        # classic t-table critical values (two-sided)
        (2.228, 10, 0.05),
        (1.812, 10, 0.10),
        (2.086, 20, 0.05),
        (1.96, 1e9, 0.05),  # normal limit
        (2.576, 1e9, 0.01),
    ],
)
def test_t_two_sided_matches_t_table(t, df, p):
    assert t_sf_two_sided(t, df) == pytest.approx(p, rel=2e-3)


def test_welch_identical_populations_p_near_one():
    assert welch_t_test(5.0, 2.0, 100, 5.0, 2.0, 100) == pytest.approx(1.0)


def test_welch_separated_populations_small_p():
    p = welch_t_test(0.0, 1.0, 50, 2.0, 1.0, 50)
    assert p < 1e-6


def test_welch_guard_small_n():
    assert np.isnan(welch_t_test(0, 1, 1, 1, 1, 50))


def test_welch_arrays_consistency():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 200)
    y = rng.normal(0.05, 1, 200)
    p = welch_t_test_arrays(x, y)
    assert 0.0 < p <= 1.0
