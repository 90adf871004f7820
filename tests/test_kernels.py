"""Numpy kernel semantics vs hand-computed expectations (these kernels
double as the single-node oracle, so they get their own ground truth)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fforma_spark.functions import kernels as K


def test_acf_matches_definition():
    x = np.array([1.0, 3.0, 2.0, 5.0, 4.0, 6.0])
    m = x.mean()
    s1 = sum((x[i] - m) * (x[i - 1] - m) for i in range(1, len(x)))
    s2 = sum((v - m) ** 2 for v in x)
    assert K.acf(x, 1) == pytest.approx(s1 / s2, rel=1e-12)


def test_detrend_matches_polyfit():
    rng = np.random.default_rng(0)
    x = rng.normal(10, 2, 50) + 0.3 * np.arange(50)
    slope, intercept = K.detrend_coeffs(x)
    a, b = np.polyfit(np.arange(50), x, 1)
    assert slope == pytest.approx(a, rel=1e-9)
    assert intercept == pytest.approx(b, rel=1e-9)


def test_centered_ma_even_length_quirk():
    """Even SERIES length triggers the double-MA branch regardless of
    window parity (fforma/base/_models.py:98-116, kept verbatim)."""
    x = np.arange(10, dtype=float)  # even length
    got = K.centered_ma(x, 4)
    s = pd.Series(x)
    exp = np.roll(
        s.rolling(4, center=True).mean().rolling(2, center=True).mean(), -1
    )
    assert np.allclose(got, exp, equal_nan=True)
    # odd length: plain centered MA
    x2 = np.arange(9, dtype=float)
    got2 = K.centered_ma(x2, 4)
    exp2 = pd.Series(x2).rolling(4, center=True).mean().to_numpy()
    assert np.allclose(got2, exp2, equal_nan=True)


def test_ses_recurrence():
    x = np.array([10.0, 12.0, 11.0, 13.0])
    fitted, fc = K.ses_run(0.5, x)
    assert fitted[0] == 10.0
    assert fitted[1] == 10.0  # level before seeing x[1] is a*x0+(1-a)*y0
    assert fc == pytest.approx(0.5 * 13 + 0.5 * (0.5 * 11 + 0.5 * (0.5 * 12 + 0.5 * 10)))


def test_intervals_demand_probability():
    x = np.array([0.0, 0.0, 5.0, 0.0, 3.0, 0.0, 0.0, 0.0, 7.0])
    assert list(K.intervals(x)) == [3, 2, 4]
    assert list(K.demand(x)) == [5.0, 3.0, 7.0]
    assert list(K.probability(x)) == [0, 0, 1, 0, 1, 0, 0, 0, 1]


def test_naive_family():
    y = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    assert list(K.naive(y, 3)) == [6.0, 6.0, 6.0]
    assert list(K.seasonal_naive(y, 4, 2)) == [5.0, 6.0, 5.0, 6.0]
    assert list(K.rw_drift(y, 2)) == [7.0, 8.0]
    assert list(K.average(y, 2)) == [3.5, 3.5]
    assert list(K.moving_average(y, 2, 2)) == [5.5, 5.5]
    assert list(K.seasonal_moving_average(y, 4, 2, 2)) == [4.0, 5.0, 4.0, 5.0]


def test_naive2_unseasonal_equals_naive():
    rng = np.random.default_rng(1)
    y = rng.normal(100, 1, 40)  # white noise: seasonality test fails
    assert np.allclose(K.naive2(y, 5, 4), K.naive(y, 5))


def test_naive2_seasonal_composes():
    t = np.arange(48, dtype=float)
    y = 100 + 10 * np.sin(2 * np.pi * t / 12)
    fc = K.naive2(y, 12, 12)
    assert len(fc) == 12
    # strongly seasonal: forecast should track the seasonal shape, i.e.
    # correlate highly with the true next season
    nxt = 100 + 10 * np.sin(2 * np.pi * (48 + np.arange(12)) / 12)
    assert np.corrcoef(fc, nxt)[0, 1] > 0.95


def test_adida_bucketing_drops_front_remainder():
    y = np.array([0.0, 1.0, 0.0, 2.0, 0.0, 0.0, 4.0])
    # intervals = [2,2,3] → al = round(7/3)=2; remainder = 7%2 = 1 →
    # buckets from y[1:]: [1,0],[2,0],[0,4] sums [1,2,4]
    assert list(K._bucket_sums(y, 2)) == [1.0, 2.0, 4.0]


def test_optimize_alpha_bounds():
    rng = np.random.default_rng(2)
    x = rng.normal(50, 5, 60)
    a = K.optimize_alpha(x)
    assert 0.1 <= a <= 0.3
    # optimum beats the endpoints
    assert K.ses_mse(a, x) <= min(K.ses_mse(0.1, x), K.ses_mse(0.3, x)) + 1e-6


def test_feature_vector_finite_and_named():
    rng = np.random.default_rng(3)
    y = np.abs(rng.normal(100, 10, 60))
    fv = K.feature_vector(y, 12)
    assert set(fv) == set(K.FEATURE_NAMES)
    assert all(np.isfinite(v) for v in fv.values())
    assert fv["series_length"] == 60.0


def test_crossing_points_and_flat_spots():
    x = np.array([1.0, 5.0, 1.0, 5.0, 1.0])
    assert K.crossing_points(x) == 4
    assert K.flat_spots(np.ones(7)) == 7
    assert K.flat_spots(np.array([1.0, 1.0, 1.0, 10.0, 1.0])) == 3


def test_lumpiness_stability():
    x = np.concatenate([np.zeros(10), np.ones(10) * 5])
    assert K.stability(x, 10) > 0
    assert K.lumpiness(x, 10) == 0.0  # equal block variances (both 0)
