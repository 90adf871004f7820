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


# ---------------------------------------------------------------------------
# round-2 tsfeatures vocabulary
# ---------------------------------------------------------------------------


def test_acf_vector_matches_scalar_acf():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 80).cumsum()
    v = K.acf_vector(x, 10)
    for k in range(1, 11):
        assert v[k - 1] == pytest.approx(K.acf(x, k), rel=1e-10)


def test_pacf_vector_matches_yule_walker_solve():
    """Durbin–Levinson PACF == last coefficient of the direct
    Toeplitz Yule-Walker solve at each order (exact equivalence)."""
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, 200)
    x = np.convolve(x, [1.0, 0.6, 0.3], mode="valid")  # give it structure
    kmax = 5
    rho = K.acf_vector(x, kmax)
    got = K.pacf_vector(x, kmax)
    for k in range(1, kmax + 1):
        R = np.empty((k, k))
        full = np.concatenate([[1.0], rho[:k]])
        for i in range(k):
            for j in range(k):
                R[i, j] = full[abs(i - j)]
        phi = np.linalg.solve(R, rho[:k])
        assert got[k - 1] == pytest.approx(phi[-1], rel=1e-8, abs=1e-10)


def test_unitroot_kpss_separates_rw_from_noise():
    rng = np.random.default_rng(3)
    noise = rng.normal(0, 1, 300)
    rw = noise.cumsum()
    # 5% critical value for the level KPSS statistic is 0.463
    assert K.unitroot_kpss(noise) < 0.463
    assert K.unitroot_kpss(rw) > 0.463


def test_unitroot_pp_separates_rw_from_noise():
    rng = np.random.default_rng(4)
    noise = rng.normal(0, 1, 300)
    rw = noise.cumsum()
    # Z-alpha: strongly negative for stationary, near 0 for unit root
    assert K.unitroot_pp(noise) < -50
    assert K.unitroot_pp(rw) > -15


def test_nonlinearity_detects_quadratic_map():
    rng = np.random.default_rng(5)
    lin = np.empty(300)
    lin[0] = 0.0
    eps = rng.normal(0, 1, 300)
    for t in range(1, 300):
        lin[t] = 0.5 * lin[t - 1] + eps[t]
    nl = np.empty(300)
    nl[0] = 0.1
    for t in range(1, 300):
        nl[t] = 0.3 * nl[t - 1] + 0.8 * nl[t - 1] ** 2 - 0.4 * nl[t - 1] ** 3 + 0.1 * eps[t]
    assert K.nonlinearity_stat(nl) > 5 * max(K.nonlinearity_stat(lin), 0.01)


def test_arch_stat_detects_volatility_clustering():
    rng = np.random.default_rng(6)
    iid = rng.normal(0, 1, 400)
    # ARCH(1): sigma_t^2 = 0.2 + 0.7 e_{t-1}^2
    e = np.empty(400)
    e[0] = rng.normal()
    z = rng.normal(0, 1, 400)
    for t in range(1, 400):
        e[t] = z[t] * np.sqrt(0.2 + 0.7 * e[t - 1] ** 2)
    assert K.arch_stat(e) > 4 * max(K.arch_stat(iid), 0.01)
    assert 0.0 <= K.arch_stat(e) <= 1.0


def test_heterogeneity_garch_standardization_reduces_arch():
    rng = np.random.default_rng(7)
    z = rng.normal(0, 1, 500)
    e = np.empty(500)
    e[0] = z[0]
    for t in range(1, 500):
        e[t] = z[t] * np.sqrt(0.2 + 0.6 * e[t - 1] ** 2)
    arch_acf, garch_acf, arch_r2, garch_r2 = K.heterogeneity(e)
    assert arch_r2 > 0.05            # raw residuals show ARCH
    assert garch_r2 < arch_r2        # standardization removes most of it
    assert arch_acf > garch_acf
    for v in (arch_acf, garch_acf, arch_r2, garch_r2):
        assert np.isfinite(v)


def test_peak_trough_locates_seasonal_extremes():
    ppy = 12
    t = np.arange(96)
    # seasonal max at phase 3 (0-based) -> peak = 4 (1-based)
    x = 10 + np.where(t % ppy == 3, 5.0, 0.0) - np.where(t % ppy == 9, 4.0, 0.0)
    peak, trough = K.peak_trough(x, ppy)
    assert peak == 4.0
    assert trough == 10.0
    assert K.peak_trough(x, 1) == (0.0, 0.0)


def test_ar_prewhiten_removes_autocorrelation():
    rng = np.random.default_rng(8)
    eps = rng.normal(0, 1, 500)
    x = np.empty(500)
    x[0] = 0.0
    for t in range(1, 500):
        x[t] = 0.8 * x[t - 1] + eps[t]
    u = K._ar_prewhiten(x)
    assert abs(K.acf(u, 1)) < 0.1 < abs(K.acf(x, 1))


def test_feature_vector_round2_vocabulary_complete_and_finite():
    rng = np.random.default_rng(9)
    x = 50 + rng.normal(0, 3, 60) + 4 * np.sin(np.arange(60) * 2 * np.pi / 12)
    fv = K.feature_vector(x, 12)
    assert set(fv) == set(K.FEATURE_NAMES)
    assert len(K.FEATURE_NAMES) >= 45
    for k, v in fv.items():
        assert np.isfinite(v), k
    # spot-check a couple against their kernels
    assert fv["unitroot_kpss"] == pytest.approx(K.unitroot_kpss(x), rel=1e-12)
    assert fv["diff1_acf1"] == pytest.approx(K.acf_vector(np.diff(x), 10)[0], rel=1e-12)
    assert fv["seas_acf1"] == pytest.approx(K.acf_vector(x, 12)[-1], rel=1e-12)


def test_fast_ma_and_seasonal_indices_match_pandas_originals():
    rng = np.random.default_rng(10)
    for n in (11, 12, 24, 25, 47, 48, 120):
        x = 50 + rng.normal(0, 3, n) + 4 * np.sin(np.arange(n) * 2 * np.pi / 12)
        for w in (3, 5, 12):
            if w > n:
                continue
            a = K.centered_ma(x, w)
            b = K._fast_centered_ma_quirk(x, w)
            assert np.allclose(a, b, rtol=1e-10, equal_nan=True), (n, w)
        if n >= 24:
            si_a = K.seasonal_indices(x, 12)
            si_b = K._fast_seasonal_indices(x, 12)
            assert np.allclose(si_a, si_b, rtol=1e-10), n


def test_feature_vector_degenerate_inputs_all_finite():
    """Production calls feature_vector on arbitrary docs — tiny,
    constant, and all-zero series must yield the full finite vector."""
    for n in (1, 2, 3, 4, 5, 7):
        for x in (np.full(n, 5.0), np.arange(n, dtype=float), np.zeros(n)):
            for s in (1, 7, 12):
                fv = K.feature_vector(x, s)
                assert set(fv) == set(K.FEATURE_NAMES)
                for k, v in fv.items():
                    assert np.isfinite(v), (n, s, k)


def test_arch_stat_short_series_not_saturated():
    """Round-2 ADVICE: at full lag order every 14-25 point series has
    T <= regressors, the OLS fits perfectly, and the statistic pins at
    exactly 1.0 regardless of data. The shrunk lag order must keep the
    statistic informative on short iid noise."""
    rng = np.random.RandomState(11)
    for n in (14, 18, 22, 25, 30):
        vals = [K.arch_stat(rng.normal(size=n)) for _ in range(20)]
        # iid noise: R^2 must not be identically 1 (degenerate fit)
        assert max(vals) < 1.0 - 1e-9, (n, max(vals))
        assert np.mean(vals) < 0.95, (n, np.mean(vals))
