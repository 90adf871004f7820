"""NumpyFFORMA meta-learner: objective semantics and end-to-end
weighted rollup over Spark."""

from __future__ import annotations

import numpy as np
import pytest

from fforma_spark.functions.meta_learner import NumpyFFORMA, softmax


def _synth_problem(n=300, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.rand(n, 4)
    cond = X[:, 0] < 0.5
    err = np.empty((n, 2))
    err[:, 0] = np.where(cond, 0.2, 1.0) + rng.rand(n) * 0.05
    err[:, 1] = np.where(cond, 1.0, 0.2) + rng.rand(n) * 0.05
    return X, err, cond


def test_gradient_matches_reference_formula():
    """grad = p(err − Σp·err); hess = err·p(1−p) − grad·p
    (fforma/meta_learner/_XGBoost.py:54-67)."""
    rng = np.random.RandomState(1)
    err = rng.rand(10, 3)
    F = rng.randn(10, 3)
    m = NumpyFFORMA()
    grad, hess, loss = m._grad_hess(err, F)
    p = softmax(F)
    L = (p * err).sum(axis=1, keepdims=True)
    assert np.allclose(grad, p * (err - L))
    assert np.allclose(loss, L.mean())
    # analytic grad == numeric grad of the weighted loss
    eps = 1e-6
    for i, k in [(0, 0), (3, 2), (7, 1)]:
        F2 = F.copy()
        F2[i, k] += eps
        p2 = softmax(F2)
        L2 = (p2 * err).sum(axis=1)
        numeric = (L2[i] - L[i, 0]) / eps
        assert abs(numeric - grad[i, k]) < 1e-4


def test_loss_decreases_and_routes_weights():
    X, err, cond = _synth_problem()
    m = NumpyFFORMA(n_rounds=25, max_depth=3).fit(X, err)
    assert m.loss_curve_[-1] < m.loss_curve_[0] - 0.2
    w = m.predict_weights(X)
    assert np.allclose(w.sum(axis=1), 1.0)
    assert ((w[:, 0] > 0.5) == cond).mean() > 0.95


def test_fforma_loss_close_to_oracle_best():
    X, err, _ = _synth_problem(seed=3)
    m = NumpyFFORMA(n_rounds=30, max_depth=3).fit(X, err)
    w = m.predict_weights(X)
    final = (w * err).sum(1).mean()
    assert final < err.min(1).mean() * 1.2  # near per-series argmin
    assert final < err.mean(1).mean()  # beats uniform averaging


def test_end_to_end_spark_rollup(spark):
    from fforma_spark.queries import QUERIES

    out = QUERIES["fforma_ensemble_documents"](
        spark, "/root/testdata/sf0.001"
    )
    rows = out.collect()
    assert len(rows) > 0
    assert {r["pos"] for r in rows} == set(range(8))
    assert all(np.isfinite(r["y_hat"]) for r in rows)
