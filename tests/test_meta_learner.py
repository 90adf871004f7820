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


def test_sampled_training_agrees_with_full():
    """The train_row_budget cap trains on a stratified sample; the
    learned weight function must agree with full-data training (the
    scale-safety contract for fit_fforma_spark's capped collect)."""
    X, err, cond = _synth_problem(n=2000, seed=7)
    rng = np.random.RandomState(11)
    keep = rng.rand(len(X)) < 0.5
    full = NumpyFFORMA(n_rounds=25, max_depth=3).fit(X, err)
    samp = NumpyFFORMA(n_rounds=25, max_depth=3).fit(X[keep], err[keep])
    wf = full.predict_weights(X)
    ws = samp.predict_weights(X)
    assert np.abs(wf - ws).mean() < 0.1
    # both route the majority weight to the regime-correct model
    assert ((ws[:, 0] > 0.5) == cond).mean() > 0.9


def test_fit_fforma_spark_budget_cap(spark):
    """fit_fforma_spark with a budget below the corpus size still
    trains (on the seeded stratified sample) and keeps valid models."""
    from fforma_spark.functions.meta_learner import fit_fforma_spark
    from fforma_spark.functions.metrics import evaluate_with_owa, mase_scale
    from fforma_spark.functions.models import (
        FORECAST_COLS,
        base_forecasts,
        holdout_truth,
        train_split,
    )
    from fforma_spark.functions.features import features_wide
    from fforma_spark.operators.reshape import explode_panel
    from fforma_spark.sources.tables import sequences_from_documents
    from pyspark.sql import functions as F

    seq = sequences_from_documents(spark, "/root/testdata/sf0.001")
    fc = base_forecasts(seq, default_h=8)
    truth = holdout_truth(seq, default_h=8)
    train_panel = explode_panel(train_split(seq, default_h=8)).select(
        "doc_id", "pos", "val"
    )
    ev = evaluate_with_owa(
        truth, fc, FORECAST_COLS, mase_scale(train_panel, F.lit(1))
    )
    owa_cols = [c for c in ev.columns if c.endswith("_owa")]
    feats = features_wide(seq)
    model, kept, fcols = fit_fforma_spark(
        feats,
        ev.select("doc_id", *owa_cols).na.fill(0.0),
        owa_cols,
        benchmark="naive2_owa",
        train_row_budget=40,
        n_rounds=5,
    )
    assert len(kept) >= 1
    assert model.loss_curve_[-1] <= model.loss_curve_[0] + 1e-9


def test_end_to_end_spark_rollup(spark):
    from fforma_spark.queries import QUERIES

    out = QUERIES["fforma_ensemble_documents"](
        spark, "/root/testdata/sf0.001"
    )
    rows = out.collect()
    assert len(rows) > 0
    assert {r["pos"] for r in rows} == set(range(8))
    assert all(np.isfinite(r["y_hat"]) for r in rows)
