"""Quantile-regression kernels — from-scratch numpy (no statsmodels /
cvxpy in this container).

Reference semantics (fforma/base/_quantile_models.py): lag-embedding
design matrix (``embed``, :18-47 — R stats::embed contract), quantile
regression on AR lags with optional constant (:49-225, via statsmodels
QuantReg there), recursive multi-step forecast, constant-series →
Naive fallback. The solver here is IRLS (iteratively-reweighted least
squares) on the pinball loss — the classical Schlossmacher/MM scheme:
w_i = τ/max(|r_i|,ε) for positive residuals, (1−τ)/max(|r_i|,ε) for
negative; converges to the LP optimum for non-degenerate designs.

Every step is per-series numpy → runs inside the same Arrow-batched
mapInPandas fabric as the other kernels.
"""

from __future__ import annotations

import numpy as np


def embed(x: np.ndarray, p: int) -> np.ndarray:
    """Lag-embedding matrix, R ``stats::embed`` semantics: row t is
    [x_t, x_{t-1}, ..., x_{t-p+1}] (fforma/base/_quantile_models.py:18-47)."""
    if p == 0:
        raise ValueError("embedding dimension should not be 0")
    x = np.asarray(x, dtype=np.float64)
    cols = [np.roll(x, k) for k in range(p)]
    out = np.vstack(cols).T
    return out[p - 1:]


def pinball_loss(y: np.ndarray, y_hat: np.ndarray, tau: float) -> float:
    e = np.asarray(y, dtype=np.float64) - np.asarray(y_hat, dtype=np.float64)
    return float(np.mean(np.where(e >= 0, tau * e, (tau - 1) * e)))


def quantile_regression(
    X: np.ndarray,
    y: np.ndarray,
    tau: float,
    max_iter: int = 200,
    tol: float = 1e-10,
    eps: float = 1e-8,
) -> np.ndarray:
    """IRLS pinball-loss regression; returns beta (X already includes
    the constant column if wanted)."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    prev = np.inf
    for _ in range(max_iter):
        r = y - X @ beta
        w = np.where(r >= 0, tau, 1.0 - tau) / np.maximum(np.abs(r), eps)
        sw = np.sqrt(w)
        beta_new, *_ = np.linalg.lstsq(X * sw[:, None], y * sw, rcond=None)
        loss = pinball_loss(y, X @ beta_new, tau)
        beta = beta_new
        if abs(prev - loss) < tol * max(prev, 1.0):
            break
        prev = loss
    return beta


def quantile_ar_forecast(
    y: np.ndarray,
    h: int,
    tau: float,
    ar_terms: list[int] | None = None,
    add_constant: bool = True,
) -> np.ndarray:
    """Quantile AR forecast: fit y_t ~ c + Σ a_j y_{t-n_j} at quantile
    τ, then forecast recursively (fforma/base/_quantile_models.py:49-225,
    max_diffs=0 path). Constant series → Naive (reference note [4])."""
    y = np.asarray(y, dtype=np.float64)
    if ar_terms is None:
        ar_terms = [1, 2]
    max_ar = max(ar_terms)
    if np.all(y == y[0]) or len(y) <= max_ar + 2:
        return np.full(h, float(y[-1]))
    emb = embed(y, max_ar + 1)
    target = emb[:, 0]
    lags = emb[:, ar_terms]  # column j of embed is lag j
    # drop constant lag columns (adjust_ar_terms=True behavior)
    keep = [j for j in range(lags.shape[1]) if np.ptp(lags[:, j]) > 0]
    if not keep:
        return np.full(h, float(y[-1]))
    lags = lags[:, keep]
    kept_terms = [ar_terms[j] for j in keep]
    X = np.column_stack([np.ones(len(target)), lags]) if add_constant else lags
    beta = quantile_regression(X, target, tau)
    hist = list(y)
    out = np.empty(h)
    for step in range(h):
        row = [1.0] if add_constant else []
        row += [hist[-t] for t in kept_terms]
        val = float(np.dot(row, beta))
        out[step] = val
        hist.append(val)
    return out
