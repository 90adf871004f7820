"""FFORMA meta-learner: from-scratch numpy gradient-boosted trees with
the FFORMA softmax objective (no xgboost/scipy in this container).

Semantics follow the reference implementation structurally (citations
into /root/reference for the behavior contract; the algorithm itself is
the public XGBoost/FFORMA formulation — Chen & Guestrin 2016,
Montero-Manso et al. 2020):

* contribution-to-error = err_model / (err_benchmark + 1e-3), losers
  (never-argmin models) dropped (fforma/meta_learner/_XGBoost.py:98-116).
* objective over per-series raw scores F (n,K), p = softmax(F):
    weighted loss  L_i = Σ_k p_ik · err_ik      (_XGBoost.py:60-62,74-78)
    grad           g_ik = p_ik (err_ik − L_i)    (_XGBoost.py:64)
    hess           h_ik = err_ik p_ik (1−p_ik) − g_ik p_ik  (_XGBoost.py:65)
* one regression tree per class per boosting round; leaf value
  −G/(H+λ), split gain ½[G_l²/(H_l+λ) + G_r²/(H_r+λ) − G²/(H+λ)]
  (XGBoost exact greedy algorithm — public).
* predict: weights = softmax(F(x)); y_hat = Σ_k w_k · forecast_k
  (_XGBoost.py:137-163).

Scale shape: training data is ONE row per series (features + per-model
errors) — collected to the driver, which is the same shape the
reference trains on and is small even for millions of series;
weight APPLICATION is distributed (broadcast join + weighted sum).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# Regression tree (exact greedy, second-order)
# ---------------------------------------------------------------------------


@dataclass
class _Node:
    feature: int = -1
    threshold: float = 0.0
    left: "_Node | None" = None
    right: "_Node | None" = None
    value: float = 0.0
    is_leaf: bool = False


class _Tree:
    def __init__(self, max_depth: int, reg_lambda: float, min_child_weight: float,
                 gamma: float = 0.0):
        self.max_depth = max_depth
        self.lam = reg_lambda
        self.mcw = min_child_weight
        self.gamma = gamma
        self.root: _Node | None = None

    def _leaf(self, g: np.ndarray, h: np.ndarray) -> _Node:
        H = h.sum()
        if H < self.mcw:
            # FFORMA hessians can be negative (softmax objective is
            # non-convex); xgboost handles that by pruning leaves whose
            # summed hessian is below min_child_weight. Take no step
            # rather than a Newton step against untrusted curvature.
            return _Node(value=0.0, is_leaf=True)
        return _Node(value=-g.sum() / (H + self.lam), is_leaf=True)

    def _best_split(self, X: np.ndarray, g: np.ndarray, h: np.ndarray):
        n, d = X.shape
        G, H = g.sum(), h.sum()
        parent = G * G / (H + self.lam)
        best = (0.0, -1, 0.0)  # gain, feature, threshold
        for j in range(d):
            order = np.argsort(X[:, j], kind="stable")
            xs = X[order, j]
            gl = np.cumsum(g[order])[:-1]
            hl = np.cumsum(h[order])[:-1]
            # candidate split after position i: left = [0..i], right = rest;
            # only between distinct feature values
            valid = xs[1:] != xs[:-1]
            if not valid.any():
                continue
            hr = H - hl
            ok = valid & (hl >= self.mcw) & (hr >= self.mcw)
            if not ok.any():
                continue
            gr = G - gl
            gain = 0.5 * (
                gl * gl / (hl + self.lam) + gr * gr / (hr + self.lam) - parent
            ) - self.gamma
            gain = np.where(ok, gain, -np.inf)
            i = int(np.argmax(gain))
            if gain[i] > best[0]:
                best = (float(gain[i]), j, float((xs[i] + xs[i + 1]) / 2))
        return best

    def _build(self, X, g, h, depth) -> _Node:
        if depth >= self.max_depth or len(g) < 2:
            return self._leaf(g, h)
        gain, j, thr = self._best_split(X, g, h)
        if j < 0 or gain <= 0.0:
            return self._leaf(g, h)
        mask = X[:, j] < thr
        node = _Node(feature=j, threshold=thr)
        node.left = self._build(X[mask], g[mask], h[mask], depth + 1)
        node.right = self._build(X[~mask], g[~mask], h[~mask], depth + 1)
        return node

    def fit(self, X, g, h):
        self.root = self._build(X, g, h, 0)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        out = np.empty(len(X))
        for i, row in enumerate(X):
            node = self.root
            while not node.is_leaf:
                node = node.left if row[node.feature] < node.threshold else node.right
            out[i] = node.value
        return out


# ---------------------------------------------------------------------------
# FFORMA gradient boosting
# ---------------------------------------------------------------------------


@dataclass
class NumpyFFORMA:
    """Gradient-boosted FFORMA weight model (driver-side numpy)."""

    n_rounds: int = 50
    learning_rate: float = 0.1
    max_depth: int = 4
    reg_lambda: float = 1.0
    min_child_weight: float = 1e-6
    trees_: list = field(default_factory=list, repr=False)
    loss_curve_: list = field(default_factory=list, repr=False)

    def _grad_hess(self, errors: np.ndarray, F: np.ndarray):
        p = softmax(F)
        L = (p * errors).sum(axis=1, keepdims=True)
        grad = p * (errors - L)
        hess = errors * p * (1.0 - p) - grad * p
        # hessians are handed to the trees RAW (possibly negative),
        # exactly like the reference hands them to xgboost
        # (fforma/meta_learner/_XGBoost.py:65); _Tree guards low/negative
        # curvature via min_child_weight (split gate + leaf no-step).
        return grad, hess, float(L.mean())

    def fit(self, X: np.ndarray, errors: np.ndarray) -> "NumpyFFORMA":
        X = np.asarray(X, dtype=np.float64)
        errors = np.asarray(errors, dtype=np.float64)
        n, k = errors.shape
        F = np.zeros((n, k))
        for _ in range(self.n_rounds):
            grad, hess, loss = self._grad_hess(errors, F)
            self.loss_curve_.append(loss)
            round_trees = []
            for c in range(k):
                t = _Tree(self.max_depth, self.reg_lambda, self.min_child_weight)
                t.fit(X, grad[:, c], hess[:, c])
                F[:, c] += self.learning_rate * t.predict(X)
                round_trees.append(t)
            self.trees_.append(round_trees)
        _, _, loss = self._grad_hess(errors, F)
        self.loss_curve_.append(loss)
        return self

    def raw_scores(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        k = len(self.trees_[0])
        F = np.zeros((len(X), k))
        for round_trees in self.trees_:
            for c, t in enumerate(round_trees):
                F[:, c] += self.learning_rate * t.predict(X)
        return F

    def predict_weights(self, X: np.ndarray) -> np.ndarray:
        return softmax(self.raw_scores(X))


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def collect_training_matrix(
    features_df,
    errors_df,
    loss_cols: list[str],
    benchmark: str,
    feature_cols: list[str] | None = None,
    train_row_budget: int | None = 2_000_000,
    sample_seed: int = 2024,
):
    """Budget-capped collect of the per-series (features ⋈ errors)
    matrix (see fit_fforma_spark for the scale contract).

    Returns (X, err, kept_models, feature_cols, doc_ids) with
    benchmark-relative errors and loser pruning already applied.
    """
    from pyspark.sql import functions as SF

    joined = features_df.join(errors_df, "doc_id")
    cached = None
    try:
        if train_row_budget is not None:
            # cache before the budget count: the upstream plan includes
            # the full feature mapInPandas pass, and without the cache
            # the count + (possible) prefix-distinct + final toPandas
            # would each re-execute it from scratch
            cached = joined.cache()
            joined = cached
            n_total = joined.count()
            if n_total > train_row_budget:
                frac = train_row_budget / n_total
                joined = joined.withColumn(
                    "_pfx", SF.substring("doc_id", 1, 1)
                )
                prefixes = [
                    r[0] for r in joined.select("_pfx").distinct().collect()
                ]
                joined = joined.sampleBy(
                    "_pfx", {p: frac for p in prefixes}, seed=sample_seed
                ).drop("_pfx")
        pdf = joined.orderBy("doc_id").toPandas()
    finally:
        if cached is not None:
            cached.unpersist()
    if feature_cols is None:
        feature_cols = [c for c in features_df.columns if c != "doc_id"]
    models = [c for c in loss_cols if c != benchmark]
    err = pdf[models].to_numpy(dtype=np.float64)
    bench = pdf[benchmark].to_numpy(dtype=np.float64)
    err = err / (bench[:, None] + 1e-3)
    winners = set(np.unique(err.argmin(axis=1)))
    kept = [m for i, m in enumerate(models) if i in winners]
    err = err[:, [i for i in range(len(models)) if i in winners]]
    X = pdf[feature_cols].to_numpy(dtype=np.float64)
    X = np.nan_to_num(X, nan=0.0, posinf=0.0, neginf=0.0)
    return X, err, kept, feature_cols, pdf["doc_id"].to_numpy()


def fit_fforma_spark(
    features_df,
    errors_df,
    loss_cols: list[str],
    benchmark: str,
    feature_cols: list[str] | None = None,
    train_row_budget: int | None = 2_000_000,
    sample_seed: int = 2024,
    **params,
) -> tuple[NumpyFFORMA, list[str], list[str]]:
    """Train on the collected per-series (features ⋈ errors) matrix —
    1 row/series, the same driver-side shape the reference uses.

    The collect is CAPPED: above ``train_row_budget`` rows a seeded
    stratified sample (by doc_id first character, Spark ``sampleBy``)
    is taken first, so at the 10^12-doc target the driver pulls a
    bounded ~budget×(features+errors) matrix instead of ~10 TB. GBT
    weight functions are smooth in the feature distribution, so a
    multi-million-series sample preserves them (test:
    tests/test_meta_learner.py sampled-vs-full agreement). Scoring is
    always fully distributed (fforma_weights_df).

    Returns (model, kept_models, feature_cols). Benchmark-relative
    scaling and loser pruning per _XGBoost.py:98-116.
    """
    X, err, kept, feature_cols, _ = collect_training_matrix(
        features_df,
        errors_df,
        loss_cols,
        benchmark,
        feature_cols,
        train_row_budget,
        sample_seed,
    )
    model = NumpyFFORMA(**params).fit(X, err)
    return model, kept, feature_cols


def fforma_weights_df(spark, model: NumpyFFORMA, features_df,
                      feature_cols: list[str], kept: list[str]):
    """Distributed weight application: score features with the trained
    trees inside a mapInPandas pass (model broadcast via closure),
    yielding the per-series weight table for weighted_rollup."""
    import pandas as pd

    schema = "doc_id string, " + ", ".join(f"w_{m} double" for m in kept)

    def score(it):
        for pdf in it:
            X = pdf[feature_cols].to_numpy(dtype=np.float64)
            X = np.nan_to_num(X, nan=0.0, posinf=0.0, neginf=0.0)
            w = model.predict_weights(X)
            out = pd.DataFrame({"doc_id": pdf["doc_id"]})
            for i, m in enumerate(kept):
                out[f"w_{m}"] = w[:, i]
            yield out

    from fforma_spark.util import ensure_parallelism

    src = ensure_parallelism(features_df.select("doc_id", *feature_cols))
    return src.mapInPandas(score, schema)
