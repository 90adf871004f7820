"""Adaptive hyper-parameter optimization: a from-scratch TPE sampler
and median pruner, closing the reference's Optuna dependency.

Reference behavior contract
(fforma/experiments/cross_validation/common.py:103-106):

    sampler = TPESampler(seed=random_seed)
    pruner  = MedianPruner()
    study   = optuna.create_study(sampler=sampler, pruner=pruner)
    study.optimize(objective, n_trials=n_trials)

with the objective reporting the running-mean CV loss after every fold
and raising TrialPruned when ``trial.should_prune()``
(common.py:75-94). optuna is not installed in this container, so this
module implements both pieces from scratch (numpy only), following the
published algorithm (Bergstra et al., "Algorithms for Hyper-Parameter
Optimization", NeurIPS 2011) rather than optuna's source:

* :class:`TPESampler` — univariate tree-structured Parzen estimator.
  The first ``n_startup_trials`` draws are random; afterwards the
  observed (params, loss) history is split into the best ``gamma``
  fraction l(x) and the rest g(x), each modeled per-dimension with a
  truncated-Gaussian Parzen mixture (categoricals: smoothed category
  frequencies), and the next point is the best of ``n_ei_candidates``
  draws from l(x) ranked by the EI surrogate l(x)/g(x).
* :class:`MedianPruner` — a trial reporting intermediate value v at
  step s is pruned when v is strictly worse than the median of the
  completed trials' intermediate values at step s (active once
  ``n_startup_trials`` trials completed).
* :func:`tpe_cross_validate_fforma` — the reference's CV flow over the
  Spark-resident feature/error panels: matrix collected once through
  the budget-capped path, per-fold intermediate reporting, pruning,
  final refit on all rows with the best params.

Everything is deterministic under a fixed seed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from fforma_spark.functions.cross_validation import stratified_kfold
from fforma_spark.functions.meta_learner import (
    NumpyFFORMA,
    collect_training_matrix,
)

# ---------------------------------------------------------------------------
# search-space definition
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Uniform:
    low: float
    high: float
    log: bool = False


@dataclass(frozen=True)
class Int:
    low: int
    high: int
    log: bool = False


@dataclass(frozen=True)
class Categorical:
    choices: tuple


Space = dict  # name -> Uniform | Int | Categorical


# ---------------------------------------------------------------------------
# Parzen estimator (one dimension)
# ---------------------------------------------------------------------------


class _Parzen:
    """Truncated-Gaussian Parzen mixture over [low, high] (optionally
    in log space), built from observed values plus one wide prior
    component so the density never vanishes — the density model TPE
    uses for both l(x) and g(x)."""

    def __init__(self, obs: np.ndarray, low: float, high: float, log: bool):
        self.log = log
        if log:
            obs, low, high = np.log(obs), np.log(low), np.log(high)
        self.low, self.high = float(low), float(high)
        span = self.high - self.low
        # prior component: one Gaussian centered mid-range, sigma=span
        mus = np.append(np.asarray(obs, dtype=np.float64), (self.low + self.high) / 2)
        order = np.argsort(mus)
        mus = mus[order]
        # bandwidth: distance to the farther adjacent neighbor,
        # clipped to [span/100, span] (Bergstra's heuristic; the floor
        # stays small so tight clusters keep tight kernels)
        n = len(mus)
        if n == 1:
            sig = np.array([span])
        else:
            gap_lo = np.diff(mus, prepend=self.low)
            gap_hi = np.diff(mus, append=self.high)
            sig = np.maximum(gap_lo, gap_hi)
        sig = np.clip(sig, span / 100.0, span)
        # prior keeps its wide sigma
        self.mu, self.sigma = mus, sig
        self.sigma[order == n - 1] = span  # the appended prior component
        # truncation mass of each component on [low, high]
        self._z = self._cdf(self.high) - self._cdf(self.low)
        self._z = np.maximum(self._z, 1e-12)

    def _cdf(self, x):
        from math import sqrt

        z = (x - self.mu) / (self.sigma * sqrt(2.0))
        # vectorized erf via numpy (math.erf is scalar)
        return 0.5 * (1.0 + _erf(z))

    def sample(self, rng: np.random.RandomState, size: int) -> np.ndarray:
        """Draw from the truncated mixture by rejection per component."""
        comp = rng.randint(0, len(self.mu), size=size)
        out = np.empty(size)
        for i, c in enumerate(comp):
            for _ in range(100):
                v = rng.normal(self.mu[c], self.sigma[c])
                if self.low <= v <= self.high:
                    break
            else:  # pathological sigma: fall back to uniform
                v = rng.uniform(self.low, self.high)
            out[i] = v
        return np.exp(out) if self.log else out

    def log_pdf(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        t = np.log(x) if self.log else x
        z = (t[:, None] - self.mu[None, :]) / self.sigma[None, :]
        comp = (
            -0.5 * z * z
            - np.log(self.sigma[None, :] * np.sqrt(2 * np.pi))
            - np.log(self._z[None, :])
        )
        m = comp.max(axis=1, keepdims=True)
        lp = m[:, 0] + np.log(np.exp(comp - m).sum(axis=1)) - np.log(len(self.mu))
        if self.log:  # change of variables d(log x) = dx / x
            lp = lp - t
        return lp


def _erf(z: np.ndarray) -> np.ndarray:
    """Vectorized erf (Abramowitz–Stegun 7.1.26, |err| < 1.5e-7 —
    plenty for a sampler's truncation mass)."""
    z = np.asarray(z, dtype=np.float64)
    s = np.sign(z)
    a = np.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * np.exp(-a * a))


class _CatParzen:
    """Smoothed categorical frequencies (+1 pseudo-count per choice)."""

    def __init__(self, obs_idx: np.ndarray, n_choices: int):
        w = np.bincount(obs_idx, minlength=n_choices).astype(np.float64) + 1.0
        self.p = w / w.sum()

    def sample(self, rng: np.random.RandomState, size: int) -> np.ndarray:
        return rng.choice(len(self.p), size=size, p=self.p)

    def log_pdf(self, idx: np.ndarray) -> np.ndarray:
        return np.log(self.p[np.asarray(idx, dtype=np.int64)])


# ---------------------------------------------------------------------------
# TPE sampler
# ---------------------------------------------------------------------------


@dataclass
class TPESampler:
    """Univariate TPE: independent Parzen estimators per dimension,
    EI-ranked candidate draws (Bergstra et al. 2011 §4)."""

    seed: int = 1
    n_startup_trials: int = 10
    n_ei_candidates: int = 24
    gamma_max: int = 25

    def __post_init__(self):
        self.rng = np.random.RandomState(self.seed)

    def _gamma(self, n: int) -> int:
        # top-quantile split size: ceil(0.25*sqrt(n)) capped (the
        # "good" set stays small so l(x) tracks the best region)
        return min(int(np.ceil(0.25 * np.sqrt(n))), self.gamma_max)

    def _random_point(self, space: Space) -> dict:
        p = {}
        for name, dim in space.items():
            if isinstance(dim, Categorical):
                p[name] = dim.choices[self.rng.randint(len(dim.choices))]
            elif isinstance(dim, Int):
                if dim.log:
                    v = np.exp(self.rng.uniform(np.log(dim.low), np.log(dim.high + 1)))
                    p[name] = int(np.clip(int(v), dim.low, dim.high))
                else:
                    p[name] = int(self.rng.randint(dim.low, dim.high + 1))
            else:
                if dim.log:
                    p[name] = float(
                        np.exp(self.rng.uniform(np.log(dim.low), np.log(dim.high)))
                    )
                else:
                    p[name] = float(self.rng.uniform(dim.low, dim.high))
        return p

    def suggest(self, space: Space, history: list[tuple[dict, float]]) -> dict:
        """history: [(params, loss)] of finished trials. Pruned trials
        participate with their LAST INTERMEDIATE value as the loss —
        matching optuna's TPESampler, which includes pruned trials in
        the Parzen split that way (Study.optimize feeds them in; r3
        ADVICE fix — the old behavior silently excluded them)."""
        done = [(p, v) for p, v in history if np.isfinite(v)]
        if len(done) < self.n_startup_trials:
            return self._random_point(space)
        vals = np.array([v for _, v in done])
        order = np.argsort(vals, kind="stable")
        n_good = max(1, self._gamma(len(done)))
        good = [done[i][0] for i in order[:n_good]]
        bad = [done[i][0] for i in order[n_good:]] or good
        out = {}
        for name, dim in space.items():
            if isinstance(dim, Categorical):
                idx = {c: i for i, c in enumerate(dim.choices)}
                lg = _CatParzen(
                    np.array([idx[p[name]] for p in good], dtype=np.int64),
                    len(dim.choices),
                )
                bg = _CatParzen(
                    np.array([idx[p[name]] for p in bad], dtype=np.int64),
                    len(dim.choices),
                )
                cand = lg.sample(self.rng, self.n_ei_candidates)
                score = lg.log_pdf(cand) - bg.log_pdf(cand)
                out[name] = dim.choices[int(cand[int(np.argmax(score))])]
            else:
                low, high = float(dim.low), float(dim.high)
                if isinstance(dim, Int):
                    high = float(dim.high)
                lg = _Parzen(
                    np.array([p[name] for p in good], dtype=np.float64),
                    low,
                    high,
                    dim.log,
                )
                bg = _Parzen(
                    np.array([p[name] for p in bad], dtype=np.float64),
                    low,
                    high,
                    dim.log,
                )
                cand = np.clip(lg.sample(self.rng, self.n_ei_candidates), low, high)
                score = lg.log_pdf(cand) - bg.log_pdf(cand)
                best = float(cand[int(np.argmax(score))])
                out[name] = (
                    int(np.clip(round(best), dim.low, dim.high))
                    if isinstance(dim, Int)
                    else best
                )
        return out


# ---------------------------------------------------------------------------
# median pruner + study loop
# ---------------------------------------------------------------------------


@dataclass
class MedianPruner:
    """Prune a trial whose intermediate value at step s is strictly
    worse than the median of completed trials' values at step s
    (optuna MedianPruner defaults: n_startup_trials=5,
    n_warmup_steps=0)."""

    n_startup_trials: int = 5
    n_warmup_steps: int = 0
    _completed: list = field(default_factory=list)  # list of per-step lists

    def should_prune(self, step: int, value: float) -> bool:
        if len(self._completed) < self.n_startup_trials:
            return False
        if step < self.n_warmup_steps:
            return False
        peers = [t[step] for t in self._completed if len(t) > step]
        if not peers:
            return False
        return value > float(np.median(peers))

    def trial_complete(self, intermediates: list[float]) -> None:
        self._completed.append(list(intermediates))


class TrialPruned(Exception):
    pass


@dataclass
class Study:
    """Minimal sequential ask-tell loop: TPE sampling + median pruning
    over an objective(params, report) -> loss callable, where the
    objective calls ``report(step, value)`` after each fold and the
    study raises :class:`TrialPruned` inside it to stop the trial."""

    space: Space
    sampler: TPESampler
    pruner: MedianPruner = field(default_factory=MedianPruner)

    def __post_init__(self):
        self.trials: list[dict] = []

    def optimize(self, objective, n_trials: int):
        history: list[tuple[dict, float]] = []
        for _ in range(n_trials):
            params = self.sampler.suggest(self.space, history)
            intermediates: list[float] = []

            def report(step: int, value: float):
                intermediates.append(value)
                if self.pruner.should_prune(step, value):
                    raise TrialPruned()

            try:
                value = float(objective(params, report))
                state = "complete"
                self.pruner.trial_complete(intermediates)
                history.append((params, value))
            except TrialPruned:
                value, state = float("nan"), "pruned"
                if intermediates:
                    # optuna's TPE treats a pruned trial as a finished
                    # trial at its last intermediate value
                    history.append((params, float(intermediates[-1])))
            self.trials.append(
                {
                    "params": params,
                    "value": value,
                    "state": state,
                    "intermediates": intermediates,
                }
            )
        done = [t for t in self.trials if t["state"] == "complete"]
        if not done:
            raise ValueError("every trial was pruned — lower n_startup_trials")
        return min(done, key=lambda t: t["value"])


# ---------------------------------------------------------------------------
# FFORMA wiring
# ---------------------------------------------------------------------------

DEFAULT_SPACE: Space = {
    # the reference's XGBoost dimensions (tourism.py:72-76) mapped to
    # the from-scratch GBT's knobs: n_estimators→n_rounds, eta→
    # learning_rate, max_depth→max_depth (shrunk: the numpy GBT is
    # exact, not histogram-binned), lambda regularization added
    "n_rounds": Int(5, 60),
    "learning_rate": Uniform(1e-3, 1.0, log=True),
    "max_depth": Int(2, 6),
    "reg_lambda": Uniform(1e-2, 10.0, log=True),
}


def tpe_cross_validate_fforma(
    features_df,
    errors_df,
    loss_cols: list[str],
    benchmark: str,
    space: Space | None = None,
    n_trials: int = 30,
    n_splits: int = 3,
    seed: int = 1,
    train_row_budget: int | None = 2_000_000,
):
    """The reference's CrossValidation.fit flow (common.py:100-117)
    over Spark-resident inputs: budget-capped single collect, TPE
    sampling, per-fold median pruning, final refit with best params.

    Returns (best_params, best_loss, study, model, kept, feature_cols).
    """
    space = DEFAULT_SPACE if space is None else space
    X, err, kept, feature_cols, doc_ids = collect_training_matrix(
        features_df, errors_df, loss_cols, benchmark, None, train_row_budget, seed
    )
    classes = np.array([str(d)[:1] for d in doc_ids])
    folds = [
        (tr, te)
        for tr, te in stratified_kfold(classes, n_splits, seed)
        if len(tr) and len(te)
    ]
    if not folds:
        raise ValueError(
            f"no usable CV folds: {len(X)} rows cannot fill {n_splits} splits"
        )

    def objective(params: dict, report) -> float:
        losses = []
        for step, (tr, te) in enumerate(folds):
            model = NumpyFFORMA(**params).fit(X[tr], err[tr])
            w = model.predict_weights(X[te])
            losses.append(float((w * err[te]).sum(axis=1).mean()))
            # the reference reports the RUNNING MEAN, not the fold
            # loss (common.py:88-91)
            report(step, float(np.mean(losses)))
        return float(np.mean(losses))

    study = Study(space, TPESampler(seed=seed))
    best = study.optimize(objective, n_trials)
    model = NumpyFFORMA(**best["params"]).fit(X, err)
    return best["params"], best["value"], study, model, kept, feature_cols
