"""From-scratch TPE + MedianPruner (fforma_spark/functions/hpo.py):
sampler math, optimization behavior vs random search, pruner
semantics, and the Spark-wired CV flow mirroring the reference's
optuna study (fforma/experiments/cross_validation/common.py:100-117).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from fforma_spark.functions.hpo import (
    Categorical,
    Int,
    MedianPruner,
    Study,
    TPESampler,
    TrialPruned,
    Uniform,
    _erf,
    _Parzen,
)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYP = True
except Exception:  # noqa: BLE001
    _HAS_HYP = False


if _HAS_HYP:

    @settings(max_examples=60, deadline=None)
    @given(
        obs=st.lists(
            st.floats(min_value=0.51, max_value=9.99), min_size=1, max_size=12
        ),
        log=st.booleans(),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_parzen_fuzz_bounds_and_finite_density(obs, log, seed):
        """For arbitrary observation sets: samples stay in [low, high]
        and log_pdf is finite everywhere inside the domain."""
        pz = _Parzen(np.array(obs), 0.5, 10.0, log)
        rng = np.random.RandomState(seed)
        s = pz.sample(rng, 64)
        assert s.min() >= 0.5 - 1e-9 and s.max() <= 10.0 + 1e-9
        xs = np.linspace(0.5, 10.0, 257)
        lp = pz.log_pdf(xs)
        assert np.all(np.isfinite(lp))


def test_erf_matches_math_erf():
    z = np.linspace(-4, 4, 201)
    got = _erf(z)
    want = np.array([math.erf(v) for v in z])
    assert np.max(np.abs(got - want)) < 2e-7


def test_parzen_log_pdf_is_normalized_density():
    """exp(log_pdf) must integrate to ~1 over [low, high] — the
    truncation mass bookkeeping is what makes l(x)/g(x) comparable."""
    obs = np.array([1.0, 2.0, 2.5, 7.0])
    for log in (False, True):
        pz = _Parzen(obs, 0.5, 10.0, log)
        xs = np.linspace(0.5, 10.0, 20001)
        dens = np.exp(pz.log_pdf(xs))
        integral = np.trapz(dens, xs)
        assert abs(integral - 1.0) < 5e-3, (log, integral)


def test_parzen_sample_within_bounds_and_near_observations():
    rng = np.random.RandomState(0)
    pz = _Parzen(np.array([3.0, 3.1, 2.9]), 0.0, 100.0, False)
    s = pz.sample(rng, 500)
    assert s.min() >= 0.0 and s.max() <= 100.0
    # 3 tight components at ~3 + one wide prior: well over a quarter
    # of the mass (the tight components' share) must land near the
    # observation cluster, far more than the uniform-prior baseline
    near = np.mean(np.abs(s - 3.0) < 10.0)
    assert near > 0.4, near


def _quadratic(params, report):
    return (params["x"] - 2.0) ** 2


def test_tpe_beats_random_search_on_quadratic():
    """Same trial budget, same seed family: TPE's best value must beat
    pure random search (the whole point of the sampler)."""
    space = {"x": Uniform(0.0, 10.0)}
    study = Study(space, TPESampler(seed=7, n_startup_trials=8))
    best = study.optimize(_quadratic, n_trials=40)

    rng = np.random.RandomState(7)
    random_best = min((rng.uniform(0, 10) - 2.0) ** 2 for _ in range(40))

    assert best["value"] < random_best
    assert abs(best["params"]["x"] - 2.0) < 0.5


def test_tpe_concentrates_after_startup():
    space = {"x": Uniform(0.0, 10.0)}
    study = Study(space, TPESampler(seed=3, n_startup_trials=10))
    study.optimize(_quadratic, n_trials=40)
    xs = [t["params"]["x"] for t in study.trials]
    early = np.mean([abs(x - 2.0) for x in xs[:10]])
    late = np.mean([abs(x - 2.0) for x in xs[-10:]])
    assert late < early


def test_tpe_mixed_space_types_and_targets():
    """Int stays int within bounds, categorical stays in choices, and
    the sampler finds the good (cat, int) region."""

    def obj(params, report):
        pen = 0.0 if params["kind"] == "b" else 5.0
        return pen + (params["k"] - 7) ** 2 + (math.log(params["lr"]) + 3) ** 2

    space = {
        "kind": Categorical(("a", "b", "c")),
        "k": Int(1, 20),
        "lr": Uniform(1e-4, 1.0, log=True),
    }
    study = Study(space, TPESampler(seed=11, n_startup_trials=10))
    best = study.optimize(obj, n_trials=60)
    for t in study.trials:
        assert isinstance(t["params"]["k"], int)
        assert 1 <= t["params"]["k"] <= 20
        assert t["params"]["kind"] in ("a", "b", "c")
        assert 1e-4 <= t["params"]["lr"] <= 1.0
    assert best["params"]["kind"] == "b"
    assert abs(best["params"]["k"] - 7) <= 2


def test_median_pruner_semantics():
    pr = MedianPruner(n_startup_trials=2)
    # startup: nothing prunes
    assert not pr.should_prune(0, 1e9)
    pr.trial_complete([1.0, 0.9])
    assert not pr.should_prune(0, 1e9)  # still only 1 completed
    pr.trial_complete([3.0, 2.5])
    # medians: step0 = 2.0, step1 = 1.7
    assert pr.should_prune(0, 2.1)
    assert not pr.should_prune(0, 2.0)  # strictly-worse rule
    assert pr.should_prune(1, 1.8)
    assert not pr.should_prune(1, 1.6)
    # a step no completed trial reached: never prunes
    assert not pr.should_prune(5, 100.0)


def test_study_prunes_and_still_finds_best():
    """Objective with 3 steps where bad params are visibly bad at step
    0: once enough trials complete, bad trials get pruned mid-way, yet
    the best completed trial is a good one."""
    calls = {"full": 0, "pruned": 0}

    def obj(params, report):
        bad = params["x"] > 5.0
        for step in range(3):
            val = (10.0 if bad else 1.0) + params["x"] * 0.01 - step * 0.1
            report(step, val)
        calls["full"] += 1
        return val

    space = {"x": Uniform(0.0, 10.0)}
    study = Study(
        space,
        TPESampler(seed=5, n_startup_trials=6),
        MedianPruner(n_startup_trials=3),
    )
    best = study.optimize(obj, n_trials=30)
    states = [t["state"] for t in study.trials]
    assert states.count("pruned") > 0
    assert best["params"]["x"] <= 5.0
    # pruned trials stopped early: fewer full evaluations than trials
    assert calls["full"] == states.count("complete") < 30


def test_study_deterministic_under_seed():
    space = {"x": Uniform(0.0, 10.0), "k": Int(1, 5)}

    def obj(params, report):
        return (params["x"] - 3) ** 2 + params["k"]

    a = Study(space, TPESampler(seed=9))
    a.optimize(obj, n_trials=25)
    b = Study(space, TPESampler(seed=9))
    b.optimize(obj, n_trials=25)
    assert [t["params"] for t in a.trials] == [t["params"] for t in b.trials]
    assert [t["value"] for t in a.trials] == [t["value"] for t in b.trials]


def test_all_pruned_raises_clearly():
    pr = MedianPruner(n_startup_trials=0)
    pr._completed.append([-1e18])

    def obj(params, report):
        report(0, 0.0)
        return 0.0

    study = Study({"x": Uniform(0, 1)}, TPESampler(seed=1), pr)
    with pytest.raises(ValueError, match="every trial was pruned"):
        study.optimize(obj, n_trials=3)


def test_tpe_cv_fforma_end_to_end(spark):
    """The reference CV flow on Spark inputs: TPE over the GBT knobs,
    per-fold median pruning, final refit — deterministic, finite, and
    parameters inside the declared space."""
    from pyspark.sql import functions as F

    from fforma_spark.functions.features import features_wide
    from fforma_spark.functions.hpo import (
        Int as HInt,
        Uniform as HUniform,
        tpe_cross_validate_fforma,
    )
    from fforma_spark.functions.metrics import evaluate_with_owa, mase_scale
    from fforma_spark.functions.models import (
        FORECAST_COLS,
        base_forecasts,
        holdout_truth,
        train_split,
    )
    from fforma_spark.operators.reshape import explode_panel
    from fforma_spark.sources.tables import sequences_from_documents

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
    feats = features_wide(seq).na.fill(0.0)
    errors = ev.select("doc_id", *owa_cols).na.fill(0.0)
    space = {
        "n_rounds": HInt(4, 12),
        "learning_rate": HUniform(0.05, 0.5, log=True),
        "max_depth": HInt(2, 3),
    }
    best, loss, study, model, kept, fcols = tpe_cross_validate_fforma(
        feats, errors, owa_cols, benchmark="naive2_owa",
        space=space, n_trials=8, n_splits=3, seed=1,
    )
    assert np.isfinite(loss)
    assert 4 <= best["n_rounds"] <= 12 and isinstance(best["n_rounds"], int)
    assert 0.05 <= best["learning_rate"] <= 0.5
    assert best["max_depth"] in (2, 3)
    assert len(study.trials) == 8
    completed = [t for t in study.trials if t["state"] == "complete"]
    assert loss == min(t["value"] for t in completed)
    # every completed trial reported one intermediate per fold
    n_folds = len(completed[0]["intermediates"])
    assert all(len(t["intermediates"]) == n_folds for t in completed)
    assert model.loss_curve_[-1] <= model.loss_curve_[0] + 1e-9
