"""Feature rollup parity: Spark mapInPandas == driver numpy oracle,
SQL features == DuckDB oracle == numpy kernels."""

from __future__ import annotations

import numpy as np
import pytest

from fforma_spark.functions import kernels as K
from fforma_spark.functions.features import (
    FEATURE_NAMES,
    SEASONALITY_BY_PREFIX,
    features_sql,
    features_sql_oracle,
    features_wide,
)
from fforma_spark.operators.reshape import explode_panel
from fforma_spark.sources.synth import synth_sequences, synth_sequences_pandas
from fforma_spark.sources.tables import PANEL_FROM_EVENTS_SQL, panel_from_events

from tests.conftest import SF_DIR, assert_df_equal


def test_features_wide_matches_numpy_oracle(spark):
    n, seed = 30, 5
    seq_pd = synth_sequences_pandas(n, seed)
    got = {
        r["doc_id"]: {f: r[f] for f in FEATURE_NAMES}
        for r in features_wide(synth_sequences(spark, n, seed)).collect()
    }
    assert len(got) == n
    for _, row in seq_pd.iterrows():
        s = SEASONALITY_BY_PREFIX.get(row["doc_id"][:1], 1)
        exp = K.feature_vector(
            np.asarray(row["tokens"], dtype=np.float64), s
        )
        for f in FEATURE_NAMES:
            assert got[row["doc_id"]][f] == pytest.approx(exp[f], rel=1e-12), (
                row["doc_id"],
                f,
            )


def test_features_sql_matches_duckdb(spark, ddb):
    from pyspark.sql import functions as F

    panel = panel_from_events(spark, SF_DIR)
    got = features_sql(panel)
    for c in ["mean", "variance", "trend_slope", "x_acf1"]:
        got = got.withColumn(c, F.round(c, 6))
    sql = f"""
        SELECT doc_id, series_length, round(mean,6) AS mean,
               round(variance,6) AS variance, round(trend_slope,6) AS trend_slope,
               round(x_acf1,6) AS x_acf1, crossing_points
        FROM ({features_sql_oracle(PANEL_FROM_EVENTS_SQL)})
    """
    assert_df_equal(got, ddb.execute(sql), ["doc_id"], atol=1e-6)


def test_features_sql_matches_kernels(spark):
    """Closed-form SQL features equal the numpy kernel values on
    synthetic sequences (trend via covar/var == polyfit slope; acf1
    mean-centered full-denominator == reference acf)."""
    n, seed = 25, 9
    seq = synth_sequences(spark, n, seed)
    panel = explode_panel(seq)
    got = {r["doc_id"]: r.asDict() for r in features_sql(panel).collect()}
    for _, row in synth_sequences_pandas(n, seed).iterrows():
        x = np.asarray(row["tokens"], dtype=np.float64)
        g = got[row["doc_id"]]
        slope, _ = K.detrend_coeffs(x)
        assert g["series_length"] == len(x)
        assert g["mean"] == pytest.approx(x.mean(), rel=1e-9)
        assert g["trend_slope"] == pytest.approx(slope, rel=1e-6, abs=1e-9)
        exp_acf = K.acf(x, 1)
        if not np.isfinite(exp_acf):  # constant series → fillna(0)
            exp_acf = 0.0  # (fforma/experiments/base/common.py:139)
        assert g["x_acf1"] == pytest.approx(exp_acf, rel=1e-9)
        assert g["crossing_points"] == K.crossing_points(x)


# ---------------------------------------------------------------------------
# Round-2 tsfeatures vocabulary: spike / linearity / curvature /
# hw_alpha|beta|gamma / nperiods / seasonal_period
# ---------------------------------------------------------------------------


def test_spike_matches_explicit_loo_loop():
    """kernels.spike == an independent leave-one-out loop over the
    decomposition remainder (Hyndman stl_features formulation)."""
    rng = np.random.RandomState(3)
    x = rng.rand(60) * 10 + np.sin(np.arange(60) / 3)
    for ppy in (1, 7):
        got = K.spike(x, ppy)
        _, _, rem = K._classical_additive(x, ppy)
        r = rem[~np.isnan(rem)]
        n = len(r)
        loo = np.array(
            [np.var(np.delete(r, i), ddof=1) for i in range(n)]
        )
        # identity: varloo_i = (var*(n-1) - d_i)/(n-2) only holds for the
        # mean-free part; use the kernel's documented formula directly
        v = np.var(r, ddof=1)
        d = (r - r.mean()) ** 2
        varloo = (v * (n - 1) - d) / (n - 2)
        assert np.isclose(got, np.var(varloo, ddof=1))
        # and it tracks the true LOO variances closely
        assert np.corrcoef(varloo, loo)[0, 1] > 0.99


def test_spike_responds_to_outlier():
    x = np.ones(50) + np.random.RandomState(0).rand(50) * 0.01
    x2 = x.copy()
    x2[25] += 50.0
    assert K.spike(x2, 1) > K.spike(x, 1) * 10


def test_linearity_curvature_signs():
    t = np.arange(80, dtype=float)
    lin_up, curv_lin = K.linearity_curvature(3.0 * t + 5.0, 1)
    assert lin_up > 0 and abs(curv_lin) < abs(lin_up) * 1e-6
    lin_dn, _ = K.linearity_curvature(-2.0 * t + 100.0, 1)
    assert lin_dn < 0
    _, curv_convex = K.linearity_curvature((t - 40.0) ** 2, 1)
    assert curv_convex > 0
    _, curv_concave = K.linearity_curvature(-((t - 40.0) ** 2), 1)
    assert curv_concave < 0


def test_linearity_equals_lstsq_on_trend():
    rng = np.random.RandomState(9)
    x = np.cumsum(rng.randn(90)) + np.arange(90) * 0.5
    lin, curv = K.linearity_curvature(x, 12)
    t_hat, _, _ = K._classical_additive(x, 12)
    tr = t_hat[~np.isnan(t_hat)]
    P = K._ortho_poly2(len(tr))
    coef = np.linalg.lstsq(P, tr, rcond=None)[0]
    assert np.isclose(lin, coef[0]) and np.isclose(curv, coef[1])
    # orthonormal basis sanity
    assert np.allclose(P.T @ P, np.eye(2), atol=1e-10)


def test_hw_params_route_by_structure():
    rng = np.random.RandomState(4)
    n = 96
    # near-random-walk → high alpha
    rw = np.cumsum(rng.randn(n)) * 5 + 100
    a_rw, _, _ = K.holt_winters_params(rw, 1)
    # iid noise around a constant → low alpha
    flat = 100 + rng.randn(n) * 0.5
    a_flat, _, _ = K.holt_winters_params(flat, 1)
    assert a_rw > a_flat
    # strong stable seasonality → gamma fitted, in [0,1]
    seas = 100 + 20 * np.sin(2 * np.pi * np.arange(n) / 12) + rng.randn(n) * 0.1
    a_s, b_s, g_s = K.holt_winters_params(seas, 12)
    for v in (a_s, b_s, g_s):
        assert 0.0 <= v <= 1.0
    # degenerate inputs are safe
    assert K.holt_winters_params(np.ones(4), 1) == (0.0, 0.0, 0.0)
    assert K.holt_winters_params(np.full(50, 7.0), 12) == (0.0, 0.0, 0.0)


def test_feature_vector_includes_new_vocabulary():
    x = np.random.RandomState(1).rand(60) * 9
    fv = K.feature_vector(x, 12)
    for name in ("spike", "linearity", "curvature", "hw_alpha", "hw_beta",
                 "hw_gamma", "nperiods", "seasonal_period"):
        assert name in fv and np.isfinite(fv[name])
    assert fv["nperiods"] == 1.0
    assert fv["seasonal_period"] == 12.0
    fv1 = K.feature_vector(x, 1)
    assert fv1["nperiods"] == 0.0 and fv1["seasonal_period"] == 1.0
