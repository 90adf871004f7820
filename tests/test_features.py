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
