"""Rolling ensemble backtest: oracle parity + checkpoint resume."""

from __future__ import annotations

import numpy as np

from fforma_spark.plans.backtest import materialize_backtest
from fforma_spark.sources.tables import panel_from_events

from tests.conftest import SF_DIR


def test_backtest_query_vs_duckdb(spark, ddb):
    from fforma_spark.queries import ORACLES, QUERIES

    name = "ensemble_backtest_events"
    sp = {
        r["cutoff"]: (r["n_docs"], r["softmin_smape"], r["naive_smape"])
        for r in QUERIES[name](spark, SF_DIR).collect()
    }
    dk = {
        r[0]: (r[1], r[2], r[3])
        for r in ddb.execute(ORACLES[name]).fetchall()
    }
    assert set(sp) == set(dk) and len(sp) >= 5
    for c in sp:
        assert sp[c][0] == dk[c][0], (c, sp[c], dk[c])
        assert np.isclose(sp[c][1], dk[c][1], atol=1e-9), (c, sp[c], dk[c])
        assert np.isclose(sp[c][2], dk[c][2], atol=1e-9), (c, sp[c], dk[c])


def test_backtest_ensemble_is_sane(spark):
    from fforma_spark.queries import QUERIES

    rows = QUERIES["ensemble_backtest_events"](spark, SF_DIR).collect()
    assert len(rows) == 5  # 6 cutoffs → 5 paired test cutoffs
    for r in rows:
        assert r["n_docs"] > 0
        assert 0 <= r["softmin_smape"] <= 200
        # softmin ensemble shouldn't be catastrophically worse than naive
        assert r["softmin_smape"] <= r["naive_smape"] * 1.5


def test_backtest_materialize_resume(spark, tmp_path):
    base = str(tmp_path / "bt")
    panel = panel_from_events(spark, SF_DIR)
    cuts = [30, 36, 42]
    m1 = materialize_backtest(panel, base, cuts, h=6, s=7, fingerprint="fp1")
    assert set(m1) == {36, 42}
    assert all(not m["resumed"] for m in m1.values())
    assert all(m["rows"] == 1 for m in m1.values())
    # second run: everything resumes, nothing recomputed
    m2 = materialize_backtest(panel, base, cuts, h=6, s=7, fingerprint="fp1")
    assert all(m["resumed"] for m in m2.values())
    # changed input fingerprint: rebuild
    m3 = materialize_backtest(panel, base, cuts, h=6, s=7, fingerprint="fp2")
    assert all(not m["resumed"] for m in m3.values())
