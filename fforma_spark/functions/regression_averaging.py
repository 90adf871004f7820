"""Regression-averaging meta-learners (FQRA / LQRA) over Spark.

Reference semantics: fforma/meta_learner/_regression_averaging.py:9-105
fits one FQRA/QRAL1 model PER SERIES on (base-model predictions vs
actuals) at a validation cutoff, then ensembles the test-cutoff
predictions (BaseModelsTrainer fan-out, fforma/base/trainer.py:77-146).

Spark shape: the whole per-series flow — two train splits, 14 base
forecasts at each cutoff, the PCA/lasso quantile fit, the ensembled
prediction — runs in ONE Arrow-batched mapInPandas pass over the wide
sequences table. No shuffle; the dask process pool collapses into
plain data parallelism, the right 100 TB plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from fforma_spark.functions.models import (
    FORECAST_COLS,
    HORIZON_BY_PREFIX,
    forecast_series,
)
from fforma_spark.functions.features import SEASONALITY_BY_PREFIX
from fforma_spark.functions.quantile import fqra_fit_predict, qral1_fit

RA_SCHEMA = "doc_id string, pos long, y_hat double"


def _fc_matrix(train: np.ndarray, h: int, s: int) -> np.ndarray:
    """(h, n_models) base-forecast matrix, FORECAST_COLS column order."""
    fc = forecast_series(train, h, s)
    return np.column_stack([fc[c] for c in FORECAST_COLS])


def _ra_batches(
    it: Iterator[pd.DataFrame],
    method: str,
    tau: float,
    n_components: int,
    lambd: float,
    default_h: int,
) -> Iterator[pd.DataFrame]:
    cols = ["doc_id", "pos", "y_hat"]
    for pdf in it:
        frames = []
        for doc_id, tokens in zip(pdf["doc_id"], pdf["tokens"]):
            s = SEASONALITY_BY_PREFIX.get(str(doc_id)[:1], 1)
            h = HORIZON_BY_PREFIX.get(str(doc_id)[:1], default_h)
            y = np.asarray(tokens, dtype=np.float64)
            if len(y) <= 2 * h + 1:  # need a validation AND a test split
                continue
            # validation cutoff t−1: fit ensembling weights there …
            X_val = _fc_matrix(y[: -2 * h], h, s)
            y_val = y[-2 * h : -h]
            # … apply them to the test-cutoff forecasts (cutoff t)
            X_test = _fc_matrix(y[:-h], h, s)
            if method == "fqra":
                y_hat = fqra_fit_predict(X_val, y_val, X_test, tau, n_components)
            elif method == "lqra":
                beta = qral1_fit(X_val, y_val, tau, lambd)
                y_hat = X_test @ beta
            else:  # pragma: no cover
                raise ValueError(f"unknown method {method!r}")
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": doc_id,
                        "pos": np.arange(h, dtype=np.int64),
                        "y_hat": np.asarray(y_hat, dtype=np.float64),
                    }
                )
            )
        yield (
            pd.concat(frames, ignore_index=True)[cols]
            if frames
            else pd.DataFrame(columns=cols)
        )


def regression_averaging_forecasts(
    seq_df: DataFrame,
    method: str = "fqra",
    tau: float = 0.5,
    n_components: int = 2,
    lambd: float = 1.0,
    default_h: int = 8,
    max_series_len: int | None = None,
) -> DataFrame:
    """Per-series FQRA/LQRA ensemble forecasts as a long panel
    (doc_id, pos, y_hat).

    ``max_series_len`` arms whale protection exactly like
    models.base_forecasts: whale docs enter the PCA/IRLS kernels as
    their trailing window (plans/skew.cap_whales) so no Arrow
    batch/task is dominated by a 200k-token doc; docs ≤ cap are
    bit-identical."""
    from fforma_spark.util import ensure_parallelism

    gen = lambda it: _ra_batches(  # noqa: E731
        it, method, tau, n_components, lambd, default_h
    )
    if max_series_len is not None:
        from fforma_spark.plans.skew import cap_whales

        seq_df = cap_whales(
            seq_df.select("doc_id", "tokens", "n_tok"), max_series_len
        )
    src = ensure_parallelism(seq_df.select("doc_id", "tokens"))
    return src.mapInPandas(gen, RA_SCHEMA)
