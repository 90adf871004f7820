"""Short-series parity for the batched feature twins (r6 optimization).

Round 6 lowered MIN_BATCH_LEN 20 -> 2 so short docs batch too. That is
only sound if feature_matrix is bit-exact against feature_vector on the
short-length surface — including the e_acf span-2 edge (n == window+1,
e.g. n == ppy+1), where the pre-r6 twin zero-gated e_acf1/e_acf10 on
MA-span >= 3 while the scalar path computes the ACF of the 2-point
remainder (exactly -0.5). That gate also silently mis-batched
(s=24, n=25) and (s=52, n=53) under the OLD n>=20 dispatch, so this is
a latent-bug regression test as much as a floor-lowering one.
"""

from __future__ import annotations

import numpy as np

from fforma_spark.functions.batch_kernels import feature_matrix
from fforma_spark.functions.kernels import FEATURE_NAMES, feature_vector


def _assert_rows_match(X: np.ndarray, s: int) -> None:
    fm = feature_matrix(X, s)
    for i in range(len(X)):
        fv = feature_vector(X[i], s)
        for name in FEATURE_NAMES:
            a, b = fm[name][i], fv[name]
            assert a == b or (np.isnan(a) and np.isnan(b)), (
                f"s={s} n={X.shape[1]} row={i} {name}: "
                f"batched={a!r} scalar={b!r}"
            )


def _shapes(rng: np.random.Generator, n: int) -> np.ndarray:
    return np.vstack(
        [
            rng.integers(1, 15, size=(6, n)).astype(np.float64),
            rng.integers(0, 4, size=(2, n)).astype(np.float64),
            np.full((1, n), 7.0),
            (np.arange(n, dtype=np.float64) + 1)[None, :],
            rng.normal(100, 40, size=(2, n)),
            np.abs(rng.standard_cauchy((1, n))) + 0.5,
        ]
    )


def test_short_lengths_all_seasonalities():
    rng = np.random.default_rng(41)
    for s in (1, 4, 7, 12, 24, 52):
        for n in range(2, 24):
            _assert_rows_match(_shapes(rng, n), s)


def test_eacf_span2_edge():
    """n == window+1: MA span is exactly 2; the scalar path's 2-point
    remainder ACF must be reproduced (not zero-gated)."""
    rng = np.random.default_rng(42)
    for s, n in [(1, 4), (4, 5), (7, 8), (12, 13), (24, 25), (52, 53)]:
        X = _shapes(rng, n)
        _assert_rows_match(X, s)
        fm = feature_matrix(X, s)
        # non-degenerate rows at span 2 have e_acf1 == -0.5 exactly
        assert (fm["e_acf1"][:6] == -0.5).all()
