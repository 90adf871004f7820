"""Profile the per-series feature kernel (no Spark — pure numpy).

The tiers scaling leg is dominated by the 45-feature mapInPandas pass
(BENCH_SCALING_r4.json: features 146.8 s of the 172.0 s local[32]
leg at 1M docs). This harness reproduces the per-series cost on a
synthetic corpus with the same token-length distribution as the bench
store (p50≈93, p99≈2500, whale-capped at 930) and prints a cProfile
breakdown, so kernel optimization targets real hot spots instead of
guesses.

Usage: python scripts/profile_features.py [n_series] [--cprofile]
"""

from __future__ import annotations

import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from fforma_spark.functions.kernels import FEATURE_NAMES, feature_vector  # noqa: E402


def synth_lengths(n: int, rng: np.random.Generator) -> np.ndarray:
    """Lognormal-ish mix matching the bench store: p50≈93, p90≈181,
    p99≈2500, capped at the whale threshold 930 (whales enter the
    kernel as their trailing 930-token window)."""
    base = rng.lognormal(mean=np.log(93.0), sigma=0.55, size=n)
    heavy = rng.random(n) < 0.01
    base[heavy] *= rng.lognormal(mean=np.log(25.0), sigma=0.5, size=heavy.sum())
    return np.clip(base.astype(np.int64), 8, 930)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 2000
    rng = np.random.default_rng(42)
    lens = synth_lengths(n, rng)
    series = [rng.integers(0, 50_000, size=m).astype(np.float64) for m in lens]
    seas = rng.choice([24, 7, 52, 12, 4, 1], size=n)

    # warm once (numpy internals, any lazy imports)
    feature_vector(series[0], int(seas[0]))

    if "--batched-only" not in sys.argv:
        t0 = time.perf_counter()
        for x, s in zip(series, seas):
            feature_vector(x, int(s))
        wall = time.perf_counter() - t0
        print(
            f"{n} series, mean len {lens.mean():.0f}: {wall:.2f}s "
            f"({1e3 * wall / n:.3f} ms/series, {n / wall:.0f} series/s/core)"
        )

    if "--batched" in sys.argv or "--batched-only" in sys.argv:
        # the grouped (seasonality, length) dispatch exactly as the
        # mapInPandas fabric runs it, at Arrow-batch granularity
        import pandas as pd

        from fforma_spark.functions import features as FF

        prefix = {24: "H", 7: "D", 52: "W", 12: "M", 4: "Q", 1: "Y"}
        pdf = pd.DataFrame(
            {
                "doc_id": [f"{prefix[int(s)]}{i:07d}" for i, s in enumerate(seas)],
                "tokens": [x.tolist() for x in series],
            }
        )
        for bsz in (2000, 10000, 50000):
            if bsz > n:
                continue
            batches = [pdf.iloc[i : i + bsz] for i in range(0, n, bsz)]
            t0 = time.perf_counter()
            for out in FF._feature_batches(iter(batches), 1):
                pass
            wall = time.perf_counter() - t0
            # group-size profile of the first batch
            from collections import Counter

            c = Counter(
                (d[0], len(t))
                for d, t in zip(batches[0]["doc_id"], batches[0]["tokens"])
            )
            sizes = np.array(sorted(c.values()))
            batched_frac = sizes[sizes >= 3].sum() / sizes.sum()
            print(
                f"batched bsz={bsz}: {wall:.2f}s ({1e3 * wall / n:.3f} ms/series, "
                f"{n / wall:.0f} series/s/core; groups/batch={len(c)}, "
                f"rows in batched groups={100 * batched_frac:.0f}%)"
            )

    if "--cprofile" in sys.argv:
        pr = cProfile.Profile()
        pr.enable()
        for x, s in zip(series, seas):
            feature_vector(x, int(s))
        pr.disable()
        st = pstats.Stats(pr)
        st.sort_stats("cumulative").print_stats(30)
        assert FEATURE_NAMES  # keep the import honest


if __name__ == "__main__":
    main()
