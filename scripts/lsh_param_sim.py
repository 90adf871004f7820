#!/usr/bin/env python
"""Offline parameter study for the multi-probe / multi-table LSH ANN.

Replicates the exact synth_embeddings corpus (Philox, 64 clusters in
R^64) and the exact deterministic plane recipe in pure numpy, then
measures recall@k and candidate volume for a grid of
(n_tables, n_bits, probe_hamming) so the production constants in
fforma_spark/pipeline/similarity.py are DATA-DERIVED, not guessed.

Usage: python scripts/lsh_param_sim.py [--n 1000000] [--queries 8] [--k 10]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fforma_spark.pipeline.common import py_h64  # noqa: E402

_EMB_DIM = 64
_EMB_CLUSTERS = 64
SEED = 42


def gen_corpus(n: int) -> np.ndarray:
    """Same math as sources/synth._emb_batches, vectorized per cluster
    center but per-vector Philox noise (bit-identical floats are not
    needed here — the geometry is what matters, and this IS the same
    distribution with the same keys)."""
    centers = np.stack(
        [
            np.random.Generator(np.random.Philox(key=[SEED + 11, c])).normal(
                0.0, 1.0, _EMB_DIM
            )
            for c in range(_EMB_CLUSTERS)
        ]
    )
    out = np.empty((n, _EMB_DIM), dtype=np.float32)
    block = 100_000
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        for i in range(lo, hi):
            rng = np.random.Generator(np.random.Philox(key=[SEED + 7, i]))
            out[i] = centers[i % _EMB_CLUSTERS] + rng.normal(0.0, 0.6, _EMB_DIM)
        print(f"gen {hi}/{n}", file=sys.stderr)
    return out


def planes_for(n_tables: int, n_bits: int) -> np.ndarray:
    """(T*B, DIM) deterministic planes — the 'mplane:{t}:{j}:{k}' seed
    family the production code will use."""
    P = np.empty((n_tables * n_bits, _EMB_DIM), dtype=np.float64)
    for t in range(n_tables):
        for j in range(n_bits):
            for k in range(_EMB_DIM):
                P[t * n_bits + j, k] = (
                    (py_h64(f"mplane:{t}:{j}:{k}") % 2001) - 1000
                ) / 1000.0
    return P


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    X = gen_corpus(args.n)
    Xd = X.astype(np.float64)
    norms = np.linalg.norm(Xd, axis=1)
    nq, k = args.queries, args.k

    # brute-force truth (excluding self): same semantics as the job
    truth: list[set[int]] = []
    for qi in range(nq):
        sims = (Xd @ Xd[qi]) / (norms * norms[qi])
        sims[qi] = -np.inf
        top = np.argpartition(-sims, k)[:k]
        top = top[np.argsort(-sims[top], kind="stable")]
        truth.append(set(int(t) for t in top))

    grid = [
        (4, 8, 1),
        (4, 12, 1),
        (4, 12, 2),
        (3, 12, 2),
        (4, 16, 2),
        (4, 16, 3),
        (3, 16, 3),
        (2, 16, 3),
        (6, 16, 2),
        (8, 16, 2),
    ]
    for n_tables, n_bits, r in grid:
        P = planes_for(n_tables, n_bits)
        signs = (Xd @ P.T) >= 0  # (N, T*B)
        weights = (1 << np.arange(n_bits, dtype=np.int64))
        buckets = np.empty((args.n, n_tables), dtype=np.int64)
        for t in range(n_tables):
            buckets[:, t] = signs[:, t * n_bits : (t + 1) * n_bits] @ weights
        masks = np.array(
            [m for m in range(1 << n_bits) if bin(m).count("1") <= r],
            dtype=np.int64,
        )
        # per-table bucket -> sorted order for fast membership
        hits, cand_counts = 0, []
        order = [np.argsort(buckets[:, t], kind="stable") for t in range(n_tables)]
        sortedb = [buckets[order[t], t] for t in range(n_tables)]
        for qi in range(nq):
            cand: set[int] = set()
            for t in range(n_tables):
                probes = buckets[qi, t] ^ masks
                lo = np.searchsorted(sortedb[t], probes, side="left")
                hi = np.searchsorted(sortedb[t], probes, side="right")
                for a, b in zip(lo, hi):
                    if b > a:
                        cand.update(int(x) for x in order[t][a:b])
            cand.discard(qi)
            cand_counts.append(len(cand))
            hits += len(cand & truth[qi])
        print(
            json.dumps(
                {
                    "n_tables": n_tables,
                    "n_bits": n_bits,
                    "probe_hamming": r,
                    "n_probes_per_table": int(len(masks)),
                    "recall_at_k": round(hits / (nq * k), 4),
                    "mean_candidates": round(float(np.mean(cand_counts)), 1),
                    "cand_frac_of_n": round(
                        float(np.mean(cand_counts)) / args.n, 5
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
