"""spark-submit job: ANN similarity search at stored-corpus scale.

Runs brute-force kNN (the recall oracle), LSH-bucketed top-k, and IVF
top-k (with one Lloyd iteration) over a stored embeddings parquet and
prints ONE JSON line with per-op wall time + recall@k vs brute force.

    spark-submit --py-files fforma_spark.zip jobs/ann_pipeline.py \
        --input /path/embeddings.parquet

With --synth N --store PATH the deterministic clustered corpus is
written first so both parallelism levels read identical bytes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="stored embeddings parquet")
    ap.add_argument("--synth", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--store", help="write the synth corpus here and exit")
    ap.add_argument("--queries", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cells", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument(
        "--reps",
        type=int,
        default=1,
        help="time each op N times, report best (steady state) + all "
        "reps — separates per-op work from first-run warmup floors",
    )
    ap.add_argument(
        "--ops",
        default="brute,lsh,ivf,ivf_lloyd",
        help="comma subset of brute,lsh,ivf,ivf_lloyd,neardup (recall "
        "needs brute; a big-corpus LSH scaling leg runs brute,lsh "
        "only; neardup is the all-pairs embedding_neardup_lsh leg)",
    )
    # near-dup leg knobs — defaults are DATA-DERIVED at 100k on the
    # stored corpus geometry (lsh_param_sim-style replay, round 5):
    # 12 tables x 24 bits, one-sided Hamming<=1 probing -> sampled
    # recall 0.905 at 0.29% of N^2/2 candidate volume, threshold 0.9
    # (the densest cosine tier that still means "near-duplicate" on
    # this corpus: >=0.95 pairs are empty, >=0.9 pairs are ~2.7k/100k)
    ap.add_argument("--neardup-thresh", type=float, default=0.9)
    ap.add_argument("--neardup-tables", type=int, default=12)
    ap.add_argument("--neardup-bits", type=int, default=24)
    ap.add_argument("--neardup-probe", type=int, default=1)
    ap.add_argument(
        "--neardup-limit", type=int, default=0,
        help="run the near-dup op over vec_id < N only (0 = full "
        "corpus; the candidate mass is quadratic in the cluster "
        "occupancy, so scaling legs pin this)",
    )
    ap.add_argument(
        "--neardup-sample", type=int, default=2048,
        help="sampled-exact recall denominator: grade recall over "
        "exact pairs with vec_a < this (0 disables the diagnostic)",
    )
    args = ap.parse_args()

    from fforma_spark.session import get_spark

    spark = get_spark(app_name="ann-pipeline")

    if args.store:
        from fforma_spark.sources.synth import synth_embeddings

        if not args.synth:
            ap.error("--store requires --synth N")
        synth_embeddings(spark, args.synth, args.seed).write.mode(
            "overwrite"
        ).parquet(args.store)
        n = spark.read.parquet(args.store).count()
        print(json.dumps({"stored": args.store, "n_vecs": n}))
        return

    if args.input:
        emb = spark.read.parquet(args.input)
    elif args.synth:
        from fforma_spark.sources.synth import synth_embeddings

        emb = synth_embeddings(spark, args.synth, args.seed)
    else:
        ap.error("one of --input / --synth is required")

    from fforma_spark.pipeline import similarity as S

    n_vecs = emb.count()
    nq, k = args.queries, args.k
    out: dict = {
        "metric": "ann pipeline wall time",
        "unit": "sec",
        "n_vecs": n_vecs,
        "master": spark.sparkContext.master,
        "queries": nq,
        "k": k,
        "ops": {},
    }

    def run(name, build):
        from fforma_spark.util import best_of

        best, times, pairs = best_of(
            args.reps,
            lambda: {
                (r["query_id"], r["cand_id"]) for r in build().collect()
            },
        )
        out["ops"][name] = {
            "sec": best,
            "rep_times": times,
            "rows": len(pairs),
        }
        return pairs

    ops = set(args.ops.split(","))
    approx: list[tuple[str, set]] = []
    truth: set = set()
    if "brute" in ops:
        truth = run("knn_bruteforce", lambda: S.knn_bruteforce(emb, nq, k))
    if "lsh" in ops:
        approx.append(
            ("ann_lsh_topk", run("ann_lsh_topk",
                                 lambda: S.ann_lsh_topk(
                                     emb, nq, k, n_vecs=n_vecs)))
        )
        # candidate volume (untimed diagnostic): how many distinct
        # pairs the multi-probe union scored, vs the exact path's
        # Q·(N-1) — VERDICT r4 #1 asks for the measured increase
        n_cand = S.ann_lsh_candidate_pairs(emb, nq).count()
        out["ops"]["ann_lsh_topk"]["candidates"] = n_cand
        out["ops"]["ann_lsh_topk"]["cand_frac_of_exact"] = round(
            n_cand / (nq * max(n_vecs - 1, 1)), 5
        )
        out["ops"]["ann_lsh_topk"]["lsh_conf"] = {
            "n_tables": S.N_TABLES,
            "n_bits": S.N_BITS,
            "probe_hamming": S.PROBE_HAMMING,
            "n_probes_per_table": len(S.probe_masks()),
        }
    if "ivf" in ops:
        approx.append(
            ("ann_ivf_topk", run(
                "ann_ivf_topk",
                lambda: S.ann_ivf_topk(emb, nq, k, args.cells, args.nprobe),
            ))
        )
    if "ivf_lloyd" in ops:
        # production path: double-sum Lloyd (the decimal-exact variant
        # exists for the DuckDB oracle's bit-identity, not throughput)
        approx.append(
            ("ann_ivf_lloyd1_topk", run(
                "ann_ivf_lloyd1_topk",
                lambda: S.ann_ivf_topk(
                    emb, nq, k, args.cells, args.nprobe,
                    lloyd_iters=1, lloyd_exact=False,
                ),
            ))
        )
    for name, pairs in approx:
        if truth:
            out["ops"][name]["recall_at_k"] = round(
                len(pairs & truth) / max(len(truth), 1), 4
            )
    if "neardup" in ops:
        from pyspark.sql import functions as F
        from fforma_spark.util import best_of

        nd_emb = (
            emb.filter(F.col("vec_id") < args.neardup_limit)
            if args.neardup_limit
            else emb
        )
        nd_conf = (
            args.neardup_thresh, args.neardup_tables,
            args.neardup_bits, args.neardup_probe,
        )
        nd = S.embedding_neardup_lsh(nd_emb, *nd_conf)
        # timed: the production output is the full verified pair set
        best, times, n_pairs = best_of(args.reps, nd.count)
        out["ops"]["embedding_neardup_lsh"] = {
            "sec": best,
            "rep_times": times,
            "rows": n_pairs,
            "conf": {
                "threshold": args.neardup_thresh,
                "n_tables": args.neardup_tables,
                "n_bits": args.neardup_bits,
                "probe_hamming": args.neardup_probe,
                "limit": args.neardup_limit or n_vecs,
            },
        }
        if args.neardup_sample:
            # untimed diagnostic (not part of the scaling number):
            # recall vs the sampled exact ground truth — pairs with
            # vec_a < sample, exact side one O(S·N) mapInPandas pass
            s = args.neardup_sample
            got = {
                (r["vec_a"], r["vec_b"])
                for r in nd.filter(F.col("vec_a") < s).collect()
            }
            exact = {
                (r["vec_a"], r["vec_b"])
                for r in S.exact_neardup_pairs_sampled(
                    nd_emb, args.neardup_thresh, s
                ).collect()
            }
            out["ops"]["embedding_neardup_lsh"]["sampled_recall"] = round(
                len(got & exact) / max(len(exact), 1), 4
            )
            out["ops"]["embedding_neardup_lsh"]["sampled_exact_pairs"] = len(
                exact
            )
    out["value"] = round(sum(o["sec"] for o in out["ops"].values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
