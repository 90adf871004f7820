"""spark-submit job: the dedup pipeline at stored-corpus scale.

Runs the shuffle-heavy dedup operators (exact hash groupBy, MinHash
band self-join at r=1 and r=2, SimHash64 Hamming chunk joins, n-gram
inverted-index Jaccard) over a stored documents parquet and prints ONE
JSON line with per-op wall time + result/candidate-pair counts — the
measured evidence for the r=1 vs r=2 candidate-volume claim and the
max_df fan-out cap (VERDICT r2 item 4).

    spark-submit --py-files fforma_spark.zip jobs/dedup_pipeline.py \
        --input /path/docs.parquet [--ops exact,minhash,...]

With --synth N the input is sources.synth.synth_documents (stored
first via --store so both parallelism levels read identical bytes).
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
    ap.add_argument("--input", help="stored documents parquet")
    ap.add_argument("--synth", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--store", help="write the synth corpus here and exit")
    ap.add_argument(
        "--ops",
        default="exact,minhash,minhash_r2,simhash_hamming,ngram",
    )
    ap.add_argument(
        "--reps",
        type=int,
        default=1,
        help="time each op N times, report best (steady state) + all "
        "reps — separates per-op work from first-run warmup floors",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from fforma_spark.session import get_spark, warm_python_workers

    spark = get_spark(app_name="dedup-pipeline")

    if args.store:
        from fforma_spark.sources.synth import synth_documents

        if not args.synth:
            ap.error("--store requires --synth N")
        synth_documents(spark, args.synth, args.seed).write.mode(
            "overwrite"
        ).parquet(args.store)
        n = spark.read.parquet(args.store).count()
        print(json.dumps({"stored": args.store, "n_docs": n}))
        return

    if args.input:
        docs = spark.read.parquet(args.input)
    elif args.synth:
        from fforma_spark.sources.synth import synth_documents

        docs = synth_documents(spark, args.synth, args.seed)
    else:
        ap.error("one of --input / --synth is required")

    warm_python_workers(spark)
    from fforma_spark.pipeline import dedup as D

    n_docs = docs.count()
    out: dict = {
        "metric": "dedup pipeline wall time",
        "unit": "sec",
        "n_docs": n_docs,
        "master": spark.sparkContext.master,
        "ops": {},
    }
    thresh = 0.5

    def run(name, build, counters, diagnostic=False):
        from fforma_spark.util import best_of

        best, times, agg = best_of(
            args.reps, lambda: build().agg(*counters).collect()[0].asDict()
        )
        out["ops"][name] = {
            "sec": best,
            "rep_times": times,
            # diagnostic ops (candidate counts) are excluded from the
            # phase total — the production op recomputes that work
            # internally, so counting both would double it
            "diagnostic": diagnostic,
            **{k: (int(v) if v is not None else 0) for k, v in agg.items()},
        }

    ops = set(args.ops.split(","))
    if "exact" in ops:
        run(
            "exact",
            lambda: D.exact_dedup(docs),
            [
                F.count("*").alias("rows"),
                F.sum(F.col("n_copies") - 1).alias("exact_dups"),
            ],
        )
    if "minhash" in ops:
        run(
            "minhash_r1",
            lambda: D.minhash_neardup(docs, thresh),
            [
                F.count("*").alias("candidate_pairs"),
                F.sum(F.col("is_dup").cast("long")).alias("dup_pairs"),
            ],
        )
    if "minhash_r2" in ops:
        run(
            "minhash_r2",
            lambda: D.minhash_neardup(docs, thresh, r=2),
            [
                F.count("*").alias("candidate_pairs"),
                F.sum(F.col("is_dup").cast("long")).alias("dup_pairs"),
            ],
        )
    if "simhash_hamming" in ops:
        # candidate volume first — the quantity the 8-band combo-key
        # layout exists to shrink vs the old 4×16 chunk joins (r3
        # scale-killer); then the verified pairs
        run(
            "simhash64_candidates",
            lambda: D.sh64_band_candidates(D.simhash64(docs)),
            [F.count("*").alias("candidate_pairs")],
            diagnostic=True,
        )
        run(
            "simhash64_hamming3",
            lambda: D.simhash_hamming_neardup(docs, max_dist=3),
            [F.count("*").alias("pairs")],
        )
    if "ngram" in ops:
        run(
            "ngram_jaccard",
            lambda: D.ngram_jaccard_neardup(docs, thresh, max_df=100),
            [F.count("*").alias("pairs")],
        )
    prod = {k: o for k, o in out["ops"].items() if not o.get("diagnostic")}
    total = round(sum(o["sec"] for o in prod.values()), 3)
    out["value"] = total
    out["docs_per_sec"] = round(n_docs * len(prod) / total, 1) if total else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
