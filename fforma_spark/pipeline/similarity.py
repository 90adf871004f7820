"""Approximate-nearest-neighbor search over the embeddings table.

Three paths (all Catalyst-only):

* ``knn_bruteforce`` — exact cosine top-k per query via a filtered
  cross join + window rank. O(Q·N): the CORRECTNESS baseline; fine
  whenever Q is small (the query side broadcasts).
* ``ann_lsh_*`` — multi-table, multi-probe random-hyperplane LSH:
  each vector gets ``N_TABLES`` independent ``N_BITS``-bit signatures
  (sign of the dot product against fixed pseudo-random planes); each
  query probes, in every table, ALL buckets within Hamming distance
  ``PROBE_HAMMING`` of its own signature, and candidates are the union
  across tables/probes (deduped before ranking). The (4, 16, ≤2)
  parameters are DATA-DERIVED, not guessed: scripts/lsh_param_sim.py
  replays the exact Philox corpus geometry at 1M vectors — recall@10
  0.975 at a 2.5% candidate fraction (the round-4 single-table
  single-probe scheme measured recall 0.2). Planes are deterministic
  md5-derived literals, so the DuckDB oracle computes bit-identical
  signatures and the row stays value-hashed.
* ``ann_ivf_*`` — inverted-file Voronoi cells + optional Lloyd
  refinement (below).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from fforma_spark.pipeline.common import py_h64
from fforma_spark.pipeline.dedup import _dot_sql, cosine, cosine_sql

DIM = 64
#: multi-probe LSH geometry — the PRODUCTION default, derived at 1M
#: scale by scripts/lsh_param_sim.py (recall@10 = 0.975, 2.5%
#: candidates): 4 independent tables × 16 signed-hyperplane bits,
#: probing all C(16,≤2) = 137 buckets within Hamming distance 2 per
#: table. n_bits is a density knob — it should grow with log2(N)
#: (≈ log2(N / wanted-bucket-occupancy)), so every entry point takes
#: (n_tables, n_bits, probe_hamming) overrides; the driver row at
#: N=500 registers the small-N point (4, 8, 1) with the same code.
N_TABLES = 4
N_BITS = 16
PROBE_HAMMING = 2


@lru_cache(maxsize=None)
def plane_vals(t: int, j: int) -> tuple[float, ...]:
    """Deterministic pseudo-random hyperplane (table t, bit j) in
    [-1, 1]^DIM — identical literals on both engines (and in numpy
    tests / scripts/lsh_param_sim.py via the same formula)."""
    return tuple(
        ((py_h64(f"mplane:{t}:{j}:{k}") % 2001) - 1000) / 1000.0
        for k in range(DIM)
    )


def probe_masks(n_bits: int = N_BITS, probe_hamming: int = PROBE_HAMMING) -> list[int]:
    """Every XOR mask within the probe radius, ascending — 137 for
    (16, ≤2), 9 for (8, ≤1)."""
    return [
        m for m in range(1 << n_bits) if bin(m).count("1") <= probe_hamming
    ]


def _mplane_lit(t: int, j: int) -> Column:
    return F.array(*[F.lit(v) for v in plane_vals(t, j)])


def _mplane_sql(t: int, j: int) -> str:
    return "[" + ", ".join(repr(v) for v in plane_vals(t, j)) + "]"


def _dot_mplane(emb: Column, t: int, j: int) -> Column:
    """Left-fold dot with plane (t, j) (same FP order as the SQL twin)."""
    return F.aggregate(
        F.zip_with(emb, _mplane_lit(t, j), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def mlsh_bucket(emb: Column, t: int, n_bits: int = N_BITS) -> Column:
    """Table-``t`` signature: bit j = sign(dot(emb, plane[t][j]))."""
    b = F.lit(0)
    for j in range(n_bits):
        b = b + F.when(_dot_mplane(emb, t, j) >= 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
    return b.cast("long")


def mlsh_bucket_sql(
    t: int, emb: str = "embedding", n_bits: int = N_BITS
) -> str:
    terms = " + ".join(
        f"CASE WHEN {_dot_sql(emb, _mplane_sql(t, j))} >= 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j in range(n_bits)
    )
    return f"CAST({terms} AS BIGINT)"


def _tbl_case_sql(n_tables: int, col_prefix: str = "b") -> str:
    """CASE t.tbl WHEN 0 THEN b0 ... — selects the per-table signature."""
    whens = " ".join(
        f"WHEN {t} THEN {col_prefix}{t}" for t in range(n_tables - 1)
    )
    return f"CASE t.tbl {whens} ELSE {col_prefix}{n_tables - 1} END"


def _tbl_values_sql(n_tables: int) -> str:
    return (
        "(VALUES "
        + ", ".join(f"({t})" for t in range(n_tables))
        + ") AS t(tbl)"
    )


def _mask_values_sql(masks: list[int]) -> str:
    return "(VALUES " + ", ".join(f"({m})" for m in masks) + ") AS m(mask)"


def lsh_buckets(
    emb: DataFrame, n_tables: int = N_TABLES, n_bits: int = N_BITS
) -> DataFrame:
    """Per-(table, bucket) histogram — the skew diagnostic for the ANN
    candidate join (one row per occupied bucket in each of the
    ``n_tables`` hash tables)."""
    e = emb.select(
        *[
            mlsh_bucket(F.col("embedding"), t, n_bits).alias(f"b{t}")
            for t in range(n_tables)
        ]
    )
    return (
        e.select(
            F.posexplode(
                F.array(*[F.col(f"b{t}") for t in range(n_tables)])
            ).alias("tbl", "bucket")
        )
        .groupBy("tbl", "bucket")
        .agg(F.count("*").alias("n"))
    )


def lsh_buckets_sql(n_tables: int = N_TABLES, n_bits: int = N_BITS) -> str:
    sigs = ",\n               ".join(
        f"{mlsh_bucket_sql(t, n_bits=n_bits)} AS b{t}"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (
            SELECT {sigs}
            FROM embeddings
        )
        SELECT t.tbl, {_tbl_case_sql(n_tables)} AS bucket, count(*) AS n
        FROM b CROSS JOIN {_tbl_values_sql(n_tables)}
        GROUP BY 1, 2
    """


def knn_bruteforce(emb: DataFrame, n_queries: int, k: int) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries; candidates =
    everything else. The query side is tiny → broadcast join, then a
    per-query window rank (TakeOrdered semantics)."""
    e = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cand = e.select(F.col("vec_id").alias("cand_id"), "embedding")
    scored = (
        F.broadcast(q)
        .join(cand, F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def knn_bruteforce_sql(n_queries: int, k: int) -> str:
    cos = cosine_sql("q.embedding", "c.embedding")
    return f"""
        WITH scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   {cos} AS cos_sim
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < {n_queries}
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, cand_id
            ) AS rank
            FROM scored
        )
        SELECT query_id, cand_id, cos_sim, rank FROM ranked WHERE rank <= {k}
    """


def _np_signatures(X, n_tables: int, n_bits: int):
    """(B, n_tables) int64 signatures with the EXACT left-fold float
    order of :func:`mlsh_bucket` / the DuckDB twin (acc starts at 0.0
    and adds x_k·p_k in k order, one rounding per step), vectorized
    across rows — the same batched-twin-with-exactness-contract
    pattern as functions/batch_kernels.py. Bit-identity with the
    Catalyst expression is pinned by
    tests/test_pipeline.py::test_lsh_arrow_signatures_bit_identical."""
    import numpy as np

    B = X.shape[0]
    out = np.zeros((B, n_tables), dtype=np.int64)
    for t in range(n_tables):
        for j in range(n_bits):
            p = plane_vals(t, j)
            acc = np.zeros(B, dtype=np.float64)
            for k in range(DIM):
                acc = acc + X[:, k] * p[k]
            out[:, t] |= (acc >= 0).astype(np.int64) << j
    return out


def _signatures_udf(n_tables: int, n_bits: int):
    """Arrow-batched signature kernel: one vectorized pass computes all
    ``n_tables`` signatures per row. The Catalyst expression path costs
    n_tables·n_bits zip_with/aggregate folds per row (64M fold
    evaluations at 1M vectors — measured to dominate the ANN op); this
    pandas_udf does the same arithmetic in the same order at numpy
    speed."""
    import numpy as np
    import pandas as pd

    def fn(s):  # pd.Series -> pd.Series (hints omitted: evaluated
        # lazily under `from __future__ import annotations`, the
        # typehint inspector can't resolve them inside a factory)
        if len(s) == 0:
            return pd.Series([], dtype=object)
        X = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in s], dtype=np.float64
        )
        sig = _np_signatures(X, n_tables, n_bits)
        return pd.Series(list(sig))

    return F.pandas_udf(fn, "array<long>")


def lsh_signatures(
    emb: Column, n_tables: int, n_bits: int, hash_path: str = "arrow"
) -> Column:
    """All ``n_tables`` signatures of a vector as array<long> —
    ``hash_path='arrow'`` (production: one vectorized kernel) or
    ``'catalyst'`` (the oracle-mirror expression form). Both are
    bit-identical by the shared left-fold order."""
    if hash_path == "arrow":
        return _signatures_udf(n_tables, n_bits)(emb)
    return F.array(*[mlsh_bucket(emb, t, n_bits) for t in range(n_tables)])


def ann_lsh_candidate_pairs(
    emb: DataFrame,
    n_queries: int,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
    probe_hamming: int = PROBE_HAMMING,
    hash_path: str = "arrow",
    dedupe: bool = True,
) -> DataFrame:
    """Deduplicated multi-table multi-probe candidate set:
    ``(query_id, cand_id)``, one row per distinct pair — IDs ONLY, so
    the dedup exchange moves 16-byte rows, never embeddings (the
    embedding fetch is the caller's broadcast join-back, see
    :func:`ann_lsh_topk`). ``dedupe=False`` skips the distinct
    exchange and returns the raw table/probe collision multiset (a
    pair appears ≤ T·P times): the grouped Arrow scorer dedups ids in
    numpy inside the groupBy-cand shuffle it needs anyway, so at 90M
    pairs (Q=4096×1M) this deletes an entire 90M-row exchange.

    Scale shape: the candidate index is N·T rows (vec_id, tbl, bucket)
    — column-pruned to ids, no vectors move. The probe side is
    Q·T·(#masks) rows (Q=8, T=4, 137 masks → 4 384 rows) and
    BROADCASTS while small (past ~1M probe rows the bucket join
    shuffles — see the inline note); each probe matches at most one
    bucket per table, so a
    pair can duplicate at most T× before the dropDuplicates. Expected
    candidate volume Q·T·P·N/2^B + clustered mass — measured 2.5% of N
    per query at 1M (scripts/lsh_param_sim.py), vs the exact path's
    100%. The signature pass runs as one Arrow-batched vectorized
    kernel by default (``hash_path``), bit-identical to the Catalyst /
    DuckDB expression form (measured 2.4 s vs 20.1 s for the 64-fold
    expression form at 1M×64, local[32])."""
    # posexplode the signature expression IN the same select: a
    # two-step select (alias then explode) lets CollapseProject
    # duplicate the UDF — measured as TWO ArrowEvalPython nodes per
    # branch, i.e. the 1M-row hash pass ran twice (pinned by
    # tests/test_job_plans.py::test_ann_job_lsh_plan)
    sig = lsh_signatures(F.col("embedding"), n_tables, n_bits, hash_path)
    e = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    cand = e.select(
        F.col("vec_id").alias("cand_id"),
        F.posexplode(sig).alias("tbl", "bucket"),
    )
    masks = F.array(
        *[F.lit(m) for m in probe_masks(n_bits, probe_hamming)]
    ).cast("array<long>")
    probes = (
        e.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.posexplode(sig).alias("tbl", "sig"),
        )
        .select(
            "query_id",
            "tbl",
            F.explode(masks).alias("mask"),
            "sig",
        )
        .select(
            "query_id",
            "tbl",
            F.col("sig").bitwiseXOR(F.col("mask")).alias("bucket"),
        )
    )
    # the probe side is Q·T·(#masks) rows: tiny at Q=8 (4 384 —
    # broadcast), but 2.2M rows at Q=4096 where the binding hint
    # would serialize a ~50 MB driver-side hash-relation build; past
    # the cap the bucket join shuffles on (tbl, bucket) instead
    n_probe_rows = (
        n_queries * n_tables * len(probe_masks(n_bits, probe_hamming))
    )
    probes_small = n_probe_rows <= BROADCAST_PAIRS_MAX
    raw = (
        (F.broadcast(probes) if probes_small else probes)
        .join(cand, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
    )
    return raw.dropDuplicates(["query_id", "cand_id"]) if dedupe else raw


#: Broadcast the candidate-pair id table only while its EXPECTED row
#: count stays under this: Q·T·P·N/2^B rows of two longs ≈ 32 MB of
#: hash relation at the cap. Above it the pairs side must shuffle-join
#: (an explicit broadcast() hint is binding — AQE never demotes it, so
#: a hint here would serialize a Q=512×1M run behind a single-threaded
#: ~4M-row driver-side hash-relation build; measured as the 2.0×
#: 8→32 plateau of the round-5 lsh1m_q512 leg).
BROADCAST_PAIRS_MAX = 1_000_000


def _expected_lsh_pairs(
    n_queries: int, n_tables: int, n_bits: int, probe_hamming: int,
    n_vecs: int | None,
) -> float:
    """Expected multi-probe candidate volume Q·T·P·N/2^B (the random
    term; clustered mass comes on top but tracks the same knob). With
    no ``n_vecs`` hint the caller gets the conservative answer: assume
    N = 2^B·16 (one probe row ≈ 16 candidates, past the measured 1M
    point) so only genuinely small probe sets keep the hint."""
    probes = n_queries * n_tables * len(probe_masks(n_bits, probe_hamming))
    per_probe = (n_vecs / float(1 << n_bits)) if n_vecs else 16.0
    return probes * per_probe


def _score_candidates_arrow(
    pairs: DataFrame, e: DataFrame, n_queries: int, k: int | None = None
) -> DataFrame:
    """Score (query_id, cand_id) candidates against a driver-collected
    query matrix in one vectorized numpy pass per Arrow batch.

    The Catalyst higher-order-function cosine costs ~2.4 µs per 64-d
    pair per thread (it allocates a zipped array per row) and is
    allocation-bound — measured 27.3 s → 10.0 s (2.7×) 8→32 on the
    11.3M-pair Q=512×1M leg, i.e. 75% of the op and the scaling
    bottleneck. The naive Arrow replacement (one embedding per PAIR
    row through mapInPandas) just moves the bottleneck into Arrow
    serialization: 11.3M × 512 B ≈ 6 GB, measured 8.4 s → 3.8 s (2.2×,
    bandwidth-capped) for an IDENTITY mapInPandas on the same rows.

    So the fan-out happens in numpy, not in the data plane: group the
    pair ids by candidate (skinny 16-byte rows shuffle), join each
    DISTINCT candidate's embedding exactly once (≤N rows cross Arrow,
    ~10× less bytes than per-pair), and expand inside the batch with
    ``np.repeat`` against the closure-carried query matrix (Q·D floats
    — 512×64 ≈ 256 KB, so it needs no join at all). The q collect is
    control-plane bounded (Q rows, same convention as the IVF centroid
    collect above).

    In-batch arithmetic (profiled per 4096-row batch at the Q=4096×1M
    leg, 445k pairs/batch): the dot products run as ONE dgemm per
    ≤4 MB row-chunk against the queries present in the batch, then a
    single (row, query) gather — 540→60 ms vs the materialize-both-
    gathers elementwise form, because the gathered operands were ~700
    MB of memory traffic per batch (that's also why 32 workers scaled
    at only ~0.5: they share the memory controllers). The per-batch
    top-k prunes with a scalar composite-key argsort to each query's
    k-th cos VALUE, keeps ``cos >= kth`` (supersets ties, so it is
    exact), and only lexsorts the ~Q·k survivors with the full
    (cos desc, cand asc) tie-break — the window's exact ordering.

    Float caveat: dgemm/pairwise summation differs from the oracle
    path's left-fold by ~1 ulp, so ranks can flip only between
    effectively-tied candidates — the oracled driver row keeps the
    fold-exact Catalyst scorer (`score_path='catalyst'`)."""
    import numpy as np
    import pandas as pd

    qrows = (
        e.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    dim = len(qrows[0]["embedding"]) if qrows else DIM
    qmat = np.zeros((n_queries, dim), dtype=np.float64)
    for r in qrows:
        qmat[r["vec_id"]] = r["embedding"]
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))

    grouped = pairs.groupBy("cand_id").agg(
        F.collect_list("query_id").alias("qids")
    )
    joined = grouped.join(e, grouped["cand_id"] == e["vec_id"]).select(
        "cand_id", "qids", "embedding"
    )
    nq = n_queries

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            qlists = [
                np.asarray(x, dtype=np.int64) for x in pdf["qids"].to_numpy()
            ]
            counts = np.fromiter(
                (len(x) for x in qlists), dtype=np.int64, count=len(qlists)
            )
            qflat = np.concatenate(qlists) if qlists else np.empty(0, np.int64)
            rep = np.repeat(np.arange(len(pdf)), counts)
            # the input is the raw table/probe collision multiset
            # (dedupe=False upstream): dedup (cand, query) here, in
            # one vectorized unique over composite keys, instead of
            # paying a whole-dataset distinct exchange before the
            # groupBy shuffle
            uniq = np.unique(rep * np.int64(nq) + qflat)
            rep, qflat = np.divmod(uniq, np.int64(nq))
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            cnorm = np.sqrt((E * E).sum(axis=1))
            # dgemm against the queries PRESENT in this batch, chunked
            # so the similarity block stays ≤4 MB (cache-resident on a
            # 4-core/16 GB executor too); rep is sorted (np.unique),
            # so each chunk's pair slice is contiguous
            uq = np.unique(qflat)
            qsub = qmat[uq].T
            pos_in_uq = np.searchsorted(uq, qflat)
            rows_per_chunk = max(1, (4 << 20) // (8 * max(len(uq), 1)))
            num = np.empty(len(rep), dtype=np.float64)
            lo = 0
            for r0 in range(0, len(pdf), rows_per_chunk):
                r1 = min(r0 + rows_per_chunk, len(pdf))
                hi = int(np.searchsorted(rep, r1, side="left"))
                m = E[r0:r1] @ qsub
                num[lo:hi] = m[rep[lo:hi] - r0, pos_in_uq[lo:hi]]
                lo = hi
            cand = pdf["cand_id"].to_numpy()[rep]
            cos = num / (cnorm[rep] * qnorm[qflat])
            if k is not None and len(cos):
                # partial top-k per query WITHIN the batch: the global
                # top-k per query is a subset of the union of per-batch
                # top-ks (anything pruned here loses to ≥k better rows
                # of the same query downstream too), so the rank window
                # sees ~batches·Q·k rows instead of every scored pair —
                # 90M → ~4M Arrow-out rows at the Q=4096×1M leg.
                # Two-phase exact top-k: a scalar composite key
                # (query asc, cos desc — query spacing 4.0 > the cos
                # range) finds each query's k-th cos VALUE cheaply,
                # `cos >= kth` keeps a superset of the true top-k
                # (boundary ties included), and the expensive 3-key
                # lexsort with the window's exact (cos desc, cand asc)
                # tie-break runs only on the ~Q·k survivors.
                order = np.argsort(qflat * 4.0 - cos)
                qs = qflat[order]
                starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
                seg_len = np.diff(np.r_[starts, len(qs)])
                kth_idx = order[starts + np.minimum(seg_len - 1, k - 1)]
                kth = np.full(nq, -np.inf)
                kth[qflat[kth_idx]] = cos[kth_idx]
                # the composite key's ulp at 4·nq (~2e-12 at nq=4096)
                # can blur cos near-ties, so the k-th BY KEY may sit a
                # few ulps above the true k-th cos — widen the keep
                # threshold by 4 key-ulps so the prune stays a strict
                # superset of the true top-k (phase 2 trims exactly)
                eps = 4.0 * nq * np.finfo(np.float64).eps
                cand_keep = np.flatnonzero(cos >= kth[qflat] - eps)
                sq, sc, scc = (
                    qflat[cand_keep], cos[cand_keep], cand[cand_keep]
                )
                o2 = np.lexsort((scc, -sc, sq))
                qs2 = sq[o2]
                st2 = np.flatnonzero(np.r_[True, qs2[1:] != qs2[:-1]])
                p2 = np.arange(len(qs2)) - np.repeat(
                    st2, np.diff(np.r_[st2, len(qs2)])
                )
                keep = cand_keep[o2[p2 < k]]
                qflat, cand, cos = qflat[keep], cand[keep], cos[keep]
            yield pd.DataFrame(
                {
                    "query_id": qflat,
                    "cand_id": cand,
                    "cos_sim": cos,
                }
            )

    return joined.mapInPandas(
        score, "query_id long, cand_id long, cos_sim double"
    )


def ann_lsh_topk(
    emb: DataFrame,
    n_queries: int,
    k: int,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
    probe_hamming: int = PROBE_HAMMING,
    hash_path: str = "arrow",
    n_vecs: int | None = None,
    score_path: str = "auto",
) -> DataFrame:
    """Multi-table multi-probe LSH ANN: rank the union of candidates
    from all ``n_tables`` tables' Hamming-``probe_hamming`` probe
    buckets. Same output shape as knn_bruteforce; recall@10 measured
    0.975 at 1M vectors for 2.5% of the exact path's candidate volume
    (the round-4 single-probe scheme measured 0.2 — VERDICT r4 #1).

    Embedding fetch: while the expected pair count Q·T·P·N/2^B stays
    under :data:`BROADCAST_PAIRS_MAX`, the deduped id pairs BROADCAST
    against the embeddings scan (Q=8 at 1M ≈ 67k id rows ≈ 1 MB — no
    shuffle of vectors at all). At production Q the pairs table is
    millions of rows and the hint is DROPPED — an explicit broadcast()
    is binding (AQE cannot demote it), and building a ~4M-row hash
    relation happens single-threaded on the driver, which measured as
    a hard 2.0× scaling plateau on the 8→32 lsh1m_q512 leg. Without
    the hint the join shuffles both sides on vec_id — embarrassingly
    parallel, the right plan at that scale. Pass ``n_vecs`` (the jobs
    do) so the estimate uses the real N; with no hint the conservative
    default only broadcasts genuinely small probe sets.

    Scoring: ``score_path='catalyst'`` evaluates the cosine as the
    oracle-mirrored left-fold expression; ``'arrow'`` scores each
    Arrow batch against a closure-carried numpy query matrix (see
    :func:`_score_candidates_arrow` — the Catalyst expression is the
    scaling bottleneck past ~10M pairs). ``'auto'`` keys off the same
    expected-pair estimate as the broadcast hint."""
    small = (
        _expected_lsh_pairs(n_queries, n_tables, n_bits, probe_hamming, n_vecs)
        <= BROADCAST_PAIRS_MAX
    )
    if score_path == "auto":
        score_path = "catalyst" if small else "arrow"
    # the arrow scorer dedups (cand, query) in numpy inside the
    # groupBy-cand shuffle, so it takes the raw collision multiset and
    # the whole-dataset distinct exchange disappears from the plan
    pairs = ann_lsh_candidate_pairs(
        emb, n_queries, n_tables, n_bits, probe_hamming, hash_path,
        dedupe=(score_path != "arrow"),
    )
    e = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    if score_path == "arrow":
        scored = _score_candidates_arrow(pairs, e, n_queries, k)
    else:
        q = e.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
        )
        scored = (
            (F.broadcast(pairs) if small else pairs)
            .join(e, pairs["cand_id"] == e["vec_id"])
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id",
                "cand_id",
                cosine(F.col("q_emb"), F.col("embedding")).alias("cos_sim"),
            )
        )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def _seed_centroids(e: DataFrame, n_queries: int, n_cells: int) -> DataFrame:
    """Deterministic seed centroids: the embeddings of vec_ids
    [n_queries, n_queries + n_cells)."""
    return e.filter(
        (F.col("vec_id") >= n_queries) & (F.col("vec_id") < n_queries + n_cells)
    ).select(
        (F.col("vec_id") - n_queries).alias("cell_id"),
        F.col("embedding").alias("c_emb"),
    )


def _assign_cells(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-cell assignment for every vector as a ZERO-SHUFFLE
    scan→project: the C centroids are collected to the driver
    (control-plane — C is small by construction) and inlined as
    literals, so the argmax over cells is a single array_max over C
    per-row cosine folds. No crossJoin, no window, no aggregation, no
    exchange — the round-2 rank-1 row_number window shuffled all N×C
    scored rows on vec_id; this shuffles nothing. (This is how
    broadcast K-means assignment works at any scale: centroids ride
    the closure, vectors never move.)

    Ties on c_sim break to the lowest cell_id via the lexicographic
    (c_sim, -cell_id) struct ordering — same order as the oracle's
    row_number. Float math matches the DuckDB twin exactly: per-cell
    ||c||² is pre-folded left-to-right in Python (same order as
    list_reduce), and the per-row fold is the shared zip_with/aggregate
    form."""
    cent_rows = sorted(cents.collect(), key=lambda r: r["cell_id"])
    aa = _dot_self(F.col("embedding"))
    opts = []
    for row in cent_rows:
        cid = int(row["cell_id"])
        cvec = [float(v) for v in row["c_emb"]]
        bb = 0.0
        for v in cvec:  # left fold — matches list_reduce order
            bb += v * v
        clit = F.array(*[F.lit(v) for v in cvec])
        dot_ab = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                clit,
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sim = dot_ab / F.sqrt(F.col("_aa") * F.lit(bb))
        opts.append(
            F.struct(
                sim.alias("s"),
                F.lit(-cid).cast("long").alias("t"),
                F.lit(cid).cast("long").alias("cell_id"),
            )
        )
    return (
        e.withColumn("_aa", aa)
        .withColumn("_best", F.array_max(F.array(*opts)))
        .select(
            "vec_id",
            F.col("_best.cell_id").alias("cell_id"),
            "embedding",
        )
    )


def _dot_self(a: Column) -> Column:
    """dot(a, a) with the shared left-fold order."""
    return F.aggregate(
        F.zip_with(a, a, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lloyd_refine(e: DataFrame, cents: DataFrame, exact: bool = True) -> DataFrame:
    """One Lloyd iteration: re-assign every vector to its nearest cell,
    then recompute each centroid as the element-wise mean of its
    members. Empty cells keep their previous centroid.

    ``exact=True`` (the oracle path): per-dimension sums run in
    DECIMAL(27,10) (exact, order-independent) and only the final mean
    divides in double — Spark and the DuckDB oracle produce
    bit-identical centroids regardless of aggregation order.
    ``exact=False`` (the production default in jobs/ann_pipeline.py):
    vectorized per-partition partial sums — a mapInPandas stage folds
    each Arrow batch's members into ≤C rows of (cell_id, Σvec, count)
    per PARTITION with one numpy ``sum(axis=0)`` per cell, so the
    shuffle and the final agg see n_partitions×C rows instead of the
    oracle path's N×D posexplode rows (the measured ann1m bottleneck —
    64M exploded rows at 1M×64). Centroids differ from the exact path
    only within double-sum reassociation (pytest: atol 1e-9, identical
    top-k). The decimal posexplode path remains the oracle: DuckDB and
    Spark produce bit-identical centroids there regardless of
    aggregation order."""
    assign = _assign_cells(e, cents)
    if exact:
        pos = assign.select(
            "cell_id", F.posexplode("embedding").alias("dim", "x")
        )
        # float → double first: DuckDB's direct FLOAT→DECIMAL cast
        # goes through the float's short decimal repr; the
        # double-mediated cast is identical on both engines
        sum_expr = F.sum(
            F.col("x").cast("double").cast("decimal(27,10)")
        ).cast("double")
        means = pos.groupBy("cell_id", "dim").agg(
            (sum_expr / F.count("*")).alias("m")
        )
    else:
        import numpy as np
        import pandas as pd

        def partial_sums(it):
            sums: dict[int, np.ndarray] = {}
            cnts: dict[int, int] = {}
            for pdf in it:
                for cid, grp in pdf.groupby("cell_id"):
                    mat = np.stack(
                        [np.asarray(v, dtype=np.float64) for v in grp["embedding"]]
                    )
                    s = mat.sum(axis=0)
                    c = int(cid)
                    if c in sums:
                        sums[c] += s
                        cnts[c] += len(grp)
                    else:
                        sums[c] = s
                        cnts[c] = len(grp)
            if sums:
                yield pd.DataFrame(
                    {
                        "cell_id": list(sums),
                        "psum": [sums[c] for c in sums],
                        "pcnt": [cnts[c] for c in sums],
                    }
                )

        partials = assign.select("cell_id", "embedding").mapInPandas(
            partial_sums, "cell_id long, psum array<double>, pcnt long"
        )
        # final merge is tiny (≤ n_partitions×C rows before explode)
        means = (
            partials.select(
                "cell_id",
                "pcnt",
                F.posexplode("psum").alias("dim", "x"),
            )
            .groupBy("cell_id", "dim")
            .agg((F.sum("x") / F.sum("pcnt")).alias("m"))
        )
    new = means.groupBy("cell_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "m"))),
            lambda s: s["m"],
        ).alias("new_emb")
    )
    return cents.join(F.broadcast(new), "cell_id", "left").select(
        "cell_id", F.coalesce("new_emb", "c_emb").alias("c_emb")
    )


def ann_ivf_topk(
    emb: DataFrame,
    n_queries: int,
    k: int,
    n_cells: int = 8,
    nprobe: int = 2,
    lloyd_iters: int = 0,
    lloyd_exact: bool = True,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition vectors into ``n_cells``
    Voronoi cells around deterministic seed centroids, optionally
    refined by ``lloyd_iters`` Lloyd iterations, then search each query
    only inside its ``nprobe`` nearest cells.

    Scale shape: assignment is a ZERO-SHUFFLE projection against
    literal centroids (see _assign_cells), so the only exchange in the
    search path is the cell_id join — expected candidate volume
    Q·N·(nprobe/n_cells). Lloyd training shuffles only partial-agg
    output per iteration (see lloyd_refine; ``lloyd_exact=False`` is
    the double-sum production path) — at 10^12 vectors you'd run it on
    a sample, which changes nothing structurally."""
    e = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    cents = _seed_centroids(e, n_queries, n_cells)
    for _ in range(lloyd_iters):
        cents = lloyd_refine(e, cents, exact=lloyd_exact)
    assign = _assign_cells(e, cents).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_embedding"),
        "cell_id",
    )
    # probe ranking is a window over Q×C rows only (queries are tiny)
    q = e.filter(F.col("vec_id") < n_queries)
    q_scored = q.crossJoin(F.broadcast(cents)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "cell_id",
        cosine(F.col("embedding"), F.col("c_emb")).alias("c_sim"),
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("c_sim"), "cell_id")
    probes = (
        q_scored.withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "q_emb", "cell_id")
    )
    scored = (
        F.broadcast(probes)
        .join(assign, "cell_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("q_emb"), F.col("c_embedding")).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def ann_ivf_topk_sql(
    n_queries: int,
    k: int,
    n_cells: int = 8,
    nprobe: int = 2,
    lloyd_iters: int = 0,
) -> str:
    c_sim = cosine_sql("e.embedding", "c.c_emb")
    cos = cosine_sql("q.q_emb", "a.c_embedding")
    cents_cte = f"""
        cents_0 AS (
            SELECT vec_id - {n_queries} AS cell_id, embedding AS c_emb
            FROM embeddings
            WHERE vec_id >= {n_queries} AND vec_id < {n_queries + n_cells}
        )"""
    prev = "cents_0"
    for it in range(lloyd_iters):
        c_sim_it = cosine_sql("e.embedding", "c.c_emb")
        cents_cte += f""",
        assign_{it} AS (
            SELECT vec_id, embedding, cell_id FROM (
                SELECT e.vec_id, e.embedding, c.cell_id,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {c_sim_it} DESC, c.cell_id
                       ) AS crank
                FROM embeddings e CROSS JOIN {prev} c
            ) r WHERE crank = 1
        ),
        means_{it} AS (
            SELECT cell_id, g.i - 1 AS dim,
                   CAST(sum(CAST(CAST(embedding[g.i] AS DOUBLE) AS DECIMAL(27,10))) AS DOUBLE)
                   / count(*) AS m
            FROM assign_{it},
                 UNNEST(generate_series(1, len(embedding))) AS g(i)
            GROUP BY cell_id, g.i
        ),
        newc_{it} AS (
            SELECT cell_id, list(m ORDER BY dim) AS new_emb
            FROM means_{it} GROUP BY cell_id
        ),
        cents_{it + 1} AS (
            SELECT p.cell_id, coalesce(n.new_emb, p.c_emb) AS c_emb
            FROM {prev} p LEFT JOIN newc_{it} n USING (cell_id)
        )"""
        prev = f"cents_{it + 1}"
    return f"""
        WITH {cents_cte},
        ranked_cells AS (
            SELECT e.vec_id, e.embedding, c.cell_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {c_sim} DESC, c.cell_id
                   ) AS crank
            FROM embeddings e CROSS JOIN {prev} c
        ),
        assign AS (
            SELECT vec_id AS cand_id, embedding AS c_embedding, cell_id
            FROM ranked_cells WHERE crank = 1
        ),
        probes AS (
            SELECT vec_id AS query_id, embedding AS q_emb, cell_id
            FROM ranked_cells
            WHERE vec_id < {n_queries} AND crank <= {nprobe}
        ),
        scored AS (
            SELECT q.query_id, a.cand_id, {cos} AS cos_sim
            FROM probes q JOIN assign a USING (cell_id)
            WHERE q.query_id <> a.cand_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, cand_id
            ) AS rank
            FROM scored
        )
        SELECT query_id, cand_id, cos_sim, rank FROM ranked WHERE rank <= {k}
    """


def ann_lsh_topk_sql(
    n_queries: int,
    k: int,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
    probe_hamming: int = PROBE_HAMMING,
) -> str:
    """DuckDB twin of :func:`ann_lsh_topk` — mirrors the multi-table
    multi-probe scheme exactly (same plane literals, same XOR masks,
    same pair dedup) so the driver row stays value-hashed."""
    cos = cosine_sql("q_emb", "c_emb")
    sigs = ",\n                   ".join(
        f"{mlsh_bucket_sql(t, n_bits=n_bits)} AS b{t}"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (
            SELECT vec_id, embedding,
                   {sigs}
            FROM embeddings
        ),
        cand AS (
            SELECT vec_id AS cand_id, embedding AS c_emb, t.tbl,
                   {_tbl_case_sql(n_tables)} AS bucket
            FROM b CROSS JOIN {_tbl_values_sql(n_tables)}
        ),
        probes AS (
            SELECT vec_id AS query_id, embedding AS q_emb, t.tbl,
                   xor({_tbl_case_sql(n_tables)}, CAST(m.mask AS BIGINT))
                       AS bucket
            FROM b CROSS JOIN {_tbl_values_sql(n_tables)}
                   CROSS JOIN {_mask_values_sql(
                       probe_masks(n_bits, probe_hamming))}
            WHERE vec_id < {n_queries}
        ),
        pairs AS (
            SELECT DISTINCT p.query_id, c.cand_id, p.q_emb, c.c_emb
            FROM probes p
            JOIN cand c ON p.tbl = c.tbl AND p.bucket = c.bucket
            WHERE p.query_id <> c.cand_id
        ),
        scored AS (
            SELECT query_id, cand_id, {cos} AS cos_sim FROM pairs
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, cand_id
            ) AS rank
            FROM scored
        )
        SELECT query_id, cand_id, cos_sim, rank FROM ranked WHERE rank <= {k}
    """


# --- LSH-bucketed embedding near-dup (the scale path for
# pipeline.dedup.embedding_neardup's O(N²) correctness baseline) ------------


def embedding_neardup_lsh(
    emb: DataFrame,
    threshold: float,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
    probe_hamming: int = 0,
    hash_path: str = "arrow",
) -> DataFrame:
    """All (vec_a < vec_b) pairs with cosine ≥ ``threshold`` whose LSH
    signatures collide in at least one of ``n_tables`` tables (within
    Hamming distance ``probe_hamming``, one-sided XOR probing) — the
    banding-style SCALE path for :func:`~fforma_spark.pipeline.dedup.
    embedding_neardup`, which is the exact O(N²) baseline.

    Scale shape: the bucket index is N·n_tables (id, tbl, bucket) rows
    — ids only, no vectors move until the verify join. Candidates are
    the per-(tbl, bucket) self-join, so the quadratic term is
    Σ n_bucket² per table, never N²: tune ``n_bits`` up with log2(N)
    to keep buckets small (every entry point takes overrides, same as
    the ANN path). The cosine verify joins the two embedding sides
    back by id — at small N both sides broadcast; at scale AQE picks
    shuffle joins keyed on vec_id, which is the right plan there.

    Default ``probe_hamming=0`` is the classic banded near-dup scheme
    (exact bucket match per table: recall comes from table count);
    ``probe_hamming>0`` trades candidate volume for per-table recall
    exactly as in :func:`ann_lsh_candidate_pairs`. The DuckDB twin
    (:func:`embedding_neardup_lsh_sql`) mirrors plane literals, XOR
    masks, pair dedup, and the cosine fold order bit-identically."""
    sig = lsh_signatures(F.col("embedding"), n_tables, n_bits, hash_path)
    e = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    buckets = e.select(
        "vec_id", F.posexplode(sig).alias("tbl", "bucket")
    )
    masks = F.array(
        *[F.lit(m) for m in probe_masks(n_bits, probe_hamming)]
    ).cast("array<long>")
    probes = buckets.select(
        "vec_id", "tbl", F.explode(masks).alias("mask"), "bucket"
    ).select(
        "vec_id", "tbl", F.col("bucket").bitwiseXOR(F.col("mask")).alias("bucket")
    )
    pairs = (
        probes.alias("a")
        .join(buckets.alias("b"), ["tbl", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            cosine(F.col("emb_a"), F.col("emb_b")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


def embedding_neardup_lsh_sql(
    threshold: float,
    n_tables: int = N_TABLES,
    n_bits: int = N_BITS,
    probe_hamming: int = 0,
) -> str:
    """DuckDB twin of :func:`embedding_neardup_lsh` — same plane
    literals, XOR probe masks, id-pair dedup, and cosine fold order,
    so the driver row is value-hashed, not rows-only."""
    cos = cosine_sql("ea.embedding", "eb.embedding")
    sigs = ",\n                   ".join(
        f"{mlsh_bucket_sql(t, n_bits=n_bits)} AS b{t}"
        for t in range(n_tables)
    )
    return f"""
        WITH b AS (
            SELECT vec_id, embedding,
                   {sigs}
            FROM embeddings
        ),
        buckets AS (
            SELECT vec_id, t.tbl,
                   {_tbl_case_sql(n_tables)} AS bucket
            FROM b CROSS JOIN {_tbl_values_sql(n_tables)}
        ),
        probes AS (
            SELECT vec_id, t.tbl,
                   xor({_tbl_case_sql(n_tables)}, CAST(m.mask AS BIGINT))
                       AS bucket
            FROM b CROSS JOIN {_tbl_values_sql(n_tables)}
                   CROSS JOIN {_mask_values_sql(
                       probe_masks(n_bits, probe_hamming))}
        ),
        pairs AS (
            SELECT DISTINCT p.vec_id AS vec_a, c.vec_id AS vec_b
            FROM probes p
            JOIN buckets c ON p.tbl = c.tbl AND p.bucket = c.bucket
            WHERE p.vec_id < c.vec_id
        )
        SELECT vec_a, vec_b, {cos} AS cos_sim
        FROM pairs
        JOIN embeddings ea ON ea.vec_id = vec_a
        JOIN embeddings eb ON eb.vec_id = vec_b
        WHERE {cos} >= {threshold!r}
    """


def exact_neardup_pairs_sampled(
    emb: DataFrame, threshold: float, n_sample: int
) -> DataFrame:
    """Exact cosine-≥-threshold pairs RESTRICTED to ``vec_a <
    n_sample`` — the sampled ground truth for grading
    :func:`embedding_neardup_lsh` recall at corpus scale, where the
    full exact baseline is O(N²). O(S·N) instead, distributed as one
    mapInPandas pass with the S-row sample matrix shipped in the
    closure (S·DIM floats — bounded by the caller's sample size, the
    same shape as the literal-centroid IVF assignment).

    Diagnostic, not an oracle: the numpy dot order differs from the
    Catalyst left-fold, so a pair sitting exactly on the threshold can
    differ in the last ulp between the two paths. Fine for a recall
    denominator; never registered as a driver row."""
    import numpy as np

    e = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    sample = e.filter(F.col("vec_id") < n_sample).collect()
    sid = np.array([r["vec_id"] for r in sample], dtype=np.int64)
    S = np.asarray(
        [np.asarray(r["embedding"], dtype=np.float64) for r in sample]
    )
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)

    def gen(it):
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            C = Sn @ Xn.T
            ai, bi = np.nonzero(C >= threshold)
            va, vb = sid[ai], ids[bi]
            keep = va < vb
            yield pd.DataFrame(
                {"vec_a": va[keep], "vec_b": vb[keep]}
            )

    return e.mapInPandas(gen, "vec_a long, vec_b long")
