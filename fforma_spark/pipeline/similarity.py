"""Approximate-nearest-neighbor search over the embeddings table.

Two paths (both Catalyst-only):

* ``knn_bruteforce`` — exact cosine top-k per query via a filtered
  cross join + window rank. O(Q·N): the CORRECTNESS baseline; fine
  whenever Q is small (the query side broadcasts).
* ``ann_lsh_*`` — random-hyperplane LSH: each vector gets a B-bit
  bucket (sign of the dot product against B fixed pseudo-random
  planes); search joins only within the query's bucket. At scale this
  turns O(Q·N) into O(Q·N/2^B) expected, with the bucket join
  shuffling on the bucket key. Planes are deterministic md5-derived
  literals, so the DuckDB oracle computes bit-identical buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from fforma_spark.pipeline.common import py_h64
from fforma_spark.pipeline.dedup import _dot_sql, cosine, cosine_sql

DIM = 64
N_PLANES = 8

# Deterministic pseudo-random hyperplanes in [-1, 1]^DIM, identical
# literals on both engines (and in numpy tests via the same formula).
PLANES: list[list[float]] = [
    [((py_h64(f"plane:{j}:{k}") % 2001) - 1000) / 1000.0 for k in range(DIM)]
    for j in range(N_PLANES)
]


def _plane_lit(j: int) -> Column:
    return F.array(*[F.lit(v) for v in PLANES[j]])


def _plane_sql(j: int) -> str:
    return "[" + ", ".join(repr(v) for v in PLANES[j]) + "]"


def _dot_lit(emb: Column, j: int) -> Column:
    """Left-fold dot with plane j (same FP order as the SQL twin)."""
    return F.aggregate(
        F.zip_with(emb, _plane_lit(j), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_bucket(emb: Column) -> Column:
    b = F.lit(0)
    for j in range(N_PLANES):
        b = b + F.when(_dot_lit(emb, j) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return b.cast("long")


def lsh_bucket_sql(emb: str = "embedding") -> str:
    terms = " + ".join(
        f"CASE WHEN {_dot_sql(emb, _plane_sql(j))} >= 0 THEN {1 << j} ELSE 0 END"
        for j in range(N_PLANES)
    )
    return f"CAST({terms} AS BIGINT)"


def lsh_buckets(emb: DataFrame) -> DataFrame:
    """Bucket histogram — the skew diagnostic for the ANN join."""
    return (
        emb.select(lsh_bucket(F.col("embedding")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


LSH_BUCKETS_SQL = None  # built lazily (PLANES is large); see queries module


def lsh_buckets_sql() -> str:
    return f"""
        SELECT {lsh_bucket_sql()} AS bucket, count(*) AS n
        FROM embeddings
        GROUP BY 1
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


def ann_lsh_topk(emb: DataFrame, n_queries: int, k: int) -> DataFrame:
    """LSH-bucketed ANN: rank candidates only within the query's
    bucket. Same output shape as knn_bruteforce; recall < 1 by design
    (that's the approximation traded for the 2^B candidate reduction).
    """
    e = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "embedding",
        lsh_bucket(F.col("embedding")).alias("bucket"),
    )
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    cand = e.select(F.col("vec_id").alias("cand_id"), "embedding", "bucket")
    scored = (
        F.broadcast(q)
        .join(cand, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
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


def ann_lsh_topk_sql(n_queries: int, k: int) -> str:
    cos = cosine_sql("q.embedding", "c.embedding")
    bucket = lsh_bucket_sql("embedding")
    return f"""
        WITH b AS (
            SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
        ),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   {cos} AS cos_sim
            FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
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
