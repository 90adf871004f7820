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


def ann_ivf_topk(
    emb: DataFrame,
    n_queries: int,
    k: int,
    n_cells: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition vectors into ``n_cells``
    Voronoi cells around deterministic seed centroids (the embeddings
    of vec_ids [n_queries, n_queries+n_cells)), then search each query
    only inside its ``nprobe`` nearest cells.

    Scale shape: the assignment pass is a scan × broadcast(n_cells)
    project — O(N·C) flops, no shuffle; the search join shuffles on
    cell_id only, so expected candidate volume is Q·N·(nprobe/n_cells).
    Centroid *training* (Lloyd iterations = re-assign + per-cell mean)
    is orthogonal and would reuse exactly this assignment join; seeds
    keep the operator deterministic for the cross-engine oracle.
    """
    e = emb.select(F.col("vec_id").cast("long").alias("vec_id"), "embedding")
    cents = e.filter(
        (F.col("vec_id") >= n_queries) & (F.col("vec_id") < n_queries + n_cells)
    ).select(
        (F.col("vec_id") - n_queries).alias("cell_id"),
        F.col("embedding").alias("c_emb"),
    )
    # nearest-cell assignment for every vector (rank-1 over C cells)
    scored_cells = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            "cell_id",
            cosine(F.col("embedding"), F.col("c_emb")).alias("c_sim"),
        )
    )
    wv = W.partitionBy("vec_id").orderBy(F.desc("c_sim"), "cell_id")
    ranked_cells = scored_cells.withColumn("crank", F.row_number().over(wv))
    assign = ranked_cells.filter(F.col("crank") == 1).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_embedding"),
        "cell_id",
    )
    probes = ranked_cells.filter(
        (F.col("vec_id") < n_queries) & (F.col("crank") <= nprobe)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "cell_id",
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
    n_queries: int, k: int, n_cells: int = 8, nprobe: int = 2
) -> str:
    c_sim = cosine_sql("e.embedding", "c.embedding")
    cos = cosine_sql("q.q_emb", "a.c_embedding")
    return f"""
        WITH cents AS (
            SELECT vec_id - {n_queries} AS cell_id, embedding
            FROM embeddings
            WHERE vec_id >= {n_queries} AND vec_id < {n_queries + n_cells}
        ),
        ranked_cells AS (
            SELECT e.vec_id, e.embedding, c.cell_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {c_sim} DESC, c.cell_id
                   ) AS crank
            FROM embeddings e CROSS JOIN cents c
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
