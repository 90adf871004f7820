"""Driver registrations for the training-data pipeline operators.

Imported (for side effects) by fforma_spark.queries — every entry lands
in the same QUERIES/ORACLES dicts the driver reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fforma_spark.pipeline import dedup as D
from fforma_spark.pipeline import multimodal as M
from fforma_spark.pipeline import similarity as S
from fforma_spark.pipeline import text as T
from fforma_spark.sources.tables import load_table
from fforma_spark.util import sql_round6, stable_round6

# registered lazily to avoid a circular import
from fforma_spark import queries as Q

register = Q.register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --- text analysis ---------------------------------------------------------


@register("langid_documents", T.lang_id_sql())
def langid_documents(spark, sf_dir):
    """n-gram/stopword language heuristic — scan→project, no shuffle."""
    return T.lang_id(_docs(spark, sf_dir))


@register(
    "quality_documents",
    f"""
    SELECT doc_id, n_words, stop_hits, n_punct,
           {sql_round6('mean_word_len')} AS mean_word_len,
           {sql_round6('quality')} AS quality
    FROM ({T.quality_score_sql()}) q
    """,
)
def quality_documents(spark, sf_dir):
    df = T.quality_score(_docs(spark, sf_dir))
    return df.withColumn("mean_word_len", stable_round6("mean_word_len")).withColumn(
        "quality", stable_round6("quality")
    )


@register("token_counts_documents", T.token_counts_sql())
def token_counts_documents(spark, sf_dir):
    return T.token_counts(_docs(spark, sf_dir))


@register("fingerprint_documents", T.fingerprint_sql())
def fingerprint_documents(spark, sf_dir):
    return T.fingerprint(_docs(spark, sf_dir))


# --- deduplication ---------------------------------------------------------


@register("exact_dedup_documents", D.EXACT_DEDUP_SQL)
def exact_dedup_documents(spark, sf_dir):
    return D.exact_dedup(_docs(spark, sf_dir))


_J_THRESH = 0.5


@register(
    "minhash_lsh_neardup",
    f"""
    SELECT doc_a, doc_b, {sql_round6('jaccard')} AS jaccard, is_dup
    FROM ({D.minhash_neardup_sql(_J_THRESH)}) m
    """,
)
def minhash_lsh_neardup(spark, sf_dir):
    """shingle→minhash→band→bucket-join→Jaccard-verify near-dup."""
    out = D.minhash_neardup(_docs(spark, sf_dir), _J_THRESH)
    return out.withColumn("jaccard", stable_round6("jaccard"))


@register(
    "minhash_lsh_neardup_r2",
    f"""
    SELECT doc_a, doc_b, {sql_round6('jaccard')} AS jaccard, is_dup
    FROM ({D.minhash_neardup_sql(_J_THRESH, r=2)}) m
    """,
)
def minhash_lsh_neardup_r2(spark, sf_dir):
    """r=2 banding (4 bands × 2 rows): the dup-heavy-corpus precision
    control — a candidate must match two consecutive minhashes, so
    P(candidate) = 1−(1−J²)⁴ and candidate volume collapses vs r=1."""
    out = D.minhash_neardup(_docs(spark, sf_dir), _J_THRESH, r=2)
    return out.withColumn("jaccard", stable_round6("jaccard"))


_NGJ_MAXDF = 100


@register(
    "ngram_jaccard_neardup",
    f"""
    SELECT doc_a, doc_b, {sql_round6('jaccard')} AS jaccard
    FROM ({D.ngram_jaccard_neardup_sql(_J_THRESH, _NGJ_MAXDF)}) n
    """,
)
def ngram_jaccard_neardup(spark, sf_dir):
    """EXACT n-gram Jaccard via inverted shingle index with a
    document-frequency cap — recall 1.0 over the capped shingle space
    (vs the MinHash path's probabilistic recall)."""
    out = D.ngram_jaccard_neardup(_docs(spark, sf_dir), _J_THRESH, _NGJ_MAXDF)
    return out.withColumn("jaccard", stable_round6("jaccard"))


@register("simhash_documents", D.simhash_sql())
def simhash_documents(spark, sf_dir):
    return D.simhash(_docs(spark, sf_dir))


@register("simhash64_documents", D.simhash64_sql())
def simhash64_documents(spark, sf_dir):
    """64-bit simhash as 4×16-bit chunks — the ≥64-bit signature that
    keeps bucket counts useful at 10^9+ docs."""
    return D.simhash64(_docs(spark, sf_dir))


@register("simhash_hamming_neardup", D.simhash_hamming_neardup_sql(3))
def simhash_hamming_neardup(spark, sf_dir):
    """Hamming-distance ≤3 near-dups over the 64-bit signature via
    4 chunk equi-joins (pigeonhole-complete, never all-pairs)."""
    return D.simhash_hamming_neardup(_docs(spark, sf_dir), max_dist=3)


@register("simhash_collisions", D.simhash_collisions_sql())
def simhash_collisions(spark, sf_dir):
    return D.simhash_collisions(_docs(spark, sf_dir))


_COS_THRESH = 0.35


@register(
    "embedding_neardup",
    f"""
    SELECT vec_a, vec_b, {sql_round6('cos_sim')} AS cos_sim
    FROM ({D.embedding_neardup_sql(_COS_THRESH)}) e
    """,
)
def embedding_neardup(spark, sf_dir):
    out = D.embedding_neardup(_emb(spark, sf_dir), _COS_THRESH)
    return out.withColumn("cos_sim", stable_round6("cos_sim"))


# --- similarity search -----------------------------------------------------

_NQ, _K = 8, 5


@register(
    "knn_bruteforce",
    f"""
    SELECT query_id, cand_id, {sql_round6('cos_sim')} AS cos_sim, rank
    FROM ({S.knn_bruteforce_sql(_NQ, _K)}) k
    """,
)
def knn_bruteforce(spark, sf_dir):
    out = S.knn_bruteforce(_emb(spark, sf_dir), _NQ, _K)
    return out.withColumn("cos_sim", stable_round6("cos_sim"))


@register(
    "ann_lsh_topk",
    f"""
    SELECT query_id, cand_id, {sql_round6('cos_sim')} AS cos_sim, rank
    FROM ({S.ann_lsh_topk_sql(_NQ, _K)}) k
    """,
)
def ann_lsh_topk(spark, sf_dir):
    out = S.ann_lsh_topk(_emb(spark, sf_dir), _NQ, _K)
    return out.withColumn("cos_sim", stable_round6("cos_sim"))


_IVF_CELLS, _IVF_NPROBE = 8, 2


@register(
    "ann_ivf_topk",
    f"""
    SELECT query_id, cand_id, {sql_round6('cos_sim')} AS cos_sim, rank
    FROM ({S.ann_ivf_topk_sql(_NQ, _K, _IVF_CELLS, _IVF_NPROBE)}) k
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF ANN: Voronoi-cell partition around deterministic seed
    centroids, nprobe-cell search — O(Q·N·nprobe/n_cells) candidates."""
    out = S.ann_ivf_topk(_emb(spark, sf_dir), _NQ, _K, _IVF_CELLS, _IVF_NPROBE)
    return out.withColumn("cos_sim", stable_round6("cos_sim"))


@register("ann_lsh_buckets", S.lsh_buckets_sql())
def ann_lsh_buckets(spark, sf_dir):
    return S.lsh_buckets(_emb(spark, sf_dir))


# --- multimodal ------------------------------------------------------------


@register("multimodal_frame_index", M.FRAME_INDEX_SQL)
def multimodal_frame_index(spark, sf_dir):
    return M.frame_index(_docs(spark, sf_dir))


@register("multimodal_byte_features")  # rows-only: numpy oracle in pytest
def multimodal_byte_features(spark, sf_dir):
    return M.extract_features(_docs(spark, sf_dir))


@register("multimodal_thumbnails")  # rows-only: numpy oracle in pytest
def multimodal_thumbnails(spark, sf_dir):
    """decode(stand-in) → REAL bilinear resize to 8×8 thumbnails,
    Arrow-batched mapInPandas (pipeline/multimodal.py::thumbnails)."""
    return M.thumbnails(_docs(spark, sf_dir))
