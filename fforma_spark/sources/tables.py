"""Readers over the driver-provided parquet tables and deterministic
derivations of the canonical engine inputs from them.

Format-pluggable: ``load_table`` reads parquet today; an Iceberg catalog
path is config-gated (no Iceberg runtime jar in the sandbox — SURVEY.md
§7.3), so production would swap ``spark.read.parquet`` for
``spark.read.table("catalog.db.tbl")`` without touching callers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table; Iceberg-gated for production catalogs."""
    catalog = os.environ.get("FFORMA_SPARK_ICEBERG_CATALOG")
    if catalog:  # pragma: no cover — no Iceberg jar in sandbox
        return spark.read.table(f"{catalog}.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_output(
    df: DataFrame,
    parquet_path: str,
    table_name: str | None = None,
    doc_buckets: int = 65536,
    secondary: str | None = None,
) -> str:
    """Format-pluggable sink, the write-side twin of :func:`load_table`.

    Default: overwrite a parquet directory. When
    ``FFORMA_SPARK_ICEBERG_CATALOG`` is set and a ``table_name`` is
    given, write via the V2 ``writeTo`` API with the SCALE.md §1
    partition spec — ``bucket(doc_buckets, doc_id)`` plus an optional
    secondary partition column — and doc_id sort within partitions
    (Iceberg min/max pruning on doc ranges). Returns the path or the
    fully-qualified table written.

    No Iceberg jar ships in the sandbox: the branch selection and the
    partition-transform construction are exercised by
    tests/test_iceberg_gate.py; the full round-trip runs wherever a
    runtime jar is on the classpath.
    """
    catalog = os.environ.get("FFORMA_SPARK_ICEBERG_CATALOG")
    if catalog and table_name:
        from pyspark.sql.functions import partitioning

        parts = [partitioning.bucket(doc_buckets, "doc_id")]
        if secondary is not None:
            parts.append(F.col(secondary))
        target = f"{catalog}.{table_name}"
        (
            df.sortWithinPartitions("doc_id")
            .writeTo(target)
            .partitionedBy(*parts)
            .createOrReplace()
        )
        return target
    df.write.mode("overwrite").parquet(parquet_path)
    return parquet_path


def sequences_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic tokenization of ``documents`` into the canonical
    sequence table (doc_id, tokens:array<int>, n_tok, source).

    Token = length of each whitespace-separated word — deterministic,
    engine-portable (the DuckDB oracle derives the identical array with
    list_transform(string_split(...))), and entirely JVM-side here.
    Mirrors the reference's wide/"horizontal" panel form
    (fforma/utils/reshaping.py:12-40).
    """
    from fforma_spark.util import ensure_parallelism

    # The driver parquet files carry ONE row group, so the scan arrives
    # as a single split and everything up to the first exchange —
    # including this tokenization — would run on one core. Repartition
    # straight after the read (optimization guide §2.5, unsplittable
    # input) so tokenization parallelizes and a cache of this table is
    # already distribution-ready for the mapInPandas fabrics (their own
    # ensure_parallelism then no-ops). At production scale scans have
    # many splits and this is a no-op.
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.transform(F.split(F.col("text"), " "), lambda w: F.length(w))
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        toks.cast("array<int>").alias("tokens"),
        F.size(toks).cast("int").alias("n_tok"),
        F.col("source"),
    )


def panel_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long panel (doc_id, pos, val) from the events stream table.

    doc_id = user_id; pos = 0-based rank of the event within the user's
    stream ordered by (ts, event_id); val = event value. This is the
    reference's canonical long panel (unique_id, ds, y)
    (fforma/fforma_python_futuro.py:128-138) with a real timestamp axis
    behind the integer position.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.col("user_id").cast("string").alias("doc_id"),
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
        F.col("value").cast("double").alias("val"),
    )


# DuckDB-side equivalent of panel_from_events, reused by oracle SQL.
PANEL_FROM_EVENTS_SQL = """
    SELECT CAST(user_id AS VARCHAR) AS doc_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS pos,
           CAST(value AS DOUBLE) AS val
    FROM events
"""

# DuckDB-side equivalent of sequences_from_documents.
SEQUENCES_FROM_DOCUMENTS_SQL = """
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           list_transform(string_split(text, ' '), w -> CAST(length(w) AS INT)) AS tokens,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
           source
    FROM documents
"""
