"""Streaming exact deduplication — the ingestion twin of the batch
``pipeline.dedup.exact_dedup``.

The reference is strictly batch; this is engine-only surface for the
live-ingestion path of a training-data pipeline: documents arrive as a
stream, and each distinct text must be admitted exactly once, across
micro-batches AND across job restarts (the seen-set lives in the
streaming state store, recovered from the checkpoint).

Semantics vs the batch twin: batch ``exact_dedup`` sees the whole
corpus and elects keeper = min(doc_id); a stream cannot know the
global minimum at admission time, so the streaming contract is
FIRST-SEEN WINS — the keeper is the first arrival of each
content_hash in stream order. The sets of admitted content_hashes are
identical (tested); only the keeper identity can differ when a
duplicate's lower doc_id arrives later.

State sizing at 100 TB: ``dropDuplicates`` state is one row per
distinct content_hash (32-char key), O(#distinct docs) — bounded by
the corpus, not the stream; at 10⁹ distinct docs that is ~100 GB of
state, sharded across executors by hash (uniform key by construction)
and RocksDB-backed in production. For unbounded feeds where arrival
lateness is bounded, ``within_watermark`` switches to
``dropDuplicatesWithinWatermark`` so state for a hash is dropped once
the watermark passes its event time — constant state, at the cost of
re-admitting a duplicate that arrives later than the lateness bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def streaming_documents(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def streaming_exact_dedup(
    docs: DataFrame,
    within_watermark: str | None = None,
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """Admit the first arrival of each distinct text; drop the rest.

    Hash first (md5 of the UTF-8 text, the batch twin's key) so the
    dedup state stores 32-char keys, never document bodies. Default is
    global dedup (state = one row per distinct hash, exactly-once per
    corpus); pass ``within_watermark`` (e.g. ``"10 minutes"``, requires
    ``ts_col``) for the bounded-state variant over unbounded feeds.
    """
    hashed = docs.withColumn(
        "content_hash", F.md5(F.encode("text", "UTF-8"))
    )
    if within_watermark is not None:
        return hashed.withWatermark(ts_col, within_watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])


def batch_first_seen_dedup(docs: DataFrame) -> DataFrame:
    """Batch twin of the streaming contract for the equivalence test:
    keeper = first arrival in ingestion order (min doc_id stands in
    for arrival order when the input is written in doc_id order)."""
    w_first = F.min_by(F.struct("text", "lang", "source", "n_chars"), "doc_id")
    return (
        docs.withColumn("content_hash", F.md5(F.encode("text", "UTF-8")))
        .groupBy("content_hash")
        .agg(w_first.alias("_r"))
        .select("content_hash", "_r.*")
    )
