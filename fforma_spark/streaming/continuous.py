"""Structured-Streaming continuous aggregates — the streaming twin of
the batch tier rollup.

The reference is strictly batch (SURVEY §2.11); the north rule's
"continuous aggregates / retention" are served by the incremental-batch
checkpoint ladder (plans/checkpoint.py). This module adds the streaming
ingestion path for completeness: the SAME tier semantics expressed as a
watermarked tumbling-window aggregate over an event-time stream, so a
deployment can keep T1 hot from a live feed and let the batch ladder
re-derive T2/T3 from it (identical partial→final algebra).

Equivalence contract (tested): running the stream with the
``availableNow`` trigger over a static directory produces exactly the
batch groupBy result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def streaming_events(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


# Shared tier-stats vocabulary for the streaming rollup and its batch
# twin: cnt/vmin/vmax/vsum plus vfirst/vlast (earliest/latest value in
# the window, event_id tie-break for determinism) — the SAME partials
# the batch ladder re-aggregates, so streaming T1 output feeds
# operators.rollup.rollup_from_tier directly (see tier_from_streaming).
def _tier_aggs():
    # built lazily: Column construction needs an active SparkContext
    return (
        F.count("*").alias("cnt"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.sum("value").alias("vsum"),
        F.min_by("value", F.struct("ts", "event_id")).alias("vfirst"),
        F.max_by("value", F.struct("ts", "event_id")).alias("vlast"),
    )


def streaming_tier_rollup(
    events: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T1-equivalent continuous aggregate: tumbling event-time windows
    per user with the tier stats vocabulary (cnt/vmin/vmax/vsum/vmean).

    Watermark bounds state for late data; the output is append-mode
    finalizable once the watermark passes the window end.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.col("user_id").cast("string").alias("doc_id"),
            F.window("ts", window_duration).alias("w"),
        )
        .agg(*_tier_aggs())
        .select(
            "doc_id",
            F.col("w.start").alias("bucket_start"),
            "cnt",
            "vmin",
            "vmax",
            "vsum",
            "vfirst",
            "vlast",
            (F.col("vsum") / F.col("cnt")).alias("vmean"),
        )
    )


def batch_tier_rollup_events(
    events: DataFrame, window_duration: str = "1 minute"
) -> DataFrame:
    """The batch twin of streaming_tier_rollup (same output schema) —
    the equivalence oracle."""
    return (
        events.groupBy(
            F.col("user_id").cast("string").alias("doc_id"),
            F.window("ts", window_duration).alias("w"),
        )
        .agg(*_tier_aggs())
        .select(
            "doc_id",
            F.col("w.start").alias("bucket_start"),
            "cnt",
            "vmin",
            "vmax",
            "vsum",
            "vfirst",
            "vlast",
            (F.col("vsum") / F.col("cnt")).alias("vmean"),
        )
    )


def tier_from_streaming(t1: DataFrame, window_seconds: int = 60) -> DataFrame:
    """Adapt streaming T1 output (timestamp windows) to the batch tier
    shape (integer buckets) so operators.rollup.rollup_from_tier can
    cascade T2/T3 from it WITHOUT rescanning raw events — the
    streaming→batch boundary of the continuous-aggregate ladder.
    bucket = epoch_seconds(bucket_start) / window_seconds (exact:
    window starts are aligned multiples of the window)."""
    return t1.select(
        "doc_id",
        (F.unix_timestamp("bucket_start") / F.lit(window_seconds))
        .cast("long")
        .alias("bucket"),
        "cnt",
        "vmin",
        "vmax",
        "vsum",
        "vfirst",
        "vlast",
        "vmean",
    )


def run_durable(
    df: DataFrame, checkpoint_dir: str, out_dir: str, output_mode: str
) -> None:
    """Drain with availableNow through a foreachBatch parquet sink that
    supports checkpoint recovery: a restarted query resumes from the
    recorded offsets and the state store. The write is IDEMPOTENT on
    batch retry — each micro-batch lands in its own
    ``batch_id=<n>`` subdirectory with overwrite semantics, so a batch
    re-executed after a crash between the data write and the
    checkpoint commit replaces its own output instead of duplicating
    it (the exactly-once contract foreachBatch leaves to the sink).
    Read the result with ``spark.read.parquet(out_dir)`` (batch_id
    appears as a partition column)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    q = (
        df.writeStream.outputMode(output_mode)
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_append_durable(
    rollup: DataFrame, checkpoint_dir: str, out_dir: str
) -> None:
    """APPEND-mode durable drain of the watermarked window rollup:
    each window row is emitted exactly once, when the watermark passes
    its end; a window whose data spans a restart is emitted once with
    the MERGED stats (the continuous-aggregate contract; un-finalized
    tail windows stay in state until later data advances the
    watermark). See run_durable for the recovery/idempotence
    semantics."""
    run_durable(rollup, checkpoint_dir, out_dir, "append")


def run_available_now(
    rollup: DataFrame, checkpoint_dir: str, table_name: str
) -> None:
    """Drain everything currently available through the streaming
    engine into an in-memory table, then stop — the batch-equivalence
    harness (and the backfill pattern for production)."""
    q = (
        rollup.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
