"""Streaming exact dedup: first-seen admission, batch hash-set
equivalence, and seen-set recovery across restarts (SURVEY §2.11 /
engine-only ingestion surface)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fforma_spark.streaming.continuous import run_durable
from fforma_spark.streaming.dedup import (
    batch_first_seen_dedup,
    streaming_documents,
    streaming_exact_dedup,
)


def _write_docs(spark, path: str, rows: list[tuple[int, str]]) -> None:
    df = spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def test_streaming_dedup_matches_batch_hash_set(spark, tmp_path):
    src = str(tmp_path / "docs_dir")
    os.makedirs(src)
    # two files, duplicates both within and across them
    _write_docs(spark, src, [(1, "alpha beta"), (2, "gamma"), (3, "alpha beta")])
    _write_docs(spark, src, [(4, "gamma"), (5, "delta"), (6, "delta")])

    deduped = streaming_exact_dedup(streaming_documents(spark, src))
    out = str(tmp_path / "out")
    run_durable(deduped, str(tmp_path / "ckpt"), out, "append")

    got = spark.read.parquet(out).collect()
    hashes = [r["content_hash"] for r in got]
    assert len(hashes) == len(set(hashes)), "a hash was admitted twice"
    batch = {
        r["content_hash"]
        for r in batch_first_seen_dedup(spark.read.parquet(src)).collect()
    }
    assert set(hashes) == batch
    assert len(batch) == 3  # alpha beta / gamma / delta


def test_streaming_dedup_seen_set_survives_restart(spark, tmp_path):
    src = str(tmp_path / "docs_dir")
    os.makedirs(src)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    _write_docs(spark, src, [(1, "alpha"), (2, "beta"), (3, "alpha")])
    run_durable(
        streaming_exact_dedup(streaming_documents(spark, src)), ckpt, out, "append"
    )
    first = spark.read.parquet(out)
    assert first.count() == 2  # alpha, beta

    # "restart": new files arrive, among them duplicates of already-
    # admitted texts; the recovered state store must reject those
    _write_docs(spark, src, [(4, "beta"), (5, "gamma"), (6, "alpha")])
    run_durable(
        streaming_exact_dedup(streaming_documents(spark, src)), ckpt, out, "append"
    )
    rows = spark.read.parquet(out).collect()
    hashes = [r["content_hash"] for r in rows]
    assert len(hashes) == len(set(hashes)), "restart re-admitted a seen hash"
    assert len(hashes) == 3  # alpha, beta from run 1; gamma from run 2
    texts = {r["text"] for r in rows}
    assert texts == {"alpha", "beta", "gamma"}
    # first-seen wins: the admitted alpha is doc 1, not doc 6
    by_text = {r["text"]: r["doc_id"] for r in rows}
    assert by_text["alpha"] == 1 and by_text["beta"] == 2


def test_streaming_dedup_within_watermark_mode_builds(spark, tmp_path):
    """The bounded-state variant wires dropDuplicatesWithinWatermark
    over an event-time column (plan-level check: the degenerate
    one-batch availableNow drain admits each hash once here too)."""
    src = str(tmp_path / "docs_dir")
    os.makedirs(src)
    _write_docs(spark, src, [(1, "alpha"), (2, "alpha"), (3, "beta")])

    stream = streaming_documents(spark, src).withColumn(
        "ingest_ts", F.timestamp_seconds(F.col("doc_id") + 1_700_000_000)
    )
    deduped = streaming_exact_dedup(stream, within_watermark="10 minutes")
    out = str(tmp_path / "out")
    run_durable(deduped, str(tmp_path / "ckpt"), out, "append")
    hashes = [r["content_hash"] for r in spark.read.parquet(out).collect()]
    assert len(hashes) == 2 and len(set(hashes)) == 2
