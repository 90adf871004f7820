"""Streaming continuous aggregate == batch tier rollup (availableNow
equivalence; SURVEY §2.11)."""

from __future__ import annotations

import os
import shutil

from fforma_spark.streaming.continuous import (
    batch_tier_rollup_events,
    run_available_now,
    streaming_events,
    streaming_tier_rollup,
)

SF = "/root/testdata/sf0.001"


def test_streaming_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_dir")
    os.makedirs(src)
    shutil.copy(os.path.join(SF, "events.parquet"), src)

    stream = streaming_events(spark, src)
    assert stream.isStreaming
    rollup = streaming_tier_rollup(stream, "1 minute")
    run_available_now(rollup, str(tmp_path / "ckpt"), "t1_stream")

    got = {
        (r["doc_id"], r["bucket_start"]): (
            r["cnt"], r["vmin"], r["vmax"], round(r["vsum"], 9)
        )
        for r in spark.table("t1_stream").collect()
    }
    batch = {
        (r["doc_id"], r["bucket_start"]): (
            r["cnt"], r["vmin"], r["vmax"], round(r["vsum"], 9)
        )
        for r in batch_tier_rollup_events(
            spark.read.parquet(src), "1 minute"
        ).collect()
    }
    assert got == batch
    assert len(got) > 0
