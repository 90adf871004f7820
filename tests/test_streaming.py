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


def test_stateful_streaming_ses_matches_batch(spark, tmp_path):
    """applyInPandasWithState per-series SES: one availableNow drain
    == the batch fold bit-for-bit (custom stateful operator twin)."""
    import os as _os
    import shutil as _shutil

    from fforma_spark.streaming.stateful import (
        batch_ses,
        run_update_stream,
        streaming_ses,
    )

    src = str(tmp_path / "events_dir2")
    _os.makedirs(src)
    _shutil.copy(os.path.join(SF, "events.parquet"), src)

    stream = streaming_events(spark, src)
    stateful = streaming_ses(stream, alpha=0.3)
    run_update_stream(stateful, str(tmp_path / "ckpt2"), "ses_stream")

    # update-mode memory sink: keep the last row per key (max n)
    rows = spark.table("ses_stream").collect()
    got = {}
    for r in rows:
        if r["doc_id"] not in got or r["n"] > got[r["doc_id"]][0]:
            got[r["doc_id"]] = (r["n"], r["level"], r["forecast"])
    batch = {
        r["doc_id"]: (r["n"], r["level"], r["forecast"])
        for r in batch_ses(spark.read.parquet(src), alpha=0.3).collect()
    }
    assert got == batch
    assert len(got) > 0
