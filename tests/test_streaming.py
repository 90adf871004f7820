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


def test_windowed_rollup_append_mode_resumes_and_merges_windows(spark, tmp_path):
    """Continuous-aggregate semantics across a restart: append-mode
    emits each window EXACTLY ONCE when the watermark passes it; a
    window whose rows span the two files must come out (after the
    restart) with the MERGED stats of both files — proof the windowed
    state survived the checkpoint. Every emitted row must equal the
    batch rollup over the full data for that (key, bucket)."""
    import pyspark.sql.functions as F

    from fforma_spark.streaming.continuous import run_append_durable

    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    tl = F.unix_micros(F.col("ts").cast("timestamp"))
    med = ev.select(
        F.percentile_approx(tl, F.lit(0.5)).alias("m")
    ).first()["m"]
    first, second = ev.filter(tl < med), ev.filter(tl >= med)

    src = str(tmp_path / "events_cont")
    ckpt = str(tmp_path / "ckpt_cont")
    first.coalesce(1).write.parquet(src)

    def rollup():
        return streaming_tier_rollup(
            streaming_events(spark, src), "1 minute", watermark="0 seconds"
        )

    out1 = str(tmp_path / "cont_out_1")
    run_append_durable(rollup(), ckpt, out1)
    second.coalesce(1).write.mode("append").parquet(src)
    out2 = str(tmp_path / "cont_out_2")
    run_append_durable(rollup(), ckpt, out2)

    got = [
        ((r["doc_id"], r["bucket_start"]),
         (r["cnt"], r["vmin"], r["vmax"], round(r["vsum"], 9)))
        for part in (out1, out2)
        for r in spark.read.parquet(part).collect()
    ]
    keys = [k for k, _ in got]
    assert len(keys) == len(set(keys)), "a window was emitted twice"
    assert len(got) > 0

    batch = {
        (r["doc_id"], r["bucket_start"]): (
            r["cnt"], r["vmin"], r["vmax"], round(r["vsum"], 9)
        )
        for r in batch_tier_rollup_events(
            spark.read.parquet(src), "1 minute"
        ).collect()
    }
    for k, v in got:
        assert v == batch[k], k

    # the restart must have merged at least one window spanning both
    # files: it appears in drain2's output with a count EXCEEDING what
    # file 2 alone contains for that (key, bucket)
    half2 = {
        (r["doc_id"], r["bucket_start"]): r["cnt"]
        for r in batch_tier_rollup_events(second, "1 minute").collect()
    }
    drain2 = {
        (r["doc_id"], r["bucket_start"]): r["cnt"]
        for r in spark.read.parquet(out2).collect()
    }
    merged = [k for k, cnt in drain2.items() if cnt > half2.get(k, 0)]
    assert merged, "no window merged rows from both files across the restart"


def test_stateful_ses_resumes_from_checkpoint_across_restarts(spark, tmp_path):
    """The streaming side of the killed-job-resumes contract: drain
    half the data, STOP the query (simulated kill), add the second
    half, start a NEW query against the SAME checkpoint. The second
    drain must (a) process only the new file (offsets from the
    checkpoint) and (b) continue each key's SES fold from the
    checkpointed state store — final (n, level) must equal the batch
    fold over the FULL series bit-for-bit, not a refold of half."""
    import pyspark.sql.functions as F

    from fforma_spark.streaming.stateful import (
        batch_ses,
        run_update_stream_durable,
        streaming_ses,
    )

    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    tl = F.unix_micros(F.col("ts").cast("timestamp"))
    med = ev.select(
        F.percentile_approx(tl, F.lit(0.5)).alias("m")
    ).first()["m"]
    first = ev.filter(tl < med)
    second = ev.filter(tl >= med)
    assert first.count() > 0 and second.count() > 0

    src = str(tmp_path / "events_resume")
    ckpt = str(tmp_path / "ckpt_resume")
    first.coalesce(1).write.parquet(src)

    def latest(out_dir):
        out = {}
        for r in spark.read.parquet(out_dir).collect():
            if r["doc_id"] not in out or r["n"] > out[r["doc_id"]][0]:
                out[r["doc_id"]] = (r["n"], r["level"], r["n_late"])
        return out

    out1 = str(tmp_path / "ses_out_1")
    run_update_stream_durable(
        streaming_ses(streaming_events(spark, src), 0.3), ckpt, out1
    )
    drain1 = latest(out1)
    batch_half = {
        r["doc_id"]: (r["n"], r["level"])
        for r in batch_ses(first, alpha=0.3).collect()
    }
    assert {k: v[:2] for k, v in drain1.items()} == batch_half

    # "restart": second file lands, a fresh query reuses the checkpoint
    second.coalesce(1).write.mode("append").parquet(src)
    out2 = str(tmp_path / "ses_out_2")
    run_update_stream_durable(
        streaming_ses(streaming_events(spark, src), 0.3), ckpt, out2
    )
    drain2 = latest(out2)
    assert len(drain2) > 0

    batch_full = {
        r["doc_id"]: (r["n"], r["level"])
        for r in batch_ses(ev, alpha=0.3).collect()
    }
    for k, (n, level, n_late) in drain2.items():
        assert n_late == 0, (k, n_late)
        assert (n, level) == batch_full[k], k
    # at least one key genuinely spans both drains — for those, the
    # full count is only reachable by resuming the checkpointed fold
    # (a from-scratch refold of file 2 would report a smaller n)
    spanning = [k for k in drain2 if k in drain1 and drain1[k][0] < drain2[k][0]]
    assert spanning, "no key continued across the restart"


def test_stateful_ses_drops_and_flags_late_rows():
    """Round-2 ADVICE: an event arriving behind the folded (ts,
    event_id) watermark in a later micro-batch must be DROPPED and
    counted in n_late — not silently folded in the wrong position
    (which would permanently corrupt the per-key level)."""
    import pandas as pd

    from fforma_spark.streaming.stateful import _ses_fold

    class _FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    def batch(ts_vals, eids, values):
        return pd.DataFrame(
            {
                "ts": pd.to_datetime(ts_vals, unit="s"),
                "event_id": eids,
                "value": values,
            }
        )

    alpha = 0.3
    state = _FakeState()
    out1 = list(
        _ses_fold(("7",), iter([batch([10, 20, 30], [1, 2, 3], [1.0, 2.0, 3.0])]),
                  state, alpha)
    )[0]
    assert int(out1["n_late"].iloc[0]) == 0
    # second micro-batch: one late event (ts=20 < watermark 30), one new
    out2 = list(
        _ses_fold(("7",), iter([batch([20, 40], [9, 4], [99.0, 4.0])]),
                  state, alpha)
    )[0]
    assert int(out2["n"].iloc[0]) == 4
    assert int(out2["n_late"].iloc[0]) == 1
    # level == in-order fold of [1,2,3,4]; the late 99.0 never entered
    level = 1.0
    for v in (2.0, 3.0, 4.0):
        level = level + alpha * (v - level)
    assert abs(float(out2["level"].iloc[0]) - level) < 1e-12
    # tie on the watermark itself (same ts AND event_id) also drops
    out3 = list(
        _ses_fold(("7",), iter([batch([40], [4], [123.0])]), state, alpha)
    )[0]
    assert int(out3["n"].iloc[0]) == 4
    assert int(out3["n_late"].iloc[0]) == 2


def test_streaming_t1_feeds_batch_t2_cascade(spark, tmp_path):
    """Closes the streaming→batch cascade loop (VERDICT r3 #6): the
    durable append-mode streaming T1 parquet, adapted via
    tier_from_streaming, re-aggregates through the BATCH
    rollup_from_tier into a T2 identical to the all-batch T2 over the
    same events — the partial→final algebra holds across the
    streaming/batch boundary (vfirst/vlast included)."""
    from fforma_spark.operators.rollup import rollup_from_tier
    from fforma_spark.streaming.continuous import (
        run_append_durable,
        tier_from_streaming,
    )

    src = str(tmp_path / "events_cascade")
    os.makedirs(src)
    shutil.copy(os.path.join(SF, "events.parquet"), src)

    rollup = streaming_tier_rollup(
        streaming_events(spark, src), "1 minute", watermark="0 seconds"
    )
    out = str(tmp_path / "t1_stream_out")
    run_append_durable(rollup, str(tmp_path / "ckpt_cascade"), out)

    # append mode finalizes a window only once the watermark passes its
    # END — the minute containing the global max ts stays in state (no
    # later data advances the watermark), so cascade the FINALIZED
    # prefix: drop that last minute bucket from both paths.
    import pyspark.sql.functions as F

    ev = spark.read.parquet(src)
    last_minute = (
        ev.agg(
            (F.unix_timestamp(F.max("ts")) / 60).cast("long").alias("b")
        ).first()["b"]
    )

    t1_stream = tier_from_streaming(
        spark.read.parquet(out).drop("batch_id"), 60
    ).filter(F.col("bucket") < last_minute)
    t2_stream = rollup_from_tier(t1_stream, 5)

    t1_batch = tier_from_streaming(
        batch_tier_rollup_events(ev, "1 minute"), 60
    ).filter(F.col("bucket") < last_minute)
    t2_batch = rollup_from_tier(t1_batch, 5)

    def canon(df):
        return {
            (r["doc_id"], r["bucket"]): (
                r["cnt"], r["vmin"], r["vmax"], round(r["vsum"], 9),
                r["vfirst"], r["vlast"], round(r["vmean"], 9),
            )
            for r in df.collect()
        }

    got, want = canon(t2_stream), canon(t2_batch)
    assert len(want) > 0
    # T2 must be coarser than T1 (windows actually merged)
    assert len(want) < t1_batch.count()
    assert got == want
