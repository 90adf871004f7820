"""Custom stateful streaming operator: per-series streaming SES.

The reference's SES kernel (fforma/base/_models.py:59-72) is a
sequential fold ``level ← level + α·(x − level)`` — exactly the shape
Structured Streaming's ``applyInPandasWithState`` exists for: the fold
state (level, n) lives in the state store per doc_id, each micro-batch
folds its new observations in, and the operator emits the updated
level + one-step forecast per key.

Ordering contract: within one micro-batch the operator sorts a key's
rows by (ts, event_id); ACROSS micro-batches in-order delivery per key
is the deployment contract (e.g. a Kafka partition per key — the same
assumption every per-key streaming fold makes). The contract is now
ENFORCED, not assumed (round-2 ADVICE finding): the state tracks the
max (ts, event_id) already folded, rows arriving at or behind it are
DROPPED rather than silently folded in the wrong position (which would
permanently corrupt the level), and the per-key count of dropped rows
is emitted as ``n_late`` so violations are visible downstream. The
equivalence test drives the whole directory through one availableNow
batch, where the result must equal the batch kernel bit-for-bit with
n_late = 0.

Scale shape: state is O(#keys) doubles (RocksDB-backed state store in
production), each micro-batch shuffles only its own rows on doc_id —
no reprocessing of history, which is what makes this the streaming
twin of the sequential-kernel mapInPandas stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "doc_id string, n long, level double, forecast double, n_late long"
)
# max_ts is the int64 timestamp of the last folded event; with
# max_eid it forms the per-key high-watermark for the ordering guard
STATE_SCHEMA = "level double, n long, max_ts long, max_eid long, n_late long"

_MIN = -(1 << 62)


def _ses_fold(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState, alpha: float):
    rows = pd.concat(list(pdf_iter))
    rows = rows.sort_values(["ts", "event_id"])
    if state.exists:
        level, n, max_ts, max_eid, n_late = state.get
    else:
        level, n, max_ts, max_eid, n_late = 0.0, 0, _MIN, _MIN, 0
    # int64 view of the timestamp (unit-agnostic: only the ordering
    # matters, and it is consistent within a stream)
    ts_us = (rows["ts"].astype("int64")).to_numpy()
    eids = rows["event_id"].astype("int64").to_numpy()
    for t, eid, v in zip(ts_us, eids, rows["value"].astype("float64")):
        if (int(t), int(eid)) <= (max_ts, max_eid):
            # behind the folded watermark: folding it now would corrupt
            # the level permanently — drop and surface the violation
            n_late += 1
            continue
        if n == 0:
            level = float(v)  # SES initializes at the first observation
        else:
            level = level + alpha * (float(v) - level)
        n += 1
        max_ts, max_eid = int(t), int(eid)
    state.update((float(level), int(n), int(max_ts), int(max_eid), int(n_late)))
    yield pd.DataFrame(
        {
            "doc_id": [str(key[0])],
            "n": [n],
            "level": [level],
            "forecast": [level],  # SES h-step forecast is flat
            "n_late": [n_late],
        }
    )


def streaming_ses(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Per-series streaming SES state machine over the events stream.

    Emits one (doc_id, n, level, forecast) row per key per micro-batch
    — downstream sinks in update mode keep the latest row per key.
    """

    def fold(key, it, state):
        yield from _ses_fold(key, it, state, alpha)

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_ses(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Batch twin (the equivalence oracle): the same fold over each
    full series, applyInPandas so every group arrives whole."""
    import numpy as np

    def fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        x = np.asarray(pdf["value"], dtype=np.float64)
        level = float(x[0])
        for v in x[1:]:
            level = level + alpha * (float(v) - level)
        return pd.DataFrame(
            {
                "doc_id": [str(pdf["user_id"].iloc[0])],
                "n": [len(x)],
                "level": [level],
                "forecast": [level],
                "n_late": [0],  # a whole sorted series has no late rows
            }
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(fold_group, OUTPUT_SCHEMA)
    )


def run_update_stream(
    stateful: DataFrame, checkpoint_dir: str, table_name: str
) -> None:
    """Drain the stream with availableNow into a memory sink (update
    mode — latest row per key per batch)."""
    q = (
        stateful.writeStream.outputMode("update")
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_update_stream_durable(
    stateful: DataFrame, checkpoint_dir: str, out_dir: str
) -> None:
    """UPDATE-mode durable drain — unlike the memory sink, this
    supports CHECKPOINT RECOVERY: a killed query restarted against the
    same ``checkpoint_dir`` resumes from the recorded source offsets
    AND the state store, processing only new data (the production
    deployment shape for the stateful operator; update rows land per
    batch, downstream keeps the latest row per key). See
    continuous.run_durable for the recovery/idempotence semantics."""
    from fforma_spark.streaming.continuous import run_durable

    run_durable(stateful, checkpoint_dir, out_dir, "update")
