"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2.11 — the reference has no
streaming surface; this is the Spark-superset analog of its WAL/replay
state machinery re-expressed as managed per-key state).

Semantics match plans/relational.q_sessionize: a new session starts
when the gap from the previous event of the same user exceeds
``gap_s``.  In streaming mode the state handle keeps (last_ts,
session_no, running aggregates) per user; a processing-time timeout
flushes idle users' open sessions.

Tests drive the operator over the events parquet as an
availableNow file stream and assert the CLOSED-session results equal
the batch window-function plan — the streaming/batch parity contract.

Two timeout modes (``timeout_mode``), because the idle-flush guarantee
and exact gap-session parity are genuinely different contracts
(ADVICE r4, closed in r5 by implementing the event-time dual):

  * ``"processing"`` (default) — wall-clock idle flush.  A user idle
    for ``gap_s`` of PROCESSING time gets their open session closed
    even if the source stalls.  Divergence: a user whose next event
    arrives more than the timeout after the previous micro-batch — but
    within ``gap_s`` of last_ts in EVENT time — has one batch-semantics
    session split into two (demonstrated, not just documented, by
    tests/test_streaming.py::test_processing_vs_event_timeout_split).
  * ``"event"`` — ``GroupStateTimeout.EventTimeTimeout`` keyed to the
    stream's watermark: the timer fires only when the WATERMARK passes
    last_ts + gap_s, and any event that could continue the session is
    by then beyond-watermark late (dropped by contract), so a session
    is never split — true batch parity on an unbounded stream.  The
    trade: a stalled source stops the watermark and sessions stay open
    indefinitely.  Pick per workload.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

from terrier_spark.streaming.windows import EVENTS_SCHEMA

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_no", LongType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
        StructField("start_ts", LongType()),
        StructField("end_ts", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("session_no", LongType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
        StructField("start_ts", LongType()),
    ]
)


def _sessionize_fn(gap_s: int, emit_open: bool, timeout_mode: str = "processing"):
    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                last_ts, sno, n, val, start = state.get
                if n > 0:
                    # Flush the open session but KEEP the session
                    # counter as a tombstone (last_ts=None marks "no
                    # open session"): state.remove() here restarted the
                    # user's numbering at 1 on their next event,
                    # emitting a second, different session under an
                    # already-used (user_id, session_no) key and
                    # diverging from the batch numbering (review
                    # finding r4).  Tombstones are 5 longs per
                    # ever-seen user — the same bound as any
                    # dedup-by-key stream; no new timeout is scheduled
                    # for them, so this branch never re-fires for a
                    # flushed user.
                    state.update((None, sno, 0, 0.0, None))
                    yield pd.DataFrame(
                        [[user_id, sno, n, val, start, last_ts]],
                        columns=[f.name for f in SESSION_SCHEMA.fields],
                    )
            return
        rows = pd.concat(list(pdfs))
        if not len(rows):
            return
        rows = rows.sort_values(["ts", "event_id"])
        ts = (rows["ts"].astype("int64") // 10**9).to_numpy()
        vals = rows["value"].to_numpy()
        if state.exists:
            last_ts, sno, n, val, start = state.get
        else:
            last_ts, sno, n, val, start = None, 0, 0, 0.0, None
        closed = []
        for t, v in zip(ts, vals):
            if last_ts is None or t - last_ts > gap_s:
                if n > 0:
                    closed.append([user_id, sno, n, round(val, 6), start, last_ts])
                sno, n, val, start = sno + 1, 0, 0.0, int(t)
            n += 1
            val += float(v)
            last_ts = int(t)
        state.update((last_ts, sno, n, val, start))
        if timeout_mode == "event":
            # Fire when the WATERMARK passes the event-time gap.  Spark
            # rejects a timeout at-or-before the current watermark, so a
            # group whose gap already elapsed (old rows surfacing after
            # other users advanced the watermark) is clamped to wm+1 —
            # it times out at the next watermark advance.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max((last_ts + gap_s) * 1000, wm + 1))
        else:
            state.setTimeoutDuration(gap_s * 1000)
        out = closed
        if emit_open and n > 0:
            out = closed + [[user_id, sno, n, round(val, 6), start, last_ts]]
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in SESSION_SCHEMA.fields]
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_s: int = 1800,
    emit_open: bool = False,
    timeout_mode: str = "processing",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-user gap sessionization with managed state.  ``emit_open``
    additionally emits the still-open session per batch (used in
    availableNow tests so the final state is observable).
    ``timeout_mode``: "processing" (wall-clock idle flush) or "event"
    (watermark-keyed, exact batch parity — see module docstring);
    "event" applies ``watermark`` to the ts column, since
    EventTimeTimeout requires one."""
    if timeout_mode not in ("processing", "event"):
        raise ValueError(f"timeout_mode must be processing|event, got {timeout_mode!r}")
    if timeout_mode == "event" and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    conf = (
        GroupStateTimeout.EventTimeTimeout
        if timeout_mode == "event"
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_s, emit_open, timeout_mode),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )


def run_sessionize_over_parquet(
    spark: SparkSession,
    parquet_path: str,
    gap_s: int = 1800,
    query_name: str = "sessions",
    timeout_mode: str = "processing",
    watermark: str = "30 days",
) -> DataFrame:
    """availableNow file-stream run of the stateful sessionizer over an
    events parquet; returns collected session rows (closed + the final
    open session per user, since the stream ends).  The default
    ``watermark`` for event mode is deliberately wider than the events
    table's time span: parquet part files are not time-ordered, so a
    tight watermark would drop in-gap rows as late and break batch
    parity — size the delay to the source's out-of-orderness."""
    from terrier_spark.streaming.windows import await_drained, stage_parquet_dir

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_parquet_dir(parquet_path, prefix="ts_sess_"))
    )
    out = sessionize_stream(
        stream,
        gap_s=gap_s,
        emit_open=True,
        timeout_mode=timeout_mode,
        watermark=watermark,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q, 180, query_name)
    return spark.table(query_name)
