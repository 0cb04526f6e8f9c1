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

Known divergence (ADVICE r4): the idle-flush timer is PROCESSING-time,
so on a long-running stream a user whose next event arrives more than
the timeout after the previous MICRO-BATCH — but within ``gap_s`` of
last_ts in EVENT time — gets one batch-semantics session split into
two closed sessions.  The availableNow tests hold parity because they
drain before the 1800 s timers fire; exact gap-session parity on an
unbounded stream needs EventTimeTimeout keyed to a watermark
(timestamp-typed state + ``GroupStateTimeout.EventTimeTimeout``),
which trades the idle-flush guarantee: a stalled SOURCE then never
closes sessions.  The processing-time choice is deliberate for the
ingest-monitoring use here; pick per workload.
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


def _sessionize_fn(gap_s: int, emit_open: bool):
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
    events: DataFrame, gap_s: int = 1800, emit_open: bool = False
) -> DataFrame:
    """Per-user gap sessionization with managed state.  ``emit_open``
    additionally emits the still-open session per batch (used in
    availableNow tests so the final state is observable)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_s, emit_open),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_sessionize_over_parquet(
    spark: SparkSession,
    parquet_path: str,
    gap_s: int = 1800,
    query_name: str = "sessions",
) -> DataFrame:
    """availableNow file-stream run of the stateful sessionizer over an
    events parquet; returns collected session rows (closed + the final
    open session per user, since the stream ends)."""
    from terrier_spark.streaming.windows import await_drained, stage_parquet_dir

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_parquet_dir(parquet_path, prefix="ts_sess_"))
    )
    out = sessionize_stream(stream, gap_s=gap_s, emit_open=True)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q, 180, query_name)
    return spark.table(query_name)
