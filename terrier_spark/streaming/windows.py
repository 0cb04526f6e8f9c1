"""Streaming windowed aggregation over the events stream.

The same logical plan as plans/relational.q_events_tumbling, expressed
as a Structured Streaming job: file source → watermark → tumbling window
agg → sink.  Tests run it on the testdata events parquet with a memory
sink in 'complete' mode and assert equality with the batch result —
the streaming/batch parity Spark guarantees for windowed aggs.

At production scale the source is Kafka/Iceberg-CDC and the sink is an
Iceberg table in append mode with a watermark bounding state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_agg(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour per-event-type counts/sums (streaming-safe plan)."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.bround(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stage_parquet_dir(parquet_path: str, prefix: str = "ts_stream_") -> str:
    """Spark's streaming file source needs a DIRECTORY: stage a bare
    .parquet file into a temp dir (pass-through for dirs).  The staged
    copy is registered for interpreter-exit removal — repeated
    test/bench runs used to leak one full parquet copy per invocation
    into TMPDIR (tmpfs RAM under a /dev/shm TMPDIR — review finding
    r4).  Shared by windows and stateful runners (was copy-pasted)."""
    import atexit
    import os
    import shutil
    import tempfile

    if not os.path.isfile(parquet_path):
        return parquet_path
    staged = tempfile.mkdtemp(prefix=prefix)
    shutil.copy(parquet_path, os.path.join(staged, os.path.basename(parquet_path)))
    atexit.register(shutil.rmtree, staged, ignore_errors=True)
    return staged


def await_drained(q, timeout_s: int, query_name: str) -> None:
    """Wait until the query has processed EVERY available input row,
    then return — raising if it is still chewing data at the deadline
    (review finding r4: the old bare awaitTermination(timeout) ignored
    its boolean, so a stream still mid-drain yielded a silently partial
    memory table that was compared as if complete).

    Termination alone is the wrong signal: a stateful availableNow
    query whose groups registered processing-time timers does NOT
    terminate after the last input row — Spark busy-loops empty
    micro-batches (observed ~2/s) until every timer expires, and the
    sessionizer's timers are gap_s long.  (The old code silently relied
    on this: awaitTermination(180) expired, the complete table was
    read, and the spinning query was LEAKED for the rest of the
    session, burning executor time on 0-row batches.)  So the loop
    accepts either (a) clean termination, or (b) two consecutive polls
    whose most recent COMPLETED trigger processed 0 input rows with no
    data pending — availableNow snapshots its input, so nothing new
    can arrive — after which the drained query is stopped explicitly.
    Only a query still chewing input at the deadline raises."""
    import time

    deadline = time.monotonic() + timeout_s
    drained_polls = 0
    while time.monotonic() < deadline:
        if q.awaitTermination(2):
            return
        lp = q.lastProgress
        if (
            lp is not None
            and lp.get("numInputRows", 1) == 0
            and not q.status.get("isDataAvailable", True)
        ):
            drained_polls += 1
            if drained_polls >= 2:
                q.stop()
                q.awaitTermination(30)
                return
        else:
            drained_polls = 0
    q.stop()
    raise TimeoutError(
        f"stream {query_name!r} did not drain within {timeout_s}s; "
        "partial results discarded"
    )


def run_stream_over_parquet(
    spark: SparkSession, parquet_path: str, query_name: str = "events_agg"
) -> DataFrame:
    """Run the streaming plan over a parquet dir (or a single .parquet
    file, staged via stage_parquet_dir) with a memory sink; returns the
    final result as a (batch) DataFrame."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_parquet_dir(parquet_path))
    )
    agg = windowed_agg(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q, 120, query_name)
    return spark.table(query_name)
