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


def run_stream_over_parquet(
    spark: SparkSession, parquet_path: str, query_name: str = "events_agg"
) -> DataFrame:
    """Run the streaming plan over a parquet dir (or a single .parquet
    file — Spark's streaming file source needs a directory, so a bare
    file is staged into a temp dir first) via a memory sink; returns the
    final result as a (batch) DataFrame."""
    import os
    import shutil
    import tempfile

    if os.path.isfile(parquet_path):
        staged = tempfile.mkdtemp(prefix="ts_stream_")
        shutil.copy(parquet_path, os.path.join(staged, os.path.basename(parquet_path)))
        parquet_path = staged
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_path)
    )
    agg = windowed_agg(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(query_name)
