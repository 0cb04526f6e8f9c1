"""Structured Streaming parity: the streaming windowed agg over the
events table must equal the batch plan (Spark's batch/stream unification
is the contract; the reference has no streaming — SURVEY.md §2.11)."""

from terrier_spark.streaming.windows import run_stream_over_parquet, windowed_agg


def _norm(rows):
    return sorted(
        (str(r["window_start"]), r["event_type"], r["n_events"], float(r["total_value"]))
        for r in rows
    )


def test_stream_equals_batch(spark, sf_dir):
    path = f"{sf_dir}/events.parquet"
    batch = windowed_agg(spark.read.parquet(path))
    stream_result = run_stream_over_parquet(spark, path, query_name="t_events_agg")
    assert _norm(stream_result.collect()) == _norm(batch.collect())
    assert stream_result.count() > 0


def test_stateful_sessionize_equals_batch(spark, sf_dir):
    """applyInPandasWithState sessionizer == the batch window-function
    plan (q_sessionize) on (user, session_no, n_events, session_value)."""
    from terrier_spark.plans.relational import q_sessionize
    from terrier_spark.streaming.stateful import run_sessionize_over_parquet

    got = run_sessionize_over_parquet(
        spark, f"{sf_dir}/events.parquet", gap_s=1800, query_name="t_sessions"
    )
    got_rows = sorted(
        (r["user_id"], r["session_no"], r["n_events"], round(r["session_value"], 6))
        for r in got.collect()
    )
    exp_rows = sorted(
        (r["user_id"], r["session_no"], r["n_events"], round(r["session_value"], 6))
        for r in q_sessionize(spark, sf_dir).collect()
    )
    assert got_rows == exp_rows
    assert len(got_rows) > 0
