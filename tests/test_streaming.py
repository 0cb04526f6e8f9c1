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


def test_timeout_flush_preserves_session_numbering():
    """A processing-time timeout flush must KEEP the per-user session
    counter (review finding r4: state.remove() restarted numbering at 1,
    emitting a second, different session under an already-used
    (user_id, session_no) key and diverging from batch numbering).
    Drives _sessionize_fn directly with a fake GroupState."""
    import pandas as pd

    from terrier_spark.streaming.stateful import _sessionize_fn

    class FakeState:
        def __init__(self):
            self._s = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self._s is not None

        @property
        def get(self):
            return self._s

        def update(self, s):
            self._s = s

        def remove(self):
            self._s = None

        def setTimeoutDuration(self, ms):
            pass

    fn = _sessionize_fn(gap_s=10, emit_open=False)
    st = FakeState()

    def events(ts_s, eids):
        return pd.DataFrame(
            {
                "ts": pd.to_datetime(ts_s, unit="s"),
                "event_id": eids,
                "value": [1.0] * len(eids),
            }
        )

    # session 1 opens
    assert list(fn((7,), iter([events([0, 5], [1, 2])]), st)) == []
    # idle timeout: session 1 flushes, counter survives as a tombstone
    st.hasTimedOut = True
    flushed = list(fn((7,), iter([]), st))
    assert len(flushed) == 1 and flushed[0].iloc[0]["session_no"] == 1
    assert st.exists and st._s[1] == 1 and st._s[2] == 0
    # a second spurious timeout on the tombstone emits nothing
    assert list(fn((7,), iter([]), st)) == []
    # the user's next event opens session TWO, not a duplicate ONE
    st.hasTimedOut = False
    list(fn((7,), iter([events([100], [3])]), st))
    assert st._s[1] == 2
