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


def test_event_time_sessionize_equals_batch(spark, sf_dir):
    """timeout_mode='event' (EventTimeTimeout keyed to the watermark)
    holds the same batch-parity contract as processing mode on the
    events table — with a watermark delay sized past the part files'
    out-of-orderness so no in-gap row is dropped as late."""
    from terrier_spark.plans.relational import q_sessionize
    from terrier_spark.streaming.stateful import run_sessionize_over_parquet

    got = run_sessionize_over_parquet(
        spark,
        f"{sf_dir}/events.parquet",
        gap_s=1800,
        query_name="t_sessions_evt",
        timeout_mode="event",
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


def test_processing_vs_event_timeout_split(spark, tmp_path):
    """The ADVICE-r4 divergence, demonstrated and resolved: on an
    identical staged timeline where a user's next event lands within
    gap_s of EVENT time but more than the idle timeout of WALL time
    after their previous micro-batch, processing mode splits the
    batch-semantics session in two, while event mode (watermark-keyed
    timers) keeps it whole — any event that could continue a session is
    beyond-watermark late by the time its timer can fire.

    Timeline (gap_s=4, event seconds; maxFilesPerTrigger=1 makes each
    file its own micro-batch):
      file A: user 1 @ ts 10,11,12 | processing run 1, then sleep 5 s wall
      file B: user 2 @ ts 13       | processing run 2 (batches B,C,D):
      file C: user 1 @ ts 14       |   the idle timer flushes user 1 in
      file D: user 1 @ ts 110      |   batch B, so ts 14 opens session 2
    Event mode runs ONCE over the same four files: watermark order is
    identical to the staged runs (it advances per micro-batch), wall
    time is irrelevant by construction, and no timer can fire before
    the watermark passes last_ts + gap — one unsplit session."""
    import glob
    import os
    import shutil
    import time

    from terrier_spark.streaming.stateful import sessionize_stream
    from terrier_spark.streaming.windows import EVENTS_SCHEMA, await_drained

    src = str(tmp_path / "src")
    os.makedirs(src)

    def add_file(name, rows):
        # rows: (event_id, ts_s, user_id)
        df = spark.createDataFrame(
            [(eid, t, uid, "click", 1.0, "{}") for eid, t, uid in rows],
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
            "event_type", "value", "props",
        )
        stage = str(tmp_path / "stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, name))

    def run_once(mode):
        cp = str(tmp_path / f"cp_{mode}")
        out_dir = str(tmp_path / f"out_{mode}")
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = sessionize_stream(
            stream, gap_s=4, emit_open=False, timeout_mode=mode,
            watermark="0 seconds",
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # A stateful availableNow query with armed processing-time
        # timers busy-loops after the last input row (see await_drained)
        # — wait for the drain signal, then stop it.
        await_drained(q, 180, f"split_{mode}")

    def closed_user1(mode):
        out_dir = str(tmp_path / f"out_{mode}")
        rows = spark.read.schema(
            "user_id long, session_no long, n_events long, "
            "session_value double, start_ts long, end_ts long"
        ).parquet(out_dir).filter("user_id = 1").collect()
        return sorted((r["session_no"], r["n_events"]) for r in rows)

    # ts starts at 10, not 0: the initial watermark is epoch 0 and the
    # late-row filter drops rows with eventTime <= watermark, so a
    # ts-0 event would vanish from the event-mode run before the
    # stateful operator ever saw it.
    add_file("a.parquet", [(1, 10, 1), (2, 11, 1), (3, 12, 1)])
    run_once("processing")
    time.sleep(5)  # wall idle > gap_s: arms the processing-time split
    add_file("b.parquet", [(4, 13, 2)])
    add_file("c.parquet", [(5, 14, 1)])
    add_file("d.parquet", [(6, 110, 1)])
    run_once("processing")
    run_once("event")

    # processing: session 1 (ts 10-12) was flushed by the idle timer, so
    # ts 14 opened session 2 — ONE batch-semantics session became two.
    # (A trailing (3, 1) row may follow when a late extra batch lands
    # > gap_s of wall time after batch D and idle-flushes the final
    # open session — that's the documented processing-mode contract,
    # not part of the split under test.)
    assert closed_user1("processing")[:2] == [(1, 3), (2, 1)]
    # event: one unsplit session carrying all four in-gap events; the
    # ts-100 session stays open (its timer sits past the final
    # watermark), so exactly one closed row.
    assert closed_user1("event") == [(1, 4)]
