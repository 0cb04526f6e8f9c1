"""Data-derived shuffle partition sizing (VERDICT r2 scale-weak fix).

The aligned build's task count must grow with input BYTES, not core
count: each task buffers ~one pidx bucket of content in Arrow form, so
at fixed parallelism per-task memory grows linearly with data.
"""

from terrier_spark.operators import index_build as ib

SF_DIR = "/root/testdata/sf0.001"


def test_floor_is_core_count_at_small_scale(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    floor = max(spark.sparkContext.defaultParallelism, 8)
    assert ib._data_parts(docs) == floor


def test_parts_scale_with_estimated_bytes(spark, monkeypatch):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # Shrink the per-task budget so the real (small) file exceeds it:
    # partition count must now exceed the core-count floor and scale
    # ~linearly with est_bytes / budget.
    monkeypatch.setattr(ib, "TARGET_TASK_BYTES", 1024)
    floor = max(spark.sparkContext.defaultParallelism, 8)
    big = ib._data_parts(docs)
    assert big > floor
    monkeypatch.setattr(ib, "TARGET_TASK_BYTES", 2048)
    assert abs(ib._data_parts(docs) - -(-big // 2)) <= 1


def test_sentinel_estimates_fall_back_to_floor(spark):
    # A plan Catalyst can't size (in-memory local relation inflated via
    # a non-deterministic-ish transform still sizes fine, so force the
    # sentinel path by feeding a DataFrame whose stats call raises).
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    class Broken:
        def __getattr__(self, name):
            raise RuntimeError("no stats")

    docs_broken = docs.limit(5)
    docs_broken.__dict__["_jdf"] = Broken()
    floor = max(spark.sparkContext.defaultParallelism, 8)
    assert ib._data_parts(docs_broken) == floor


def test_fallback_logs_visible_degradation_warning(spark, caplog):
    """When the private sizeInBytes probe is unavailable the build falls
    back to core-count-derived partitions — the r2 scale-weak mode.
    That degradation must be VISIBLE (VERDICT r3 hygiene #3): a warning
    is logged once per process."""
    import logging

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(5)
    docs.__dict__["_jdf"] = None  # any attribute access raises
    ib._WARNED_NO_SIZE_STATS = False
    with caplog.at_level(logging.WARNING, logger="terrier_spark.index_build"):
        ib._data_parts(docs)
    assert any("sizeInBytes unavailable" in r.message for r in caplog.records)
    # once per process: a second fallback stays quiet
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="terrier_spark.index_build"):
        ib._data_parts(docs)
    assert not caplog.records
