"""Deterministic release of library-internal caches (sketchlib.caches).

ADVICE r3: global_offsets (and the dedup/ANN pair finders) persist an
intermediate they cannot unpersist themselves; every call used to leak
one cached DataFrame for the session's lifetime. The registry makes
release explicit and targeted — the caller's own persisted frames are
never touched.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import functions as F

from sketchlib import caches


def test_global_offsets_cache_registered_and_released(spark):
    from sketchlib.tokenops import global_offsets

    caches.release_caches()  # clean slate
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7 + 1).alias("ln")
    )
    before = caches.active_count()
    out = global_offsets(df, "id", F.col("ln").cast("bigint"))
    assert caches.active_count() == before + 1
    rows = out.select(F.sum("__start").alias("s")).collect()
    assert rows[0]["s"] is not None
    released = caches.release_caches()
    assert released >= 1
    assert caches.active_count() == 0


def test_release_does_not_touch_caller_persists(spark):
    caches.release_caches()
    mine = spark.range(100).persist(StorageLevel.MEMORY_ONLY)
    mine.count()
    assert mine.storageLevel.useMemory
    from sketchlib.tokenops import global_offsets

    out = global_offsets(
        spark.range(200).select("id", F.lit(1).alias("ln")),
        "id",
        F.col("ln").cast("bigint"),
    )
    out.count()
    caches.release_caches()
    # the caller's own cache is still persisted after release
    assert mine.storageLevel.useMemory
    mine.unpersist()


def test_release_is_idempotent_and_safe(spark):
    caches.release_caches()
    assert caches.release_caches() == 0
    # registering then double-releasing must not raise
    df = spark.range(10).persist()
    caches.register(df)
    df.count()
    assert caches.release_caches() == 1
    assert caches.release_caches() == 0


def test_owner_scoped_release_leaves_other_operators_caches(spark):
    """ADVICE r4: a scoped release must drop only its own operator's
    persists — another operator's correctness-load-bearing cache (e.g.
    global_offsets' sampled range partitioning) stays cached."""
    caches.release_caches()
    a = caches.register(spark.range(10).persist(), owner="op.a")
    b = caches.register(spark.range(20).persist(), owner="op.b")
    a.count(), b.count()
    assert caches.active_count() == 2
    assert caches.active_count("op.a") == 1
    assert caches.release_caches("op.a") == 1
    assert caches.active_count("op.a") == 0
    # op.b untouched, still persisted
    assert caches.active_count("op.b") == 1
    assert b.storageLevel.useMemory
    assert caches.release_caches() == 1


def test_global_offsets_registers_under_its_owner(spark):
    from sketchlib.tokenops import global_offsets

    caches.release_caches()
    out = global_offsets(
        spark.range(300).select("id", F.lit(2).alias("ln")),
        "id",
        F.col("ln").cast("bigint"),
    )
    assert caches.active_count("tokenops.global_offsets") == 1
    out.count()
    # the documented deterministic-release call for this operator
    assert caches.release_caches("tokenops.global_offsets") == 1
    assert caches.active_count() == 0


def test_cache_handle_single_registration_release(spark):
    caches.release_caches()
    df = caches.register(spark.range(5).persist(), owner="op.h")
    h = caches.handle_for(df)
    df.count()
    assert h.release() is True
    assert h.release() is False  # idempotent
    assert caches.active_count() == 0
    assert caches.release_caches() == 0


def test_registry_is_thread_safe():
    """Concurrent register/release from job threads must not corrupt
    the registry (ADVICE r4: the bare list was unsynchronized)."""
    import threading

    class FakeDF:  # no Spark needed: registry only calls .unpersist()
        def unpersist(self):
            return self

    caches.release_caches()
    errs = []

    def worker(i):
        try:
            for _ in range(200):
                caches.register(FakeDF(), owner=f"t{i % 4}")
                caches.release_caches(f"t{i % 4}")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errs
    caches.release_caches()
    assert caches.active_count() == 0
