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
