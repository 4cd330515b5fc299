"""Event-time windowed sketch streaming (applyInPandasWithState).

Feeds a file-source stream micro-batch by micro-batch and asserts:

- a window is finalized exactly once, only after the watermark passes
  window_end + delay,
- finalized HLL states give the exact distinct count of the window's
  on-time rows (small cardinalities are exact under HLL linear counting),
- a straggler row older than the watermark can NOT resurrect or
  double-emit an already-finalized window,
- n_updates matches the on-time row count per window.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sketchlib.agg import SketchSpec, load_state  # noqa: E402

EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)


def _write_batch(dir_: str, idx: int, rows: list[tuple[int, int]]) -> None:
    """rows: (seconds_after_epoch, user_id)"""
    ts = [EPOCH + dt.timedelta(seconds=s) for s, _ in rows]
    users = [u for _, u in rows]
    tbl = pa.table(
        {
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(users, type=pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(dir_, f"batch{idx}.parquet"))


@pytest.fixture(scope="module")
def windowed_rows(spark, tmp_path_factory):
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    from sketchlib.streaming import windowed_sketch_stream

    src = str(tmp_path_factory.mktemp("win_src"))
    ckpt = str(tmp_path_factory.mktemp("win_ckpt"))
    schema = StructType(
        [StructField("ts", TimestampType()), StructField("user_id", LongType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = windowed_sketch_stream(
        stream,
        "ts",
        [],
        [SketchSpec("hll", "hll", "user_id", {"p": 12})],
        window_duration="1 minute",
        watermark_delay="30 seconds",
    )
    # batch 1: window0 [0,60) users {1,2,3}; window1 [60,120) users {1,2}
    _write_batch(src, 1, [(0, 1), (10, 2), (20, 3), (61, 1), (70, 2)])
    q = (
        out.writeStream.format("memory")
        .queryName("win_sink")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: window2 [120,180) users {7,8}; max ts 170 -> watermark 140
        _write_batch(src, 2, [(120, 7), (150, 8), (170, 7)])
        q.processAllAvailable()
        after_b2 = spark.sql("select * from win_sink").collect()
        # batch 3: fresh row far in the future (advances watermark to 370)
        # plus a straggler for the already-expiring window0 (ts=50 < wm)
        _write_batch(src, 3, [(400, 9), (50, 99)])
        q.processAllAvailable()
        # batch 4: empty-ish nudge so timeouts fire against watermark 370
        _write_batch(src, 4, [(410, 9)])
        q.processAllAvailable()
        _write_batch(src, 5, [(420, 9)])
        q.processAllAvailable()
        rows = spark.sql("select * from win_sink").collect()
    finally:
        q.stop()
    return after_b2, rows


def _starts(rows):
    return sorted((r["window_start"] - EPOCH).total_seconds() for r in rows)


def test_no_emission_before_watermark(windowed_rows):
    after_b2, _ = windowed_rows
    # during batch 2 the watermark was still 0 (set from batch 1 at its
    # end); nothing may be finalized yet
    assert _starts(after_b2) in ([], [0.0])


def test_windows_finalize_exactly_once(windowed_rows):
    _, rows = windowed_rows
    starts = _starts(rows)
    # windows 0,60,120 must be finalized exactly once; the 390/420
    # windows are still open (watermark <= end+delay)
    assert starts == [0.0, 60.0, 120.0]


def test_finalized_states_are_exact(windowed_rows):
    _, rows = windowed_rows
    expect = {0.0: (3, 3), 60.0: (2, 2), 120.0: (2, 3)}  # (distinct, n_rows)
    for r in rows:
        start = (r["window_start"] - EPOCH).total_seconds()
        distinct, n_rows = expect[start]
        hll = load_state(bytes(r["state"]))
        assert r["sketch"] == "hll"
        assert r["n_updates"] == n_rows
        # tiny cardinalities sit in HLL linear-counting range: exact
        assert round(hll.count()) == distinct


def test_straggler_dropped(windowed_rows):
    _, rows = windowed_rows
    w0 = [r for r in rows if (r["window_start"] - EPOCH).total_seconds() == 0.0]
    assert len(w0) == 1
    hll = load_state(bytes(w0[0]["state"]))
    assert round(hll.count()) == 3  # user 99 (late) not absorbed


def test_sliding_windows(spark, tmp_path_factory):
    """60s windows sliding by 30s: every row lands in exactly two
    windows; finalized counts match per-window exact distincts."""
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    from sketchlib.streaming import windowed_sketch_stream

    src = str(tmp_path_factory.mktemp("slide_src"))
    ckpt = str(tmp_path_factory.mktemp("slide_ckpt"))
    schema = StructType(
        [StructField("ts", TimestampType()), StructField("user_id", LongType())]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = windowed_sketch_stream(
        stream,
        "ts",
        [],
        [SketchSpec("hll", "hll", "user_id", {"p": 12})],
        window_duration="1 minute",
        watermark_delay="10 seconds",
        slide_duration="30 seconds",
    )
    # rows at t=40 (windows [-20,40+20) -> starts 0 and 30... i.e.
    # [0,60) and [30,90)) and t=70 ([30,90) and [60,120))
    _write_batch(src, 1, [(40, 1), (41, 2), (70, 3)])
    q = (
        out.writeStream.format("memory")
        .queryName("slide_sink")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(src, 2, [(400, 9)])
        q.processAllAvailable()
        _write_batch(src, 3, [(430, 9)])
        q.processAllAvailable()
        rows = spark.sql("select * from slide_sink").collect()
    finally:
        q.stop()
    got = {
        (r["window_start"] - EPOCH).total_seconds(): (
            round(load_state(bytes(r["state"])).count()),
            r["n_updates"],
        )
        for r in rows
        if (r["window_start"] - EPOCH).total_seconds() < 300
    }
    assert got == {0.0: (2, 2), 30.0: (3, 3), 60.0: (1, 1)}


def test_restart_resumes_state(spark, tmp_path_factory):
    """Kill the query after ingesting window0's rows (nothing emitted
    yet — watermark still 0), restart from the same checkpoint, then
    advance the watermark: window0 must finalize exactly once with the
    pre-restart HLL state intact (distinct=3), proving the kernels
    live in the fault-tolerant state store, not in process memory."""
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    from sketchlib.streaming import windowed_sketch_stream

    src = str(tmp_path_factory.mktemp("restart_src"))
    ckpt = str(tmp_path_factory.mktemp("restart_ckpt"))
    sink_dir = str(tmp_path_factory.mktemp("restart_sink"))
    schema = StructType(
        [StructField("ts", TimestampType()), StructField("user_id", LongType())]
    )

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = windowed_sketch_stream(
            stream,
            "ts",
            [],
            [SketchSpec("hll", "hll", "user_id", {"p": 12})],
            window_duration="1 minute",
            watermark_delay="10 seconds",
        )
        # memory sink cannot recover from a checkpoint; the parquet
        # sink is the fault-tolerant one (exactly-once file log)
        return (
            out.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    _write_batch(src, 1, [(0, 1), (10, 2), (20, 3)])
    q1 = start()
    q1.processAllAvailable()
    q1.stop()  # state for window0 lives only in the checkpoint now

    _write_batch(src, 2, [(300, 9)])
    _write_batch(src, 3, [(330, 9)])
    q2 = start()
    try:
        q2.processAllAvailable()
        rows = spark.read.parquet(sink_dir).collect()
    finally:
        q2.stop()
    w0 = [r for r in rows if (r["window_start"] - EPOCH).total_seconds() == 0.0]
    assert len(w0) == 1
    assert w0[0]["n_updates"] == 3
    assert round(load_state(bytes(w0[0]["state"])).count()) == 3


def test_windowed_ddsketch_states(spark, tmp_path_factory):
    """r5 kernel through the windowed stateful operator: per-window
    DDSketch states finalize with exact n and a median within alpha of
    the true per-window median (values here are small ints, so the
    relative bound pins them to the exact bucket)."""
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    from sketchlib.streaming import windowed_sketch_stream

    src = str(tmp_path_factory.mktemp("win_dd_src"))
    ckpt = str(tmp_path_factory.mktemp("win_dd_ckpt"))
    schema = StructType(
        [StructField("ts", TimestampType()), StructField("user_id", LongType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = windowed_sketch_stream(
        stream,
        "ts",
        [],
        [SketchSpec("dd", "ddsketch", "user_id", {"alpha": 0.01})],
        window_duration="1 minute",
        watermark_delay="30 seconds",
    )
    # window0 [0,60): values 10,20,30; window1 [60,120): 40,50
    _write_batch(src, 1, [(0, 10), (10, 20), (20, 30), (61, 40), (70, 50)])
    q = (
        out.writeStream.format("memory")
        .queryName("win_dd_sink")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # push the watermark far past both windows so they finalize
        _write_batch(src, 2, [(400, 1)])
        q.processAllAvailable()
        _write_batch(src, 3, [(500, 1)])
        q.processAllAvailable()
        rows = spark.sql("select * from win_dd_sink").collect()
    finally:
        q.stop()
    got = {
        (r["window_start"] - EPOCH).total_seconds(): load_state(bytes(r["state"]))
        for r in rows
        if (r["window_start"] - EPOCH).total_seconds() < 120
    }
    assert set(got) == {0.0, 60.0}
    dd0, dd1 = got[0.0], got[60.0]
    assert dd0.n == 3 and dd1.n == 2
    assert abs(dd0.quantile(0.5) - 20.0) <= 0.01 * 20.0
    assert abs(dd1.quantile(0.5) - 40.0) <= 0.01 * 40.0
