"""Event-time SESSION-window sketch streaming (session_sketch_stream).

Asserts the sessionization contract: gap-splitting within and across
micro-batches, immediate emission of sessions closed by newer data,
watermark-timeout finalization of open sessions, straggler drop, and
stream ≡ batch (native F.session_window) equivalence on in-order input.
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sketchlib.agg import SketchSpec, load_state  # noqa: E402

EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)


def _write_batch(dir_: str, idx: int, rows: list[tuple[int, int, int]]) -> None:
    """rows: (seconds_after_epoch, user_id, value). Files written
    up-front get explicit ascending mtimes — the file stream source
    orders batches by modification time, and same-millisecond writes
    would otherwise arrive in arbitrary order (fatal for a
    watermark-dependent in-order test)."""
    tbl = pa.table(
        {
            "ts": pa.array(
                [EPOCH + dt.timedelta(seconds=s) for s, _, _ in rows],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([u for _, u, _ in rows], type=pa.int64()),
            "value": pa.array([v for _, _, v in rows], type=pa.int64()),
        }
    )
    path = os.path.join(dir_, f"batch{idx}.parquet")
    pq.write_table(tbl, path)
    t = 1_700_000_000 + idx * 10
    os.utime(path, (t, t))


def _run_session_stream(spark, src, ckpt, name, gap="60 seconds", delay="10 seconds"):
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    from sketchlib.streaming import session_sketch_stream

    schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("value", LongType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    out = session_sketch_stream(
        stream,
        "ts",
        ["user_id"],
        [SketchSpec("hll", "hll", "value", {"p": 12})],
        gap=gap,
        watermark_delay=delay,
    )
    return (
        out.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )


@pytest.fixture(scope="module")
def session_rows(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sess_src"))
    ckpt = str(tmp_path_factory.mktemp("sess_ckpt"))
    # batch 1: u1 session A (0,10,20); u2 session (5,15);
    #          u3 TWO sessions in one batch: (0,10) and (100,110)
    _write_batch(
        src,
        1,
        [(0, 1, 11), (10, 1, 12), (20, 1, 11), (5, 2, 21), (15, 2, 22),
         (0, 3, 31), (10, 3, 32), (100, 3, 33), (110, 3, 33)],
    )
    q = _run_session_stream(spark, src, ckpt, "sess_sink")
    try:
        q.processAllAvailable()
        # batch 1's max ts (110) advances the watermark to 100 at batch
        # end, and Spark's no-data micro-batch then fires the timeouts
        # for every session whose end+gap+delay < 100
        after_b1 = spark.sql("select * from sess_sink").collect()
        # batch 2: u1 opens session B at 200; u2's ts=65 is BELOW the
        # watermark (100) — a straggler that must be dropped, not merged
        _write_batch(src, 2, [(200, 1, 13), (210, 1, 14), (65, 2, 21)])
        q.processAllAvailable()
        after_b2 = spark.sql("select * from sess_sink").collect()
        _write_batch(src, 3, [(1000, 9, 1)])
        q.processAllAvailable()
        _write_batch(src, 4, [(1010, 9, 1)])
        q.processAllAvailable()
        _write_batch(src, 5, [(1020, 9, 1)])
        q.processAllAvailable()
        # watermark-timeout finalizations ride Spark's NO-DATA
        # micro-batch, which processAllAvailable does not always wait
        # for under load — poll until the five expected non-u9 sessions
        # have landed (bounded; exactly-once is still asserted by the
        # tests, this only waits for arrival, never filters). Under a
        # loaded host the no-data batch may not fire at all within the
        # window (observed in a full-suite run), so each poll also
        # NUDGES with one more u9 event: state timeouts are evaluated
        # in every DATA micro-batch too, and u9 is excluded from all
        # assertions, so the nudge cannot change the expected output.
        import time as _time

        deadline = _time.time() + 60
        nudge_idx, nudge_ts = 6, 1030
        while _time.time() < deadline:
            rows = spark.sql("select * from sess_sink").collect()
            if sum(1 for r in rows if r["user_id"] != 9) >= 5:
                break
            _write_batch(src, nudge_idx, [(nudge_ts, 9, 1)])
            nudge_idx += 1
            nudge_ts += 10
            q.processAllAvailable()
            _time.sleep(0.5)
        rows = spark.sql("select * from sess_sink").collect()
    finally:
        q.stop()
    return after_b1, after_b2, rows


def _key(r):
    return (r["user_id"], (r["session_start"] - EPOCH).total_seconds())


def test_watermark_finalizes_closed_sessions(session_rows):
    after_b1, _, _ = session_rows
    # u3's first session was closed by its own batch's later rows; the
    # others by the watermark timeout (end+gap+delay < 100)
    assert {_key(r) for r in after_b1} == {(1, 0.0), (2, 5.0), (3, 0.0)}
    u3 = [r for r in after_b1 if _key(r) == (3, 0.0)][0]
    assert (u3["session_end"] - EPOCH).total_seconds() == 10.0
    assert u3["n_updates"] == 2


def test_open_session_not_emitted_early(session_rows):
    _, after_b2, _ = session_rows
    keys = {_key(r) for r in after_b2}
    assert (1, 200.0) not in keys  # u1's session B still open
    # u3's second session (timeout 180 < new watermark 200) finalized
    assert (3, 100.0) in keys


def test_all_sessions_finalize_exactly_once(session_rows):
    *_, rows = session_rows
    keyed = {}
    for r in rows:
        if r["user_id"] == 9:
            continue
        keyed.setdefault(_key(r), []).append(r)
    expect = {
        (1, 0.0): (20.0, 3, 2),     # end, n_updates, distinct values
        (1, 200.0): (210.0, 2, 2),
        (2, 5.0): (15.0, 2, 2),
        (3, 0.0): (10.0, 2, 2),
        (3, 100.0): (110.0, 2, 1),
    }
    assert set(keyed) == set(expect)
    for k, rs in keyed.items():
        assert len(rs) == 1, f"session {k} emitted {len(rs)} times"
        end, n, distinct = expect[k]
        r = rs[0]
        assert (r["session_end"] - EPOCH).total_seconds() == end
        assert r["n_updates"] == n
        assert round(load_state(bytes(r["state"])).count()) == distinct


def test_straggler_dropped(session_rows):
    *_, rows = session_rows
    # u2's late ts=65 row (below watermark) was not merged into its
    # already-finalized session, and never resurrected a new one
    u2 = [r for r in rows if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["n_updates"] == 2


def test_stream_equals_batch_sessionization(spark, tmp_path_factory):
    """In-order stream of many users: finalized (user, start, end,
    n_updates) must equal the native batch F.session_window answer."""
    src = str(tmp_path_factory.mktemp("eq_src"))
    ckpt = str(tmp_path_factory.mktemp("eq_ckpt"))
    # deterministic corpus: 12 users, events with gaps straddling 60s
    rows = []
    for u in range(12):
        t = u * 3
        for i in range(9):
            t += 20 + ((u * 7 + i * 13) % 80)  # gaps 20..99 vs gap=60
            rows.append((t, u, (u * 10 + i) % 17))
    rows.sort()
    third = len(rows) // 3
    _write_batch(src, 1, rows[:third])
    _write_batch(src, 2, rows[third : 2 * third])
    _write_batch(src, 3, rows[2 * third :])
    top = max(r[0] for r in rows)
    _write_batch(src, 4, [(top + 5000, 99, 1)])
    _write_batch(src, 5, [(top + 5010, 99, 1)])
    q = _run_session_stream(spark, src, ckpt, "eq_sink")
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], (r["session_start"] - EPOCH).total_seconds(),
             (r["session_end"] - EPOCH).total_seconds(), r["n_updates"])
            for r in spark.sql("select * from eq_sink").collect()
            if r["user_id"] != 99
        }
    finally:
        q.stop()
    df = spark.createDataFrame(
        [(EPOCH + dt.timedelta(seconds=s), u, v) for s, u, v in rows],
        "ts timestamp, user_id long, value long",
    )
    batch = {
        (
            r["user_id"],
            (r["win"]["start"] - EPOCH).total_seconds(),
            (r["last"] - EPOCH).total_seconds(),
            r["n"],
        )
        for r in df.groupBy(
            "user_id", F.session_window("ts", "60 seconds").alias("win")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.max("ts").alias("last"))
        .collect()
    }
    assert got == batch and len(got) > 12
