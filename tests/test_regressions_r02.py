"""Regression tests for the round-1 ADVICE defects (ADVICE.md r01):

1. agg.build_partials must reject per-ROW misaligned value/weight nulls
   even when per-group null counts coincide.
2. topk_exact_rescore must not silently truncate when a group has fewer
   than k distinct candidates but a positive residual bound.
3. hashing.unique_counts must handle dense uint64 ranges >= 2^63.
"""

import numpy as np
import pytest


def test_unique_counts_uint64_high_range():
    from sketchlib.hashing import unique_counts

    vals = np.arange(5, dtype=np.uint64) + np.uint64(2**63)
    vals = np.concatenate([vals, vals[:2]])  # dupes
    u, c = unique_counts(vals)
    assert u.dtype == np.uint64
    ru, rc = np.unique(vals, return_counts=True)
    assert np.array_equal(u, ru)
    assert np.array_equal(c, rc)


def test_unique_counts_negative_dense():
    from sketchlib.hashing import unique_counts

    vals = np.array([-5, -5, -3, 0, 2, 2, 2], dtype=np.int64)
    u, c = unique_counts(vals)
    assert np.array_equal(u, np.array([-5, -3, 0, 2]))
    assert np.array_equal(c, np.array([2, 1, 1, 3]))


def test_weighted_tdigest_rejects_row_misaligned_nulls(spark):
    """Equal per-group null COUNTS but nulls on different rows must
    raise, not silently pair values with wrong rows' weights."""
    from sketchlib.agg import SketchSpec, build_partials

    rows = [
        ("a", None, 1.0),
        ("a", 2.0, None),
        ("a", 3.0, 3.0),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double").coalesce(1)
    spec = SketchSpec("td", "tdigest", "v", {"delta": 100.0}, weight_col="w")
    with pytest.raises(Exception, match="misaligned"):
        build_partials(df, ["g"], [spec]).collect()


def test_weighted_tdigest_aligned_nulls_ok(spark):
    """Nulls on the SAME rows are a legal weighted stream."""
    from sketchlib.agg import SketchSpec, build_partials
    from sketchlib.tdigest import TDigest

    rows = [("a", None, None), ("a", 2.0, 1.0), ("a", 3.0, 4.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double").coalesce(1)
    spec = SketchSpec("td", "tdigest", "v", {"delta": 100.0}, weight_col="w")
    out = build_partials(df, ["g"], [spec]).collect()
    td = TDigest.from_bytes(bytes(out[0]["state"]))
    assert td.count() == 5.0  # 1 + 4
    assert td.min == 2.0 and td.max == 3.0


def test_topk_rescore_exact_when_k_exceeds_candidates(spark):
    """k > candidates_per_part with a positive residual bound: the old
    certificate never flagged the group; the result silently missed
    values. Must now match the exact top-k."""
    from pyspark.sql import functions as F

    from sketchlib.topk import topk_exact_rescore

    # 40 distinct values, near-flat counts, single partition so the
    # candidate pass emits only candidates_per_part=8 of them
    rows = [(f"v{i:02d}", j) for i in range(40) for j in range(2 + (i % 3))]
    df = (
        spark.createDataFrame(rows, "value string, j int")
        .select(F.lit("g").alias("grp"), "value")
        .coalesce(1)
    )
    k = 20
    got = topk_exact_rescore(df, ["grp"], "value", k=k, candidates_per_part=8)
    got_pd = got.toPandas().sort_values(["cnt", "value"], ascending=[False, True], ignore_index=True)
    exact = (
        df.groupBy("grp", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("value"))
        .limit(k)
        .toPandas()
        .sort_values(["cnt", "value"], ascending=[False, True], ignore_index=True)
    )
    assert len(got_pd) == k
    assert got_pd[["value", "cnt"]].equals(exact[["value", "cnt"]])


def test_bloom_insert_returns_was_new():
    """Reference insert -> 'was previously absent' (bloomfilter.rs:
    256-263): batch semantics must equal element-at-a-time inserts,
    including intra-batch duplicates."""
    import numpy as np

    from sketchlib.bloom import BloomFilter

    vals = np.array([5, 7, 5, 9, 7, 11, 5], dtype=np.int64)
    batch = BloomFilter(4096, 4, seed=3)
    got = batch.insert(vals)
    seq = BloomFilter(4096, 4, seed=3)
    want = []
    for x in vals:
        a = np.array([x], dtype=np.int64)
        want.append(not bool(seq.query(a)[0]))
        seq.update(a)
    assert got.tolist() == want
    assert np.array_equal(batch.bits, seq.bits)
    # second batch: everything already present
    assert not batch.insert(vals).any()


def test_cms_add_n_query_post_add_guess():
    """Reference add_n -> post-add min-row guess (countminsketch.rs:
    236-249): for distinct batch values, equals sequential add_n."""
    import numpy as np

    from sketchlib.cms import CountMinSketch

    vals = np.array([1, 2, 3, 4], dtype=np.int64)
    counts = np.array([10, 20, 30, 40], dtype=np.int64)
    batch = CountMinSketch(512, 4, seed=9)
    got = batch.add_n_query(vals, counts)
    seq = CountMinSketch(512, 4, seed=9)
    want = []
    for x, n in zip(vals, counts):
        seq.update_hashed(__import__("sketchlib.hashing", fromlist=["hash_i64"]).hash_i64(
            np.array([x], dtype=np.int64), seq.seed), np.array([n]))
        want.append(int(seq.query_points(np.array([x], dtype=np.int64))[0]))
    # batch post-add >= its own true count; equals sequential for the
    # final state since all values distinct
    assert got.tolist() == want
    assert (got >= counts.astype(np.uint64)).all()
