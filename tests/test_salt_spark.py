"""Skew helpers: sketch-based skew profiling over a planted-hot-key
stream (salt.skew_stats) and the exact-count planner."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sketchlib.salt import plan_salt_buckets, skew_stats, with_salt


def _planted_skew(spark, hot_rows=50_000, uniques=100_000):
    """One key with hot_rows occurrences + `uniques` singleton keys."""
    hot = spark.range(hot_rows).select(F.lit(-1).alias("k"))
    cold = spark.range(uniques).select(F.col("id").alias("k"))
    return hot.unionByName(cold)


def test_skew_stats_bounds_and_recommendation(spark):
    hot, uniq = 50_000, 100_000
    df = _planted_skew(spark, hot, uniq)
    st = skew_stats(df, "k", target_rows_per_bucket=10_000)
    n = hot + uniq
    assert st["n"] == n
    # HLL at p=14: rel err ~1.04/sqrt(2^14) < 1%; allow 4 sigma
    assert abs(st["ndv_est"] - (uniq + 1)) <= 0.04 * (uniq + 1)
    f2_exact = float(hot) ** 2 + uniq  # hot² + singletons
    assert abs(st["f2_est"] - f2_exact) <= (3.0 / np.sqrt(8192)) * f2_exact
    # sqrt(F2) is a HARD upper bound on the largest group, and here the
    # hot key dominates F2 so the bound is also tight
    assert st["max_group_upper"] >= hot * (1 - 3.0 / np.sqrt(8192))
    assert st["max_group_upper"] <= 1.1 * hot
    # buckets sized so the worst group fits the target
    assert st["suggested_buckets"] >= hot // 10_000
    assert st["collision_prob"] > 0.05  # a self-join here would blow up


def test_skew_stats_uniform_key_is_cheap(spark):
    df = spark.range(50_000).select(F.col("id").alias("k"))
    st = skew_stats(df, "k", target_rows_per_bucket=1_000_000)
    assert st["suggested_buckets"] == 1
    assert st["collision_prob"] < 1e-3


def test_plan_salt_buckets_and_with_salt(spark):
    df = _planted_skew(spark, 30_000, 1_000)
    plan = plan_salt_buckets(df, ["k"], target_rows_per_bucket=10_000)
    assert plan[-1] == 3  # the hot key gets 3 buckets
    salted = with_salt(df, 8, ["k"])
    got = salted.select("__salt").distinct().collect()
    assert {r["__salt"] for r in got} <= set(range(8))


def test_skew_stats_empty_input(spark):
    from sketchlib.salt import skew_stats

    empty = spark.createDataFrame([], "k string")
    prof = skew_stats(empty, "k")
    assert prof["n"] == 0 and prof["suggested_buckets"] == 1


def test_plan_salt_buckets_bounded_collect_guard(spark):
    """VERDICT r4 #5: one-row-per-group collects must fail loudly when
    the group space outgrows the bound, not OOM the driver at 100x."""
    import pytest

    df = spark.range(50).select((F.col("id")).alias("k"))
    with pytest.raises(ValueError, match="skew_stats"):
        plan_salt_buckets(df, ["k"], max_groups=10)
    # at or under the bound it still works
    plan = plan_salt_buckets(df, ["k"], max_groups=50)
    assert len(plan) == 50
