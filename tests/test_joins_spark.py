"""Bloom-accelerated joins: exact equivalence with plain semi/anti joins,
and SQL-registered estimators."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sketchlib.joins import bloom_antijoin, bloom_semijoin  # noqa: E402


@pytest.fixture(scope="module")
def sides(spark):
    large = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("payload")
    )
    # small side: every 7th key, plus keys past the large range (no match)
    small = spark.range(0, 6000, 7).select(F.col("id").alias("sk"))
    return large.cache(), small.cache()


def test_bloom_semijoin_exact(spark, sides):
    large, small = sides
    got = {r.k for r in bloom_semijoin(large, "k", small, "sk", m=1 << 16, k=5).collect()}
    want = {r.k for r in large.join(
        small.select(F.col("sk").alias("k")).distinct(), "k", "left_semi"
    ).collect()}
    assert got == want and len(want) > 0


def test_bloom_semijoin_prefilter_superset(spark, sides):
    large, small = sides
    pre = {r.k for r in bloom_semijoin(
        large, "k", small, "sk", m=1 << 16, k=5, exact=False
    ).collect()}
    want = {r.k for r in large.join(
        small.select(F.col("sk").alias("k")).distinct(), "k", "left_semi"
    ).collect()}
    assert want <= pre  # zero false negatives
    assert len(pre) <= len(want) + 0.02 * 5000  # FPR bounded


def test_bloom_antijoin_exact(spark, sides):
    large, small = sides
    got = {r.k for r in bloom_antijoin(large, "k", small, "sk", m=1 << 16, k=5).collect()}
    want = {r.k for r in large.join(
        small.select(F.col("sk").alias("k")).distinct(), "k", "left_anti"
    ).collect()}
    assert got == want


def test_sql_registered_estimators(spark, seq_small):
    from sketchlib.agg import SketchSpec, sketch_aggregate
    from sketchlib.estimates import register_sql_functions

    register_sql_functions(spark)
    merged = sketch_aggregate(
        seq_small,
        ["source"],
        [
            SketchSpec("hll", "hll", "tokens", {"p": 14}),
            SketchSpec("td", "tdigest", "n_tok", {"delta": 200.0}),
        ],
        fanout=8,
    )
    merged.createOrReplaceTempView("states_sql_test")
    hll_rows = spark.sql(
        "SELECT source, hll_count(state) AS est FROM states_sql_test WHERE sketch='hll'"
    ).collect()
    exact = {
        r.source: r.d
        for r in seq_small.select("source", F.explode("tokens").alias("t"))
        .groupBy("source")
        .agg(F.countDistinct("t").alias("d"))
        .collect()
    }
    assert len(hll_rows) == len(exact)
    for r in hll_rows:
        assert abs(r.est - exact[r.source]) <= 0.05 * exact[r.source]
    q = spark.sql(
        "SELECT tdigest_quantile(state, 0.5) AS med FROM states_sql_test WHERE sketch='td'"
    ).collect()
    assert all(r.med > 0 for r in q)


def test_sql_ams_estimators(spark, seq_small):
    from sketchlib.agg import SketchSpec, sketch_aggregate
    from sketchlib.estimates import register_sql_functions

    register_sql_functions(spark)
    merged = sketch_aggregate(
        seq_small,
        ["source"],
        [SketchSpec("ams", "ams", "tokens", {"w": 8192, "d": 5})],
        fanout=8,
    )
    merged.createOrReplaceTempView("ams_sql_test")
    rows = spark.sql(
        "SELECT source, ams_f2(state) AS f2, ams_l2(state) AS l2 FROM ams_sql_test"
    ).collect()
    exact = {
        r.source: float(r.f2)
        for r in seq_small.select("source", F.explode("tokens").alias("t"))
        .groupBy("source", "t")
        .count()
        .groupBy("source")
        .agg(F.sum(F.col("count") * F.col("count")).alias("f2"))
        .collect()
    }
    assert len(rows) == len(exact)
    for r in rows:
        assert abs(r.f2 - exact[r.source]) <= (3.0 / 8192**0.5) * exact[r.source]
        assert r.l2 == pytest.approx(r.f2**0.5)


def test_sql_kmv_estimators(spark, seq_small):
    from sketchlib.agg import SketchSpec, sketch_aggregate
    from sketchlib.estimates import register_sql_functions

    register_sql_functions(spark)
    merged = sketch_aggregate(
        seq_small,
        ["source"],
        [SketchSpec("kmv", "kmv", "tokens", {"k": 1024, "seed": 11})],
        fanout=8,
    )
    merged.createOrReplaceTempView("kmv_sql_test")
    rows = spark.sql(
        "SELECT source, kmv_distinct(state) AS est FROM kmv_sql_test"
    ).collect()
    exact = {
        r.source: r.cnt
        for r in seq_small.select("source", F.explode("tokens").alias("t"))
        .groupBy("source")
        .agg(F.countDistinct("t").alias("cnt"))
        .collect()
    }
    assert len(rows) == len(exact)
    for r in rows:
        assert abs(r.est - exact[r.source]) <= 5.0 / (1022**0.5) * exact[r.source]
    # pairwise jaccard SQL surface: the pair join over state rows
    pairs = spark.sql(
        """
        SELECT a.source AS sa, b.source AS sb,
               kmv_jaccard(a.state, b.state) AS j,
               kmv_intersection(a.state, b.state) AS i,
               kmv_difference(a.state, b.state) AS d_ab,
               kmv_difference(b.state, a.state) AS d_ba,
               kmv_distinct(a.state) AS da
        FROM kmv_sql_test a JOIN kmv_sql_test b ON a.source < b.source
        """
    ).collect()
    assert len(pairs) == len(exact) * (len(exact) - 1) // 2
    assert all(0.0 <= p.j <= 1.0 for p in pairs)
    for p in pairs:
        # set algebra coherence on the same union synopsis: the only-A
        # fraction and the shared fraction both read the same bottom-k'
        # sample, so inter + diff reconstructs |A| up to synopsis noise
        assert p.i >= 0.0 and p.d_ab >= 0.0 and p.d_ba >= 0.0
        assert abs((p.i + p.d_ab) - p.da) <= 0.2 * max(p.da, 1.0)


def test_kmv_pair_stats_equi_join_path(spark, seq_small):
    """Large-G scale path: explicit pair frame + equi-joins, estimates
    agree with the direct kernel computation; plan has no nested loop."""
    from sketchlib.agg import SketchSpec, sketch_aggregate, load_state
    from sketchlib.estimates import kmv_pair_stats

    states = sketch_aggregate(
        seq_small,
        ["source"],
        [SketchSpec("kmv", "kmv", "tokens", {"k": 512, "seed": 5})],
        fanout=8,
    ).select("source", "state")
    pairs = spark.createDataFrame(
        [("books", "web"), ("code", "wiki")], "source_a string, source_b string"
    )
    out = kmv_pair_stats(states, pairs)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    rows = {(r.source_a, r.source_b): r for r in out.collect()}
    kern = {r.source: load_state(bytes(r.state)) for r in states.collect()}
    assert len(rows) == 2
    for (sa, sb), r in rows.items():
        assert r.kmv_jaccard == pytest.approx(kern[sa].jaccard(kern[sb]))
        assert r.kmv_union == pytest.approx(kern[sa].union_distinct(kern[sb]))
        assert r.kmv_intersection == pytest.approx(
            kern[sa].intersection_distinct(kern[sb])
        )


def test_sql_generic_quantile_aliases(spark, seq_small):
    """sketch_quantile / sketch_cdf read every quantile-bearing kind
    (tdigest, kll, ddsketch) via the codec dispatch."""
    from sketchlib.agg import SketchSpec, sketch_aggregate
    from sketchlib.estimates import register_sql_functions

    register_sql_functions(spark)
    specs = [
        SketchSpec("td", "tdigest", "n_tok", {"delta": 200.0}),
        SketchSpec("kll", "kll", "n_tok", {"k": 200, "seed": 3}),
        SketchSpec("dd", "ddsketch", "n_tok", {"alpha": 0.01}),
    ]
    merged = sketch_aggregate(seq_small, [], specs, fanout=4)
    merged.createOrReplaceTempView("q_states")
    meds = {
        r["sketch"]: r["med"]
        for r in spark.sql(
            "SELECT sketch, sketch_quantile(state, 0.5) AS med FROM q_states"
        ).collect()
    }
    exact_med = seq_small.approxQuantile("n_tok", [0.5], 0.0)[0]
    assert set(meds) == {"td", "kll", "dd"}
    for kind, est in meds.items():
        assert abs(est - exact_med) <= 0.1 * exact_med + 2, (kind, est, exact_med)
    cdfs = {
        r["sketch"]: r["c"]
        for r in spark.sql(
            f"SELECT sketch, sketch_cdf(state, {exact_med}) AS c FROM q_states "
            "WHERE sketch IN ('td', 'dd')"
        ).collect()
    }
    for kind, c in cdfs.items():
        assert 0.4 <= c <= 0.6, (kind, c)
