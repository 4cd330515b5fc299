"""Spark aggregation-layer tests (FIXTURES.md §3): estimates vs exact
oracles, partition invariance (the merge-equivalence contract), skew
salting, broadcast point-query/membership UDFs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib import estimates as E
from sketchlib.agg import SketchSpec, build_partials, merge_partials, sketch_aggregate
from sketchlib.salt import salted_repartition, with_salt

SPECS = [
    SketchSpec("hll_tok", "hll", "tokens", {"p": 14}),
    SketchSpec("cms_tok", "cms", "tokens", {"w": 65536, "d": 5}),
    SketchSpec("bloom_tok", "bloom", "tokens", {"m": 1_200_000, "k": 6}),
    SketchSpec("td_ntok", "tdigest", "n_tok", {"delta": 100.0}),
    SketchSpec("kll_ntok", "kll", "n_tok", {"k": 200}),
]


@pytest.fixture(scope="module")
def merged(seq_small):
    m = sketch_aggregate(seq_small, ["source"], SPECS, fanout=4).cache()
    m.count()
    return m


@pytest.fixture(scope="module")
def exact_distinct(seq_small):
    rows = (
        seq_small.select("source", F.explode("tokens").alias("t"))
        .groupBy("source")
        .agg(F.countDistinct("t").alias("exact"))
        .collect()
    )
    return {r.source: r.exact for r in rows}


def test_hll_distinct_within_bound(merged, exact_distinct):
    rows = merged.filter(F.col("sketch") == "hll_tok").select(
        "source", E.hll_count("state").alias("est")
    ).collect()
    assert len(rows) == 4
    bound = 1.04 / np.sqrt(2**14)
    for r in rows:
        exact = exact_distinct[r.source]
        assert abs(r.est - exact) / exact <= 3 * bound, (r.source, r.est, exact)


def test_metrics_columns(merged, seq_small):
    tok_updates = {
        r.source: r.n_updates
        for r in merged.filter(F.col("sketch") == "hll_tok").collect()
    }
    exact_tokens = {
        r.source: r.s
        for r in seq_small.groupBy("source").agg(F.sum("n_tok").alias("s")).collect()
    }
    assert tok_updates == exact_tokens


def test_cms_point_queries_match_exact(spark, merged, seq_small):
    # at this load (65k cells x 5 rows vs ~48k distinct tokens per group)
    # collisions are absent for head tokens: estimates == exact counts
    exact = (
        seq_small.select("source", F.explode("tokens").alias("t"))
        .groupBy("source", "t")
        .count()
        .filter(F.col("count") >= 20)
        .cache()
    )
    states = E.collect_states(merged, ["source"], "cms_tok")
    freq = E.point_query_udf(spark, states)
    checked = exact.withColumn("est", freq("source", "t"))
    bad = checked.filter(F.col("est") < F.col("count")).count()
    assert bad == 0, "CMS must never underestimate"
    # at load factor ~0.73 (48k distinct / 65k cells, d=5) the vast
    # majority of head tokens see no collision in at least one row
    frac_exact = checked.filter(F.col("est") == F.col("count")).count() / checked.count()
    assert frac_exact > 0.9, frac_exact
    # and the eps-bound holds: est <= exact + eps*N with eps = e/w
    import math
    n_tot = seq_small.selectExpr("sum(n_tok)").collect()[0][0]
    eps = math.e / 65536
    viol = checked.filter(F.col("est") > F.col("count") + eps * n_tot).count()
    assert viol == 0


def test_bloom_membership_no_false_negatives(spark, merged, seq_small):
    present = (
        seq_small.select("source", F.explode("tokens").alias("t")).distinct().limit(2000)
    )
    states = E.collect_states(merged, ["source"], "bloom_tok")
    member = E.membership_udf(spark, states)
    miss = present.withColumn("hit", member("source", "t")).filter(~F.col("hit")).count()
    assert miss == 0


def test_quantile_estimates_close_to_exact(merged, seq_small):
    exact = {
        r.source: r.q
        for r in seq_small.groupBy("source")
        .agg(F.expr("percentile(n_tok, 0.5)").alias("q"))
        .collect()
    }
    for sk in ("td_ntok", "kll_ntok"):
        rows = merged.filter(F.col("sketch") == sk).select(
            "source", E.quantile_udf(0.5)("state").alias("p50")
        ).collect()
        for r in rows:
            # n_tok spans 16..500; sketch p50 within 5% of the span
            assert abs(r.p50 - exact[r.source]) <= 25, (sk, r.source, r.p50, exact[r.source])


def test_partition_invariance_byte_identical(spark, seq_small):
    """FIXTURES `partition_invariance`: final merged states are
    byte-identical across input partitionings and merge fanouts."""
    specs = [SketchSpec("hll_tok", "hll", "tokens", {"p": 12}),
             SketchSpec("bloom_tok", "bloom", "tokens", {"m": 100_000, "k": 4})]

    def states_of(df, fanout):
        m = sketch_aggregate(df, ["source"], specs, fanout=fanout)
        return {
            (r.source, r.sketch): bytes(r.state)
            for r in m.collect()
        }

    base = states_of(seq_small.repartition(1), None)
    for df, fanout in [
        (seq_small.repartition(7), 3),
        (seq_small.repartition(32), 8),
        (salted_repartition(seq_small, ["source"], 16), None),
    ]:
        got = states_of(df, fanout)
        assert got == base


def test_merge_idempotence_vs_counting(spark, seq_small):
    """HLL/Bloom merges are idempotent, CMS is additive — feeding the
    same partials through a 2-level tree must not double-count."""
    specs = [SketchSpec("cms_tok", "cms", "tokens", {"w": 8192, "d": 3})]
    partials = build_partials(seq_small.repartition(16), ["source"], specs)
    m1 = merge_partials(partials, ["source"], fanout=None).collect()
    m2 = merge_partials(partials, ["source"], fanout=4).collect()
    t1 = {r.source: r.n_updates for r in m1}
    t2 = {r.source: r.n_updates for r in m2}
    assert t1 == t2
    from sketchlib.agg import load_state
    for r1 in m1:
        r2 = [r for r in m2 if r.source == r1.source][0]
        assert load_state(r1.state).total() == load_state(r2.state).total()


def test_string_column_prehash(spark, seq_small):
    """String sketch inputs are hashed JVM-side (xxhash64), never in
    per-row Python."""
    specs = [SketchSpec("hll_src", "hll", "doc_id", {"p": 12})]
    m = sketch_aggregate(seq_small, [], specs, fanout=None)
    row = m.select(E.hll_count("state").alias("est")).collect()[0]
    assert abs(row.est - 2000) / 2000 < 0.1


def test_with_salt_bounds(seq_small):
    s = with_salt(seq_small, 8)
    vals = [r[0] for r in s.select("__salt").distinct().collect()]
    assert all(0 <= v < 8 for v in vals)
    with pytest.raises(ValueError):
        with_salt(seq_small, 0)


def test_global_aggregate_no_groups(seq_small):
    m = sketch_aggregate(seq_small, [], [SketchSpec("hll_tok", "hll", "tokens", {"p": 14})])
    rows = m.select(E.hll_count("state").alias("est")).collect()
    assert len(rows) == 1
    assert abs(rows[0].est - 50_000) / 50_000 < 0.05


def test_preagg_byte_identical_states(spark, seq_small):
    """pre_agg=True (JVM explode+groupBy combine) must produce
    BYTE-IDENTICAL final states to the raw path for hll/cms/bloom/ams,
    and leave non-pre-agg kinds (tdigest) on the raw path unchanged."""
    specs = [
        SketchSpec("hll", "hll", "tokens", {"p": 12, "seed": 7}),
        SketchSpec("cms", "cms", "tokens", {"w": 2048, "d": 4, "seed": 7}),
        SketchSpec("bloom", "bloom", "tokens", {"m": 1 << 16, "k": 5, "seed": 7}),
        SketchSpec("ams", "ams", "tokens", {"w": 1024, "d": 5, "seed": 7}),
        SketchSpec("kmv", "kmv", "tokens", {"k": 512, "seed": 7}),
        SketchSpec("td", "tdigest", "n_tok", {"delta": 100.0}),
    ]
    raw = {
        (r.source, r.sketch): (bytes(r.state), r.n_updates)
        for r in sketch_aggregate(seq_small, ["source"], specs, fanout=8).collect()
    }
    pre = {
        (r.source, r.sketch): (bytes(r.state), r.n_updates)
        for r in sketch_aggregate(
            seq_small, ["source"], specs, fanout=8, pre_agg=True
        ).collect()
    }
    assert set(raw) == set(pre)
    for key in raw:
        assert raw[key][1] == pre[key][1], f"n_updates mismatch for {key}"
        if key[1] == "td":
            # t-digest is NOT in the pre-agg set — it rides the raw
            # path in both jobs, but its merge is only value-
            # associative, so byte equality is not part of the
            # contract; n_updates equality above is the assertion
            continue
        assert raw[key][0] == pre[key][0], f"state bytes differ for {key}"


def test_preagg_string_column_and_scalar(spark, seq_small):
    """pre_agg with a scalar STRING column: xxhash64 then groupBy the
    hash — estimates must match the raw path exactly (same hashes)."""
    specs = [SketchSpec("hll_doc", "hll", "doc_id", {"p": 12, "seed": 3})]
    raw = sketch_aggregate(seq_small, [], specs, fanout=None).collect()[0]
    pre = sketch_aggregate(seq_small, [], specs, fanout=None, pre_agg=True).collect()[0]
    assert bytes(raw.state) == bytes(pre.state)
    assert raw.n_updates == pre.n_updates == 2000


def test_preagg_count_col_validation(spark, seq_small):
    with pytest.raises(ValueError, match="count_col"):
        sketch_aggregate(
            seq_small,
            ["source"],
            [SketchSpec("td", "tdigest", "n_tok", {"delta": 100.0}, count_col="n_tok")],
        ).collect()


def test_preagg_null_array_elements_match_raw(spark):
    """Null ARRAY ELEMENTS are dropped by BOTH build paths (review
    finding r4): states byte-identical, n_updates counts only real
    values."""
    df = spark.createDataFrame(
        [("a", [1, None, 3]), ("a", [4]), ("b", None), ("b", [None, None])],
        "source string, tokens array<bigint>",
    )
    specs = [
        SketchSpec("hll", "hll", "tokens", {"p": 10, "seed": 3}),
        SketchSpec("cms", "cms", "tokens", {"w": 256, "d": 3, "seed": 3}),
    ]
    raw = {
        (r.source, r.sketch): (bytes(r.state), r.n_updates)
        for r in sketch_aggregate(df, ["source"], specs, fanout=None).collect()
    }
    pre = {
        (r.source, r.sketch): (bytes(r.state), r.n_updates)
        for r in sketch_aggregate(df, ["source"], specs, fanout=None, pre_agg=True).collect()
    }
    # source b has no non-null values: raw path emits no state for it
    # on the cms/hll specs only if every row empty — group rows still
    # counted; both paths must agree on the emitted key set
    assert set(raw) == set(pre)
    for k in raw:
        assert raw[k] == pre[k], f"mismatch for {k}"
    assert raw[("a", "hll")][1] == 3  # 1, 3, 4 — the null never counted


def test_preagg_count_col_spacesaving_guarantees(spark, seq_small):
    """Explicit count_col routing for the r5 kind: building SpaceSaving
    from pre-aggregated (token, count) rows must consume the
    multiplicities exactly — n equals the raw token total and the
    guarantee triple holds vs exact counts (estimate-equivalent to the
    raw path, not byte-equal: compress timing differs by grouping)."""
    from sketchlib.agg import load_state

    m = 199
    flat = seq_small.select("source", F.explode("tokens").alias("tok"))
    pre = flat.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    merged = sketch_aggregate(
        pre,
        ["source"],
        [SketchSpec("ss", "spacesaving", "tok", {"m": m}, count_col="cnt")],
        fanout=4,
    )
    exact = {
        (r["source"], r["tok"]): r["cnt"] for r in pre.collect()
    }
    totals: dict = {}
    for (src, _), c in exact.items():
        totals[src] = totals.get(src, 0) + c
    rows = {r["source"]: bytes(r["state"]) for r in merged.collect()}
    assert set(rows) == set(totals)
    for src, blob in rows.items():
        ss = load_state(blob)
        n = totals[src]
        assert ss.n == n and ss.err * (m + 1) <= n
        items, f = ss.query(0.02)
        for it, fv in zip(items.tolist(), f.tolist()):
            ex = exact.get((src, it), 0)
            assert fv <= ex and ex - fv <= ss.err
        heavy = {t for (s, t), c in exact.items() if s == src and c >= 0.02 * n}
        assert heavy <= set(items.tolist())
