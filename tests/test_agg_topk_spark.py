"""lossy / topk kernels through the distributed two-stage topology."""

import numpy as np
from pyspark.sql import functions as F

from sketchlib.agg import SketchSpec, load_state, sketch_aggregate


def test_lossy_and_topk_heavy_hitters(spark, seq_small):
    # token distribution is Zipf-ish cube (FIXTURES.md): token 0 is the
    # heaviest by far; sketch over the raw int tokens per source
    specs = [
        SketchSpec("lossy", "lossy", "tokens", {"epsilon": 0.001}),
        SketchSpec("topk", "topk", "tokens", {"k": 5, "w": 8192, "d": 4, "seed": 7}),
    ]
    merged = sketch_aggregate(seq_small, ["source"], specs, fanout=4)
    rows = {(r["source"], r["sketch"]): bytes(r["state"]) for r in merged.collect()}

    exact = {
        (r["source"], r["tok"]): r["cnt"]
        for r in seq_small.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    totals: dict = {}
    top_by_source: dict = {}
    for (src, tok), cnt in exact.items():
        totals[src] = totals.get(src, 0) + cnt
        cur = top_by_source.get(src)
        if cur is None or (cnt, -tok) > (cur[1], -cur[0]):
            top_by_source[src] = (tok, cnt)

    sources = {s for s, _ in rows}
    assert sources == set(totals)
    for src in sources:
        n = totals[src]
        lc = load_state(rows[(src, "lossy")])
        assert lc.n == n
        items, f = lc.query(0.02)
        for it, fv in zip(items.tolist(), f.tolist()):
            ex = exact.get((src, it), 0)
            assert fv <= ex and fv >= ex - lc.epsilon * n
        heavy_exact = {t for (s, t), c in exact.items() if s == src and c >= 0.02 * n}
        assert heavy_exact <= set(items.tolist())  # superset guarantee

        tk = load_state(rows[(src, "topk")])
        t_items, t_counts = tk.query()
        best_tok, best_cnt = top_by_source[src]
        assert t_items[0] == best_tok
        assert t_counts[0] >= best_cnt  # CMS never undercounts
        assert t_counts[0] <= best_cnt + (np.e / 8192) * n


def test_spacesaving_heavy_hitters_distributed(spark, seq_small):
    # SpaceSaving / Misra–Gries through the same two-stage topology:
    # superset of the 2% heavy hitters per source, undercount <= err,
    # err <= n/(m+1) — regardless of partition/merge-tree shape
    m = 199
    specs = [SketchSpec("ss", "spacesaving", "tokens", {"m": m})]
    merged = sketch_aggregate(seq_small, ["source"], specs, fanout=4)
    rows = {r["source"]: bytes(r["state"]) for r in merged.collect()}

    exact = {
        (r["source"], r["tok"]): r["cnt"]
        for r in seq_small.select("source", F.explode("tokens").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    totals: dict = {}
    for (src, _), cnt in exact.items():
        totals[src] = totals.get(src, 0) + cnt
    assert set(rows) == set(totals)
    for src, blob in rows.items():
        ss = load_state(blob)
        n = totals[src]
        assert ss.n == n
        assert ss.err * (m + 1) <= n
        assert len(ss.items) <= m
        items, f = ss.query(0.02)
        for it, fv in zip(items.tolist(), f.tolist()):
            ex = exact.get((src, it), 0)
            assert fv <= ex and ex - fv <= ss.err
        heavy_exact = {t for (s, t), c in exact.items() if s == src and c >= 0.02 * n}
        assert heavy_exact <= set(items.tolist())  # superset guarantee


def test_rollup_equals_direct(spark, seq_small):
    from sketchlib.agg import rollup_states
    from sketchlib.estimates import hll_count
    from pyspark.sql import functions as F

    specs = [
        SketchSpec("hll", "hll", "tokens", {"p": 12, "seed": 3}),
        SketchSpec("cms", "cms", "tokens", {"w": 1024, "d": 4, "seed": 3}),
    ]
    per_source = sketch_aggregate(seq_small, ["source"], specs, fanout=4)
    global_direct = sketch_aggregate(seq_small, [], specs, fanout=4)
    global_rolled = rollup_states(per_source, [])
    d = {r["sketch"]: bytes(r["state"]) for r in global_direct.collect()}
    r = {r["sketch"]: bytes(r["state"]) for r in global_rolled.collect()}
    # HLL (elementwise max) and CMS (elementwise sum) are tree-shape
    # independent: rollup of per-source states == direct global build
    assert d == r


def test_rollup_new_kernels(spark, seq_small):
    """r5 kernels through the merge-up path: ddsketch rollup is
    byte-identical to a direct global build (bucket-wise add, like
    CMS); spacesaving rollup keeps its guarantee triple vs exact."""
    from pyspark.sql import functions as F

    from sketchlib.agg import SketchSpec, load_state, rollup_states, sketch_aggregate

    specs = [
        SketchSpec("dd", "ddsketch", "n_tok", {"alpha": 0.01}),
        SketchSpec("ss", "spacesaving", "tokens", {"m": 199}),
    ]
    per_source = sketch_aggregate(seq_small, ["source"], specs, fanout=4)
    direct = {
        r["sketch"]: bytes(r["state"])
        for r in sketch_aggregate(seq_small, [], specs, fanout=4).collect()
    }
    rolled = {
        r["sketch"]: bytes(r["state"])
        for r in rollup_states(per_source, []).collect()
    }
    assert rolled["dd"] == direct["dd"]  # byte-identical merge class
    ss = load_state(rolled["ss"])
    exact = {
        r["tok"]: r["cnt"]
        for r in seq_small.select(F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    n = sum(exact.values())
    assert ss.n == n and ss.err * (ss.m + 1) <= n
    items, f = ss.query(0.02)
    got = dict(zip(items.tolist(), f.tolist()))
    for tok, cnt in exact.items():
        if cnt >= 0.02 * n:
            assert tok in got and got[tok] <= cnt <= got[tok] + ss.err
