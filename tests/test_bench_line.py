"""bench.py final-line contract: the compact JSON must always fit the
driver's tail capture and keep headline + scaling to the bitter end
(round 3's unbounded line produced BENCH parsed:null)."""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import compact_line  # noqa: E402


def _result(nq, qname_len=28, val=21.34):
    queries = {f"q{'x' * qname_len}{i:03d}": val for i in range(nq)}
    return (
        {
            "value": 9.0,
            "sf": 0.1,
            "tokens": 619109054,
            "tokens_per_sec": 68827594,
            "token_updates_per_sec": 206500000,
            "scaling": {
                "cores_low": 2,
                "cores_high": 8,
                "wall_low": 44.53,
                "wall_high": 12.04,
                "efficiency": 0.925,
                "samples": {2: 1, 8: 1},
            },
        },
        queries,
    )


def test_line_fits_and_parses_at_current_query_count():
    import __spark_entry__ as mod

    result, _ = _result(0)
    queries = {name: 21.34 for name in mod.queries()}
    line = compact_line(result, queries, True)
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["value"] == 9.0
    assert d["scaling"]["efficiency"] == 0.925
    assert len(d["queries"]) == len(queries)


def test_scaling_survives_absurd_query_growth():
    # even at 200 long-named queries the scaling record must survive;
    # the queries map is allowed to drop (detail file still has it)
    result, queries = _result(200)
    line = compact_line(result, queries, True)
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["scaling"]["efficiency"] == 0.925
    assert d["value"] == 9.0


def test_error_strings_pass_through_trims():
    result, queries = _result(80)
    queries["broken_query"] = "ERROR: ValueError"
    line = compact_line(result, queries, True)
    d = json.loads(line)
    if "queries" in d:
        assert d["queries"]["broken_query"] == "ERROR: ValueError"


def test_no_trim_when_small():
    result, queries = _result(3, qname_len=4)
    line = compact_line(result, queries, True)
    d = json.loads(line)
    # untrimmed: long metric, full precision, detail pointer intact
    assert d["metric"].startswith("4-sketch build wall (")
    assert d["detail"] == "BENCH_DETAIL.json"
    assert d["tokens"] == 619109054


def test_prior_query_mins_reads_latest_round_artifact():
    """The regression-suspect resampler keys off the latest round's
    per-query numbers; the helper must survive the driver's
    {"parsed": {...}} wrapper and skip non-numeric entries."""
    import bench

    pm = bench.prior_query_mins()
    # repo carries BENCH_r04.json with a parsed queries map
    assert pm, "expected prior mins from the repo's BENCH_r*.json"
    assert all(isinstance(v, (int, float)) for v in pm.values())


def test_scaling_topup_pairs_until_eff_recovers():
    from bench import scaling_topup

    walls = {2: 20.0, 8: 7.0}  # eff = (20/7)/4 = 0.714
    taken = []

    def eff():
        return (walls[2] / walls[8]) / 4

    def sample(c):
        taken.append(c)
        if c == 8:
            walls[8] = max(5.8, walls[8] - 0.7)  # quieter window found

    budget = [500.0]

    def raw_remaining():
        return budget[0]

    def window_cost(c):
        budget[0] -= 5  # cheap stub decay so the loop terminates on eff
        return 40.0

    extra = scaling_topup(eff, sample, window_cost, raw_remaining, 8, 2)
    assert extra == len(taken)
    assert eff() >= 0.85  # recovered: (20/5.8)/4 = 0.862
    assert taken.count(8) == taken.count(2)  # symmetric pairs


def test_scaling_topup_single_high_window_when_budget_tight():
    from bench import scaling_topup

    taken = []
    extra = scaling_topup(
        eff=lambda: 0.70,
        sample=lambda c: taken.append(c),
        window_cost=lambda c: 40.0,
        raw_remaining=lambda: 70.0,  # fits one 40s window + 20s guard, not two
        high=8,
        low=2,
    )
    assert extra == 1 and taken == [8]


def test_scaling_topup_noop_when_eff_met_or_unknown():
    from bench import scaling_topup

    # 0.0 (a wall missing, no `missing` callable passed) and 0.86 (bar
    # met) are no-ops; eff>1.05 is NOT — it triggers the bounded
    # low-leg rebalance covered by its own test below
    for e in (0.0, 0.86):
        taken = []
        scaling_topup(
            eff=lambda: e,
            sample=lambda c: taken.append(c),
            window_cost=lambda c: 40.0,
            raw_remaining=lambda: 1e9,
            high=8,
            low=2,
        )
        assert taken == []


def test_scaling_topup_fills_missing_leg_first():
    from bench import scaling_topup

    walls = {2: float("inf"), 8: 7.0}
    taken = []

    def sample(c):
        taken.append(c)
        walls[c] = min(walls[c], 20.0 if c == 2 else 7.0)

    extra = scaling_topup(
        eff=lambda: 0.0 if walls[2] == float("inf") else (walls[2] / walls[8]) / 4,
        sample=sample,
        window_cost=lambda c: 40.0,
        raw_remaining=lambda: 500.0,
        high=8,
        low=2,
        missing=lambda: [c for c in (8, 2) if walls[c] == float("inf")],
    )
    assert 2 in taken  # the nulled low leg got its window
    assert walls[2] == 20.0 and extra == len(taken)


def test_scaling_topup_rebalances_superlinear_reading():
    from bench import scaling_topup

    walls = {2: 40.0, 8: 8.6}  # eff 1.163: low leg burst-inflated earlier
    taken = []

    def sample(c):
        taken.append(c)
        if c == 2:
            walls[2] = 30.0  # quieter window pulls the low wall down

    scaling_topup(
        eff=lambda: (walls[2] / walls[8]) / 4,
        sample=sample,
        window_cost=lambda c: 40.0,
        raw_remaining=lambda: 500.0,
        high=8,
        low=2,
    )
    assert taken and set(taken) == {2}  # only low-leg re-balance windows
    assert (walls[2] / walls[8]) / 4 <= 1.05


def test_scaling_topup_rebalance_bounded_when_no_quieter_window():
    from bench import scaling_topup

    taken = []
    extra = scaling_topup(
        eff=lambda: 1.2,  # never improves: host genuinely noisy
        sample=lambda c: taken.append(c),
        window_cost=lambda c: 40.0,
        raw_remaining=lambda: 1e9,
        high=8,
        low=2,
    )
    assert extra == len(taken) == 2  # bounded spend, not a loop
