"""Driver correctness-window rotation invariants (VERDICT r4 #1).

The driver hash-checks only the first ~50 entries of queries() against
the DuckDB oracles; queries() must therefore order stalest-first so no
entry goes more than one round without a driver oracle row. These tests
pin the mechanism, not this round's particular ordering.
"""

from __future__ import annotations

import importlib.util
import os

WINDOW = 50  # the driver samples this many queries() entries


def _entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_rotation_test",
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_stalest_entries_lead_and_fit_the_window():
    m = _entry()
    names = list(m.queries())
    latest = m._LATEST_ROUND
    rounds = [m._VERIFIED_ROUND.get(n, latest) for n in names]
    # ordering is non-decreasing in staleness
    assert rounds == sorted(rounds)
    # every entry verified before the latest round sits inside the window
    stale_positions = [i for i, r in enumerate(rounds) if r < latest]
    assert all(p < WINDOW for p in stale_positions), (
        "stale queries fell outside the driver's correctness window"
    )
    # and with the current query count, anything dropped was verified
    # in the latest round (so it can't go >1 round unverified)
    for n in names[WINDOW:]:
        assert m._VERIFIED_ROUND.get(n, latest) == latest


def test_rotation_map_names_are_registered_queries():
    m = _entry()
    unknown = set(m._VERIFIED_ROUND) - set(m.queries())
    assert not unknown, f"_VERIFIED_ROUND names unregistered queries: {unknown}"


def test_every_query_has_oracle_or_documented_exception():
    m = _entry()
    osql = m.oracle_sql()
    missing = set(osql) - set(m.queries())
    assert not missing, f"oracle_sql keys without a queries() entry: {missing}"
