"""Deterministic release of library-internal caches.

Several operators persist an intermediate whose recomputation would be
either wrong (``tokenops.global_offsets``: the range-partition
boundaries come from sampling, so the totals job and the output job
must see the SAME partitioning) or wastefully repeated (the dedup /
ANN pair finders reuse a signature frame across candidate generation
and exact verification). Those persists cannot be dropped inside the
operator — the caller has not materialized the returned lazy
DataFrame yet — so in a long-lived session each call used to leak one
cached DataFrame until eviction churn (ADVICE r3, tokenops.py:391).

Every such persist is now registered here; after materializing an
operator's output (collect / write), call :func:`release_caches` to
unpersist exactly the library's caches — unlike
``spark.catalog.clearCache()`` it never touches the caller's own
persisted data.
"""

from __future__ import annotations

from typing import List

__all__ = ["register", "release_caches", "active_count"]

_ACTIVE: List = []


def register(df):
    """Track a persisted DataFrame for later deterministic release.

    Returns ``df`` so call sites can wrap: ``register(x.persist())``.
    """
    _ACTIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every registered cache (blocking=False); returns how
    many were released. Safe to call at any time — an already
    unpersisted or dead DataFrame is skipped."""
    n = 0
    while _ACTIVE:
        df = _ACTIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def active_count() -> int:
    return len(_ACTIVE)
