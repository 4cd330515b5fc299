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

Every such persist is registered here under an **owner** label (the
operator that created it). After materializing an operator's output
(collect / write), release exactly that operator's caches with
``release_caches(owner="tokenops.global_offsets")`` — or everything
the library holds with a bare ``release_caches()`` (what bench.py does
between samples, where every output is already collected). Unlike
``spark.catalog.clearCache()`` neither form ever touches the caller's
own persisted data.

Why owner scoping matters (ADVICE r4, caches.py:43): a session-global
release fired while a DIFFERENT operator's lazy result is still
unmaterialized can force a recompute; for ``global_offsets`` the
recompute resamples range boundaries and silently corrupts the prefix
map rather than just being slower. Scoped release makes the safe call
expressible; the registry is lock-guarded so concurrent job threads
cannot corrupt it.
"""

from __future__ import annotations

import threading
from typing import List, Optional, Tuple

__all__ = ["register", "release_caches", "active_count", "CacheHandle"]

_LOCK = threading.Lock()
_ACTIVE: List[Tuple[str, object]] = []  # (owner, DataFrame)


class CacheHandle:
    """Release exactly one registered persist, idempotently."""

    __slots__ = ("_df",)

    def __init__(self, df):
        self._df = df

    def release(self) -> bool:
        """Unpersist this registration (blocking=False); returns True
        the first time, False if already released (by this handle or a
        ``release_caches`` sweep)."""
        with _LOCK:
            for i, (_, df) in enumerate(_ACTIVE):
                if df is self._df:
                    del _ACTIVE[i]
                    break
            else:
                return False
        try:
            self._df.unpersist()
        except Exception:
            pass
        return True


def register(df, owner: str = ""):
    """Track a persisted DataFrame for later deterministic release.

    Returns ``df`` so call sites can wrap: ``register(x.persist(), "op")``.
    Use :func:`handle_for` (or construct ``CacheHandle(df)``) when the
    call site wants single-registration release.
    """
    with _LOCK:
        _ACTIVE.append((owner, df))
    return df


def handle_for(df) -> CacheHandle:
    """A :class:`CacheHandle` for an already-registered DataFrame."""
    return CacheHandle(df)


def release_caches(owner: Optional[str] = None) -> int:
    """Unpersist registered caches (blocking=False); returns how many
    were released. ``owner=None`` sweeps everything (bench / teardown);
    an owner string releases only that operator's registrations —
    the safe call while other operators' lazy results are still
    unmaterialized. Already-unpersisted or dead DataFrames are skipped.
    """
    with _LOCK:
        if owner is None:
            victims, _ACTIVE[:] = _ACTIVE[:], []
        else:
            victims = [e for e in _ACTIVE if e[0] == owner]
            _ACTIVE[:] = [e for e in _ACTIVE if e[0] != owner]
    n = 0
    for _, df in reversed(victims):
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def active_count(owner: Optional[str] = None) -> int:
    with _LOCK:
        if owner is None:
            return len(_ACTIVE)
        return sum(1 for o, _ in _ACTIVE if o == owner)
