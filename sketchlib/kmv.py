"""KMV (k-minimum-values / bottom-k) distinct sketch with set-overlap
estimation between groups.

Public constructions: Bar-Yossef et al., "Counting distinct elements in
a data stream" (RANDOM 2002) — the k-th minimum hash estimator; Beyer,
Haas, Reinwald, Sismanis, Gemulla, "On Synopses for Distinct-Value
Estimation Under Multiset Operations" (SIGMOD 2007) — the unbiased
(k−1)/U_(k) estimator and the closure of KMV synopses under union;
Broder, "On the resemblance and containment of documents" (SEQUENCES
1997) and Cohen & Kaplan, "Summarizing data using bottom-k sketches"
(PODC 2007) — bottom-k resemblance (Jaccard) estimation. Not part of
the pdatastructs.rs reference — added because the pipeline needs what
HLL cannot give: PAIRWISE set relations between merged group states.
An HLL state answers |A| but intersections require error-amplifying
inclusion–exclusion; a KMV state is a uniform bottom-k sample of the
hashed set, so for any two groups' states the shared fraction of the
union's bottom-k estimates Jaccard directly (error ~1/√k, independent
of how small J is relative to the set sizes), and J·|A∪B| estimates
the intersection.

Guarantees (asserted in tests and the driver certificate):
- distinct(): exact while fewer than k distinct values were seen;
  otherwise (k−1)/U_(k) with relative std ≈ 1/√(k−2) (Beyer §4.1),
- jaccard(other): |bottom-k(A∪B) ∩ A ∩ B| / k', an unbiased sample
  proportion over k' ≤ k draws without replacement — std
  ≤ 0.5/√k' (hypergeometric ≤ binomial variance),
- merge = set-union then keep the k smallest (Beyer §5: a KMV synopsis
  of the union; associative, commutative, idempotent — the standard
  sketchlib aggregator contract, byte-identical to a whole-build).

Same kernel surface as the other sketches: vectorized updates over
pre-hashed uint64 batches (strings hash JVM-side via xxhash64), state
is one sorted uint64 array, versioned codec round-trip.
"""

from __future__ import annotations

import numpy as np

from .codec import check_mergeable, pack, unpack
from .hashing import DEFAULT_SEED, hash_i64

KIND = "kmv"

__all__ = ["KMV"]

# hashes are uniform in [0, 2^64); normalizing by 2^64 maps the k-th
# minimum to U_(k) ∈ (0, 1)
_TWO64 = float(2**64)


class KMV:
    """``KMV(k)`` — the k smallest distinct element hashes.

    ``k`` trades accuracy for state size (k·8 bytes): distinct-count
    relative std ≈ 1/√(k−2), Jaccard std ≤ 0.5/√k.
    """

    __slots__ = ("k", "seed", "mins")

    def __init__(self, k: int, seed: int = DEFAULT_SEED, mins: np.ndarray | None = None):
        if k < 8:
            raise ValueError(f"k ({k}) must be >= 8")
        self.k = int(k)
        self.seed = int(seed)
        if mins is None:
            mins = np.empty(0, dtype=np.uint64)
        else:
            mins = np.asarray(mins, dtype=np.uint64)
        self.mins = mins  # sorted ascending, distinct, len <= k

    @classmethod
    def with_relative_error(cls, eps_std: float, seed: int = DEFAULT_SEED) -> "KMV":
        """k for a distinct-count relative standard error of
        ``eps_std``: k = ceil(1/eps_std²) + 2 (Beyer SIGMOD'07 §4.1),
        clamped to the ctor minimum of 8 (eps_std above ~0.41 can't
        produce a smaller synopsis)."""
        if not (0.0 < eps_std < 1.0):
            raise ValueError(f"eps_std ({eps_std}) must be in (0, 1)")
        return cls(max(8, int(np.ceil(1.0 / (eps_std * eps_std))) + 2), seed)

    # -- params / codec ----------------------------------------------

    def params(self) -> dict:
        return {"k": self.k, "seed": self.seed}

    def is_empty(self) -> bool:
        return self.mins.size == 0

    def clear(self) -> None:
        self.mins = np.empty(0, dtype=np.uint64)

    # -- update -------------------------------------------------------

    def _absorb(self, h: np.ndarray) -> None:
        """Fold a batch of hashes into the bottom-k state."""
        if h.size == 0:
            return
        merged = np.union1d(self.mins, h)  # sorted + distinct
        self.mins = merged[: self.k].copy()

    def update_hashed(self, h: np.ndarray, counts: np.ndarray | None = None) -> None:
        # counts are irrelevant: bottom-k membership is idempotent
        h = np.asarray(h, dtype=np.uint64)
        if h.size > 4 * self.k:
            # cheap O(n) pre-filter: nothing above the current k-th
            # minimum can enter the state (only valid once the state
            # is full — below k every new distinct value matters)
            if self.mins.size >= self.k:
                h = h[h <= self.mins[-1]]
            if h.size > 4 * self.k:
                # dedup BEFORE truncating — argpartition on raw hashes
                # would fill the bottom-k slots with duplicates of the
                # most frequent small-hash values and drop distinct
                # values that belong in the synopsis (measured on a
                # zipf batch: a partition-then-dedup "fast path" falls
                # back to this full sort anyway and runs SLOWER). This
                # cold cost is paid once per partition; every warm
                # batch takes the O(n) <= mins[-1] prefilter above,
                # and the build path feeds pre-deduped batches via
                # update_unique (measured 0.5 ms per 50k uniques).
                h = np.unique(h)[: self.k]
        self._absorb(h)

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values)
        if v.size == 0:
            return
        self.update_hashed(hash_i64(v, self.seed))

    def update_unique(self, uniq: np.ndarray, counts: np.ndarray) -> None:
        """Fast path for pre-deduplicated batches (counts unused —
        membership is idempotent)."""
        self.update_hashed(hash_i64(uniq, self.seed))

    # -- query ----------------------------------------------------------

    def distinct(self) -> float:
        """Distinct-count estimate: exact below k, else (k−1)/U_(k)."""
        if self.mins.size < self.k:
            return float(self.mins.size)
        u_k = (float(self.mins[-1]) + 1.0) / _TWO64
        return (self.k - 1) / u_k

    def relative_error(self) -> float:
        """Expected relative standard error of :meth:`distinct`."""
        if self.mins.size < self.k:
            return 0.0
        return 1.0 / np.sqrt(self.k - 2)

    def jaccard(self, other: "KMV") -> float:
        """Bottom-k resemblance estimate between the two underlying
        sets: the shared fraction of the union synopsis's bottom-k'
        (k' = min(k, |union synopsis|))."""
        check_mergeable(KIND, self.params(), other.params())
        union = np.union1d(self.mins, other.mins)[: self.k]
        if union.size == 0:
            return 0.0
        both = np.isin(union, self.mins, assume_unique=True) & np.isin(
            union, other.mins, assume_unique=True
        )
        return float(both.sum()) / float(union.size)

    def union_distinct(self, other: "KMV") -> float:
        """Distinct estimate of A∪B from the merged synopsis."""
        check_mergeable(KIND, self.params(), other.params())
        merged = KMV(self.k, self.seed, np.union1d(self.mins, other.mins)[: self.k])
        return merged.distinct()

    def intersection_distinct(self, other: "KMV") -> float:
        """|A∩B| ≈ J(A,B) · |A∪B| (Beyer SIGMOD'07 §5.2)."""
        return self.jaccard(other) * self.union_distinct(other)

    def difference_distinct(self, other: "KMV") -> float:
        """|A\\B| ≈ (fraction of the union synopsis's bottom-k' that is
        in A but not B) · |A∪B| — the same uniform-sample argument as
        :meth:`jaccard` (each union-synopsis member is a uniform draw
        from A∪B), so the error scales identically (std ≤ 0.5/√k as a
        fraction of |A∪B|). Completes the pairwise set algebra:
        union / intersection / difference, all between merged group
        states with no raw-data second pass."""
        check_mergeable(KIND, self.params(), other.params())
        union = np.union1d(self.mins, other.mins)[: self.k]
        if union.size == 0:
            return 0.0
        only_a = np.isin(union, self.mins, assume_unique=True) & ~np.isin(
            union, other.mins, assume_unique=True
        )
        frac = float(only_a.sum()) / float(union.size)
        merged = KMV(self.k, self.seed, union)
        return frac * merged.distinct()

    # -- merge ----------------------------------------------------------

    def merge(self, other: "KMV") -> "KMV":
        """Union synopsis: keep the k smallest of both states (mutates
        self in place — the salted merge tree discards return values)."""
        check_mergeable(KIND, self.params(), other.params())
        self._absorb(other.mins)
        return self

    # -- serde ----------------------------------------------------------

    def params_header(self) -> dict:
        return {"kind": KIND, **self.params()}

    def to_bytes(self) -> bytes:
        return pack(KIND, self.params(), self.mins.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KMV":
        kind, params, payload = unpack(bytes(blob))
        if kind != KIND:
            raise ValueError(f"not a kmv blob: {kind}")
        mins = np.frombuffer(payload, dtype=np.uint64).copy()
        return cls(int(params["k"]), int(params.get("seed", DEFAULT_SEED)), mins)
