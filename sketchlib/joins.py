"""Bloom-accelerated distributed joins.

The reference names membership-prefiltered joins as the Bloom filter's
canonical application (bloomfilter.rs:49-53); the Spark-native
expression is: build the filter over the SMALL side with the same
two-stage partial/merge pipeline as every other sketch, broadcast the
KB-scale blob, and drop non-matching rows of the LARGE side *before*
the join shuffle. Correctness never depends on the filter:

- :func:`bloom_semijoin` — filter says definitely-absent => the row
  cannot match, drop it pre-shuffle (zero false negatives is the
  kernel's tested property); maybe-present rows still pass an exact
  semi-join, so the result is EXACTLY ``large.join(keys, "left_semi")``
  with the shuffle bounded by the true match volume + FPR.
- :func:`bloom_antijoin` — the dual: definitely-absent rows ARE the
  anti-join result for free (no shuffle at all for them); only the
  maybe-present minority goes through the exact anti-join.

At 100 TB this is the difference between shuffling the full fact table
and shuffling ~(selectivity + p) of it; p is the configured FPR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .agg import SketchSpec, sketch_aggregate
from .estimates import membership_udf

DEFAULT_SEED = 0x5EEDC0DE


def _small_side_bloom(small: DataFrame, small_key: str, m: int, k: int, seed: int) -> bytes:
    merged = sketch_aggregate(
        small.select(small_key),
        [],
        [SketchSpec("bloom", "bloom", small_key, {"m": m, "k": k, "seed": seed})],
        fanout="auto",
    )
    return bytes(merged.select("state").collect()[0][0])


def bloom_semijoin(
    large: DataFrame,
    large_key: str,
    small: DataFrame,
    small_key: str,
    m: int = 1 << 20,
    k: int = 7,
    seed: int = DEFAULT_SEED,
    exact: bool = True,
) -> DataFrame:
    """Rows of ``large`` whose key appears in ``small`` — exactly
    ``large`` semi-joined on the small side's distinct keys, with the
    Bloom prefilter dropping definite non-matches before any shuffle.
    ``exact=False`` skips the verify join and returns the probabilistic
    superset (true matches + ~FPR of non-matches) for cascade use."""
    blob = _small_side_bloom(small, small_key, m, k, seed)
    member = membership_udf(large.sparkSession, {"__all": blob})
    pre = large.filter(member(F.lit("__all"), F.col(large_key)))
    if not exact:
        return pre
    keys = small.select(F.col(small_key).alias("__bk")).distinct()
    return pre.join(
        F.broadcast(keys), pre[large_key] == F.col("__bk"), "left_semi"
    )


def bloom_antijoin(
    large: DataFrame,
    large_key: str,
    small: DataFrame,
    small_key: str,
    m: int = 1 << 20,
    k: int = 7,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Rows of ``large`` whose key does NOT appear in ``small`` —
    exactly ``large.join(keys, "left_anti")``. Definitely-absent rows
    (the overwhelming majority in a typical anti-join) are emitted
    straight from the broadcast filter with no shuffle; only the
    maybe-present fraction is exactly anti-joined."""
    blob = _small_side_bloom(small, small_key, m, k, seed)
    member = membership_udf(large.sparkSession, {"__all": blob})
    keys = small.select(F.col(small_key).alias("__bk")).distinct()
    # ONE scan, ONE membership evaluation per row: a left_anti join
    # whose condition is (maybe-present AND key match). Definitely-
    # absent rows never satisfy the condition, so they pass through as
    # anti-join survivors for free; only maybe-present rows can be
    # eliminated by the exact broadcast probe. (The previous shape
    # union'd two filters over `large`, scanning the fact table — and
    # running the Bloom probe — twice.)
    tagged = large.withColumn("__maybe", member(F.lit("__all"), F.col(large_key)))
    return tagged.join(
        F.broadcast(keys),
        F.col("__maybe") & (tagged[large_key] == F.col("__bk")),
        "left_anti",
    ).drop("__maybe")
