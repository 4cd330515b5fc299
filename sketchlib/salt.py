"""Explicit salting / repartitioning helpers for skewed keys.

The north rule requires skew handling to be explicit. In this engine the
main pipeline (:mod:`sketchlib.agg`) is build-side-skew-free by
construction — stage 1 never shuffles raw rows — so salting applies in
two places:

1. the **merge tree** fanout (``merge_partials(fanout=...)``), which
   bounds reducer fan-in per (group, sketch);
2. any **grouped path** the user writes themselves (e.g. a
   ``groupBy(key).applyInPandas``) over a skewed key — use
   :func:`with_salt` / :func:`salted_repartition` there, then merge the
   per-salt results (all sketch merges are associative+commutative, so
   salting never changes the answer — the reference's merge-equivalence
   contract, hyperloglog/mod.rs:556-574).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, buckets: int, cols: list[str] | None = None,
              salt_col: str = "__salt") -> DataFrame:
    """Add a deterministic salt column in [0, buckets).

    Salt derives from a hash of ``cols`` (default: all columns) so reruns
    are stable; deterministic salting keeps checkpoint resume exact.
    """
    if buckets <= 0:
        raise ValueError(f"buckets ({buckets}) must be > 0")
    src = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*src), F.lit(buckets)).cast("int"))


def salted_repartition(df: DataFrame, group_cols: list[str], buckets: int,
                       salt_cols: list[str] | None = None) -> DataFrame:
    """Repartition by (group_cols, salt): a hot group spreads over
    ``buckets`` partitions instead of melting one reducer."""
    salted = with_salt(df, buckets, salt_cols)
    return salted.repartition(*[F.col(c) for c in group_cols], F.col("__salt"))


def plan_salt_buckets(df: DataFrame, group_cols: list[str],
                      target_rows_per_bucket: int = 2_000_000) -> dict:
    """Observe per-group row counts and suggest a salt bucket count per
    group (max 1 per `target_rows_per_bucket` rows). Cheap: one count
    aggregation, pushed down to a columnar scan."""
    counts = df.groupBy(*group_cols).count().collect()
    out = {}
    for r in counts:
        key = r[0] if len(group_cols) == 1 else tuple(r[:-1])
        out[key] = max(1, int(r["count"] // target_rows_per_bucket))
    return out
