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
                      target_rows_per_bucket: int = 2_000_000,
                      max_groups: int = 100_000) -> dict:
    """Observe per-group row counts and suggest a salt bucket count per
    group (max 1 per `target_rows_per_bucket` rows). Cheap: one count
    aggregation, pushed down to a columnar scan. Collects one row per
    GROUP — right when the group space is bounded (sources, languages);
    ``max_groups`` makes a silently-unbounded key space fail loudly
    (limit-bounded collect, no extra job) instead of OOMing the driver
    at 100× — for unbounded key spaces use :func:`skew_stats`, whose
    sketch profile shuffles only KB state rows."""
    counts = df.groupBy(*group_cols).count().limit(max_groups + 1).collect()
    if len(counts) > max_groups:
        raise ValueError(
            f"plan_salt_buckets: > {max_groups} groups — this planner "
            "collects one row per group and is meant for bounded group "
            "spaces; use skew_stats (sketch-based, no per-key collect) "
            "for unbounded keys, or raise max_groups deliberately"
        )
    out = {}
    for r in counts:
        key = r[0] if len(group_cols) == 1 else tuple(r[:-1])
        out[key] = max(1, int(r["count"] // target_rows_per_bucket))
    return out


def skew_stats(df: DataFrame, key_col: str,
               target_rows_per_bucket: int = 2_000_000,
               w: int = 8192, d: int = 5) -> dict:
    """Sketch-based skew profile for UNBOUNDED key spaces: one pass over
    the key column builds a CountSketch (AMS F2 = Σ count(k)², the
    self-join size) and an HLL, shuffling only KB state rows — no
    per-key collect, so it scales where :func:`plan_salt_buckets`'s
    one-row-per-group collect cannot.

    Returns a dict with: ``n`` (rows), ``ndv_est`` (distinct keys),
    ``f2_est``, ``collision_prob`` (= F2/n², the probability two random
    rows share a key — the expansion factor of a self-join on this key),
    ``max_group_upper`` (= sqrt(F2), a hard upper bound on the largest
    group: max² ≤ Σ count²), and ``suggested_buckets`` (salt width so
    even the worst-case group stays under ``target_rows_per_bucket``).
    The F2 estimate carries the AMS 3/sqrt(w) relative bound; sqrt
    halves it on ``max_group_upper``."""
    import math

    from .agg import SketchSpec, sketch_aggregate
    from .ams import CountSketch
    from .hashing import DEFAULT_SEED
    from .hll import HLL

    merged = sketch_aggregate(
        df.select(key_col),
        [],
        [
            SketchSpec("ams", "ams", key_col, {"w": w, "d": d, "seed": DEFAULT_SEED}),
            SketchSpec("hll", "hll", key_col, {"p": 14, "seed": DEFAULT_SEED}),
        ],
        fanout="auto",
    )
    rows = {r["sketch"]: r for r in merged.collect()}
    if "ams" not in rows:
        # empty input / all-null key column: a defined zero profile,
        # not a KeyError — a planner probing an empty partition gets
        # "no skew, one bucket"
        return {
            "n": 0,
            "ndv_est": 0,
            "f2_est": 0.0,
            "collision_prob": 0.0,
            "max_group_upper": 0.0,
            "suggested_buckets": 1,
        }
    cs = CountSketch.from_bytes(bytes(rows["ams"]["state"]))
    hll = HLL.from_bytes(bytes(rows["hll"]["state"]))
    n = int(rows["ams"]["n_updates"])
    f2 = max(cs.f2(), float(n))  # F2 >= n always (every count >= 1)
    max_upper = math.sqrt(f2)
    return {
        "n": n,
        "ndv_est": int(hll.count()),
        "f2_est": f2,
        "collision_prob": f2 / max(n, 1) ** 2,
        "max_group_upper": max_upper,
        "suggested_buckets": max(1, int(math.ceil(max_upper / target_rows_per_bucket))),
    }
