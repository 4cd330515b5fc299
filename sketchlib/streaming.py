"""Structured Streaming adapter: continuously-updated sketch states.

The reference's structures are one-pass stream consumers by construction
(`add(x)` per element); the Spark expression is ``foreachBatch``: each
micro-batch runs the same stage-1 partial build as the batch path, and
appends its partial states to a parquet state store partitioned by
``batch_id``. Because every kernel merge is associative + commutative
(reference merge-equivalence contract, hyperloglog/mod.rs:556-574),
batch boundaries, arrival order, and replays never change the merged
result — no watermarks needed (SURVEY.md §2.5 streaming row).

Exactly-once: the store is partitioned by batch_id and written with
dynamic partition overwrite, so a replayed micro-batch (foreachBatch's
at-least-once contract) replaces its own partition instead of
double-counting.

Reads merge on the fly (:func:`current_states`); :func:`compact`
folds all batch partitions into one to bound read fan-in on
long-running streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .agg import SketchSpec, build_partials, merge_partials

_BATCH_COL = "batch_id"


def sketch_stream_writer(
    stream_df: DataFrame,
    group_cols: list[str],
    specs: list[SketchSpec],
    state_path: str,
    checkpoint_dir: str,
):
    """``writeStream`` builder whose foreachBatch maintains the sketch
    state store. Start with ``.start()``; combine with any trigger."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partials = build_partials(batch_df, group_cols, specs).withColumn(
            _BATCH_COL, F.lit(int(batch_id))
        )
        (
            partials.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(_BATCH_COL)
            .parquet(state_path)
        )

    return (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def current_states(
    spark: SparkSession,
    state_path: str,
    group_cols: list[str],
    fanout: int | None = 32,
) -> DataFrame:
    """Merge-on-read: one row per (group, sketch) across all batches."""
    partials = spark.read.parquet(state_path).drop(_BATCH_COL)
    return merge_partials(partials, group_cols, fanout)


def compact(
    spark: SparkSession,
    state_path: str,
    group_cols: list[str],
    compact_path: str,
    fanout: int | None = 32,
) -> None:
    """Fold the per-batch partials into a single merged partition set.
    Writes to ``compact_path`` (callers swap paths/views atomically —
    same pattern as any streaming table maintenance job)."""
    merged = current_states(spark, state_path, group_cols, fanout)
    out = merged.withColumnRenamed("n_partials", "n_rows").withColumn(
        "part_id", F.lit(0).cast("int")
    )
    out.withColumn(_BATCH_COL, F.lit(-1)).write.mode("overwrite").partitionBy(
        _BATCH_COL
    ).parquet(compact_path)
