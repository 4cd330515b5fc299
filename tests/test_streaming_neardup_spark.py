"""Streaming near-dup (streaming.neardup_stream_writer): the pairs found
incrementally across micro-batches must equal the one-shot batch path's
(and, at these LSH settings, the exact shingle-Jaccard answer)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from sketchlib.dedup import minhash_neardup_pairs
from sketchlib.streaming import neardup_clusters, neardup_pairs, neardup_stream_writer


def _docs(spark, n=300, dup_every=7):
    # deterministic corpus with planted near-dups: doc i and its "echo"
    # share most words when i % dup_every == 0
    rows = []
    for i in range(n):
        words = [f"w{(i * 13 + j) % 50}" for j in range(30)]
        rows.append((f"d{i:04d}", words))
        if i % dup_every == 0:
            rows.append((f"e{i:04d}", words[:-2] + ["x1", "x2"]))
    return spark.createDataFrame(rows, "doc_id string, words array<string>")


def test_stream_equals_batch_neardup(spark):
    docs = _docs(spark)
    root = tempfile.mkdtemp(prefix="sk_neardup_stream_")
    try:
        src = os.path.join(root, "src")
        docs.repartition(4).write.parquet(src)
        stream_df = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            neardup_stream_writer(
                stream_df,
                "doc_id",
                "words",
                os.path.join(root, "store"),
                os.path.join(root, "pairs"),
                os.path.join(root, "ckpt"),
                threshold=0.5,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        streamed = {
            (r.doc_a, r.doc_b)
            for r in neardup_pairs(spark, os.path.join(root, "pairs")).collect()
        }
        batch = {
            (r.doc_a, r.doc_b)
            for r in minhash_neardup_pairs(
                docs, "doc_id", "words", threshold=0.5
            ).collect()
        }
        assert streamed == batch
        assert len(streamed) > 0
        # exactly-once: no pair appears in two batch partitions
        dup = (
            spark.read.parquet(os.path.join(root, "pairs"))
            .groupBy("doc_a", "doc_b")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dup == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_stream_clusters_match_batch(spark):
    docs = _docs(spark, n=120)
    root = tempfile.mkdtemp(prefix="sk_neardup_cc_")
    try:
        src = os.path.join(root, "src")
        docs.repartition(3).write.parquet(src)
        stream_df = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            neardup_stream_writer(
                stream_df, "doc_id", "words",
                os.path.join(root, "store"), os.path.join(root, "pairs"),
                os.path.join(root, "ckpt"), threshold=0.5,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        from sketchlib.dedup import connected_components, minhash_neardup_pairs
        streamed = {
            (r.node, r.component)
            for r in neardup_clusters(spark, os.path.join(root, "pairs")).collect()
        }
        batch_pairs = minhash_neardup_pairs(docs, "doc_id", "words", threshold=0.5)
        batch = {
            (r.node, r.component)
            for r in connected_components(batch_pairs).collect()
        }
        assert streamed == batch and streamed
    finally:
        shutil.rmtree(root, ignore_errors=True)
