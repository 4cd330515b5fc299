"""Streaming near-dup (streaming.neardup_stream_writer): the pairs found
incrementally across micro-batches must equal the one-shot batch path's
(and, at these LSH settings, the exact shingle-Jaccard answer)."""

import os
import shutil
import tempfile

import pytest
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


def _run_stream(spark, docs, root, src_partitions=4, **writer_kw):
    src = os.path.join(root, "src")
    if not os.path.exists(src):
        docs.repartition(src_partitions).write.parquet(src)
    q = (
        neardup_stream_writer(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            "doc_id",
            "words",
            os.path.join(root, "store"),
            os.path.join(root, "pairs"),
            os.path.join(root, "ckpt"),
            threshold=0.5,
            **writer_kw,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)


def test_bucket_pruning_never_opens_untouched_buckets(spark):
    """The store is partitioned by pmod(key, n_buckets); a read filtered
    to a bucket subset must never OPEN files in other buckets. Proof: a
    deliberately corrupted parquet file in an excluded bucket does not
    fail the pruned read, but does fail an unpruned one."""
    import glob

    from sketchlib.streaming import _read_store

    docs = _docs(spark, n=120)
    root = tempfile.mkdtemp(prefix="sk_neardup_prune_")
    try:
        _run_stream(spark, docs, root, n_buckets=8)
        keys_dir = os.path.join(root, "store", "keys")
        bucket_dirs = sorted(glob.glob(os.path.join(keys_dir, "*", "__bkt=*")))
        assert bucket_dirs, "store should be bucket-partitioned"
        victim_bucket = int(bucket_dirs[0].rsplit("=", 1)[1])
        victim_files = glob.glob(
            os.path.join(keys_dir, "*", f"__bkt={victim_bucket}", "*.parquet")
        )
        assert victim_files
        for f in victim_files:
            with open(f, "wb") as fh:
                fh.write(b"this is not a parquet file")
        schema = (
            spark.createDataFrame([], "doc_id string, band int, key long").schema
        )
        others = sorted(
            {int(d.rsplit("=", 1)[1]) for d in bucket_dirs} - {victim_bucket}
        )
        # pruned read: corrupted bucket excluded -> must succeed
        ok = _read_store(spark, keys_dir, schema, exclude_batch=-1, buckets=others)
        assert ok.count() > 0
        # unpruned read opens the corrupted file -> must fail
        with pytest.raises(Exception):
            _read_store(spark, keys_dir, schema, exclude_batch=-1).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_read_store_missing_root_is_empty_history(spark):
    """Crash-recovery: the caller's has_history probe checks only the
    FIRST sibling store (keys/), so a kill between batch 0's store
    writes can leave keys/ present while cnt/ (or shingles/) has no
    root yet. The replay's read of the missing store must see EMPTY
    history — schema-correct, zero rows — not wedge the stream on a
    FileNotFoundException."""
    from sketchlib.streaming import _read_store

    schema = spark.createDataFrame([], "doc_id string, band int, key long").schema
    missing = os.path.join(
        tempfile.mkdtemp(prefix="sk_neardup_missing_"), "store", "cnt"
    )
    df = _read_store(spark, missing, schema, exclude_batch=0)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "band", "key"]
    # bucket pruning on the empty result is a no-op, not an error
    assert _read_store(spark, missing, schema, exclude_batch=0, buckets=[1]).count() == 0


def test_reingest_same_docs_no_duplicate_pairs(spark):
    """Streaming the same corpus twice (doc_ids repeat across batches)
    must not duplicate pairs or store rows: the re-ingest guard drops
    already-seen doc_ids before matching."""
    docs = _docs(spark, n=80)
    root = tempfile.mkdtemp(prefix="sk_neardup_reingest_")
    try:
        src = os.path.join(root, "src")
        docs.repartition(2).write.parquet(src)
        # append the SAME docs again as new source files (second ingest)
        docs.repartition(2).write.mode("append").parquet(src)
        _run_stream(spark, docs, root)
        streamed = [
            (r.doc_a, r.doc_b)
            for r in neardup_pairs(spark, os.path.join(root, "pairs")).collect()
        ]
        batch = {
            (r.doc_a, r.doc_b)
            for r in minhash_neardup_pairs(docs, "doc_id", "words", threshold=0.5).collect()
        }
        assert set(streamed) == batch and len(streamed) == len(batch) > 0
        # store stays unique by doc_id
        keys = spark.read.parquet(os.path.join(root, "store", "keys"))
        per_doc_band = (
            keys.groupBy("doc_id", "band").count().filter(F.col("count") > 1).count()
        )
        assert per_doc_band == 0
        sh = spark.read.parquet(os.path.join(root, "store", "shingles"))
        assert sh.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_compact_preserves_store(spark):
    from sketchlib.streaming import neardup_compact

    docs = _docs(spark, n=100)
    root = tempfile.mkdtemp(prefix="sk_neardup_compact_")
    try:
        _run_stream(spark, docs, root)
        store = os.path.join(root, "store")
        compact = os.path.join(root, "store_c")
        neardup_compact(spark, store, compact)
        for sub in ("keys", "shingles"):
            a = spark.read.parquet(os.path.join(store, sub)).drop("batch_id", "__bkt")
            b = spark.read.parquet(os.path.join(compact, sub)).drop("batch_id", "__bkt")
            assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        # count deltas fold to the same cumulative totals
        a = (
            spark.read.parquet(os.path.join(store, "counts"))
            .groupBy("band", "key")
            .agg(F.sum("n").alias("n"))
        )
        b = (
            spark.read.parquet(os.path.join(compact, "counts"))
            .groupBy("band", "key")
            .agg(F.sum("n").alias("n"))
        )
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        # compacted generation is a single batch partition per store
        assert set(
            r.batch_id
            for r in spark.read.parquet(os.path.join(compact, "keys"))
            .select("batch_id")
            .distinct()
            .collect()
        ) == {-1}
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


def test_resume_after_compaction(spark):
    """Maintenance contract: stop the stream, fold the store with
    neardup_compact, swap it in, resume from the same checkpoint —
    continued matching against the compacted history must yield exactly
    the batch answer (compacted generations join with live batches)."""
    from sketchlib.streaming import neardup_compact

    docs = _docs(spark, n=160)
    root = tempfile.mkdtemp(prefix="sk_neardup_resume_")
    try:
        src = os.path.join(root, "src")
        docs.repartition(4).write.parquet(src)
        store = os.path.join(root, "store")
        pairs = os.path.join(root, "pairs")
        ckpt = os.path.join(root, "ckpt")

        def start(max_files):
            sdf = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .option("maxFileAge", "7d")
                .parquet(src)
            )
            return neardup_stream_writer(
                sdf, "doc_id", "words", store, pairs, ckpt, threshold=0.5
            ).trigger(availableNow=True).start()

        # phase 1: ingest everything available so far
        q = start(1)
        q.awaitTermination(600)
        # compact and swap the store between runs
        compacted = os.path.join(root, "store_c")
        neardup_compact(spark, store, compacted)
        shutil.move(store, os.path.join(root, "store_old"))
        shutil.move(compacted, store)
        # phase 2: new docs arrive (ids disjoint from phase 1)
        extra_rows = []
        for i in range(160, 200):
            words = [f"w{(i * 13 + j) % 50}" for j in range(30)]
            extra_rows.append((f"d{i:04d}", words))
            if i % 7 == 0:
                extra_rows.append((f"e{i:04d}", words[:-2] + ["x1", "x2"]))
        extra = spark.createDataFrame(extra_rows, docs.schema)
        extra.repartition(2).write.mode("append").parquet(src)
        q = start(1)
        q.awaitTermination(600)
        streamed = {
            (r.doc_a, r.doc_b) for r in neardup_pairs(spark, pairs).collect()
        }
        all_docs = docs.unionByName(extra)
        batch = {
            (r.doc_a, r.doc_b)
            for r in minhash_neardup_pairs(all_docs, "doc_id", "words", threshold=0.5).collect()
        }
        assert streamed == batch and streamed
    finally:
        shutil.rmtree(root, ignore_errors=True)
