"""Spark-level tests: MinHash LSH vs exact Jaccard, exact top-k rescore."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.dedup import minhash_band_keys, minhash_neardup_pairs, shingle_col
from sketchlib.topk import topk_exact_rescore


@pytest.fixture(scope="module")
def docs(spark):
    """Synthetic docs with planted near-duplicates: pairs (i, i+1000) for
    i < 30 share most of their words; everything else is random-ish."""
    rows = []
    vocab = [f"w{j}" for j in range(200)]
    for i in range(300):
        words = [vocab[(i * 37 + k * 11) % 200] for k in range(40)]
        rows.append((i, " ".join(words)))
        if i < 30:
            # near-dup: mutate 2 of 40 words → shingle Jaccard stays high
            mutated = list(words)
            mutated[5] = "MUT5"
            mutated[25] = "MUT25"
            rows.append((i + 1000, " ".join(mutated)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.withColumn("words", F.split("text", " ")).cache()


def exact_pairs(spark, docs, threshold):
    sh = docs.select(
        "doc_id", F.explode(F.array_distinct(shingle_col("words", 3))).alias("s")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("ic"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
        .filter(F.col("ic") >= threshold * (F.col("sza") + F.col("szb") - F.col("ic")))
    )
    return {(r.doc_a, r.doc_b) for r in j.select("doc_a", "doc_b").collect()}


class TestMinHashLSH:
    def test_band_keys_shape(self, spark, docs):
        bk = minhash_band_keys(docs, "doc_id", "words", n_hashes=64, bands=16)
        row = bk.first()
        assert len(row.band_keys) == 16
        assert bk.count() == docs.count()

    def test_bands_must_divide(self, spark, docs):
        with pytest.raises(ValueError):
            minhash_band_keys(docs, "doc_id", "words", n_hashes=64, bands=7)

    def test_neardup_matches_exact(self, spark, docs):
        got = {
            (r.doc_a, r.doc_b)
            for r in minhash_neardup_pairs(
                docs, "doc_id", "words", threshold=0.5, n_hashes=64, bands=32
            ).collect()
        }
        want = exact_pairs(spark, docs, 0.5)
        # exact-verify ⇒ no false positives; 32 bands × r=2 at J>=0.5
        # ⇒ per-pair recall 1-(1-0.25)^32 ≈ 0.9999
        assert got <= want
        assert len(want) >= 30  # the planted pairs qualify
        missed = want - got
        assert len(missed) <= max(1, len(want) // 100), f"missed {missed}"

    def test_determinism(self, spark, docs):
        p1 = sorted(map(tuple, minhash_neardup_pairs(docs, "doc_id", "words").collect()))
        p2 = sorted(map(tuple, minhash_neardup_pairs(docs, "doc_id", "words").collect()))
        assert p1 == p2


class TestSimHash:
    def test_signatures_shape(self, spark, docs):
        from sketchlib.dedup import simhash_signatures

        sig = simhash_signatures(docs, "doc_id", "words")
        assert sig.count() == docs.count()

    def test_planted_neardups_found(self, spark, docs):
        # 2/40 word mutations shift ±1-vote margins (~sqrt(40) ≈ 6.3 per
        # bit), giving hamming ≈ 3-13 — measured on this fixture. With
        # max_hamming=13 < bands=16 the pigeonhole recall guarantee
        # applies, so every planted pair MUST surface. (Extras are
        # legitimate: the fixture's arithmetic-progression vocab makes
        # some unplanted doc pairs genuinely similar as word multisets.)
        from sketchlib.dedup import simhash_neardup_pairs

        got = {
            (r.doc_a, r.doc_b)
            for r in simhash_neardup_pairs(
                docs, "doc_id", "words", max_hamming=13, bands=16
            ).collect()
        }
        planted = {(i, i + 1000) for i in range(30)}
        assert planted <= got, planted - got

    def test_banding_recall_guarantee(self, spark, docs):
        # max_hamming < bands ⇒ pigeonhole: candidates lose nothing, so
        # band-blocked output == full signature-pair scan output
        from sketchlib.dedup import simhash_neardup_pairs, simhash_signatures
        from pyspark.sql import functions as F

        sig = simhash_signatures(docs, "doc_id", "words").cache()
        a, b = sig.alias("a"), sig.alias("b")
        full = (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .filter(F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))) <= 3)
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        )
        want = {(r.doc_a, r.doc_b) for r in full.collect()}
        got = {
            (r.doc_a, r.doc_b)
            for r in simhash_neardup_pairs(docs, "doc_id", "words", max_hamming=3, bands=4).collect()
        }
        assert got == want
        sig.unpersist()


class TestTopKExactRescore:
    def test_matches_full_agg(self, spark, seq_small):
        flat = seq_small.select("source", F.explode("tokens").alias("tok"))
        got = topk_exact_rescore(flat, ["source"], "tok", k=10, candidates_per_part=64)
        exact = (
            flat.groupBy("source", "tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn(
                "rn",
                F.row_number().over(
                    __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                        "source"
                    ).orderBy(F.desc("cnt"), F.asc("tok"))
                ),
            )
            .filter(F.col("rn") <= 10)
        )
        g = {(r.source, r.value, r.cnt) for r in got.collect()}
        w = {(r.source, r.tok, r.cnt) for r in exact.collect()}
        assert g == w

    def test_certificate_fallback_flat_distribution(self, spark):
        # every value appears exactly once across many partitions: the
        # certificate cannot hold, so the exact fallback must kick in
        df = spark.range(0, 2000, numPartitions=8).select(
            F.lit("g").alias("g"), (F.col("id") % 500).alias("v")
        )
        got = topk_exact_rescore(df, ["g"], "v", k=5, candidates_per_part=3)
        rows = sorted((r.value, r.cnt) for r in got.collect())
        assert rows == [(0, 4), (1, 4), (2, 4), (3, 4), (4, 4)]
