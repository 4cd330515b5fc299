"""tokenops: BPE pair stats + merge, bigram LM scoring, temperature
mixing, and segment-level dedup invariants."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import Row, functions as F

from sketchlib import gen
from sketchlib.dedup import segment_dedup
from sketchlib.tokenops import (
    bigram_counts,
    bpe_merge_step,
    bpe_train,
    fit_bigram_lm,
    novelty_signals,
    pair_counts,
    perplexity_score,
    temperature_mix,
    top_pair,
)


def _merge_ref(seq: list[int], t1: int, t2: int, new_id: int) -> list[int]:
    """Reference left-to-right non-overlapping BPE merge."""
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == t1 and seq[i + 1] == t2:
            out.append(new_id)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def test_pair_counts_matches_numpy(spark):
    df = gen.sequences_df(spark, 200).select("doc_id", "tokens")
    got = {
        (r["t1"], r["t2"]): r["cnt"] for r in pair_counts(df, "tokens").collect()
    }
    ref = {}
    batch = gen.ref_batch(np.arange(200))
    toks = batch.column("tokens").to_pylist()
    for seq in toks:
        for a, b in zip(seq, seq[1:]):
            ref[(a, b)] = ref.get((a, b), 0) + 1
    assert got == ref


@pytest.mark.parametrize(
    "seqs,pair",
    [
        ([[1, 2, 3, 1, 2], [2, 3], [1], []], (1, 2)),
        ([[7, 7, 7], [7, 7, 7, 7], [7]], (7, 7)),  # overlapping self-pair runs
        ([[1, 2], [2, 1, 2, 1]], (2, 1)),
        ([[5, 5, 5, 5, 5, 5, 5]], (5, 5)),
    ],
)
def test_bpe_merge_step_matches_reference(spark, seqs, pair):
    df = spark.createDataFrame(
        [Row(doc_id=i, tokens=s) for i, s in enumerate(seqs)],
        "doc_id int, tokens array<bigint>",
    ).repartition(1)  # one Arrow batch => exercises cross-sequence boundaries
    out = bpe_merge_step(df, "tokens", pair[0], pair[1], 999)
    got = {r["doc_id"]: r["tokens"] for r in out.collect()}
    for i, s in enumerate(seqs):
        assert got[i] == _merge_ref(s, pair[0], pair[1], 999), (i, s)


def test_bpe_merge_no_cross_sequence_pairs(spark):
    # last token of doc 0 + first token of doc 1 form the pair ONLY
    # across the boundary; nothing may merge
    df = spark.createDataFrame(
        [Row(doc_id=0, tokens=[1, 2, 3]), Row(doc_id=1, tokens=[4, 5])],
        "doc_id int, tokens array<bigint>",
    ).repartition(1)
    out = bpe_merge_step(df, "tokens", 3, 4, 999)
    got = {r["doc_id"]: r["tokens"] for r in out.collect()}
    assert got == {0: [1, 2, 3], 1: [4, 5]}


def test_bpe_merge_preserves_null_sequences(spark):
    """ADVICE r3: NULL token arrays must stay NULL through the Arrow
    rewrite, not silently become [] (the rebuilt ListArray previously
    dropped the validity bitmap)."""
    df = spark.createDataFrame(
        [
            Row(doc_id=0, tokens=[1, 2, 3]),
            Row(doc_id=1, tokens=None),
            Row(doc_id=2, tokens=[]),
            Row(doc_id=3, tokens=[1, 2]),
        ],
        "doc_id int, tokens array<bigint>",
    ).repartition(1)
    out = bpe_merge_step(df, "tokens", 1, 2, 999)
    got = {r["doc_id"]: r["tokens"] for r in out.collect()}
    assert got[0] == [999, 3]
    assert got[1] is None  # NULL preserved, not []
    assert got[2] == []  # empty stays empty
    assert got[3] == [999]


def test_bpe_train_deterministic_and_correct(spark):
    df = gen.sequences_df(spark, 120).select("tokens")
    out, merges = bpe_train(df, "tokens", n_merges=3, first_new_id=1_000_000)
    out2, merges2 = bpe_train(df, "tokens", n_merges=3, first_new_id=1_000_000)
    assert merges == merges2 and len(merges) == 3
    # python reference over the same corpus
    seqs = gen.ref_batch(np.arange(120)).column("tokens").to_pylist()
    ref_merges = []
    for step in range(3):
        cnt = {}
        for s in seqs:
            for a, b in zip(s, s[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        nid = 1_000_000 + step
        ref_merges.append((a, b, nid))
        seqs = [_merge_ref(s, a, b, nid) for s in seqs]
        assert c >= 2
    assert merges == ref_merges
    got_total = out.select(F.sum(F.size("tokens"))).first()[0]
    assert got_total == sum(len(s) for s in seqs)
    out.unpersist()


def test_novelty_signals_closed_form(spark):
    # ref doc supplies bigrams (a,b) and (b,a); probe doc "a b c" has
    # bigrams (a,b) seen and (b,c) unseen; short doc has none
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, words=["a", "b", "a"]),
            Row(doc_id=1, words=["a", "b", "c"]),
            Row(doc_id=2, words=["x"]),
        ],
        "doc_id int, words array<string>",
    )
    ref = bigram_counts(docs.filter("doc_id = 0"), "words")
    sig = {
        r["doc_id"]: (r["n_bigrams"], r["n_unseen"])
        for r in novelty_signals(docs, "doc_id", "words", ref).collect()
    }
    assert sig == {0: (2, 0), 1: (2, 1), 2: (0, 0)}


def test_perplexity_matches_numpy(spark):
    docs = gen.sequences_df(spark, 80).select(
        "doc_id", F.col("tokens").cast("array<bigint>").alias("words")
    )
    ref = docs.filter(F.xxhash64("doc_id") % 4 == 0)
    bi, uni, v = fit_bigram_lm(ref, "words")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logppl"])
        for r in perplexity_score(docs, "doc_id", "words", bi, uni, v, k=1.0).collect()
    }
    bi.unpersist()
    # numpy oracle
    rows = docs.select("doc_id", "words").collect()
    ref_ids = {r["doc_id"] for r in ref.select("doc_id").collect()}
    c2, c1, vocab = {}, {}, set()
    for r in rows:
        s = r["words"]
        vocab.update(s) if r["doc_id"] in ref_ids else None
        if r["doc_id"] in ref_ids:
            for a, b in zip(s, s[1:]):
                c2[(a, b)] = c2.get((a, b), 0) + 1
                c1[a] = c1.get(a, 0) + 1
    nv = len({w for r in rows if r["doc_id"] in ref_ids for w in r["words"]})
    assert nv == v
    for r in rows:
        s = r["words"]
        lps = [
            -math.log2((c2.get((a, b), 0) + 1.0) / (c1.get(a, 0) + nv))
            for a, b in zip(s, s[1:])
        ]
        n, val = got[r["doc_id"]]
        assert n == len(lps)
        assert val == pytest.approx(sum(lps) / len(lps), rel=1e-9)


def test_temperature_mix_targets_and_determinism(spark):
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    kept = temperature_mix(docs, "source", "doc_id", alpha=0.5, scale=3.0)
    per = {r["source"]: r["cnt"] for r in kept.groupBy("source").count().withColumnRenamed("count", "cnt").collect()}
    # each source has 250 docs -> target floor(sqrt(9*250)) = 47
    assert per == {f"s{i}": 47 for i in range(4)}
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"] for r in temperature_mix(docs, "source", "doc_id", 0.5, 3.0).collect()
    )
    assert ids1 == ids2
    # flattening: a 16x bigger source gains only 4x the quota
    docs2 = spark.range(4250).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 4000, "big").otherwise("small").alias("source"),
    )
    per2 = {
        r["source"]: r["cnt"]
        for r in temperature_mix(docs2, "source", "doc_id", 0.5, 3.0)
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    assert per2["big"] == math.isqrt(9 * 4000) and per2["small"] == math.isqrt(9 * 250)


def test_segment_dedup_planted(spark):
    # doc 0 and doc 1 share their first 5-word segment exactly; doc 1's
    # copy must drop, its unique tail must survive, reassembled in order
    seg = "w1 w2 w3 w4 w5"
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, words=(seg + " a b c d e").split(" ")),
            Row(doc_id=1, words=(seg + " f g h i j k").split(" ")),
            Row(doc_id=2, words=seg.split(" ")),
        ],
        "doc_id int, words array<string>",
    )
    out = {r["doc_id"]: r for r in segment_dedup(docs, "doc_id", "words", 5).collect()}
    assert (out[0]["n_segments"], out[0]["n_kept"]) == (2, 2)
    assert out[0]["clean_text"] == seg + " a b c d e"
    assert (out[1]["n_segments"], out[1]["n_kept"]) == (3, 2)
    assert out[1]["clean_text"] == "f g h i j k"
    assert (out[2]["n_segments"], out[2]["n_kept"]) == (1, 0)
    assert out[2]["clean_text"] == ""


def test_segment_dedup_kept_segments_unique(spark):
    docs = gen.sequences_df(spark, 150).select(
        "doc_id", F.transform("tokens", lambda t: t.cast("string")).alias("words")
    )
    out = segment_dedup(docs, "doc_id", "words", seg_words=4)
    segs = out.select(
        F.explode(F.split("clean_text", " ")).alias("w")
    )  # not segment-unique (words repeat) — instead re-segment kept text
    # invariant: total kept == distinct segments over the corpus
    resegmented = (
        docs.select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0), F.ceil(F.size("words") / 4).cast("int") - 1
                    ),
                    lambda i: F.array_join(F.slice("words", i * 4 + 1, 4), " "),
                )
            ).alias("seg")
        )
        .agg(F.countDistinct("seg"))
        .first()[0]
    )
    assert out.agg(F.sum("n_kept")).first()[0] == resegmented
    assert segs.count() > 0


def test_top_pair_tiebreak(spark):
    df = spark.createDataFrame(
        [Row(tokens=[3, 4]), Row(tokens=[1, 2])], "tokens array<bigint>"
    )
    assert top_pair(pair_counts(df, "tokens")) == (1, 2, 1)


def test_pack_sequences_matches_numpy(spark):
    from sketchlib.tokenops import pack_sequences

    df = gen.sequences_df(spark, 300).select(
        "doc_id", F.col("tokens").cast("array<bigint>").alias("tokens")
    )
    L = 128
    got = {
        r["block_id"]: (r["n_parts"], r["tokens"])
        for r in pack_sequences(df, "doc_id", "tokens", L).collect()
    }
    got_starts = {
        r["block_id"]: r["part_starts"]
        for r in pack_sequences(df, "doc_id", "tokens", L).collect()
    }
    seqs = gen.ref_batch(np.arange(300)).column("tokens").to_pylist()
    flat = [t for s in seqs for t in s]
    n_blocks = (len(flat) + L - 1) // L
    assert set(got) == set(range(n_blocks))
    # exact content of every block
    for b in range(n_blocks):
        assert got[b][1] == flat[b * L : (b + 1) * L], b
    # n_parts: docs overlapping the block's span
    starts = np.cumsum([0] + [len(s) for s in seqs])
    for b in range(n_blocks):
        lo, hi = b * L, min((b + 1) * L, len(flat))
        n_parts = sum(
            1
            for i in range(len(seqs))
            if starts[i] < hi and starts[i + 1] > lo
        )
        assert got[b][0] == n_parts, b
        want_starts = sorted(
            max(int(starts[i]) - lo, 0)
            for i in range(len(seqs))
            if starts[i] < hi and starts[i + 1] > lo
        )
        assert got_starts[b] == want_starts, b
    # every block full except possibly the last
    for b in range(n_blocks - 1):
        assert len(got[b][1]) == L


def test_pack_sequences_skips_empty_docs(spark):
    from sketchlib.tokenops import pack_sequences

    df = spark.createDataFrame(
        [Row(doc_id=0, tokens=[1, 2, 3]), Row(doc_id=1, tokens=[]),
         Row(doc_id=2, tokens=[4, 5])],
        "doc_id int, tokens array<bigint>",
    )
    out = pack_sequences(df, "doc_id", "tokens", 4).orderBy("block_id").collect()
    assert [r["tokens"] for r in out] == [[1, 2, 3, 4], [5]]
    assert [r["n_parts"] for r in out] == [2, 1]
    assert [r["part_starts"] for r in out] == [[0, 3], [0]]


def test_epoch_shuffle_shards_properties(spark):
    from sketchlib.tokenops import epoch_shuffle_shards

    docs = spark.range(103).select(F.col("id").alias("doc_id"))
    sh = epoch_shuffle_shards(docs, "doc_id", n_shards=4, epoch=0)
    rows = sh.collect()
    # permutation: ranks are exactly 0..n-1
    assert sorted(r["__rank"] for r in rows) == list(range(103))
    # round-robin balance to +-1
    per = {}
    for r in rows:
        per[r["shard"]] = per.get(r["shard"], 0) + 1
    assert max(per.values()) - min(per.values()) <= 1 and set(per) == {0, 1, 2, 3}
    # deterministic per epoch, different across epochs
    again = {
        r["doc_id"]: r["shard"]
        for r in epoch_shuffle_shards(docs, "doc_id", 4, epoch=0).collect()
    }
    assert again == {r["doc_id"]: r["shard"] for r in rows}
    other = {
        r["doc_id"]: r["shard"]
        for r in epoch_shuffle_shards(docs, "doc_id", 4, epoch=1).collect()
    }
    assert other != again


def test_merge_pair_flat_property():
    """Randomized cross-check of the vectorized merge kernel vs the
    sequential reference, over many boundary-heavy layouts."""
    from sketchlib.tokenops import _merge_pair_flat

    rng = np.random.default_rng(7)
    for trial in range(200):
        n_seq = int(rng.integers(1, 6))
        seqs = [
            list(rng.integers(0, 4, size=int(rng.integers(0, 9))))
            for _ in range(n_seq)
        ]
        t1, t2 = int(rng.integers(0, 4)), int(rng.integers(0, 4))
        flat = np.array([t for s in seqs for t in s], dtype=np.int64)
        offsets = np.cumsum([0] + [len(s) for s in seqs]).astype(np.int64)
        got_flat, got_off = _merge_pair_flat(flat, offsets, t1, t2, 99)
        ref = [_merge_ref(s, t1, t2, 99) for s in seqs]
        ref_flat = [t for s in ref for t in s]
        assert got_flat.tolist() == ref_flat, (seqs, t1, t2)
        assert got_off.tolist() == np.cumsum([0] + [len(s) for s in ref]).tolist()


def test_fit_vocab_and_encode(spark):
    from sketchlib.tokenops import encode_docs, fit_vocab

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, words=["b", "a", "b", "c", "b"]),
            Row(doc_id=1, words=["a", "b", "a", "zz"]),
            Row(doc_id=2, words=[]),
        ],
        "doc_id int, words array<string>",
    )
    vocab = {r["word"]: (r["token_id"], r["cnt"]) for r in fit_vocab(docs, "words").collect()}
    # b:4, a:3, c:1, zz:1 -> ranks (cnt desc, word asc)
    assert vocab == {"b": (0, 4), "a": (1, 3), "c": (2, 1), "zz": (3, 1)}
    # min_count/max_size trims
    v2 = fit_vocab(docs, "words", min_count=2)
    enc = {
        r["doc_id"]: (r["tokens"], r["n_tok"], r["n_oov"])
        for r in encode_docs(docs, "doc_id", "words", v2, oov_id=-1).collect()
    }
    assert enc[0] == ([0, 1, 0, -1, 0], 5, 1)
    assert enc[1] == ([1, 0, 1, -1], 4, 1)
    assert enc[2] == ([], 0, 0)


def test_fit_vocab_matches_single_window(spark):
    """Two-phase rank == plain global-window rank on a real corpus."""
    from pyspark.sql import Window

    from sketchlib.tokenops import fit_vocab

    docs = gen.sequences_df(spark, 100).select(
        F.transform("tokens", lambda t: t.cast("string")).alias("words")
    )
    got = {r["word"]: r["token_id"] for r in fit_vocab(docs, "words").collect()}
    counts = (
        docs.select(F.explode("words").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    ref = {
        r["word"]: r["rk"] - 1
        for r in counts.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == ref


def test_hash_split_deterministic_and_exhaustive(spark):
    from sketchlib.textops import hash_split

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    w = {"train": 900, "val": 50, "test": 50}
    out = hash_split(docs, "doc_id", w)
    rows = out.collect()
    assert len(rows) == 2000 and all(r["split"] in w for r in rows)
    per = {}
    for r in rows:
        per[r["split"]] = per.get(r["split"], 0) + 1
    # proportions roughly honored (md5 is uniform; 2000 draws)
    assert 1700 < per["train"] < 1950 and per["val"] > 20 and per["test"] > 20
    again = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", w).collect()}
    assert again == {r["doc_id"]: r["split"] for r in rows}
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"train": 1, "val": 1})


def test_pack_sequences_randomized_property():
    """Randomized flatten-and-chunk check of the packing arithmetic
    (block spans, local slice indices) against a python reference —
    pure driver-side math on the same formulas the Spark expressions
    use, over boundary-heavy layouts including empty docs."""
    rng = np.random.default_rng(11)
    for trial in range(300):
        L = int(rng.integers(1, 9))
        lengths = [int(rng.integers(0, 3 * L)) for _ in range(int(rng.integers(1, 8)))]
        # the span/slice formulas from pack_sequences
        start = 0
        blocks: dict[int, list] = {}
        for n in lengths:
            if n == 0:
                continue
            b0, b1 = start // L, (start + n - 1) // L
            for b in range(b0, b1 + 1):
                gs, ge = max(b * L, start), min((b + 1) * L, start + n)
                blocks.setdefault(b, []).append((gs, gs - start, ge - start))
            start += n
        # reference: concat then chunk
        total = sum(lengths)
        n_blocks = (total + L - 1) // L
        assert set(blocks) == set(range(n_blocks))
        for b, parts in blocks.items():
            covered = sorted((gs, lo, hi) for gs, lo, hi in parts)
            width = sum(hi - lo for _, lo, hi in covered)
            expect = min((b + 1) * L, total) - b * L
            assert width == expect, (trial, b)
            # parts tile the block contiguously in gs order
            cur = b * L
            for gs, lo, hi in covered:
                assert gs == cur
                cur += hi - lo
