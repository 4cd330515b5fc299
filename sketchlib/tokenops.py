"""Token-sequence operators for training-data pipelines (BPE-style
pair statistics and merges, bigram language-model scoring, temperature
mixing).

These operate on the north-rule input shape — ``tokens array<int32>``
sequences (sketchlib.gen) — and, generically, on any array column
(word arrays from ``split(text)`` work identically, which is what the
oracle-checked driver queries use).

- :func:`pair_counts` — corpus-wide adjacent-pair frequencies, the
  counting step of byte-pair encoding (Sennrich et al., ACL 2016,
  "Neural Machine Translation of Rare Words with Subword Units").
  Pure JVM expressions: slice/zip/explode + one grouped count, so the
  only shuffle is the partial-aggregated pair table.
- :func:`bpe_merge_step` / :func:`bpe_train` — apply the top-ranked
  merge to every sequence (vectorized numpy over flattened Arrow
  batches, standard left-to-right non-overlapping BPE semantics) and
  the train loop that alternates count → merge. One groupBy + one
  mapInArrow per merge; sequences never leave the executors.
- :func:`bigram_counts` / :func:`novelty_signals` — reference-corpus
  bigram table and per-doc unseen-bigram counts (all integers, so the
  filter thresholds are exact cross-multiplications in any engine).
  This is the shape of a CCNet-style LM quality filter (Wenzek et al.,
  LREC 2020) with the float LM replaced by an integer novelty score
  for engine-exact verification.
- :func:`perplexity_score` — the float version: add-k smoothed bigram
  log-perplexity per document against a fitted reference LM, computed
  with a shuffled join + grouped sum (no Python in the plan).
  Float summation order is engine-dependent, so this one is
  pytest-verified against a numpy oracle rather than hash-compared.
- :func:`temperature_mix` — deterministic temperature-weighted source
  mixing (multilingual-pretraining style, Conneau & Lample 2019):
  per-source keep target ``min(n_s, floor(scale * n_s**alpha))``,
  keeping the docs with the smallest ``md5(id)`` so every engine
  draws the identical sample. With ``alpha=0.5`` the target uses
  IEEE ``sqrt`` (correctly rounded ⇒ bit-identical across engines).

At 100 TB: pair counting shuffles only (t1, t2) pairs after map-side
partial aggregation — the pair-id space is at most V² but in practice
Zipf-concentrated, and skew on hot pairs is absorbed by the partial
agg (each task emits each pair once). A merge step is embarrassingly
parallel. The novelty join shuffles (gram → doc) once; the reference
table stays a broadcast when it is a benchmark-sized contamination
set and falls back to a shuffled join when it is corpus-scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from . import caches

__all__ = [
    "pair_counts",
    "top_pair",
    "bpe_merge_step",
    "bpe_train",
    "bigram_counts",
    "novelty_signals",
    "fit_bigram_lm",
    "perplexity_score",
    "temperature_mix",
]


# ------------------------------------------------------------- pair stats


def pair_counts(df: DataFrame, seq_col: str) -> DataFrame:
    """Adjacent-pair frequencies over an array column.

    Returns ``(t1, t2, cnt)`` with element types matching the array's.
    ``zip_with`` over the two off-by-one slices keeps everything in
    whole-stage codegen; the grouped count partial-aggregates map-side
    so the shuffle carries one row per distinct pair per task.
    """
    seq = F.col(seq_col)
    n = F.size(seq)
    pairs = F.zip_with(
        F.slice(seq, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(seq, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("t1"), b.alias("t2")),
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.t1", "p.t2")
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def top_pair(pairs: DataFrame) -> tuple:
    """The (t1, t2, cnt) row with the highest count; ties broken by
    ascending (t1, t2) so the winner is deterministic in any engine."""
    row = pairs.orderBy(F.desc("cnt"), F.asc("t1"), F.asc("t2")).first()
    return (row["t1"], row["t2"], row["cnt"])


# ------------------------------------------------------------- BPE merge


def _merge_pair_flat(
    flat: np.ndarray, offsets: np.ndarray, t1: int, t2: int, new_id: int
) -> tuple[np.ndarray, np.ndarray]:
    """Apply one BPE merge to a flattened batch of sequences.

    ``flat`` is the concatenation of all sequences, ``offsets`` the
    (n+1,) int64 boundaries. Standard left-to-right non-overlapping
    semantics: in a run like ``a a a`` with pair (a, a), the first two
    merge and the third survives. Fully vectorized: candidate
    positions → consecutive-run split → keep alternating members of
    each run (for the ``t1 == t2`` self-pair case; distinct pairs
    cannot overlap and keep every candidate).
    """
    if flat.size < 2:
        return flat.copy(), offsets.copy()
    cand = np.nonzero((flat[:-1] == t1) & (flat[1:] == t2))[0]
    # a pair spanning two sequences is not a pair
    starts = offsets[1:-1]  # interior boundaries
    if starts.size:
        spans = np.isin(cand + 1, starts)
        cand = cand[~spans]
    if cand.size and t1 == t2:
        # overlapping self-pairs: within each run of consecutive
        # candidates keep positions 0, 2, 4, ...
        run_break = np.empty(cand.size, dtype=bool)
        run_break[0] = True
        run_break[1:] = np.diff(cand) > 1
        run_id = np.cumsum(run_break) - 1
        run_first = cand[run_break][run_id]
        keep = ((cand - run_first) % 2) == 0
        cand = cand[keep]
    if cand.size == 0:
        return flat.copy(), offsets.copy()
    out = flat.copy()
    out[cand] = new_id
    # drop the second element of each merged pair
    drop = np.zeros(flat.size, dtype=bool)
    drop[cand + 1] = True
    # per-sequence drop counts -> new offsets
    seq_of = np.searchsorted(offsets, cand + 1, side="right") - 1
    drops_per_seq = np.bincount(seq_of, minlength=offsets.size - 1)
    new_offsets = offsets.copy()
    new_offsets[1:] -= np.cumsum(drops_per_seq)
    return out[~drop], new_offsets


def bpe_merge_step(
    df: DataFrame, seq_col: str, t1: int, t2: int, new_id: int
) -> DataFrame:
    """Rewrite every sequence replacing adjacent (t1, t2) with
    ``new_id`` (one BPE merge). ``mapInArrow`` over the flattened
    list buffer — one numpy pass per batch, no per-row Python, no
    shuffle. Other columns pass through unchanged."""
    schema = df.schema
    names = [f.name for f in schema.fields]
    seq_idx = names.index(seq_col)

    def run(batches):
        for b in batches:
            lst = b.column(seq_idx)
            offsets = np.asarray(lst.offsets, dtype=np.int64)
            flat = np.asarray(lst.values, dtype=np.int64)[offsets[0] : offsets[-1]]
            offsets = offsets - offsets[0]
            new_flat, new_off = _merge_pair_flat(flat, offsets, t1, t2, new_id)
            # carry the input validity bitmap: without it NULL token
            # arrays silently become [] (ADVICE r3); null slots have
            # zero extent so the rewrite leaves their offsets intact
            new_col = pa.ListArray.from_arrays(
                pa.array(new_off, type=pa.int32()),
                pa.array(new_flat, type=pa.int64()),
                mask=lst.is_null() if lst.null_count else None,
            )
            arrays = [
                new_col if i == seq_idx else b.column(i)
                for i in range(b.num_columns)
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    out_fields = []
    for f in schema.fields:
        if f.name == seq_col:
            out_fields.append(f"{f.name} array<bigint>")
        else:
            out_fields.append(f"{f.name} {f.dataType.simpleString()}")
    return df.mapInArrow(run, ", ".join(out_fields))


def bpe_train(
    df: DataFrame, seq_col: str, n_merges: int, first_new_id: int
) -> tuple[DataFrame, list[tuple[int, int, int]]]:
    """Run ``n_merges`` BPE iterations: count pairs, take the
    deterministic top pair, rewrite, repeat. Returns the rewritten
    DataFrame and the merge table ``[(t1, t2, new_id), ...]``.

    Each iteration is one grouped count (pair rows only shuffle) and
    one shuffle-free Arrow rewrite; the working set is cached between
    iterations and unpersisted when replaced, so the lineage never
    grows beyond one step.
    """
    merges: list[tuple[int, int, int]] = []
    # all other columns pass through untouched (bpe_merge_step keeps
    # them), so the trained frame chains straight into pack_sequences
    cur = df.withColumn(seq_col, F.col(seq_col).cast("array<bigint>"))
    cur = cur.persist()
    try:
        for i in range(n_merges):
            counts = pair_counts(cur, seq_col)
            if counts.isEmpty():
                break
            t1, t2, cnt = top_pair(counts)
            if cnt < 2:
                break
            new_id = first_new_id + i
            merges.append((int(t1), int(t2), new_id))
            nxt = bpe_merge_step(cur, seq_col, int(t1), int(t2), new_id).persist()
            nxt.count()  # materialize before dropping the parent
            cur.unpersist()
            cur = nxt
        # the returned frame stays persisted for the caller; register it
        # so caches.release_caches() can drop it deterministically (the
        # rewrite chain is deterministic, so a post-release recompute is
        # merely slower, never different)
        return caches.register(cur, owner="tokenops.bpe"), merges
    except Exception:
        cur.unpersist()
        raise


# --------------------------------------------------------- bigram LM ops


def bigram_counts(df: DataFrame, words_col: str) -> DataFrame:
    """Distinct-document-agnostic bigram occurrence counts
    ``(w1, w2, c)`` — :func:`pair_counts` under its LM name."""
    return pair_counts(df, words_col).select(
        F.col("t1").alias("w1"), F.col("t2").alias("w2"), F.col("cnt").alias("c")
    )


def novelty_signals(
    df: DataFrame, id_col: str, words_col: str, ref_grams: DataFrame
) -> DataFrame:
    """Per-doc integer novelty: ``(id, n_bigrams, n_unseen)`` where
    ``n_unseen`` counts bigram OCCURRENCES whose (w1, w2) never occurs
    in ``ref_grams`` (columns w1, w2). Docs with < 2 words get
    (0, 0). All-integer so thresholds like "more than 60% unseen"
    are the exact comparison ``n_unseen * 1000 > 600 * n_bigrams``.
    """
    seq = F.col(words_col)
    n = F.size(seq)
    pairs = F.zip_with(
        F.slice(seq, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(seq, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_grams = df.select(
        F.col(id_col).alias("__id"), F.explode_outer(pairs).alias("p")
    ).select("__id", "p.w1", "p.w2")
    ref = ref_grams.select("w1", "w2").distinct()
    joined = doc_grams.join(ref.withColumn("__seen", F.lit(1)), ["w1", "w2"], "left")
    return (
        joined.groupBy("__id")
        .agg(
            F.sum(F.when(F.col("w1").isNotNull(), 1).otherwise(0)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("w1").isNotNull() & F.col("__seen").isNull(), 1).otherwise(0)
            ).alias("n_unseen"),
        )
        .select(F.col("__id").alias(id_col), "n_bigrams", "n_unseen")
    )


def fit_bigram_lm(df: DataFrame, words_col: str) -> tuple[DataFrame, DataFrame, int]:
    """Fit the add-k bigram LM tables: returns (bigrams(w1,w2,c),
    unigrams(w1,c1), vocab_size). One pass / two grouped counts."""
    bi = caches.register(bigram_counts(df, words_col).persist(), owner="tokenops.lm")
    uni = bi.groupBy("w1").agg(F.sum("c").alias("c1"))
    vocab = df.select(F.explode(words_col).alias("w")).agg(
        F.countDistinct("w").alias("v")
    ).first()["v"]
    return bi, uni, int(vocab)


def perplexity_score(
    df: DataFrame,
    id_col: str,
    words_col: str,
    bigrams: DataFrame,
    unigrams: DataFrame,
    vocab_size: int,
    k: float = 1.0,
) -> DataFrame:
    """Per-doc add-k-smoothed bigram log2-perplexity
    ``(id, n_bigrams, logppl)``:

        logppl = -(1/n) * sum log2((c(w1 w2) + k) / (c1(w1) + k*V))

    Join doc bigram occurrences to the LM tables, grouped float sum.
    Deterministic up to float summation order — verified in pytest
    against a numpy oracle with tolerance, not hash-compared.
    """
    seq = F.col(words_col)
    n = F.size(seq)
    pairs = F.zip_with(
        F.slice(seq, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(seq, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_grams = df.select(F.col(id_col).alias("__id"), F.explode(pairs).alias("p")).select(
        "__id", "p.w1", "p.w2"
    )
    kv = float(k) * float(vocab_size)
    joined = (
        doc_grams.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams, ["w1"], "left")
        .select(
            "__id",
            (
                F.log2(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(float(k)))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(kv))
                )
            ).alias("lp"),
        )
    )
    return (
        joined.groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), (-F.sum("lp") / F.count(F.lit(1))).alias("logppl"))
        .select(F.col("__id").alias(id_col), "n_bigrams", "logppl")
    )


# ------------------------------------------------------ temperature mix


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float = 0.5,
    scale: float = 4.0,
) -> DataFrame:
    """Deterministic temperature-weighted source mixing: per source
    keep the ``min(n_s, floor(scale * n_s**alpha))`` docs with the
    smallest ``md5(id)``. Down-weights huge sources (alpha < 1
    flattens the source distribution — the multilingual-pretraining
    sampling rule applied as a reproducible hard subset).

    One grouped count (broadcast back — one row per source) and one
    rank-within-source window. For ``alpha=0.5`` the target is
    ``floor(sqrt(scale² · n))`` — IEEE ``sqrt`` is correctly rounded
    (unlike ``pow``), so any engine computes the identical integer.
    General alpha falls back to ``pow`` (fine in one engine; don't
    hash-compare across engines at pow's 1-ulp tolerance).
    """
    from pyspark.sql import Window

    if alpha == 0.5:
        raw = F.floor(F.sqrt(F.col("__n") * F.lit(float(scale) * float(scale))))
    else:
        raw = F.floor(F.lit(float(scale)) * F.pow(F.col("__n"), F.lit(float(alpha))))
    targets = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__target", F.least(F.col("__n"), raw))
    )
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(targets), [source_col])
        .filter(F.col("__rn") <= F.col("__target"))
        .drop("__rn", "__n", "__target")
    )


# ------------------------------------------------------ sequence packing


def global_offsets(df: DataFrame, order_col, len_col, n_parts: int = 0) -> DataFrame:
    """Exclusive global running sum of ``len_col`` in ``order_col``
    order, WITHOUT a single-partition global window: range-partition
    on the order key, cumsum within each partition, then add the
    broadcast prefix of per-partition totals (the classic two-phase
    scan — at 100 TB the only small data is one row per partition).

    Adds ``__start`` (the row's exclusive prefix sum). ``len_col`` may
    be a column name or expression; ``order_col`` a column name or a
    LIST of ordering expressions (e.g. ``[F.desc("cnt"), F.asc("w")]``
    — the total order must be unambiguous for the result to be
    deterministic).

    Cache lifecycle: the range-partitioned input is persisted because
    the partition boundaries come from sampling — the totals job and
    the output must see the SAME partitioning (recomputing could
    resample different boundaries and corrupt the prefix map). The
    function cannot unpersist (the caller hasn't materialized yet), so
    the handle is registered with :mod:`sketchlib.caches` under owner
    ``"tokenops.global_offsets"``; after materializing the result, call
    ``sketchlib.caches.release_caches("tokenops.global_offsets")`` to
    drop exactly THIS operator's cache — safe even while some other
    operator's lazy result is still unmaterialized (a bare
    ``release_caches()`` sweep is for sessions that have materialized
    everything, e.g. bench between samples).
    """
    from pyspark.sql import Window

    if n_parts <= 0:
        n_parts = df.sparkSession.sparkContext.defaultParallelism
    order_exprs = (
        list(order_col) if isinstance(order_col, (list, tuple)) else [F.col(order_col)]
    )
    ranged = df.repartitionByRange(n_parts, *order_exprs).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.withColumn("__len", F.lit(len_col) if isinstance(len_col, int) else len_col)
    ranged = caches.register(ranged.persist(), owner="tokenops.global_offsets")
    totals = (
        ranged.groupBy("__pid").agg(F.sum("__len").alias("__tot")).collect()
    )
    prefix = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["__pid"]):
        prefix[r["__pid"]] = acc
        acc += r["__tot"]
    pref_df = df.sparkSession.createDataFrame(
        [(int(p), int(s)) for p, s in prefix.items()], "__pid int, __prefix bigint"
    )
    w = Window.partitionBy("__pid").orderBy(*order_exprs).rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = (
        ranged.join(F.broadcast(pref_df), "__pid")
        .withColumn(
            "__start",
            F.coalesce(F.sum("__len").over(w), F.lit(0)) + F.col("__prefix"),
        )
        .drop("__pid", "__prefix", "__len")
    )
    return out


def pack_sequences(
    df: DataFrame,
    id_col: str,
    seq_col: str,
    block_len: int,
    order_col: str | None = None,
) -> DataFrame:
    """GPT-style sequence packing: concatenate all token arrays in
    ``order_col`` (default ``id_col``) order and re-chunk into
    fixed-``block_len`` blocks (the "concat and chunk" pretraining
    batcher; see e.g. Brown et al. 2020 §2.3 / the standard causal-LM
    data collator). Deterministic given the order column, so any
    engine produces identical blocks.

    Returns one row per block: ``(block_id, n_parts, n_tokens,
    tokens, part_starts)`` where ``n_parts`` is how many documents
    contributed, ``part_starts`` the 0-based offsets within the block
    where each contributing part begins (what a causal-LM collator
    needs to reset attention across document boundaries), and the
    final block may be shorter than ``block_len``.

    Scale shape: one range-shuffle for the global offset scan, then
    each doc slices its own array into per-block chunks JVM-side
    (docs spanning a block boundary emit one row per touched block —
    at most ``n_tok/block_len + 1``), and one groupBy(block_id)
    assembles. No tokens ever visit Python; nothing collects beyond
    one row per partition.
    """
    order_col = order_col or id_col
    L = int(block_len)
    seq = F.col(seq_col)
    with_off = global_offsets(
        df.select(id_col, seq_col).filter(F.size(seq) > 0),
        order_col,
        F.size(seq).cast("bigint"),
    )
    start, n = F.col("__start"), F.size(seq).cast("bigint")
    b0 = F.floor(start / L)
    b1 = F.floor((start + n - 1) / L)
    spans = with_off.select(
        F.col(id_col),
        start.alias("__s"),
        n.alias("__n"),
        seq.alias("__seq"),
        F.explode(F.sequence(b0, b1)).alias("block_id"),
    )
    gs = F.greatest(F.col("block_id") * L, F.col("__s"))
    ge = F.least((F.col("block_id") + 1) * L, F.col("__s") + F.col("__n"))
    parts = spans.select(
        "block_id",
        gs.alias("__gs"),
        F.slice(
            "__seq", (gs - F.col("__s") + 1).cast("int"), (ge - gs).cast("int")
        ).alias("__chunk"),
    )
    sorted_parts = F.array_sort(F.collect_list(F.struct("__gs", "__chunk")))
    return (
        parts.groupBy("block_id")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.flatten(
                F.transform(sorted_parts, lambda s: s["__chunk"])
            ).alias("tokens"),
            F.transform(
                sorted_parts,
                lambda s: (s["__gs"] - F.col("block_id") * L).cast("int"),
            ).alias("part_starts"),
        )
        .select(
            "block_id",
            "n_parts",
            F.size("tokens").alias("n_tokens"),
            "tokens",
            "part_starts",
        )
    )


# ------------------------------------------------- epoch shuffle + shard


def epoch_shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    epoch: int = 0,
) -> DataFrame:
    """Deterministic training-epoch shuffle + sharding: order docs by
    ``md5(epoch || id)`` (a fresh pseudo-random permutation per epoch,
    identical in any engine) and deal them round-robin into
    ``n_shards`` shards — every shard's doc count is balanced to ±1
    by construction, and a given (epoch, corpus) always produces the
    same assignment, which is what resumable distributed training
    needs from its data loader.

    Adds ``__rank`` (0-based position in the shuffled order) and
    ``shard`` (= rank % n_shards). The global rank reuses the
    two-phase scan (:func:`global_offsets` with unit weights): one
    range shuffle + a broadcast prefix of one row per partition — no
    single-partition bottleneck at any corpus size.
    """
    keyed = df.withColumn(
        "__shuffle_key",
        F.md5(
            F.concat(
                F.lit(f"epoch{int(epoch)}:"), F.col(id_col).cast("string")
            ).cast("binary")
        ),
    )
    ranked = global_offsets(keyed, "__shuffle_key", F.lit(1).cast("bigint"))
    return (
        ranked.withColumn("__rank", F.col("__start"))
        .withColumn("shard", (F.col("__rank") % n_shards).cast("int"))
        .drop("__start", "__shuffle_key")
    )


# --------------------------------------------------- vocabulary encoding


def fit_vocab(
    df: DataFrame,
    words_col: str,
    min_count: int = 1,
    max_size: int | None = None,
) -> DataFrame:
    """Fit a frequency-ranked vocabulary over an exploded word column:
    returns ``(word, token_id, cnt)`` with dense 0-based ids assigned
    by (count desc, word asc) — the standard tokenizer-vocab ordering,
    deterministic in any engine. Ranks come from the two-phase global
    scan (:func:`global_offsets` with unit weights ordered by the
    count key), never a single-partition window, so a billion-type
    vocabulary ranks in parallel.

    ``min_count`` drops rare types BEFORE ranking; ``max_size`` keeps
    the ``token_id < max_size`` head (ids are already dense, so this
    is a filter, not a re-rank).
    """
    counts = (
        df.select(F.explode(words_col).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    ranked = global_offsets(
        counts, [F.desc("cnt"), F.asc("word")], F.lit(1).cast("bigint")
    ).select("word", F.col("__start").alias("token_id"), "cnt")
    if max_size is not None:
        ranked = ranked.filter(F.col("token_id") < max_size)
    return ranked


def encode_docs(
    df: DataFrame,
    id_col: str,
    words_col: str,
    vocab: DataFrame,
    oov_id: int = -1,
) -> DataFrame:
    """Encode word arrays to token-id arrays through a fitted
    vocabulary: ``(id, tokens array<bigint>, n_tok, n_oov)``.
    Out-of-vocabulary words map to ``oov_id``.

    Words explode with their positions, join the vocab keyed by word
    (broadcast for tokenizer-sized vocabs, shuffled join at
    corpus-vocab scale — only (word, pos) rows move, never documents),
    and reassemble in position order. The text→tokens bridge into the
    sketch/BPE/packing pipeline, which consumes exactly this shape.
    """
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode_outer(words_col).alias("pos", "word"),
    )
    joined = exploded.join(vocab.select("word", "token_id"), "word", "left")
    return (
        joined.groupBy("__id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        # null pos = the explode_outer marker for an
                        # empty doc: emit NULL so collect_list drops it
                        F.when(
                            F.col("pos").isNotNull(),
                            F.struct(
                                "pos",
                                F.coalesce("token_id", F.lit(oov_id)).alias("tid"),
                            ),
                        )
                    )
                ),
                lambda s: s["tid"],
            ).alias("tokens"),
            F.sum(F.when(F.col("pos").isNotNull(), 1).otherwise(0)).alias("n_tok"),
            F.sum(
                F.when(F.col("pos").isNotNull() & F.col("token_id").isNull(), 1)
                .otherwise(0)
            ).alias("n_oov"),
        )
        .select(F.col("__id").alias(id_col), "tokens", "n_tok", "n_oov")
    )
