"""Text-analysis operators for training-data pipelines.

- :func:`token_count_col` — BPE-ish regex tokenization count, pure JVM
  expression (regexp_extract_all), matching DuckDB's regexp semantics so
  it is oracle-checkable.
- :func:`fit_language_profiles` / :func:`lang_id_classify` — character
  n-gram language identification (Cavnar-Trenkle style): profiles are
  learned with one distributed aggregation over a labeled sample;
  classification is pure JVM expressions (explode n-grams →
  broadcast-join the profile table → grouped dot product → min_by
  argmax — the cosine argmax is norm-invariant, so no per-doc norm is
  needed). :func:`lang_id_udf` is the ad-hoc column-expression
  convenience wrapper.
- :func:`winnow_fingerprints` — MOSS-style winnowing document
  fingerprints (Schleimer-Wilkerson-Aiken): rolling polynomial hash of
  k-gram word windows, keep each window's minimum — fully vectorized
  over the flattened Arrow batch, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

# words | numbers | single punctuation — identical semantics in Spark
# (java.util.regex) and DuckDB (RE2) for this class-only pattern
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_col(text_col: str):
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def top_ngram_share(df, id_col: str, words_col: str, n: int = 2):
    """Per-doc repetition signal: (id, n_grams, max_gram_count) where
    max_gram_count is the most frequent word n-gram's count. The
    Gopher/RefinedWeb "top n-gram share" quality rule is
    max_gram_count/n_grams; ratios near 1 mean the document is one
    phrase repeated. Pure JVM expressions + one grouped count — docs
    with fewer than n words are dropped (no n-grams to measure)."""
    grams = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.transform(
                F.slice(
                    words_col, 1, F.greatest(F.size(words_col) - F.lit(n - 1), F.lit(0))
                ),
                lambda w, i: F.concat_ws(
                    " ", *[F.element_at(words_col, i + j + 1) for j in range(n)]
                ),
            )
        ).alias("gram"),
    )
    per_gram = grams.groupBy("__id", "gram").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy("__id")
        .agg(F.sum("c").alias("n_grams"), F.max("c").alias("max_gram_count"))
        .select(F.col("__id").alias(id_col), "n_grams", "max_gram_count")
    )


# ---------------------------------------------------------------- lang id


def fit_language_profiles(
    df: DataFrame, text_col: str, lang_col: str, n: int = 3, top: int = 300
) -> dict[str, dict[str, float]]:
    """Learn per-language char-n-gram profiles with one distributed
    aggregation (explode n-grams JVM-side → groupBy count), keeping the
    ``top`` n-grams per language, L2-normalized."""
    lowered = df.select(F.col(lang_col).alias("lang"), F.lower(F.col(text_col)).alias("t"))
    grams = lowered.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("t") - (n - 1), F.lit(1))),
                lambda i: F.col("t").substr(i, F.lit(n)),
            )
        ).alias("g"),
    )
    from pyspark.sql import Window

    counts = grams.filter(F.length("g") == n).groupBy("lang", "g").count()
    # truncate to the top-N n-grams per language DISTRIBUTEDLY before any
    # collect: at corpus scale the full (lang, gram) set is unbounded but
    # langs * top is a few KB. Window top-N shuffles only the counted
    # (lang, gram) rows, never raw text.
    w = Window.partitionBy("lang").orderBy(F.desc("count"), F.asc("g"))
    kept_rows = (
        counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= top).collect()
    )
    by_lang: dict[str, dict[str, float]] = {}
    for r in kept_rows:
        by_lang.setdefault(r["lang"], {})[r["g"]] = float(r["count"])
    profiles = {}
    for lang, kept in by_lang.items():
        norm = float(np.sqrt(sum(v * v for v in kept.values())))
        profiles[lang] = {k: v / norm for k, v in kept.items()}
    return profiles


def lang_id_classify(
    df: DataFrame,
    id_col: str,
    text_col: str,
    profiles: dict[str, dict[str, float]],
    n: int = 3,
) -> DataFrame:
    """ENGINE-PATH classifier: (id, pred) for every input row, computed
    entirely with JVM expressions — no Python in the plan.

    The cosine argmax is norm-invariant (the doc's own n-gram norm is a
    per-doc constant across languages), so classification reduces to
    ``argmax_lang Σ_g count(doc, g) · profile(lang, g)``: explode char
    n-grams (same extraction as :func:`fit_language_profiles`),
    broadcast-join the tiny (lang, gram, weight) profile table, one
    grouped sum per (doc, lang), then ``min_by`` over
    ``(-score, lang)`` for a deterministic argmax (ties and
    no-gram-overlap docs fall to the alphabetically-first language —
    same contract as :func:`lang_id_udf`).

    Scale shape: raw text never shuffles; only the (doc, matched-gram)
    rows produced by the broadcast join reach the grouped sum, which is
    partial-aggregated map-side. Precondition: ``id_col`` is unique per
    row (it is the join-back key).
    """
    spark = df.sparkSession
    langs = sorted(profiles)
    prof_rows = [
        (lang, g, float(w)) for lang in langs for g, w in profiles[lang].items()
    ]
    prof_df = spark.createDataFrame(prof_rows, "lang string, g string, w double")
    lowered = df.select(F.col(id_col).alias("__id"), F.lower(F.col(text_col)).alias("t"))
    grams = lowered.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("t") - (n - 1), F.lit(1))),
                lambda i: F.col("t").substr(i, F.lit(n)),
            )
        ).alias("g"),
    ).filter(F.length("g") == n)
    scored = (
        grams.join(F.broadcast(prof_df), "g")
        .groupBy("__id", "lang")
        .agg(F.sum("w").alias("score"))
    )
    best = scored.groupBy("__id").agg(
        F.min_by("lang", F.struct((-F.col("score")).alias("ns"), F.col("lang"))).alias(
            "pred"
        )
    )
    return (
        df.select(F.col(id_col).alias("__id"))
        .join(best, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("pred", F.lit(langs[0])).alias("pred"),
        )
    )


def lang_id_udf(spark, profiles: dict[str, dict[str, float]], n: int = 3):
    """Convenience scalar classifier for ad-hoc use (a column expression
    with no join-back key needed). The ENGINE path is
    :func:`lang_id_classify` — pure JVM expressions; prefer it in
    pipelines. Scoring here is one BLAS matvec per doc against a shared
    (vocab, lang) weight matrix (not a per-language Python loop); gram
    extraction is the only per-row work."""
    langs = sorted(profiles)
    vocab: dict[str, int] = {}
    for lang in langs:
        for g in profiles[lang]:
            vocab.setdefault(g, len(vocab))
    W = np.zeros((len(vocab), len(langs)), dtype=np.float64)
    for li, lang in enumerate(langs):
        for g, w in profiles[lang].items():
            W[vocab[g], li] = w
    bc = spark.sparkContext.broadcast((vocab, W, langs))

    @F.pandas_udf(StringType())
    def _classify(text):
        import pandas as pd

        vocab, W, langs = bc.value
        V = W.shape[0]
        out = []
        for t in text:
            t2 = str(t).lower()
            idx = [
                vocab[g]
                for g in (t2[i : i + n] for i in range(max(len(t2) - n + 1, 0)))
                if g in vocab
            ]
            if not idx:
                out.append(langs[0])
                continue
            counts = np.bincount(np.asarray(idx, dtype=np.int64), minlength=V)
            scores = counts @ W
            # ties fall to the alphabetically-first language (langs is
            # sorted and argmax returns the first maximal index)
            out.append(langs[int(scores.argmax())])
        return pd.Series(out)

    return _classify


# ---------------------------------------------------------------- winnowing


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    words_col: str,
    k: int = 3,
    window: int = 4,
    seed: int = 0x5EEDC0DE,
) -> DataFrame:
    """(doc_id, fp long) distinct winnowing fingerprints per doc.

    Rolling hash = polynomial combine of k consecutive word hashes;
    winnowing keeps min per sliding window of ``window`` k-gram hashes
    (ties → rightmost, per the paper), guaranteeing any shared substring
    of length >= window+k-1 words yields a shared fingerprint."""
    id_type = df.schema[id_col].dataType
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(F.col(words_col), lambda x: F.xxhash64(x, F.lit(seed))).alias("h"),
    )
    out_schema = StructType(
        [StructField("doc_id", id_type, False), StructField("fp", LongType(), False)]
    )
    P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier

    def fn(batches):
        for batch in batches:
            harr = batch.column("h")
            lengths = harr.value_lengths().fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            flat = harr.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
            n_total = flat.size
            if n_total == 0:
                continue
            doc_idx = np.repeat(np.arange(lengths.size, dtype=np.int64), lengths)
            # k-gram polynomial hash at every flat position (invalid at
            # doc tails — masked below)
            with np.errstate(over="ignore"):
                acc = np.zeros(n_total, dtype=np.uint64)
                for i in range(k):
                    sl = flat[i:] if i else flat
                    acc[: n_total - i] = acc[: n_total - i] * P + sl
            pos_in_doc = np.arange(n_total, dtype=np.int64) - np.repeat(
                np.cumsum(lengths) - lengths, lengths
            )
            kg_valid = pos_in_doc <= np.repeat(lengths, lengths) - k
            # sliding window-min over `window` consecutive valid k-grams
            ids, fps = [], []
            valid_idx = np.flatnonzero(kg_valid)
            if valid_idx.size == 0:
                continue
            vk = acc[valid_idx]
            vd = doc_idx[valid_idx]
            if vk.size >= window:
                sw = np.lib.stride_tricks.sliding_window_view(vk, window)
                sd = np.lib.stride_tricks.sliding_window_view(vd, window)
                same_doc = sd[:, 0] == sd[:, -1]
                mins = sw.min(axis=1)
                ids.append(sd[same_doc, 0])
                fps.append(mins[same_doc])
            # docs with fewer than `window` k-grams: keep their overall min
            few = np.flatnonzero((lengths >= k) & (lengths - k + 1 < window))
            if few.size:
                starts_v = np.searchsorted(vd, few, side="left")
                ends_v = np.searchsorted(vd, few, side="right")
                for d, s, e in zip(few.tolist(), starts_v.tolist(), ends_v.tolist()):
                    if e > s:
                        ids.append(np.array([d]))
                        fps.append(np.array([vk[s:e].min()], dtype=np.uint64))
            if not ids:
                continue
            all_ids = np.concatenate(ids)
            all_fps = np.concatenate(fps).astype(np.uint64)
            pair = np.stack([all_ids.astype(np.uint64), all_fps], axis=1)
            uniq = np.unique(pair, axis=0)
            doc_vals = np.asarray(batch.column("doc_id"))[uniq[:, 0].astype(np.int64)]
            yield pa.RecordBatch.from_arrays(
                [pa.array(doc_vals), pa.array(uniq[:, 1].view(np.int64))],
                names=["doc_id", "fp"],
            )

    return hashed.mapInArrow(fn, out_schema)

# ------------------------------------------------- synthetic corpora


def synth_lang_corpus(spark, n: int, langs: int = 3, words_per_doc: int = 10,
                      chars_per_word: int = 4, partitions: int | None = None) -> DataFrame:
    """Deterministic labeled corpus for language-ID driver checks:
    language ``l`` draws every character from its own disjoint 5-letter
    alphabet (lang0 -> a..e, lang1 -> f..j, ...), so char-n-gram profiles
    of different languages share NO n-grams and a fit-then-classify
    round-trip is correct with certainty (closed-form oracle). Characters
    derive from splitmix64 of (doc, position) — no external data."""
    from .hashing import splitmix64

    base = spark.range(0, n, numPartitions=partitions)
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("lang", StringType(), False),
            StructField("text", StringType(), False),
        ]
    )
    chars_per_doc = words_per_doc * chars_per_word

    def gen(batches):
        for batch in batches:
            ids = batch.column("doc_id" if "doc_id" in batch.schema.names else "id").to_numpy()
            if ids.size == 0:
                continue
            with np.errstate(over="ignore"):
                h = splitmix64(
                    (ids[:, None].astype(np.uint64) * np.uint64(0x9E3779B1))
                    + np.arange(chars_per_doc, dtype=np.uint64)[None, :]
                )
            lang_idx = (ids % langs).astype(np.int64)
            # 5 letters per language, alphabets disjoint by construction
            letters = (h % np.uint64(5)).astype(np.int64) + 5 * lang_idx[:, None]
            codes = (letters + ord("a")).astype(np.uint8)
            texts = []
            for row in codes:
                w = row.reshape(words_per_doc, chars_per_word)
                texts.append(" ".join(bytes(word).decode("ascii") for word in w))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids),
                    pa.array([f"lang{i}" for i in lang_idx]),
                    pa.array(texts),
                ],
                names=["doc_id", "lang", "text"],
            )

    return base.mapInArrow(gen, schema)


# ------------------------------------------------- decontamination


def decontaminate_ids(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    words_col: str = "words",
    n: int = 3,
    m: int = 1 << 22,
    k: int = 7,
    seed: int = 42,
) -> DataFrame:
    """EXACT benchmark decontamination with a Bloom pre-filter: the ids
    of every corpus doc sharing at least one word ``n``-gram with the
    benchmark set (the standard "did the eval set leak into training
    data" check).

    Scale shape: the benchmark's n-gram hashes build ONE Bloom filter
    (KB-MB state, broadcast — zero false negatives by construction,
    bloomfilter.rs insert/query contract), which prunes the corpus's
    exploded gram stream BEFORE anything shuffles; only the surviving
    candidate (id, gram) hits join the exact benchmark gram set, which
    removes the Bloom's false positives. The result is exact while the
    shuffled volume is the contamination candidates, not the corpus.
    """
    from .agg import SketchSpec, sketch_aggregate
    from .dedup import shingle_col
    from .estimates import membership_udf

    spark = docs.sparkSession
    bgrams = bench.select(F.explode(shingle_col(words_col, n)).alias("g"))
    merged = sketch_aggregate(
        bgrams.select(F.xxhash64("g").alias("h")),
        [],
        [SketchSpec("b", "bloom", "h", {"m": m, "k": k, "seed": seed})],
        fanout="auto",
    )
    blob = bytes(merged.select("state").collect()[0][0])
    member = membership_udf(spark, {"_": blob})
    cgrams = docs.select(
        F.col(id_col).alias("__id"), F.explode(shingle_col(words_col, n)).alias("g")
    )
    cand = cgrams.filter(member(F.lit("_"), F.xxhash64("g")))
    # exact verify on the gram STRINGS (not hashes): kills Bloom false
    # positives and is immune even to 64-bit gram-hash collisions
    hits = cand.join(bgrams.distinct(), "g", "left_semi")
    return hits.select(F.col("__id").alias(id_col)).distinct()


# ------------------------------------------------- quality rules (Gopher-style)

# small function-word list for the stopword-presence rule (Gopher §A1.1
# uses the same idea: real prose contains common function words)
QUALITY_STOPWORDS = ("the", "a", "be", "to", "of", "and", "that", "have", "with", "in")


def quality_signals(df: DataFrame, id_col: str, words_col: str) -> DataFrame:
    """Per-doc quality-rule signals (Rae et al. Gopher §A1.1 /
    RefinedWeb style), ALL integer-valued and pure JVM expressions so
    thresholds compose into exact cross-multiplied comparisons:

    ``n_words, word_chars`` (sum of word lengths), ``n_alpha_words``
    (words containing a letter), ``n_stopwords`` (hits in
    QUALITY_STOPWORDS), ``max_word_len``.
    """
    wlen = F.transform(words_col, lambda w: F.length(w))
    return df.select(
        F.col(id_col),
        F.size(words_col).alias("n_words"),
        F.aggregate(wlen, F.lit(0), lambda a, b: a + b).alias("word_chars"),
        F.size(F.filter(words_col, lambda w: w.rlike("[A-Za-z]"))).alias("n_alpha_words"),
        F.size(F.filter(words_col, lambda w: w.isin(*QUALITY_STOPWORDS))).alias(
            "n_stopwords"
        ),
        F.array_max(wlen).alias("max_word_len"),
    )


def quality_mask(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_alpha_frac_pct: int = 80,
    min_stopwords: int = 2,
):
    """Boolean pass/fail expression over :func:`quality_signals`
    columns. Every comparison is cross-multiplied integer arithmetic
    (mean word length in [3,10] becomes ``3*n <= chars <= 10*n``), so
    any engine computes the identical mask — no float thresholds."""
    n, chars = F.col("n_words"), F.col("word_chars")
    return (
        (n >= min_words)
        & (n <= max_words)
        & (chars >= min_mean_word_len * n)
        & (chars <= max_mean_word_len * n)
        & (F.col("n_alpha_words") * 100 >= min_alpha_frac_pct * n)
        & (F.col("n_stopwords") >= min_stopwords)
    )


# ------------------------------------------------- deterministic sampling

def stratified_sample(
    df: DataFrame, group_cols: list[str], id_col: str, n_per_group: int
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_group`` rows per
    group with the smallest ``md5(id)`` (md5 is available and
    byte-identical in every engine, so the SAME sample is reproducible
    anywhere — the property a train/eval split needs). One shuffle on
    the group key; Spark's WindowGroupLimit pushes the top-N below the
    sort at scale."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


# ------------------------------------------------- PII scrubbing

# deliberately simple patterns with IDENTICAL semantics in java.util.regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\d{3}-\d{3}-\d{4}"


def scrub_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Adds ``n_emails, n_phones`` (match counts) and ``clean_text``
    (matches replaced with [EMAIL]/[PHONE]) — pure JVM expressions
    (regexp_extract_all / regexp_replace), no Python in the plan.
    Patterns are the standard simple forms; swap in stricter ones per
    deployment policy."""
    emails = F.regexp_extract_all(F.col(text_col), F.lit(PII_EMAIL), F.lit(0))
    return df.withColumn("n_emails", F.size(emails)).withColumn(
        "n_phones",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_PHONE), F.lit(0))),
    ).withColumn(
        "clean_text",
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), PII_EMAIL, "[EMAIL]"),
            PII_PHONE,
            "[PHONE]",
        ),
    )


# ------------------------------------------------- deterministic splits

def hash_split(
    df: DataFrame, id_col: str, weights: dict[str, int], modulus: int = 1000
) -> DataFrame:
    """Deterministic weighted train/val/test split: each row lands in
    exactly one named split by where ``md5(id)`` falls among
    cumulative weight boundaries (permille by default). Engine- and
    run-independent — the property an eval split must have so that no
    later pipeline change quietly moves documents across the
    train/test wall.

    ``weights`` maps split name -> integer weight out of ``modulus``
    (e.g. ``{"train": 980, "val": 10, "test": 10}``; must sum to
    ``modulus``). The bucket is the first 8 md5 hex digits mod
    ``modulus`` — uniform, stateless, no shuffle, no sampling noise.
    """
    if sum(weights.values()) != modulus:
        raise ValueError(f"weights must sum to {modulus}: {weights}")
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("bigint") % modulus
    expr = None
    acc = 0
    for name, wt in weights.items():
        cond = bucket < F.lit(acc + wt)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        acc += wt
    return df.withColumn("split", expr)
