"""Text-analysis operators for training-data pipelines.

- :func:`token_count_col` — BPE-ish regex tokenization count, pure JVM
  expression (regexp_extract_all), matching DuckDB's regexp semantics so
  it is oracle-checkable.
- :func:`fit_language_profiles` / :func:`lang_id_udf` — character
  n-gram language identification (Cavnar-Trenkle style): profiles are
  learned with one distributed aggregation over a labeled sample, then
  broadcast; classification is a vectorized pandas UDF scoring cosine
  overlap against each profile. (On the driver's synthetic corpus every
  language shares one vocabulary, so accuracy there is chance — the
  pytest fixture plants genuinely distinct languages instead.)
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


def lang_id_udf(spark, profiles: dict[str, dict[str, float]], n: int = 3):
    """Vectorized classifier: cosine score of a doc's n-gram counts
    against each broadcast profile; returns the argmax language."""
    bc = spark.sparkContext.broadcast(profiles)

    @F.pandas_udf(StringType())
    def _classify(text):
        import collections

        import pandas as pd

        profs = bc.value
        langs = sorted(profs)
        out = []
        for t in text:
            c: collections.Counter = collections.Counter()
            t2 = f" {str(t).lower()} "
            c.update(t2[i : i + n] for i in range(len(t2) - n + 1))
            norm = np.sqrt(sum(v * v for v in c.values())) or 1.0
            best, best_s = langs[0], -1.0
            for lang in langs:
                p = profs[lang]
                s = sum(v * p.get(g, 0.0) for g, v in c.items()) / norm
                if s > best_s:
                    best, best_s = lang, s
            out.append(best)
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
