"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container ships no image/audio codecs (Pillow/ffmpeg absent), so the
actual decoders are STUBS behind import-guards (`NotImplementedError`
with a clear message) — but everything Spark-side is real and tested:
schemas, Arrow batch shapes, mapInArrow pipelines, partition behavior.
Two operators are genuinely functional because they need no codec:

- :func:`byte_histogram_features` — 32-bin byte histogram per payload,
  L1-normalized float32 vector (a real, deterministic feature extractor
  usable for binary near-dup / clustering).
- :func:`frame_sample` — fixed-stride frame slicing for raw
  frame-concatenated payloads (the "video" sampling path).

Convention: a media table is ``(media_id, kind string, payload binary,
meta map<string,string>)``; :func:`synth_media_df` builds a
deterministic one for tests/benchmarks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

N_HIST_BINS = 32


def synth_media_df(spark, n: int, payload_bytes: int = 4096, partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table: payload bytes derive from
    splitmix64 of the row id (no external data)."""
    from .hashing import splitmix64

    base = spark.range(0, n, numPartitions=partitions)
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    kinds = np.array(["image", "audio", "video"])
    words = payload_bytes // 8

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            if ids.size == 0:
                continue
            with np.errstate(over="ignore"):
                mat = splitmix64(
                    (ids[:, None].astype(np.uint64) * np.uint64(1_000_003))
                    + np.arange(words, dtype=np.uint64)[None, :]
                )
            payloads = [row.tobytes() for row in mat]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids),
                    pa.array(kinds[ids % 3]),
                    pa.array(payloads, type=pa.binary()),
                ],
                names=["media_id", "kind", "payload"],
            )

    return base.mapInArrow(gen, schema)


def byte_histogram_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Adds ``features array<float>[32]``: L1-normalized byte histogram,
    computed vectorized over the flattened Arrow binary column."""
    cols = df.columns
    out_schema = StructType(
        [df.schema[c] for c in cols] + [StructField("features", ArrayType(FloatType()), False)]
    )

    def fn(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            arr = batch.column(payload_col)
            # zero-copy: binary array = (validity, offsets, data) buffers
            odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
            offsets = np.frombuffer(arr.buffers()[1], dtype=odt)[
                arr.offset : arr.offset + n + 1
            ].astype(np.int64)
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            buf = data[offsets[0] : offsets[-1]]
            lengths = np.diff(offsets)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
            bins = (buf >> 3).astype(np.int64)  # 256/32
            flat_idx = doc_idx * N_HIST_BINS + bins
            hist = np.bincount(flat_idx, minlength=n * N_HIST_BINS).reshape(n, N_HIST_BINS)
            feats = (hist / np.maximum(lengths, 1)[:, None]).astype(np.float32)
            offs = pa.array(np.arange(0, (n + 1) * N_HIST_BINS, N_HIST_BINS, dtype=np.int32))
            flist = pa.ListArray.from_arrays(offs, pa.array(feats.reshape(-1)))
            yield pa.RecordBatch.from_arrays(
                [batch.column(c) for c in cols] + [flist], names=cols + ["features"]
            )

    return df.mapInArrow(fn, out_schema)


def frame_sample(df: DataFrame, frame_bytes: int, every_n: int,
                 payload_col: str = "payload") -> DataFrame:
    """Explode fixed-size frames, keeping every ``every_n``-th:
    (…, frame_no int, frame binary). Pure JVM expressions."""
    n_frames = (F.length(payload_col) / frame_bytes).cast("int")
    frames = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
            lambda i: F.struct(
                i.alias("frame_no"),
                F.substring(F.col(payload_col), i * frame_bytes + 1, frame_bytes).alias("frame"),
            ),
        ),
        lambda s: s["frame_no"] % every_n == 0,
    )
    return df.withColumn("f", F.explode(frames)).select(
        *[c for c in df.columns if c != payload_col],
        F.col("f.frame_no").cast("int").alias("frame_no"),
        F.col("f.frame").alias("frame"),
    )


def _require(module: str, op: str):
    try:
        return __import__(module)
    except ImportError as e:
        raise NotImplementedError(
            f"{op} needs `{module}`, which this environment does not ship; "
            "the Spark-side plumbing (schema, batching, partitioning) is "
            "implemented and tested — plug the codec in on a real cluster."
        ) from e


def decode_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB: real decode requires Pillow. Raises NotImplementedError at
    plan-build time (not inside executors) when the codec is absent."""
    _require("PIL", "image decode")
    raise AssertionError("unreachable in this container")


def resample_audio(df: DataFrame, rate: int, payload_col: str = "payload") -> DataFrame:
    """STUB: real resample requires an audio codec (soundfile/ffmpeg)."""
    _require("soundfile", "audio resample")
    raise AssertionError("unreachable in this container")
