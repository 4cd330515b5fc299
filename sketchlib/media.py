"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Everything here is REAL and codec-free (pure numpy — the container
ships no Pillow/ffmpeg and none is needed):

- :func:`byte_histogram_features` — 32-bin byte histogram per payload,
  L1-normalized float32 vector (zero-copy over Arrow buffers).
- :func:`frame_sample` — fixed-stride frame slicing for raw
  frame-concatenated payloads (the "video" sampling path), pure JVM.
- :func:`decode_image_meta` — BMP (24-bpp BI_RGB) and PPM (P6) decode:
  dimensions + channel means. Compressed formats (JPEG/PNG) come back
  fmt='unknown', ok=false; plug Pillow into the same interface on a
  cluster that ships it.
- :func:`decode_audio_meta` / :func:`resample_audio` — RIFF/WAVE
  integer-PCM parse (sample rate, channels, duration, RMS) and linear
  resampling re-encoded as WAV.
- encoders (:func:`wav_bytes`, :func:`bmp_bytes`, :func:`ppm_bytes`)
  for deterministic synthesis — no external data anywhere.

Convention: a media table is ``(media_id, kind string, payload binary,
meta map<string,string>)``; :func:`synth_media_df` builds a
deterministic opaque-payload table, :func:`synth_codec_media_df` a
closed-form decodable one (BMP/WAV/garbage rows with metadata derivable
from the row id alone — the oracle recomputes it from ``range()``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
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


# ---------------------------------------------------------------------------
# codec-free formats: WAV/PCM, BMP (24-bpp BI_RGB), PPM (P6) — pure numpy
# ---------------------------------------------------------------------------
# These are the container formats a pipeline can decode with NO external
# codec. Compressed formats (JPEG/MP3/...) still need a real codec: the
# decoders below mark them fmt='unknown', ok=false instead of failing the
# job, and a cluster with Pillow/ffmpeg plugs richer decoders into the
# same (payload -> meta columns) interface.

import struct


def wav_bytes(samples: np.ndarray, rate: int) -> bytes:
    """Encode int16 PCM samples ((n,) mono or (n, ch)) as a RIFF/WAVE
    blob — the deterministic synthesis side of :func:`parse_wav`."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.reshape(-1).tobytes()  # interleaved
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(b: bytes):
    """(rate, channels, bits, samples (n, ch) float64) from a RIFF/WAVE
    PCM blob (8/16/32-bit integer PCM). Raises ValueError on anything
    that is not uncompressed PCM."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, rate, ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        payload = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", payload, 0)
            if audio_fmt != 1:
                raise ValueError(f"not integer PCM (fmt={audio_fmt})")
        elif cid == b"data":
            data = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    dt = {8: np.uint8, 16: "<i2", 32: "<i4"}.get(bits)
    if dt is None:
        raise ValueError(f"unsupported bit depth {bits}")
    arr = np.frombuffer(data, dtype=dt).astype(np.float64)
    if bits == 8:
        arr -= 128.0  # 8-bit WAV is offset-binary
    n = (arr.size // ch) * ch
    return rate, ch, bits, arr[:n].reshape(-1, ch)


def bmp_bytes(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bpp
    BI_RGB BMP (bottom-up rows, 4-byte row padding, BGR byte order)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + info + data


def parse_bmp(b: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from an uncompressed 24-bpp BI_RGB BMP."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP blob")
    (offset,) = struct.unpack_from("<I", b, 10)
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(b, dtype=np.uint8, count=h * row_bytes, offset=offset)
    px = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR->RGB
    return px[::-1] if bottom_up else px


def ppm_bytes(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a binary PPM (P6)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def parse_ppm(b: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from a binary PPM (P6, maxval 255)."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM blob")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens (comments unsupported — synthesis never emits them)
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    return np.frombuffer(b, dtype=np.uint8, count=h * w * 3, offset=pos).reshape(h, w, 3)


_IMG_META_FIELDS = [
    StructField("fmt", StringType(), False),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("mean_r", FloatType(), True),
    StructField("mean_g", FloatType(), True),
    StructField("mean_b", FloatType(), True),
    StructField("ok", BooleanType(), False),
]


def decode_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL codec-free image decode (BMP 24-bpp, PPM P6 — pure numpy):
    adds ``fmt, width, height, mean_r/g/b, ok``. Unknown/compressed
    formats get fmt='unknown', ok=false (nulls) rather than failing the
    job — plug Pillow into the same interface for JPEG/PNG on a real
    cluster. Header parse is per-payload; pixel statistics are numpy
    over each payload's buffer."""
    cols = df.columns
    out_schema = StructType([df.schema[c] for c in cols] + _IMG_META_FIELDS)

    def fn(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            fmts, ws, hs, mr, mg, mb, oks = [], [], [], [], [], [], []
            for v in batch.column(payload_col):
                b = v.as_py()
                try:
                    if b[:2] == b"BM":
                        px, fmt = parse_bmp(b), "bmp"
                    elif b[:2] == b"P6":
                        px, fmt = parse_ppm(b), "ppm"
                    else:
                        raise ValueError("unknown format")
                    means = px.reshape(-1, 3).mean(axis=0)
                    fmts.append(fmt)
                    hs.append(px.shape[0])
                    ws.append(px.shape[1])
                    mr.append(float(means[0]))
                    mg.append(float(means[1]))
                    mb.append(float(means[2]))
                    oks.append(True)
                except (ValueError, struct.error, IndexError):
                    fmts.append("unknown")
                    ws.append(None)
                    hs.append(None)
                    mr.append(None)
                    mg.append(None)
                    mb.append(None)
                    oks.append(False)
            yield pa.RecordBatch.from_arrays(
                [batch.column(c) for c in cols]
                + [
                    pa.array(fmts),
                    pa.array(ws, type=pa.int64()),
                    pa.array(hs, type=pa.int64()),
                    pa.array(mr, type=pa.float32()),
                    pa.array(mg, type=pa.float32()),
                    pa.array(mb, type=pa.float32()),
                    pa.array(oks),
                ],
                names=cols + ["fmt", "width", "height", "mean_r", "mean_g", "mean_b", "ok"],
            )

    return df.mapInArrow(fn, out_schema)


def decode_audio_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL codec-free audio decode (RIFF/WAVE integer PCM — pure
    numpy): adds ``sample_rate, n_channels, bits, n_samples,
    duration_s, rms, ok``. Non-WAV payloads get ok=false."""
    from pyspark.sql.types import BooleanType, DoubleType, IntegerType

    cols = df.columns
    out_schema = StructType(
        [df.schema[c] for c in cols]
        + [
            StructField("sample_rate", IntegerType(), True),
            StructField("n_channels", IntegerType(), True),
            StructField("bits", IntegerType(), True),
            StructField("n_samples", LongType(), True),
            StructField("duration_s", DoubleType(), True),
            StructField("rms", DoubleType(), True),
            StructField("ok", BooleanType(), False),
        ]
    )

    def fn(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            rates, chs, bits_l, ns, durs, rmss, oks = [], [], [], [], [], [], []
            for v in batch.column(payload_col):
                try:
                    rate, ch, bits, samples = parse_wav(v.as_py())
                    rates.append(rate)
                    chs.append(ch)
                    bits_l.append(bits)
                    ns.append(samples.shape[0])
                    durs.append(samples.shape[0] / rate)
                    rmss.append(float(np.sqrt((samples**2).mean())) if samples.size else 0.0)
                    oks.append(True)
                except (ValueError, struct.error):
                    rates.append(None)
                    chs.append(None)
                    bits_l.append(None)
                    ns.append(None)
                    durs.append(None)
                    rmss.append(None)
                    oks.append(False)
            yield pa.RecordBatch.from_arrays(
                [batch.column(c) for c in cols]
                + [
                    pa.array(rates, type=pa.int32()),
                    pa.array(chs, type=pa.int32()),
                    pa.array(bits_l, type=pa.int32()),
                    pa.array(ns, type=pa.int64()),
                    pa.array(durs, type=pa.float64()),
                    pa.array(rmss, type=pa.float64()),
                    pa.array(oks),
                ],
                names=cols
                + ["sample_rate", "n_channels", "bits", "n_samples", "duration_s", "rms", "ok"],
            )

    return df.mapInArrow(fn, out_schema)


def resample_audio(df: DataFrame, rate: int, payload_col: str = "payload") -> DataFrame:
    """REAL codec-free resample for 16-bit PCM WAV payloads: linear
    interpolation to ``rate`` Hz per channel (numpy), re-encoded as WAV
    in place of ``payload``. Non-WAV payloads pass through unchanged
    with ok=false."""
    from pyspark.sql.types import BooleanType

    cols = df.columns
    out_schema = StructType(
        [df.schema[c] for c in cols] + [StructField("ok", BooleanType(), False)]
    )
    pay_idx = cols.index(payload_col)

    def fn(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            out_payloads, oks = [], []
            for v in batch.column(payload_col):
                b = v.as_py()
                try:
                    src_rate, ch, bits, samples = parse_wav(b)
                    if bits != 16:
                        raise ValueError("resample supports 16-bit PCM")
                    n_src = samples.shape[0]
                    n_dst = max(1, int(round(n_src * rate / src_rate)))
                    t_dst = np.arange(n_dst) * (src_rate / rate)
                    t_src = np.arange(n_src, dtype=np.float64)
                    res = np.stack(
                        [np.interp(t_dst, t_src, samples[:, c]) for c in range(ch)],
                        axis=1,
                    )
                    out_payloads.append(
                        wav_bytes(np.clip(np.round(res), -32768, 32767).astype(np.int16), rate)
                    )
                    oks.append(True)
                except (ValueError, struct.error):
                    out_payloads.append(b)
                    oks.append(False)
            arrays = [batch.column(c) for c in cols]
            arrays[pay_idx] = pa.array(out_payloads, type=pa.binary())
            yield pa.RecordBatch.from_arrays(arrays + [pa.array(oks)], names=cols + ["ok"])

    return df.mapInArrow(fn, out_schema)


def synth_codec_media_df(spark, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic decodable media table whose metadata is CLOSED-FORM
    in the row id (the correctness oracle recomputes it from range()):

    - ``id % 7 == 3`` → kind='garbage': an undecodable payload
      (fmt='unknown', ok=false downstream)
    - else if ``id % 2 == 0`` → kind='image': constant-color 24-bpp BMP,
      width ``16 + id%8``, height ``12 + id%4``, RGB
      ``((id*3)%256, (id*5)%256, (id*7)%256)`` — channel means equal the
      color exactly
    - else → kind='audio': 16-bit PCM WAV, rate ``8000 + (id%4)*4000``,
      ``800 + (id%10)*80`` samples alternating +A/-A with
      ``A = (id%100 + 1)*100`` — RMS is exactly A (perfect-square sqrt)
    """
    from pyspark.sql.types import BinaryType, LongType, StringType

    base = spark.range(0, n, numPartitions=partitions)
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            if ids.size == 0:
                continue
            kinds, payloads = [], []
            for i in ids.tolist():
                if i % 7 == 3:
                    kinds.append("garbage")
                    payloads.append(b"GARBAGE" + int(i).to_bytes(8, "little"))
                elif i % 2 == 0:
                    w, h = 16 + i % 8, 12 + i % 4
                    color = np.array([(i * 3) % 256, (i * 5) % 256, (i * 7) % 256], dtype=np.uint8)
                    px = np.broadcast_to(color, (h, w, 3))
                    kinds.append("image")
                    payloads.append(bmp_bytes(px))
                else:
                    rate = 8000 + (i % 4) * 4000
                    n_samp = 800 + (i % 10) * 80
                    amp = (i % 100 + 1) * 100
                    samples = np.where(np.arange(n_samp) % 2 == 0, amp, -amp).astype(np.int16)
                    kinds.append("audio")
                    payloads.append(wav_bytes(samples, rate))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(kinds), pa.array(payloads, type=pa.binary())],
                names=["media_id", "kind", "payload"],
            )

    return base.mapInArrow(gen, schema)
