"""Deterministic synthetic `sequences` table generator (FIXTURES.md §1).

Schema (the BASELINE.json input_hint shape):
    doc_id string, tokens array<int32>, n_tok int32, source string

Generator (seed-free closed form, FIXTURES.md):
    L_i      = 16 + (splitmix64(i) % 485)                  # 16..500
    token_ij = int(V * u³), u = uniform01(splitmix64(i*1_000_003 + j)), V=50_000
    source_i = web(60%) / books(20%) / code(10%) / wiki(10%) by i % 10

Two implementations that MUST agree row-for-row (tested):
- :func:`ref_batch` — pure numpy, the oracle for per-row token-array
  equality (the driver's per-row invariant, BASELINE.json input_hint)
- :func:`sequences_df` — a Spark job (`spark.range` → `mapInArrow`), so
  bench-scale tables need no external data and never materialize on the
  driver
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import splitmix64, uniform01

VOCAB = 50_000
_SOURCES = np.array(["web", "books", "code", "wiki"])
# i % 10 → source index: 0-5 web, 6-7 books, 8 code, 9 wiki (skewed on purpose)
_MOD10_TO_SRC = np.array([0, 0, 0, 0, 0, 0, 1, 1, 2, 3], dtype=np.int64)

ARROW_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)


def ref_batch(ids: np.ndarray) -> pa.RecordBatch:
    """Generate the rows for doc indices ``ids`` (pure numpy → Arrow)."""
    i = np.asarray(ids, dtype=np.int64)
    lengths = (16 + (splitmix64(i.astype(np.uint64)) % np.uint64(485))).astype(np.int64)
    total = int(lengths.sum())
    doc_idx = np.repeat(i, lengths)
    # j = position within each doc
    starts = np.cumsum(lengths) - lengths
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
    u = uniform01(splitmix64((doc_idx * 1_000_003 + j).astype(np.uint64)))
    tokens = (VOCAB * u**3).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    tokens_arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(tokens))
    # f"doc-{v:010d}" via arrow compute (12x faster than a python loop,
    # byte-identical output)
    import pyarrow.compute as pc

    doc_id = pc.binary_join_element_wise(
        pa.scalar("doc-"), pc.utf8_lpad(pc.cast(pa.array(i), pa.string()), 10, "0"), ""
    )
    source = pa.array(_SOURCES[_MOD10_TO_SRC[i % 10]])
    return pa.RecordBatch.from_arrays(
        [doc_id, tokens_arr, pa.array(lengths.astype(np.int32)), source],
        schema=ARROW_SCHEMA,
    )


def sequences_df(spark, n_docs: int, partitions: int | None = None):
    """The same table as a distributed Spark job (no driver materialize)."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("tokens", ArrayType(IntegerType())),
            StructField("n_tok", IntegerType()),
            StructField("source", StringType()),
        ]
    )
    base = spark.range(0, n_docs, numPartitions=partitions)

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            yield ref_batch(ids)

    return base.mapInArrow(gen, schema)


def write_sequences(spark, path: str, n_docs: int, partitions: int | None = None) -> None:
    sequences_df(spark, n_docs, partitions).write.mode("overwrite").parquet(path)
