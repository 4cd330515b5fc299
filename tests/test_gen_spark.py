"""Generator tests: input_hint schema equality + per-row token-array
equality between the Spark job and the pure-numpy reference generator
(the driver's per-row invariant, BASELINE.json input_hint)."""

import numpy as np

from sketchlib.gen import ref_batch, sequences_df


def test_schema_matches_input_hint(seq_small):
    assert [(f.name, f.dataType.simpleString()) for f in seq_small.schema.fields] == [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]


def test_per_row_token_array_equality(seq_small):
    rows = seq_small.orderBy("doc_id").collect()
    ref = ref_batch(np.arange(2000)).to_pandas()
    assert len(rows) == 2000
    for r, (_, want) in zip(rows, ref.iterrows()):
        assert r.doc_id == want.doc_id
        assert r.n_tok == want.n_tok == len(r.tokens)
        assert np.array_equal(np.asarray(r.tokens), want.tokens), r.doc_id
        assert r.source == want.source


def test_source_skew(seq_small):
    counts = dict(
        (r["source"], r["count"]) for r in seq_small.groupBy("source").count().collect()
    )
    assert counts == {"web": 1200, "books": 400, "code": 200, "wiki": 200}


def test_token_range_and_lengths(seq_small):
    import pyspark.sql.functions as F

    stats = seq_small.select(
        F.min("n_tok").alias("lo"),
        F.max("n_tok").alias("hi"),
        F.min(F.array_min("tokens")).alias("tmin"),
        F.max(F.array_max("tokens")).alias("tmax"),
    ).collect()[0]
    assert 16 <= stats.lo and stats.hi <= 500
    assert 0 <= stats.tmin and stats.tmax < 50_000


def test_partitioning_does_not_change_rows(spark):
    a = sequences_df(spark, 500, partitions=1).orderBy("doc_id").collect()
    b = sequences_df(spark, 500, partitions=7).orderBy("doc_id").collect()
    assert a == b
