"""Cross-checks vs Spark's OWN approximate built-ins (SURVEY.md §2.5):
our sketches and Catalyst's (`approx_count_distinct` = HLL++,
`percentile_approx` = GK) must agree with the exact answer within each
algorithm's bound — two independent implementations bracketing the same
truth. (CMS has no SQL readout in Spark; its cross-check is the exact
DuckDB oracle in the driver queries.)"""

import math

from pyspark.sql import functions as F

from sketchlib.agg import SketchSpec, sketch_aggregate
from sketchlib.estimates import hll_count
from sketchlib.kll import KLL
from sketchlib.tdigest import TDigest

P = 14
SLACK = 4 * 1.04 / math.sqrt(2**P)


def test_hll_vs_approx_count_distinct(spark, seq_small):
    flat = seq_small.select("source", F.explode("tokens").alias("t"))
    both = (
        flat.groupBy("source")
        .agg(
            F.countDistinct("t").alias("exact"),
            F.approx_count_distinct("t", rsd=0.01).alias("spark_est"),
        )
    )
    merged = sketch_aggregate(
        seq_small,
        ["source"],
        [SketchSpec("h", "hll", "tokens", {"p": P, "seed": 7})],
        fanout=4,
    ).withColumn("ours", hll_count("state"))
    rows = both.join(merged, "source").select("source", "exact", "spark_est", "ours").collect()
    assert rows
    for r in rows:
        # ours within our published bound; Spark's within its rsd*4;
        # and the two estimators agree within combined slack
        assert abs(r.ours - r.exact) <= max(SLACK * r.exact, 3), r
        assert abs(r.spark_est - r.exact) <= max(0.04 * r.exact, 3), r
        assert abs(r.ours - r.spark_est) <= max((SLACK + 0.04) * r.exact, 6), r


def test_quantiles_vs_percentile_approx(spark, seq_small):
    vals = seq_small.select(F.col("n_tok").cast("double").alias("v"))
    row = vals.agg(
        F.expr("percentile(v, 0.5)").alias("exact"),
        F.percentile_approx("v", 0.5, 10000).alias("spark_est"),
    ).collect()[0]
    merged_td = sketch_aggregate(
        vals.withColumn("g", F.lit(1)),
        ["g"],
        [SketchSpec("td", "tdigest", "v", {"delta": 200.0})],
        fanout=4,
    ).collect()
    merged_kll = sketch_aggregate(
        vals.withColumn("g", F.lit(1)),
        ["g"],
        [SketchSpec("k", "kll", "v", {"k": 200, "seed": 7})],
        fanout=4,
    ).collect()
    ours_td = TDigest.from_bytes(bytes(merged_td[0]["state"])).quantile(0.5)
    ours_kll = float(KLL.from_bytes(bytes(merged_kll[0]["state"])).quantiles([0.5])[0])
    n = vals.count()
    # value-space agreement: n_tok spans 16..500; all three estimators
    # must land within a few rank-percent of the exact median, which for
    # this distribution is < 15 value units
    for est in (row.spark_est, ours_td, ours_kll):
        assert abs(est - row.exact) <= 15, (est, row.exact)
    # rank-space agreement for ours (the real guarantee)
    for est in (ours_td, ours_kll):
        rank = vals.filter(F.col("v") <= est).count() / n
        assert abs(rank - 0.5) <= 0.05, (est, rank)
