"""Physical-plan contracts over EVERY driver query.

The 100 TB design promises (SCALE.md) are properties of the *plan*, not
just the small-SF results, so they are asserted here directly:

- no unbounded cartesian product anywhere (the canonical scale-killer);
  the only allowed nested-loop joins are the two documented bounded
  ones (ann_cosine_topk: 5 query vectors broadcast; winnow_guarantee:
  a 1-row x 1-row certificate join),
- no row-at-a-time Python UDF (`BatchEvalPython`) in any plan — Python
  stages must be Arrow-batched (`ArrowEvalPython` / `MapInArrow` /
  pandas grouped ops),
- parquet scans driven by the flagship sketch queries must prune
  columns (ReadSchema strictly narrower than the on-disk schema).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

# bounded-by-construction nested-loop joins, documented in the query
# docstrings; everything else must broadcast/shuffle on a key
CARTESIAN_OK = {
    "ann_cosine_topk",
    "winnow_guarantee",
    # pair join over #sources merged STATE rows (KB), never the corpus
    "hll_set_algebra",
    "kmv_source_overlap",
}

def _all_plans(spark):
    import __spark_entry__ as mod

    plans = {}
    jvm = spark.sparkContext._jvm
    for name, fn in mod.queries().items():
        df = fn(spark, SF_DIR)
        plans[name] = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    return plans


@pytest.fixture(scope="module")
def plans(spark):
    return _all_plans(spark)


def test_no_unbounded_cartesian(plans):
    offenders = []
    for name, plan in plans.items():
        if name in CARTESIAN_OK:
            continue
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            offenders.append(name)
    assert not offenders, (
        f"unbounded cross joins in {offenders}: at 100TB these are O(n^2); "
        "join on a key (band/bucket/fp) or broadcast a provably-small side "
        "and add the query to CARTESIAN_OK with a boundedness argument"
    )


def test_no_row_at_a_time_python(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, (
        f"row-at-a-time Python UDFs in {offenders}: use Arrow-batched "
        "(pandas_udf / mapInArrow) stages instead"
    )


def test_flagship_scans_prune_columns(plans, spark):
    # events.parquet carries 8 columns; the HLL user-distinct query needs 2
    import re

    plan = plans["hll_distinct_users_per_event_type"]

    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert read_schemas, "no FileScan with ReadSchema in flagship plan"
    on_disk = len(spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).columns)
    for rs in read_schemas:
        ncols = len([c for c in rs.split(",") if ":" in c])
        assert ncols < on_disk, (
            f"scan reads {ncols}/{on_disk} columns — column pruning lost: {rs}"
        )
