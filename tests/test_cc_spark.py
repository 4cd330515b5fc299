"""Connected-components duplicate clustering (dedup.connected_components).

Oracle: a pure-Python union-find over the same edge list. Shapes chosen
to stress the alternating-star algorithm: long paths (worst-case
diameter), cliques (the near-dup shape), stars, isolated pairs, random
graphs, and string ids (lexicographic min must match Spark's)."""

import random

import pytest
from pyspark.sql import functions as F

from sketchlib.dedup import connected_components, drop_near_duplicates


def union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then label each node by its component min
    roots = {}
    for x in list(parent):
        roots.setdefault(find(x), []).append(x)
    out = {}
    for r, members in roots.items():
        m = min(members + [r])
        for x in members:
            out[x] = m
    return out


def run_cc(spark, edges, typ="long"):
    df = spark.createDataFrame(edges, f"doc_a {typ}, doc_b {typ}")
    got = {
        (r.node, r.component)
        for r in connected_components(df).collect()
    }
    want = set(union_find(edges).items())
    assert got == want


def test_cc_path_graph(spark):
    # a 200-node chain: worst case for naive min-propagation (O(n)
    # rounds); alternating star must finish in O(log^2 n)
    run_cc(spark, [(i, i + 1) for i in range(200)])


def test_cc_cliques_and_pairs(spark):
    edges = []
    # three cliques of 10 on disjoint ranges
    for base in (0, 100, 200):
        ids = [base + i for i in range(10)]
        edges += [(a, b) for a in ids for b in ids if a < b]
    # isolated pairs
    edges += [(1000, 1001), (2000, 2001)]
    run_cc(spark, edges)


def test_cc_star_and_reverse_edges(spark):
    # star centered on the LARGEST id, edges given high->low
    edges = [(999, i) for i in range(10)]
    run_cc(spark, edges)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_cc_random_graphs(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(300))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(250)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    run_cc(spark, edges)


def test_cc_string_ids(spark):
    edges = [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("doc-x", "doc-y")]
    run_cc(spark, edges, typ="string")


def test_drop_near_duplicates(spark):
    docs = spark.createDataFrame(
        [(f"d{i}",) for i in range(6)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("d0", "d1"), ("d1", "d2"), ("d4", "d5")], "doc_a string, doc_b string"
    )
    kept = sorted(r.doc_id for r in drop_near_duplicates(docs, pairs).collect())
    # cluster {d0,d1,d2} keeps d0; {d4,d5} keeps d4; d3 is a singleton
    assert kept == ["d0", "d3", "d4"]


def test_cc_empty_and_self_loops(spark):
    empty = spark.createDataFrame([], "doc_a string, doc_b string")
    assert connected_components(empty).count() == 0
    loops = spark.createDataFrame([("a", "a")], "doc_a string, doc_b string")
    assert connected_components(loops).count() == 0


def test_cc_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches the loop to reliable checkpoint():
    results identical, and checkpoint state actually lands in the dir."""
    import os

    edges = [(i, i + 1) for i in range(60)] + [(200 + i, 200) for i in range(5)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    ckdir = str(tmp_path / "cc_ckpt")
    got = {
        (r.node, r.component)
        for r in connected_components(df, checkpoint_dir=ckdir).collect()
    }
    assert got == set(union_find(edges).items())
    # reliable checkpoints were written under the requested directory
    walked = [f for _, _, fs in os.walk(ckdir) for f in fs]
    assert walked, "no reliable checkpoint state written"
    # and drop_near_duplicates plumbs the same option through
    docs = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    kept = drop_near_duplicates(docs, df, checkpoint_dir=ckdir)
    losers = {n for n, c in union_find(edges).items() if n != c}
    assert {r.doc_id for r in kept.collect()} == set(range(300)) - losers
