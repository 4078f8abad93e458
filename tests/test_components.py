"""Connected components + transitive dedup grouping.

The Spark implementation (min-label propagation + pointer jumping to
the label-sum fixpoint) is checked against a plain Python union-find
on fixed and randomized graphs — the same exactness contract the
DuckDB recursive-CTE oracle enforces at the queries() surface.
"""

import random

from pyspark.sql import functions as F

from crawler_spark.operators.components import (
    connected_components,
    dedup_groups,
)


def _union_find(edges):
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
    # canonical = min member per root
    members = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    out = {}
    for root, ms in members.items():
        m = min(ms)
        for n in ms:
            out[n] = m
    return out


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df).collect()
    return {r["node"]: r["component"] for r in got}


def test_chain_star_singleton_mix(spark):
    # a 6-node path (worst case for plain propagation), a star, and
    # a 2-cycle; expected labels = component minimums
    edges = [
        (10, 11), (11, 12), (12, 13), (13, 14), (14, 15),  # path
        (20, 21), (20, 22), (20, 23),                      # star
        (30, 31), (31, 30),                                # cycle w/ dup edge
    ]
    assert _cc_spark(spark, edges) == _union_find(edges)


def test_two_paths_merge_via_bridge(spark):
    edges = [(1, 2), (2, 3), (5, 6), (6, 7), (3, 5)]
    got = _cc_spark(spark, edges)
    assert set(got.values()) == {1}
    assert got == _union_find(edges)


def test_randomized_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _cc_spark(spark, edges) == _union_find(edges)


def test_dedup_groups_transitive_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    )
    # A~B, B~C must collapse {1,2,3}; {5,6} a pair; 4,7 singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: (r["group_id"], r["group_size"])
        for r in dedup_groups(docs, pairs).collect()
    }
    assert got == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        4: (4, 1), 5: (5, 2), 6: (5, 2), 7: (7, 1),
    }


def test_dedup_groups_keeper_filter(spark):
    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "doc_a long, doc_b long")
    g = dedup_groups(docs, pairs)
    keepers = sorted(
        r["doc_id"]
        for r in g.filter(F.col("doc_id") == F.col("group_id")).collect()
    )
    assert keepers == [0, 3]
