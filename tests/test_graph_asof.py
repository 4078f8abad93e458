"""asof_join (operators/asof.py) and pagerank (operators/graphrank.py):
semantic invariants beyond the DuckDB hash-twin — correctness of the
as-of pick against a pandas merge_asof reference, and rank
conservation/ordering properties of the fixed-iteration walk.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.asof import asof_join
from crawler_spark.operators.graphrank import pagerank


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_asof_matches_pandas_merge_asof(spark, events):
    left = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", F.col("ts").alias("click_ts"), "click_id")
    )
    got = (
        asof_join(left, right, "user_id", "ts", "click_ts",
                  ["click_id", "click_ts"])
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("click_ts")
    want = (
        pd.merge_asof(lp, rp, left_on="ts", right_on="click_ts",
                      by="user_id", direction="backward")
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["event_id", "click_id", "click_ts"]],
        want[["event_id", "click_id", "click_ts"]],
        check_dtype=False,
    )


def test_asof_tie_is_inclusive(spark):
    left = spark.createDataFrame(
        [(1, "k", 10)], "id int, k string, t int"
    )
    right = spark.createDataFrame(
        [("k", 10, "exact"), ("k", 9, "earlier"), ("k", 11, "later")],
        "k string, rt int, v string",
    )
    rows = asof_join(left, right, "k", "t", "rt", ["v"]).collect()
    assert len(rows) == 1 and rows[0].v == "exact"  # <= picks the t row


def test_asof_no_prior_row_is_null(spark):
    left = spark.createDataFrame([(1, "k", 5)], "id int, k string, t int")
    right = spark.createDataFrame([("k", 9, "x")], "k string, rt int, v string")
    rows = asof_join(left, right, "k", "t", "rt", ["v"]).collect()
    assert len(rows) == 1 and rows[0].v is None


def test_pagerank_uniform_cycle(spark):
    # a directed cycle is perfectly balanced: every node keeps rank 1
    n = 5
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    ranks = pagerank(edges, iterations=4).collect()
    assert len(ranks) == n
    assert all(r.rank == 1.0 for r in ranks)


def test_pagerank_star_center_dominates(spark):
    # leaves -> center: center accumulates, leaves fall to (1-d)
    edges = spark.createDataFrame(
        [(i, 99) for i in range(1, 9)], "src long, dst long"
    )
    ranks = {r.node: r.rank for r in pagerank(edges, iterations=3).collect()}
    assert ranks[99] == max(ranks.values())
    leaf = ranks[1]
    assert all(ranks[i] == leaf for i in range(2, 9))
    assert leaf == pytest.approx(0.15, abs=1e-6)  # no in-links


def test_pagerank_total_mass_conserved_on_regular_graph(spark):
    # on a graph with no dangling nodes, sum(rank) = #nodes at every
    # iteration (mass in = mass out)
    edges = spark.createDataFrame(
        [(i, j) for i in range(6) for j in range(6) if j != i],
        "src long, dst long",
    )
    total = pagerank(edges, iterations=3, round_to=None).agg(
        F.sum("rank").alias("s")
    ).collect()[0].s
    assert total == pytest.approx(6.0, rel=1e-9)


def test_asof_tie_at_equal_ts_is_visible(spark):
    """A right row stamped exactly at the left ts is visible (<=,
    right-before-left in the window order) — DuckDB ASOF semantics."""
    from crawler_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 10), ("k", 9)], "key string, ts long"
    )
    right = spark.createDataFrame(
        [("k", 10, "at10"), ("k", 5, "at5")], "key string, rts long, v string"
    )
    rows = {r.ts: r.v for r in asof_join(
        left, right, "key", "ts", "rts", ["v"]
    ).collect()}
    assert rows == {10: "at10", 9: "at5"}


def test_asof_check_unique_raises_on_dup(spark):
    from crawler_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10)], "key string, ts long")
    right = spark.createDataFrame(
        [("k", 5, "a"), ("k", 5, "b"), ("k", 3, "c")],
        "key string, rts long, v string",
    )
    import pytest

    with pytest.raises(ValueError, match="not unique"):
        asof_join(left, right, "key", "ts", "rts", ["v"], check_unique=True)
    # unique right passes the gate and answers normally
    ok = asof_join(
        left, right.filter("v != 'b'"), "key", "ts", "rts", ["v"],
        check_unique=True,
    ).collect()
    assert [(r.ts, r.v) for r in ok] == [(10, "a")]
