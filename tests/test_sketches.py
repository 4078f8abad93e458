"""HLL sketch + snapshot diff: accuracy, mergeability, CDC statuses.

Everything is deterministic (md5-digit register/rank arithmetic, fixed
test corpus), so accuracy bounds are exact constants, not statistical
expectations.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators import sketches as K
from crawler_spark.operators.snapshot import diff_rollup, snapshot_diff

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_hll_estimate_within_bound(spark, docs):
    """m=256 → standard error ≈ 1.04/sqrt(256) = 6.5%; assert every
    group lands within 3σ (~20%) of the exact distinct count."""
    est = {
        r.lang: r.est_distinct
        for r in K.hll_distinct(docs, key="text", group="lang").collect()
    }
    exact = {
        r.lang: r.n
        for r in docs.groupBy("lang")
        .agg(F.countDistinct("text").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for lang, n in exact.items():
        assert abs(est[lang] - n) <= max(0.2 * n, 3), (lang, est[lang], n)


def test_hll_registers_merge_is_union(spark, docs):
    """The sketch's load-bearing property at 100 TB: registers built on
    disjoint slices and merged with MAX equal the registers built on
    the union in one pass (what makes it a map-side partial agg and a
    cross-day mergeable state)."""
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        K.hll_registers(a, key="text", group="lang")
        .unionByName(K.hll_registers(b, key="text", group="lang"))
        .groupBy("lang", "reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    direct = K.hll_registers(docs, key="text", group="lang")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_insensitive_to_duplicates(spark, docs):
    """Distinct-count estimator must not move when rows are duplicated
    (max is idempotent)."""
    doubled = docs.unionByName(docs)
    one = K.hll_distinct(docs, key="text", group="lang").collect()
    two = K.hll_distinct(doubled, key="text", group="lang").collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, two))


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "h1"), (2, "h2"), (3, "h3")], "doc_id long, content_hash string"
    )
    new = spark.createDataFrame(
        [(2, "h2"), (3, "CHANGED"), (4, "h4")], "doc_id long, content_hash string"
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "same", 3: "changed", 4: "added"}
    roll = {r.status: r.n for r in diff_rollup(snapshot_diff(old, new)).collect()}
    assert roll == {"removed": 1, "same": 1, "changed": 1, "added": 1}
