"""Driver-contract smoke + a fast subset of the DuckDB value checks
(the full sweep is scripts/check_contract.py, run pre-commit)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

FAST_SUBSET = [
    "depth_filter",
    "host_budget",
    "fetch_join",
    "agg_metrics",
    "dedup_exact",
    "token_count",
]


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as e

    return e


def test_entry_runs(spark, contract):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "source", "lang", "quality", "rank_in_source"]


def test_every_query_has_callable(contract):
    qs = contract.queries()
    assert len(qs) >= 25
    oracles = contract.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_query_matches_duckdb(spark, contract, name):
    from scripts.check_contract import TABLES, compare, duck_conn

    qs = contract.queries()
    oracles = contract.oracle_sql()
    spark_pdf = qs[name](spark, SF_DIR).toPandas()
    con = duck_conn(SF_DIR)
    duck_pdf = con.execute(oracles[name]).df()
    assert compare(name, spark_pdf, duck_pdf) == "OK"
