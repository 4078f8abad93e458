"""Dedup operators on degenerate documents (ADVICE r1 regression).

Spark's sequence(1, 0) is the DESCENDING [1, 0] while DuckDB's
generate_series(1, 0) is empty — un-guarded shingling crashed on any
doc with < 3 tokens and silently diverged from the DuckDB twins. These
tests run every shingle-based operator over a corpus of empty / null /
1-token / 2-token / normal docs and value-compare against the exact
ORACLES SQL the driver uses.
"""

import duckdb
import pandas as pd
import pytest

from crawler_spark.operators import dedup as D
from crawler_spark.queries import ORACLES
from scripts.check_contract import compare

SHORT_DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3, 4, 5, 6, 7],
        "text": [
            "",
            "one",
            "two tokens",
            "three token doc",
            "alpha beta gamma delta",
            None,
            "alpha beta gamma delta epsilon",
            "alpha beta gamma delta epsilon",  # near/exact dup of 6
        ],
    }
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(SHORT_DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("documents", SHORT_DOCS)
    return con


def test_with_shingles_no_crash(docs):
    got = {r.doc_id: r.shingles for r in D.with_shingles(docs).collect()}
    assert got[0] == [] and got[1] == [] and got[2] == []
    assert got[5] == []  # null text
    assert got[3] == ["three token doc"]
    assert len(got[4]) == 2


@pytest.mark.parametrize(
    "name,fn",
    [
        ("minhash_signature", lambda d: D.minhash_signature(d, k=8)),
        ("ngram_jaccard", lambda d: D.ngram_jaccard_pairs(d, threshold=0.5)),
        ("ngram_jaccard_lsh", lambda d: D.lsh_jaccard_pairs(d, threshold=0.5)),
        ("minhash_lsh", lambda d: D.minhash_lsh_pairs(d, k=8, bands=4)),
        ("simhash", lambda d: D.simhash(d)),
    ],
)
def test_short_docs_match_duckdb_twin(docs, duck, name, fn):
    spark_pdf = fn(docs).toPandas()
    duck_pdf = duck.execute(ORACLES[name]).df()
    assert compare(name, spark_pdf, duck_pdf) == "OK"


def test_exact_dup_detected(docs, duck):
    # sanity: docs 6 and 7 are identical → exact + near-dup hits exist
    pairs = D.lsh_jaccard_pairs(docs, threshold=0.5).collect()
    assert any(r.doc_a == 6 and r.doc_b == 7 and r.jaccard == 1.0 for r in pairs)
