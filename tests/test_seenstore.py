"""Sorted-run exact seen probe (operators/seenstore.py).

The probe replaces the engaged-path full-ledger anti-join (VERDICT r2
#1): membership answers must be EXACT — the engine's correctness
(engine == oracle crawl order / seen set) rides on it. Unit tests pin
the membership kernel on sorted and unsorted runs; engine tests pin
oracle equality with compaction forced every 2 rounds.
"""

import numpy as np
import pandas as pd
import pytest

from crawler_spark.config import EngineConfig
from crawler_spark.plans.frontier import FrontierEngine
from crawler_spark.sources.corpus import CORPUS_SCHEMA, build_corpus_pdf, generic_task
from crawler_spark.sources.tableio import TableIO

from tests.test_frontier import assert_equivalent, run_oracle


@pytest.fixture(scope="module")
def small_pdf():
    return build_corpus_pdf(
        seed=42, n_generic=60, n_hosts=5, out_degree=4,
        n_lists=2, books_per_list=3, n_topics=4,
    )


def _hashes(seed, n):
    rng = np.random.RandomState(seed)
    return [
        "".join(rng.choice(list("0123456789abcdef"), 32)) for _ in range(n)
    ]


def _members_via_probe(spark, workdir, rounds_of_keys, probe_keys,
                       sort_within="url_hash"):
    from crawler_spark.operators.seenstore import seen_members

    io = TableIO(spark, workdir, mode="parquet")
    paths = []
    for rnd, keys in enumerate(rounds_of_keys):
        df = spark.createDataFrame(
            pd.DataFrame({"url_hash": keys}), "url_hash string"
        )
        io.write_round(df, "seen", rnd, n_files=1, sort_within=sort_within)
        paths += io.round_files("seen", rnd)
    probe = spark.createDataFrame(
        pd.DataFrame({"url_hash": probe_keys}), "url_hash string"
    )
    out = seen_members(probe, paths, n_groups=4)
    return sorted(r["url_hash"] for r in out.collect())


def test_seen_members_exact(spark, workdir):
    stored = _hashes(1, 500)
    absent = _hashes(2, 300)
    rounds = [stored[:200], stored[200:350], stored[350:]]
    # probe a mix, with duplicates (the probe must dedup)
    probe = stored[::3] + absent + stored[::3]
    got = _members_via_probe(spark, workdir, rounds, probe)
    assert got == sorted(set(stored[::3]))


def test_seen_members_unsorted_runs_still_exact(spark, workdir):
    """Stats-based pruning is valid for any layout; an unsorted run
    (e.g. written by an older engine) must still answer exactly."""
    stored = _hashes(3, 400)
    absent = _hashes(4, 100)
    got = _members_via_probe(
        spark, workdir, [stored], stored[::5] + absent, sort_within=None
    )
    assert got == sorted(set(stored[::5]))


def test_seen_members_empty_store_and_empty_probe(spark, workdir):
    from crawler_spark.operators.seenstore import seen_members

    probe = spark.createDataFrame(
        pd.DataFrame({"url_hash": _hashes(5, 10)}), "url_hash string"
    )
    assert seen_members(probe, [], n_groups=4).count() == 0
    io = TableIO(spark, workdir, mode="parquet")
    df = spark.createDataFrame(
        pd.DataFrame({"url_hash": _hashes(6, 50)}), "url_hash string"
    )
    io.write_round(df, "seen", 0, n_files=1, sort_within="url_hash")
    empty = probe.filter("url_hash is null")
    assert (
        seen_members(empty, io.round_files("seen", 0), n_groups=4).count() == 0
    )


def test_engine_with_compaction_matches_oracle(spark, small_pdf, workdir):
    """Engaged prefilter + sorted probe + LSM compaction every 2
    rounds (plus retries via reload): crawl order, seen set, and items
    must stay bit-identical with the executable spec."""
    tasks = [generic_task(max_depth=3)]
    corpus_df = spark.createDataFrame(small_pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=8, num_partitions=4, max_rounds=20, use_bloom=True,
        bloom_capacity=1 << 14, bloom_min_seen=0, bloom_shards=4,
        seen_compact_every=2,
    )
    eng = FrontierEngine(spark, tasks, corpus_df, cfg, workdir=workdir)
    eng.run(max_rounds=20)
    oracle = run_oracle(tasks, small_pdf, batch_size=8, max_rounds=20)
    assert_equivalent(eng, oracle)
    # compaction actually happened (runs table exists with one base)
    assert eng._seen_runs_base is not None
    assert eng.io.rounds("seen_runs") == [eng._seen_runs_base]


def test_engine_probe_off_same_result(spark, small_pdf, workdir):
    """sorted_seen_probe=False = the round-2 full-ledger anti-join;
    outputs must be identical either way."""
    tasks = [generic_task(max_depth=3)]
    corpus_df = spark.createDataFrame(small_pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=8, num_partitions=4, max_rounds=20, use_bloom=True,
        bloom_capacity=1 << 14, bloom_min_seen=0, bloom_shards=4,
        sorted_seen_probe=False,
    )
    eng = FrontierEngine(spark, tasks, corpus_df, cfg, workdir=workdir)
    eng.run(max_rounds=20)
    oracle = run_oracle(tasks, small_pdf, batch_size=8, max_rounds=20)
    assert_equivalent(eng, oracle)
