"""Cuckoo-filter seen-set backend (operators/cuckoo.py).

The north-star target names "bloom/cuckoo URL-seen"; ShardedCuckoo is
the cuckoo half, mirroring ShardedBloom's API. The invariant that
matters to the engine is identical: NO false negatives, ever (a lost
seen mark silently re-crawls a URL) — plus the cuckoo-only extra,
deletion (the reference's reload un-mark as a filter op).
"""

import hashlib

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.config import EngineConfig
from crawler_spark.operators.cuckoo import CuckooFilter, ShardedCuckoo
from crawler_spark.plans.frontier import FrontierEngine
from crawler_spark.plans.oracle import GoOracle
from crawler_spark.sources.corpus import (
    CORPUS_SCHEMA,
    build_corpus_pdf,
    generic_task,
)
from tests.test_frontier import assert_equivalent, corpus_dict


@given(st.sets(st.text(min_size=0, max_size=40), min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_cuckoo_never_false_negative(keys):
    cf = CuckooFilter(capacity=max(len(keys), 8))
    cf.insert_many(list(keys))
    assert bool(cf.contains_series(pd.Series(list(keys))).all())


def test_cuckoo_overfill_stash_no_false_negative():
    """6× over capacity: evictions exhaust, the stash absorbs the
    overflow, membership still never lies 'new'."""
    cf = CuckooFilter(capacity=64)
    keys = [hashlib.md5(f"s{i}".encode()).hexdigest() for i in range(400)]
    cf.insert_many(keys)
    assert len(cf.stash) > 0  # pressure actually hit the stash path
    assert bool(cf.contains_series(pd.Series(keys)).all())


def test_cuckoo_delete_keeps_remaining_keys():
    """Deleting inserted keys removes one fingerprint copy each; every
    non-deleted key must remain present (the reload un-mark must never
    evict another URL's mark)."""
    keys = [hashlib.md5(str(i).encode()).hexdigest() for i in range(5000)]
    cf = CuckooFilter(capacity=5000)
    cf.insert_many(keys)
    cf.delete_many(keys[:2500])
    assert bool(cf.contains_series(pd.Series(keys[2500:])).all())
    # deleted keys read (almost all) absent — fpp-bounded residue only
    assert cf.contains_series(pd.Series(keys[:2500])).mean() < 0.01


def test_cuckoo_serialization_roundtrip():
    keys = [hashlib.md5(f"r{i}".encode()).hexdigest() for i in range(1000)]
    a = CuckooFilter(capacity=1000)
    a.insert_many(keys)
    b = CuckooFilter.from_bytes(1000, a.to_bytes())
    assert bool(b.contains_series(pd.Series(keys)).all())
    assert (
        a.contains_series(pd.Series(keys + ["nope"] * 5)).tolist()
        == b.contains_series(pd.Series(keys + ["nope"] * 5)).tolist()
    )


def test_cuckoo_fpp_sane():
    keys = [hashlib.md5(str(i).encode()).hexdigest() for i in range(20000)]
    cf = CuckooFilter(capacity=20000)
    cf.insert_many(keys)
    fresh = [hashlib.md5(f"x{i}".encode()).hexdigest() for i in range(20000)]
    assert cf.contains_series(pd.Series(fresh)).mean() < 0.005


def test_sharded_cuckoo_fold_and_check(spark):
    """Distributed build → incremental fold → cogroup check: all
    inserted keys maybe-seen, fresh keys (almost) all definitely-new."""
    sc_keys = [hashlib.md5(str(i).encode()).hexdigest() for i in range(2000)]
    extra = [hashlib.md5(f"d{i}".encode()).hexdigest() for i in range(500)]
    fresh = [hashlib.md5(f"n{i}".encode()).hexdigest() for i in range(1000)]
    sk = ShardedCuckoo(n_shards=4, capacity=1 << 13)
    base = spark.createDataFrame([(k,) for k in sc_keys], "url_hash string")
    delta = spark.createDataFrame([(k,) for k in extra], "url_hash string")
    shards = sk.fold(None, base)
    shards = sk.fold(shards, delta)
    probe = spark.createDataFrame(
        [(k,) for k in sc_keys + extra + fresh], "url_hash string"
    )
    for tagged in (
        sk.check(probe, "url_hash", shards),
        sk.check_broadcast(probe, "url_hash", shards),
    ):
        rows = {r["url_hash"]: r["_maybe_seen"] for r in tagged.collect()}
        assert all(rows[k] for k in sc_keys + extra)  # no false negatives
        assert sum(rows[k] for k in fresh) < 20  # fpp-bounded


def test_engine_cuckoo_backend_oracle_exact(spark, workdir):
    """Full crawl with seen_filter='cuckoo' forced on from round one
    (bloom_min_seen=0), reload retries included — order/seen/items/
    failures bit-identical with the Go oracle, like the bloom backend."""
    pdf = build_corpus_pdf(
        seed=42, n_generic=60, n_hosts=5, out_degree=4,
        n_lists=2, books_per_list=3, n_topics=4,
    )
    tasks = [generic_task(max_depth=3)]
    corpus_df = spark.createDataFrame(pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=8, num_partitions=4, max_rounds=20, use_bloom=True,
        bloom_capacity=1 << 14, bloom_min_seen=0, seen_filter="cuckoo",
    )
    eng = FrontierEngine(spark, tasks, corpus_df, cfg, workdir=workdir)
    eng.run(max_rounds=20)
    oracle = GoOracle(
        list(tasks), corpus_dict(pdf), batch_size=8, max_rounds=20
    ).run()
    assert_equivalent(eng, oracle)


def test_engine_cuckoo_cogroup_tier_oracle_exact(spark, workdir):
    """Cuckoo backend through the cogroup probe tier (broadcast budget
    forced to 0) — the 10^10-scale path."""
    pdf = build_corpus_pdf(
        seed=42, n_generic=60, n_hosts=5, out_degree=4,
        n_lists=0, books_per_list=0, n_topics=0,
    )
    tasks = [generic_task(max_depth=3)]
    corpus_df = spark.createDataFrame(pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=8, num_partitions=4, max_rounds=15, use_bloom=True,
        bloom_capacity=1 << 14, bloom_min_seen=0, seen_filter="cuckoo",
        bloom_broadcast_max=0,
    )
    eng = FrontierEngine(spark, tasks, corpus_df, cfg, workdir=workdir)
    eng.run(max_rounds=15)
    oracle = GoOracle(
        list(tasks), corpus_dict(pdf), batch_size=8, max_rounds=15
    ).run()
    assert_equivalent(eng, oracle)
