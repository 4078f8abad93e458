"""Base+delta frontier materialization (cfg.frontier_base_every > 1).

Between full compacted rewrites the engine appends only each round's
new rows (children + reload retries) as a delta file-set and keeps the
retry originals in a tombstone delete-set — Iceberg-v2 merge-on-read
expressed over versioned parquet (see EngineConfig.frontier_base_every).
Outputs must stay bit-identical with the per-round full rewrite, i.e.
with the Go oracle: these tests force delta windows across every code
path that interacts with the frontier relation (retries/tombstones,
budget deferral, resume from a durable base, add_task injection).
"""

import pandas as pd

from crawler_spark.config import EngineConfig
from crawler_spark.plans.frontier import FrontierEngine
from crawler_spark.plans.oracle import GoOracle
from crawler_spark.rules import BOOK_TASK, GROUP_TASK
from crawler_spark.sources.corpus import (
    CORPUS_SCHEMA,
    build_corpus_pdf,
    generic_task,
)
from tests.test_frontier import assert_equivalent, corpus_dict


def _mk(spark, tasks, pdf, workdir, **cfg_kw):
    corpus = spark.createDataFrame(pdf, CORPUS_SCHEMA)
    kw = dict(
        batch_size=8, num_partitions=4, use_bloom=True,
        bloom_capacity=1 << 14, frontier_base_every=3,
    )
    kw.update(cfg_kw)
    return FrontierEngine(
        spark, list(tasks), corpus, EngineConfig(**kw), workdir=workdir
    )


def test_full_rewrite_mode_exact_with_retries(spark, workdir):
    """frontier_base_every=1 — the per-round full-rewrite path (the
    round-1 behavior) stays oracle-exact now that the default is
    merge-on-read."""
    pdf = build_corpus_pdf(seed=42, n_generic=0)
    pdf = pdf[~pdf["url"].str.contains("/group/topic/")].reset_index(drop=True)
    eng = _mk(
        spark, [GROUP_TASK], pdf, workdir,
        batch_size=4, checkpoint_every=0, frontier_base_every=1,
    )
    eng.run(max_rounds=30)
    oracle = GoOracle(
        [GROUP_TASK], corpus_dict(pdf), batch_size=4, max_rounds=30
    ).run()
    assert_equivalent(eng, oracle)


def test_delta_mode_exact_with_retries(spark, workdir):
    """Reload retries inside a delta window: the retry original is
    consumed but un-marked from seen, so only the tombstone delete-set
    keeps it from resurfacing from an old delta file. checkpoint_every=0
    removes the durable-base grid so windows stay maximal and the run
    ends mid-window (exercising the end-of-run fold)."""
    pdf = build_corpus_pdf(seed=42, n_generic=0)
    pdf = pdf[~pdf["url"].str.contains("/group/topic/")].reset_index(drop=True)
    eng = _mk(
        spark, [GROUP_TASK], pdf, workdir,
        batch_size=4, checkpoint_every=0, frontier_base_every=4,
    )
    eng.run(max_rounds=30)
    oracle = GoOracle(
        [GROUP_TASK], corpus_dict(pdf), batch_size=4, max_rounds=30
    ).run()
    assert_equivalent(eng, oracle)
    assert len(oracle.failures) > 0  # retries actually happened


def test_delta_mode_budget_deferral_exact(spark, workdir):
    """Budget-deferred rows must survive across delta windows (they sit
    in old parts, unseen, re-eligible every round until fetched)."""
    pdf = build_corpus_pdf(
        seed=42, n_generic=60, n_hosts=5, out_degree=4,
        n_lists=2, books_per_list=3, n_topics=4,
    )
    base = generic_task(max_depth=3)
    tasks = [type(base)(**{**base.__dict__, "budget_count": 2,
                           "budget_window_s": 1})]
    eng = _mk(
        spark, tasks, pdf, workdir,
        batch_size=16, checkpoint_every=0, round_seconds=1.0,
        frontier_base_every=3, max_rounds=30,
    )
    eng.run(max_rounds=30)
    oracle = GoOracle(
        list(tasks), corpus_dict(pdf), batch_size=16, host_budget=2,
        max_rounds=30,
    ).run()
    assert_equivalent(eng, oracle)


def test_delta_mode_resume_equals_uninterrupted(spark, tmp_path):
    """Kill mid-delta-window, resume from the last durable base (the
    checkpoint grid forces bases), continue to the same horizon as an
    uninterrupted run — state identical."""
    pdf = build_corpus_pdf(
        seed=42, n_generic=40, n_hosts=4, out_degree=4,
        n_lists=0, books_per_list=0, n_topics=0,
    )
    tasks = [generic_task(max_depth=3)]
    kw = dict(checkpoint_every=2, frontier_base_every=3)
    full = _mk(spark, tasks, pdf, str(tmp_path / "full"), **kw)
    full.run(max_rounds=6)
    part = _mk(spark, tasks, pdf, str(tmp_path / "part"), **kw)
    part.run(max_rounds=3)  # durable base at round 2, round 3 is a delta
    resumed = _mk(spark, tasks, pdf, str(tmp_path / "part"), **kw)
    resumed.run(max_rounds=4, resume=True)  # rounds 3..6 replayed

    def _state(eng):
        order = [
            (r["round"], r.pull_rank, r.url, r.fetched)
            for r in eng.read_order().collect()
        ]
        seen = {r.url_hash for r in eng.read_seen().collect()}
        return order, seen, eng.round

    assert _state(resumed) == _state(full)


def test_delta_mode_add_task_across_windows(spark, workdir):
    """add_task seeds injected between runs must survive delta windows
    (they live in the driver-built injected frame until the next base
    rewrite materializes them)."""
    pdf = build_corpus_pdf(
        seed=42, n_generic=60, n_hosts=5, out_degree=4,
        n_lists=2, books_per_list=3, n_topics=4,
    )
    book = type(BOOK_TASK)(**{**BOOK_TASK.__dict__, "budget_count": 0})
    tasks0 = [generic_task(max_depth=2)]
    eng = _mk(
        spark, tasks0, pdf, workdir,
        checkpoint_every=0, frontier_base_every=4,
    )
    eng.run(max_rounds=3)
    assert eng.round == 3
    eng.add_task(book)
    eng.run(max_rounds=30, resume=True)
    oracle = GoOracle(
        [generic_task(max_depth=2)], corpus_dict(pdf), batch_size=8,
        max_rounds=40, add_tasks_after={3: [book]},
    ).run()
    assert_equivalent(eng, oracle)
    assert any(it["task"] == book.name for it in oracle.items)
