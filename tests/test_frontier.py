"""Engine ↔ Go-oracle equivalence.

The oracle (crawler_spark/plans/oracle.py) with batch_size=1 IS the
reference's deterministic single-worker loop; with batch_size=B it
defines the engine's round semantics. The Spark engine must reproduce
the oracle's crawl order (url sequence per fetch attempt), final
seen-set, items, and failures for every configuration.
"""

import json

import pandas as pd
import pytest

from crawler_spark.config import EngineConfig
from crawler_spark.plans.frontier import FRONTIER_SCHEMA, FrontierEngine
from crawler_spark.plans.oracle import GoOracle
from crawler_spark.rules import BOOK_TASK, GROUP_TASK
from crawler_spark.sources.corpus import (
    CORPUS_SCHEMA,
    build_corpus_pdf,
    generic_task,
)


def corpus_dict(pdf):
    return dict(zip(pdf["canon_url"], pdf["text"]))


def run_engine(spark, tasks, pdf, workdir, batch_size, budget=None, max_rounds=50,
               use_bloom=True, bloom_min_seen=1 << 30):
    corpus_df = spark.createDataFrame(pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=batch_size,
        num_partitions=4,
        max_rounds=max_rounds,
        use_bloom=use_bloom,
        bloom_capacity=1 << 14,
        bloom_min_seen=bloom_min_seen,
    )
    tasks = [t for t in tasks]
    if budget is not None:
        # encode the per-round host budget directly: 1-second rounds
        cfg.round_seconds = 1.0
        tasks = [
            type(t)(**{**t.__dict__, "budget_count": budget, "budget_window_s": 1})
            for t in tasks
        ]
    eng = FrontierEngine(spark, tasks, corpus_df, cfg, workdir=workdir)
    eng.run(max_rounds=max_rounds)
    return eng


def run_oracle(tasks, pdf, batch_size, budget=None, max_rounds=50):
    return GoOracle(
        list(tasks),
        corpus_dict(pdf),
        batch_size=batch_size,
        host_budget=budget,
        max_rounds=max_rounds,
    ).run()


def assert_equivalent(eng, oracle):
    order_rows = eng.read_order().collect()
    got_order = [(r["round"], r.url, r.fetched) for r in order_rows]
    exp_order = [(o["round"], o["url"], o["fetched"]) for o in oracle.crawl_order]
    assert got_order == exp_order, (
        f"crawl order mismatch:\n got={got_order[:20]}\n exp={exp_order[:20]}"
    )
    got_seen = {r.url_hash for r in eng.read_seen().collect()}
    assert got_seen == oracle.seen
    got_failures = {r.url_hash for r in eng.read_failures().collect()}
    assert got_failures == set(oracle.failures.keys())
    got_items = sorted(
        (r.task, r.rule, r.url, tuple(sorted(json.loads(r.fields).items())))
        for r in eng.read_items().collect()
    )
    exp_items = sorted(
        (
            it["task"],
            it["rule"],
            it["url"],
            tuple(sorted((k, v) for k, v in it.items() if k not in ("task", "rule", "url"))),
        )
        for it in oracle.items
    )
    assert got_items == exp_items


@pytest.fixture(scope="module")
def small_pdf():
    return build_corpus_pdf(
        seed=42, n_generic=60, n_hosts=5, out_degree=4,
        n_lists=2, books_per_list=3, n_topics=4,
    )


def test_douban_single_worker_exact(spark, small_pdf, workdir):
    """B=1 = the reference single-worker loop, both tasks."""
    tasks = [BOOK_TASK, GROUP_TASK]
    eng = run_engine(spark, tasks, small_pdf, workdir, batch_size=1, max_rounds=40)
    oracle = run_oracle(tasks, small_pdf, batch_size=1, max_rounds=40)
    assert_equivalent(eng, oracle)
    assert len(oracle.crawl_order) > 10
    assert len(oracle.items) > 0


def test_generic_batched(spark, small_pdf, workdir):
    """Batched rounds on the cyclic generic graph, with fetch failures."""
    tasks = [generic_task(max_depth=3)]
    eng = run_engine(spark, tasks, small_pdf, workdir, batch_size=16, max_rounds=30)
    oracle = run_oracle(tasks, small_pdf, batch_size=16, max_rounds=30)
    assert_equivalent(eng, oracle)
    assert len(oracle.crawl_order) > 20


def test_generic_budget(spark, small_pdf, workdir):
    """Per-host politeness budget defers over-budget requests."""
    tasks = [generic_task(max_depth=3)]
    eng = run_engine(
        spark, tasks, small_pdf, workdir, batch_size=16, budget=2, max_rounds=30
    )
    oracle = run_oracle(tasks, small_pdf, batch_size=16, budget=2, max_rounds=30)
    assert_equivalent(eng, oracle)


def test_bloom_off_same_result(spark, small_pdf, workdir):
    tasks = [generic_task(max_depth=2)]
    eng = run_engine(
        spark, tasks, small_pdf, workdir, batch_size=8, max_rounds=20, use_bloom=False
    )
    oracle = run_oracle(tasks, small_pdf, batch_size=8, max_rounds=20)
    assert_equivalent(eng, oracle)


def test_bloom_forced_same_result(spark, small_pdf, workdir):
    """Force the bloom prefilter path (bloom_min_seen=0) — split +
    exact anti-join must stay bit-identical with the plain path."""
    tasks = [generic_task(max_depth=3)]
    eng = run_engine(
        spark, tasks, small_pdf, workdir, batch_size=8, max_rounds=20,
        use_bloom=True, bloom_min_seen=0,
    )
    oracle = run_oracle(tasks, small_pdf, batch_size=8, max_rounds=20)
    assert_equivalent(eng, oracle)


def test_sequential_seen_write_same_result(spark, small_pdf, workdir):
    """overlap_seen_write=False — the strictly-sequential end-of-round
    ledger path (the default overlaps seen-write/bloom-fold with the
    snapshot from a second driver thread; every other test runs that).
    Both orderings must stay bit-identical with the oracle."""
    tasks = [generic_task(max_depth=3)]
    corpus_df = spark.createDataFrame(small_pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=8, num_partitions=4, max_rounds=20, use_bloom=True,
        bloom_capacity=1 << 14, bloom_min_seen=0,
        overlap_seen_write=False,
    )
    eng = FrontierEngine(spark, tasks, corpus_df, cfg, workdir=workdir)
    eng.run(max_rounds=20)
    oracle = run_oracle(tasks, small_pdf, batch_size=8, max_rounds=20)
    assert_equivalent(eng, oracle)


def test_bloom_cogroup_tier_same_result(spark, small_pdf, workdir):
    """Force the cogroup probe tier (bloom_broadcast_max=0 — the
    10^10-scale path where the shard store is never assembled in one
    place); verdicts must stay bit-identical with the broadcast tier
    and the oracle."""
    tasks = [generic_task(max_depth=3)]
    corpus_df = spark.createDataFrame(small_pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=8, num_partitions=4, max_rounds=20, use_bloom=True,
        bloom_capacity=1 << 14, bloom_min_seen=0, bloom_shards=4,
        bloom_broadcast_max=0,
    )
    eng = FrontierEngine(spark, tasks, corpus_df, cfg, workdir=workdir)
    eng.run(max_rounds=20)
    oracle = run_oracle(tasks, small_pdf, batch_size=8, max_rounds=20)
    assert_equivalent(eng, oracle)


def test_bloom_lazy_fold_same_result(spark, small_pdf, workdir):
    """Sharded bloom with fold_every=3: rounds between folds rely on
    the unfolded-delta broadcast anti-join — result must stay
    bit-identical with the oracle regardless of fold timing."""
    tasks = [generic_task(max_depth=3)]
    corpus_df = spark.createDataFrame(small_pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=8, num_partitions=4, max_rounds=20, use_bloom=True,
        bloom_capacity=1 << 14, bloom_min_seen=0, bloom_fold_every=3,
        bloom_shards=4,
    )
    eng = FrontierEngine(spark, tasks, corpus_df, cfg, workdir=workdir)
    eng.run(max_rounds=20)
    oracle = run_oracle(tasks, small_pdf, batch_size=8, max_rounds=20)
    assert_equivalent(eng, oracle)


def test_distributed_rank_path_exact(spark, small_pdf, workdir):
    """Force the range-partitioned two-pass pull_rank (the >256k-batch
    path) — must be bit-identical with the window path / oracle."""
    tasks = [generic_task(max_depth=3)]
    corpus_df = spark.createDataFrame(small_pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=16, num_partitions=4, max_rounds=25, use_bloom=False,
        rank_window_max=0,  # always take the distributed path
    )
    eng = FrontierEngine(spark, tasks, corpus_df, cfg, workdir=workdir)
    eng.run(max_rounds=25)
    oracle = run_oracle(tasks, small_pdf, batch_size=16, max_rounds=25)
    assert_equivalent(eng, oracle)


def test_fetch_join_tiers_exact(spark, small_pdf, workdir):
    """The three fetch-join strategies (full-probe broadcast /
    semi-key-filtered bounded join / plain shuffle join) and the
    keys-tier rejoin+deferred guards must all be bit-identical with
    the oracle — the tier choice is a physical-plan decision only."""
    tasks = [BOOK_TASK, GROUP_TASK, generic_task(max_depth=3)]
    corpus_df = spark.createDataFrame(small_pdf, CORPUS_SCHEMA)
    oracle = run_oracle(tasks, small_pdf, batch_size=8, max_rounds=25)
    for fmax, kmax in ((1 << 18, 1 << 21), (1, 1 << 21), (1, 2)):
        cfg = EngineConfig(
            batch_size=8, num_partitions=4, max_rounds=25, use_bloom=False,
            fetch_broadcast_max=fmax, keys_broadcast_max=kmax,
        )
        eng = FrontierEngine(
            spark, tasks, corpus_df, cfg,
            workdir=f"{workdir}_t{fmax}_{kmax}",
        )
        eng.run(max_rounds=25)
        assert_equivalent(eng, oracle)


def test_histogram_cut_refinement_exact(spark, small_pdf, workdir):
    """Force the dense-band refinement of the histogram cut: dense
    seed seqs pile into one coarse bucket, and rank_refine_max=4
    makes every over-full threshold bucket take the second-level
    (seq >> 7) sub-histogram. Must stay bit-identical to the oracle."""
    tasks = [generic_task(max_depth=3, n_seeds=40)]
    corpus_df = spark.createDataFrame(small_pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=16, num_partitions=4, max_rounds=25, use_bloom=False,
        rank_window_max=0,  # always the histogram-cut distributed path
        rank_refine_max=4,  # refine any threshold bucket > 4 rows
    )
    eng = FrontierEngine(spark, tasks, corpus_df, cfg, workdir=workdir)
    eng.run(max_rounds=25)
    oracle = run_oracle(tasks, small_pdf, batch_size=16, max_rounds=25)
    assert_equivalent(eng, oracle)
    # under-full rounds (batch > candidates, the histogram exhausts
    # without crossing batch_size) with BOTH priority classes present
    # — the refinement must keep every threshold-bucket row (caught a
    # cum_before accounting bug that silently dropped mid-order rows)
    tasks2 = [BOOK_TASK, GROUP_TASK, generic_task(max_depth=3, n_seeds=40)]
    cfg2 = EngineConfig(
        batch_size=200, num_partitions=4, max_rounds=15, use_bloom=False,
        rank_window_max=0, rank_refine_max=4,
    )
    eng2 = FrontierEngine(
        spark, tasks2, corpus_df, cfg2, workdir=workdir + "_underfull"
    )
    eng2.run(max_rounds=15)
    oracle2 = run_oracle(tasks2, small_pdf, batch_size=200, max_rounds=15)
    assert_equivalent(eng2, oracle2)


def test_budget_with_salting_exact(spark, small_pdf, workdir):
    """Skew salting (two-phase per-host top-k) must not change the
    selected set — exact oracle equivalence with budgets on."""
    tasks = [generic_task(max_depth=3)]
    corpus_df = spark.createDataFrame(small_pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=16, num_partitions=4, max_rounds=20, use_bloom=False,
        max_salts=4, round_seconds=1.0,
    )
    budtasks = [
        type(t)(**{**t.__dict__, "budget_count": 3, "budget_window_s": 1})
        for t in tasks
    ]
    eng = FrontierEngine(spark, budtasks, corpus_df, cfg, workdir=workdir)
    eng.run(max_rounds=20)
    oracle = run_oracle(tasks, small_pdf, batch_size=16, budget=3, max_rounds=20)
    assert_equivalent(eng, oracle)
    # lineage ledger exists and balances
    lin = eng.read_lineage().toPandas()
    assert (lin["scheduled"] == lin["fetched"] + lin["failed"]).all()


def test_cross_task_global_seen(spark, small_pdf, workdir):
    """The URL-seen set is global across tasks (Crawler.Visited,
    engine/schedule.go:126): two tasks crawling overlapping URLs must
    dedup against each other, first puller wins."""
    t1 = generic_task(max_depth=2)
    t2 = type(t1)(**{**t1.__dict__, "name": "generic_crawl_b"})
    tasks = [t1, t2]
    eng = run_engine(spark, tasks, small_pdf, workdir, batch_size=8, max_rounds=20)
    oracle = run_oracle(tasks, small_pdf, batch_size=8, max_rounds=20)
    assert_equivalent(eng, oracle)
    # the two tasks share seeds → every url fetched exactly once
    order = [r.url_hash for r in eng.read_order().collect()]
    assert len(order) == len(set(order))


def test_add_task_mid_run(spark, small_pdf, workdir):
    """Dynamic task submission (AddResource, master/master.go:188-201):
    a task added after round 3 crawls from round 4, and the combined
    order/seen/items match an oracle run with the same injection
    point."""
    book = type(BOOK_TASK)(**{**BOOK_TASK.__dict__, "budget_count": 0})
    tasks0 = [generic_task(max_depth=2)]
    eng = run_engine(spark, tasks0, small_pdf, workdir, batch_size=8, max_rounds=3)
    assert eng.round == 3
    eng.add_task(book)
    eng.run(max_rounds=30, resume=True)
    oracle = GoOracle(
        [generic_task(max_depth=2)],
        corpus_dict(small_pdf),
        batch_size=8,
        max_rounds=40,
        add_tasks_after={3: [book]},
    ).run()
    assert_equivalent(eng, oracle)
    # the injected task actually crawled and produced items
    assert any(o["url"].startswith("https://book.douban.com") for o in oracle.crawl_order)
    assert any(it["task"] == book.name for it in oracle.items)


def test_add_two_tasks_between_same_rounds(spark, small_pdf, workdir):
    """Two add_task() calls between the same rounds must keep a total
    seq order (t1's seeds strictly before t2's — the oracle's monotone
    push counter), not collide on the same seq band."""
    book = type(BOOK_TASK)(**{**BOOK_TASK.__dict__, "budget_count": 0})
    group = type(GROUP_TASK)(**{**GROUP_TASK.__dict__, "budget_count": 0})
    eng = run_engine(
        spark, [generic_task(max_depth=2)], small_pdf, workdir,
        batch_size=8, max_rounds=3,
    )
    eng.add_task(book)
    eng.add_task(group)
    eng.run(max_rounds=30, resume=True)
    oracle = GoOracle(
        [generic_task(max_depth=2)],
        corpus_dict(small_pdf),
        batch_size=8,
        max_rounds=40,
        add_tasks_after={3: [book, group]},
    ).run()
    assert_equivalent(eng, oracle)
    assert any(it["task"] == book.name for it in oracle.items)


def test_add_task_with_engaged_bloom(spark, small_pdf, workdir):
    """add_task + resume on an engine whose bloom store is already
    engaged: the resume must rebuild (not dangle on) the deleted
    shard-store path and stay oracle-equal."""
    tasks0 = [generic_task(max_depth=2)]
    eng = run_engine(
        spark, tasks0, small_pdf, workdir, batch_size=8, max_rounds=3,
        bloom_min_seen=0,  # engaged from the first round
    )
    book = type(BOOK_TASK)(**{**BOOK_TASK.__dict__, "budget_count": 0})
    eng.add_task(book)
    eng.run(max_rounds=30, resume=True)
    oracle = GoOracle(
        tasks0, corpus_dict(small_pdf), batch_size=8, max_rounds=40,
        add_tasks_after={3: [book]},
    ).run()
    assert_equivalent(eng, oracle)


def test_reload_retry_failure_path(spark, workdir):
    """Reload=true request whose fetch fails is retried once then
    recorded as failure (engine/schedule.go:350-364): group topic
    links point at pages we delete from the corpus."""
    pdf = build_corpus_pdf(seed=42, n_generic=0)
    # drop all topic pages → every topic link fetch fails
    mask = ~pdf["url"].str.contains("/group/topic/")
    pdf = pdf[mask].reset_index(drop=True)
    tasks = [GROUP_TASK]
    eng = run_engine(spark, tasks, pdf, workdir, batch_size=4, max_rounds=30)
    oracle = run_oracle(tasks, pdf, batch_size=4, max_rounds=30)
    assert_equivalent(eng, oracle)
    assert len(oracle.failures) > 0  # retried once, then failed
    # each failed topic URL appears exactly twice in crawl order
    from collections import Counter

    c = Counter(o["url"] for o in oracle.crawl_order if not o["fetched"])
    assert all(v == 2 for v in c.values())


def test_heterogeneous_per_task_budgets(spark, workdir):
    """Tasks with DIFFERENT politeness budgets in one run (the
    reference's per-task LimitConfig, cmd/worker/worker.go:238-249):
    BOOK_TASK keeps its default budget_count=20/60s while the generic
    task is uncapped. The oracle derives each task's per-round budget
    from its own TaskConfig (GoOracle._budget_of), so the engine's
    tasks-dim host_budget column must bind book fetches to 20/host/
    round while generic hosts run free — order/seen/items exact.
    Full-size douban section (30 subjects) so the cap actually binds:
    a round fetches exactly 20 subjects and defers the rest."""
    pdf = build_corpus_pdf(seed=7, n_generic=150, n_hosts=8)
    tasks = [generic_task(max_depth=4, seed=7, n_hosts=8), BOOK_TASK, GROUP_TASK]
    corpus_df = spark.createDataFrame(pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=37, num_partitions=4, max_rounds=20,
        use_bloom=True, bloom_capacity=1 << 14, bloom_min_seen=1,
    )
    eng = FrontierEngine(spark, tasks, corpus_df, cfg, workdir=workdir)
    eng.run(max_rounds=20)
    oracle = GoOracle(
        list(tasks), corpus_dict(pdf), batch_size=37, max_rounds=20,
    ).run()
    assert_equivalent(eng, oracle)
    # the budget actually bound: a full round of 20 subjects, rest deferred
    per_round = {}
    for o in oracle.crawl_order:
        if "book.douban.com/subject" in o["url"]:
            per_round[o["round"]] = per_round.get(o["round"], 0) + 1
    assert len(per_round) > 1 and max(per_round.values()) == 20


def test_recaptured_corpus_latest_capture_wins(spark, small_pdf, workdir):
    """corpus_unique=False: a crawl dump carrying the same canon_url at
    several warc_ts must behave as if dedup_corpus ran (latest warc_ts
    capture, ties by text) — children/items/order emitted once per URL,
    never once per capture. Half the duplicated URLs get an OLDER
    garbage capture (original must win), half a NEWER real-looking one
    (override must win), so an engine picking an arbitrary capture, or
    parsing every capture, fails either the order or the items compare."""
    pdf = small_pdf.copy()
    dup = pdf.iloc[: len(pdf) // 2].copy()
    older = dup.iloc[::2].copy()
    older["warc_ts"] = older["warc_ts"] - pd.Timedelta(days=30)
    older["text"] = "stale capture with no links"
    newer = dup.iloc[1::2].copy()
    newer["warc_ts"] = newer["warc_ts"] + pd.Timedelta(days=30)
    newer["text"] = newer["text"].str.replace("page", "PAGE", regex=False)
    recaptured = pd.concat([pdf, older, newer], ignore_index=True)
    # the oracle sees what dedup_corpus would keep: latest warc_ts
    effective = (
        recaptured.sort_values(["warc_ts", "text"], ascending=[False, True])
        .drop_duplicates("canon_url", keep="first")
    )
    tasks = [generic_task(max_depth=3)]
    corpus_df = spark.createDataFrame(
        recaptured.sample(frac=1.0, random_state=1), CORPUS_SCHEMA
    )
    cfg = EngineConfig(
        batch_size=16, num_partitions=4, max_rounds=30,
        use_bloom=True, bloom_capacity=1 << 14, bloom_min_seen=1 << 30,
        corpus_unique=False,
    )
    eng = FrontierEngine(spark, tasks, corpus_df, cfg, workdir=workdir)
    eng.run(max_rounds=30)
    oracle = run_oracle(tasks, effective, batch_size=16, max_rounds=30)
    assert_equivalent(eng, oracle)


def test_frontier_compaction_bounds_and_equivalence(spark, small_pdf, workdir):
    """frontier_compact keeps outputs bit-identical (oracle equality)
    while bounding the snapshot: on a no-reload cyclic graph each
    snapshot holds at most one row per url_hash and no statically-dead
    depth rows; with compaction off the same crawl carries strictly
    more rows. The equality assert is the real gate — compaction must
    be invisible in order/seen/items/failures."""
    tasks = [generic_task(max_depth=2)]
    eng = run_engine(spark, tasks, small_pdf, workdir + "_on", batch_size=8,
                     max_rounds=6)
    oracle = run_oracle(tasks, small_pdf, batch_size=8, max_rounds=6)
    assert_equivalent(eng, oracle)
    snap = eng.io.read_round("frontier", eng.round, FRONTIER_SCHEMA)
    n_rows = snap.count()
    assert snap.select("url_hash").distinct().count() == n_rows
    max_depth_in_snap = snap.agg({"depth": "max"}).collect()[0][0]
    assert max_depth_in_snap is None or max_depth_in_snap <= 2
    # same crawl uncompacted: identical outputs, fatter snapshot
    corpus_df = spark.createDataFrame(small_pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(batch_size=8, num_partitions=4, max_rounds=6,
                       use_bloom=True, bloom_capacity=1 << 14,
                       bloom_min_seen=1 << 30, frontier_compact=False)
    eng_off = FrontierEngine(spark, tasks, corpus_df, cfg,
                             workdir=workdir + "_off")
    eng_off.run(max_rounds=6)
    assert_equivalent(eng_off, oracle)
    snap_off = eng_off.io.read_round("frontier", eng_off.round, FRONTIER_SCHEMA)
    assert snap_off.count() > n_rows


def test_frontier_compaction_reload_prefix(spark, small_pdf, workdir):
    """With reload-emitting rules in play (GROUP_TASK links are
    Reload=true and hit dangling urls → retry path), compaction takes
    the running-count window path and must still match the oracle
    exactly — the kept prefix (reload=True rows up to the first
    sealer) is precisely what the Go loop could ever pull."""
    group = type(GROUP_TASK)(**{**GROUP_TASK.__dict__, "budget_count": 0})
    tasks = [generic_task(max_depth=3), group]
    eng = run_engine(spark, tasks, small_pdf, workdir, batch_size=8,
                     max_rounds=25)
    assert eng._any_reload  # window path actually exercised
    oracle = run_oracle(tasks, small_pdf, batch_size=8, max_rounds=25)
    assert_equivalent(eng, oracle)


def test_seq_band_validation():
    """Caps the seq encoding can't represent are rejected loudly."""
    from crawler_spark.plans.frontier import _RANK_CAP, _RANK_SHIFT, _ROUND_SHIFT

    # a batch that would overflow the pull_rank band is a config error
    with pytest.raises(ValueError, match="pull_rank band"):
        FrontierEngine(None, [], None, EngineConfig(batch_size=_RANK_CAP))
    # encoding sanity at the widened caps: the largest child seq of a
    # round sorts strictly before the next round's first seq, and the
    # add_task band sits between them
    rnd = 7
    max_child = (rnd << _ROUND_SHIFT) + ((_RANK_CAP - 1) << _RANK_SHIFT) + (
        (1 << _RANK_SHIFT) - 1
    )
    add_task_first = (rnd << _ROUND_SHIFT) + (_RANK_CAP << _RANK_SHIFT)
    next_round_first = (rnd + 1) << _ROUND_SHIFT
    assert max_child < add_task_first < next_round_first
    assert next_round_first < (1 << 63)  # signed-long safe


def test_add_task_seed_band_overflow(spark, small_pdf, workdir):
    """More pending add_task seeds than the per-round band holds is
    rejected instead of silently colliding with the next round."""
    from crawler_spark.plans.frontier import _RANK_SHIFT
    from crawler_spark.config import TaskConfig

    corpus_df = spark.createDataFrame(small_pdf, CORPUS_SCHEMA)
    eng = FrontierEngine(
        spark, [generic_task(max_depth=2)], corpus_df,
        EngineConfig(batch_size=8, num_partitions=2), workdir=workdir,
    )
    big = TaskConfig(
        name="too_many_seeds",
        seeds=[(f"http://x.test/{i}", 0, "r") for i in range((1 << _RANK_SHIFT) + 1)],
        rules=[],
    )
    with pytest.raises(ValueError, match="seq band"):
        eng.add_task(big)


@pytest.mark.parametrize(
    "seed,n_generic,n_hosts,out_degree,batch,budget,max_depth",
    [
        # dense cycles on 2 hosts + tight per-host budget, odd batch:
        # budget-deferral and first-wins dedup under heavy duplication
        (7, 40, 2, 8, 7, 2, 6),
        # sparse chain-like graph, tiny batch, no budget: many rounds,
        # deep BFS, depth cutoff actually reached
        (13, 25, 3, 2, 3, None, 4),
        # wider graph, prime batch, moderate budget: rank/cut + budget
        # interplay at a size where several hosts stay contended
        (29, 80, 7, 6, 19, 3, 8),
    ],
)
def test_randomized_graph_engine_oracle_equivalence(
    spark, workdir, seed, n_generic, n_hosts, out_degree, batch, budget, max_depth
):
    """Engine ↔ oracle equality on generator-randomized graphs.

    The fixed ``small_pdf`` fixture pins one graph shape; this matrix
    re-derives the corpus from different seeds/degrees so cycle
    density, host skew, dangling-link rate, and BFS depth all differ —
    the configurations are chosen to force budget deferral, the depth
    cutoff, and multi-round duplicate arrival, each of which must stay
    bit-identical to the Go-semantics oracle (order, seen, items,
    failures)."""
    pdf = build_corpus_pdf(
        seed=seed, n_generic=n_generic, n_hosts=n_hosts,
        out_degree=out_degree, n_lists=1, books_per_list=2, n_topics=2,
    )
    tasks = [generic_task(max_depth=max_depth, seed=seed, n_hosts=n_hosts)]
    eng = run_engine(spark, tasks, pdf, workdir, batch_size=batch,
                     budget=budget, max_rounds=60)
    oracle = run_oracle(tasks, pdf, batch_size=batch, budget=budget,
                        max_rounds=60)
    assert_equivalent(eng, oracle)
