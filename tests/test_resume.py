"""Exact-resume: kill after round k, resume from snapshot, final state
identical to the uninterrupted run (north_rule requirement)."""

from crawler_spark.config import EngineConfig
from crawler_spark.plans.frontier import FrontierEngine
from crawler_spark.sources.corpus import CORPUS_SCHEMA, build_corpus_pdf, generic_task


def _mk(spark, pdf, workdir, **cfg_kw):
    corpus = spark.createDataFrame(pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=8, num_partitions=4, checkpoint_every=1, use_bloom=True,
        bloom_capacity=1 << 14, **cfg_kw,
    )
    return FrontierEngine(
        spark, [generic_task(max_depth=3)], corpus, cfg, workdir=workdir
    )


def _state(eng):
    order = [
        (r["round"], r.pull_rank, r.url, r.fetched)
        for r in eng.read_order().collect()
    ]
    seen = {r.url_hash for r in eng.read_seen().collect()}
    frontier_rounds = eng.round
    return order, seen, frontier_rounds


def test_resume_equals_uninterrupted(spark, tmp_path):
    pdf = build_corpus_pdf(
        seed=42, n_generic=40, n_hosts=4, out_degree=4,
        n_lists=0, books_per_list=0, n_topics=0,
    )
    # uninterrupted
    full = _mk(spark, pdf, str(tmp_path / "full"))
    full.run(max_rounds=6)
    # interrupted after 3 rounds, then resumed
    part = _mk(spark, pdf, str(tmp_path / "part"))
    part.run(max_rounds=3)
    resumed = _mk(spark, pdf, str(tmp_path / "part"))
    resumed.run(max_rounds=3, resume=True)
    assert _state(resumed) == _state(full)
