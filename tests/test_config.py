"""Config-file boot path: TOML equivalent to the reference's
config.toml produces the same TaskConfigs as the hand-built registry
(cmd/worker/worker.go:62-131, 215-252), inline data rules work, and
the CLI runs a crawl end-to-end."""

import json
import subprocess
import sys

from crawler_spark.config import RuleSpec
from crawler_spark.loader import load_config, task_from_dict
from crawler_spark.rules import BOOK_TASK, GROUP_TASK

REFERENCE_TOML = """
logLevel = "debug"

Tasks = [
    {Name = "douban_book_list", WaitTime = 2, Reload = true, MaxDepth = 5, Fetcher = "browser", Limits = [{EventCount = 1, EventDur = 2, Bucket = 1}, {EventCount = 20, EventDur = 60, Bucket = 20}], Cookie = "ignored"},
    {Name = "find_douban_sun_room"},
]

[engine]
batch_size = 4
num_partitions = 4
use_bloom = false
max_rounds = 30
"""


def test_reference_toml_matches_handbuilt(tmp_path):
    p = tmp_path / "config.toml"
    p.write_text(REFERENCE_TOML)
    tasks, cfg = load_config(str(p))
    assert tasks[0] == BOOK_TASK  # incl. binding 20/60 limit tier
    # name-only entry resolves rules/seeds/defaults from the registry
    assert tasks[1] == GROUP_TASK
    assert cfg.batch_size == 4 and not cfg.use_bloom and cfg.max_rounds == 30


def test_binding_limit_is_slowest_tier():
    t = task_from_dict(
        {
            "Name": "x",
            "Limits": [
                {"EventCount": 100, "EventDur": 10},  # 10/s
                {"EventCount": 5, "EventDur": 60},  # 0.083/s ← binds
                {"EventCount": 1, "EventDur": 2},  # 0.5/s
            ],
        }
    )
    assert (t.budget_count, t.budget_window_s) == (5, 60)


def test_inline_data_rules():
    """The dynamic-rule surface: a config document defines a working
    RuleSpec with no Python changes (JS-VM analogue, parsejs.go:4-14)."""
    t = task_from_dict(
        {
            "Name": "custom",
            "seeds": [["https://h.example/start", 1, "r0"]],
            "rules": [
                {
                    "name": "r0",
                    "link_regex": r'<a href="([^"]+)">',
                    "next_rule": "r1",
                    "next_priority": 5,
                },
                {"name": "r1", "match_regex": "needle"},
            ],
        }
    )
    assert t.seeds == (("https://h.example/start", 1, "r0"),)
    assert t.rules[0] == RuleSpec(
        name="r0", link_regex=r'<a href="([^"]+)">', next_rule="r1",
        next_priority=5,
    )
    assert t.rules[1].match_regex == "needle"


def test_cli_runs_crawl_from_config(tmp_path, spark):
    """python -m crawler_spark run --config … crawls the corpus and
    prints one JSON metrics line (worker-CLI analogue, cmd/cmd.go)."""
    from crawler_spark.sources.corpus import (
        CORPUS_SCHEMA,
        GENERIC_LINK_RE,
        build_corpus_pdf,
        generic_url,
    )

    pdf = build_corpus_pdf(
        seed=42, n_generic=40, n_hosts=4, out_degree=4,
        n_lists=0, books_per_list=0, n_topics=0,
    )
    corpus_path = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(pdf, CORPUS_SCHEMA).coalesce(1).write.parquet(corpus_path)

    cfg = tmp_path / "cfg.toml"
    cfg.write_text(
        f"""
Tasks = [
    {{Name = "from_config", MaxDepth = 3, seeds = [["{generic_url(42, 0, 4)}", 1, "link"]], rules = [{{name = "link", link_regex = '{GENERIC_LINK_RE}', next_rule = "link"}}]}},
]
[engine]
batch_size = 16
num_partitions = 4
use_bloom = false
max_rounds = 20
"""
    )
    out = subprocess.run(
        [sys.executable, "-m", "crawler_spark", "run",
         "--config", str(cfg), "--corpus", corpus_path,
         "--workdir", str(tmp_path / "wd"), "--cores", "4"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["tasks"] == ["from_config"]
    assert res["rounds"] >= 2 and res["urls_fetched"] > 10
