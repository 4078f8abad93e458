"""CLI entry point — the cobra-CLI analogue (cmd/cmd.go:20-26):

    python -m crawler_spark run --config config.toml --corpus pages.parquet \
        [--workdir DIR] [--max-rounds N] [--cores N] [--resume]

Boots entirely from the config file like ``crawler worker``
(cmd/worker/worker.go:62-131): tasks + limits from the ``Tasks``
array, engine knobs from ``[engine]``; the corpus is a parquet of
Common-Crawl-style pages (url, canon_url, warc_ts, html, text, lang).
Prints one JSON line of run metrics.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="crawler_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    run = sub.add_parser("run", help="run a crawl from a config file")
    run.add_argument("--config", required=True, help="TOML/JSON config path")
    run.add_argument("--corpus", required=True, help="pages parquet path")
    run.add_argument("--workdir", default="/tmp/crawler_spark_run")
    run.add_argument("--max-rounds", type=int, default=0)
    run.add_argument("--cores", type=int, default=8)
    run.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    from crawler_spark.loader import load_config
    from crawler_spark.plans.frontier import FrontierEngine
    from crawler_spark.session import get_spark
    from crawler_spark.sources.corpus import CORPUS_SCHEMA

    tasks, cfg = load_config(args.config)
    if not tasks:
        print("no tasks in config", file=sys.stderr)
        return 2
    spark = get_spark(
        "crawler_spark_cli", cores=args.cores, shuffle_partitions=args.cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.schema(CORPUS_SCHEMA).parquet(args.corpus)
    # the fetch join assumes one row per canon_url (the Go corpus is a
    # keyed map); real crawl dumps can carry recaptures — keep the
    # latest warc_ts deterministically, once, at load time
    from crawler_spark.sources.corpus import dedup_corpus

    corpus = dedup_corpus(corpus)
    eng = FrontierEngine(spark, tasks, corpus, cfg, workdir=args.workdir)
    res = eng.run(max_rounds=args.max_rounds or None, resume=args.resume)
    out = {
        "rounds": res["rounds"],
        "workdir": res["workdir"],
        "tasks": [t.name for t in tasks],
        "urls_scheduled": int(sum(m["batch"] for m in eng.metrics)),
        "urls_fetched": int(sum(m["fetched"] for m in eng.metrics)),
        "failures": int(sum(m["failures"] for m in eng.metrics)),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
