"""Seen-set growth evidence: per-round cost stays flat as the
sharded-bloom seen set grows (VERDICT r1 item 1's "done" bar).

One long crawl (many rounds, constant batch) with the executor-side
ShardedBloom engaged from round 1. If the seen check were
driver-resident (the r1 design this replaced), per-round time would
grow with the seen count — the driver would collect/rebroadcast an
ever-bigger filter and backfill by looping over every seen hash.
With the sharded store, the per-round work is: probe (pandas UDF over
the round's frontier, independent of seen size), fold (XOR of one
bounded delta into fixed-size shard bytes), and the exact anti-join
of maybe-seen rows only — all O(round), not O(seen).

Writes a markdown table into BENCH/BASELINE.md (SEEN_GROWTH markers)
and prints one JSON line. Usage: python BENCH/seen_growth.py [quick]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from crawler_spark.session import get_spark
from crawler_spark.config import EngineConfig
from crawler_spark.plans.frontier import FrontierEngine
from crawler_spark.sources.corpus import build_corpus_df, generic_task
import os as _os

cores = int(sys.argv[1]); pages = int(sys.argv[2]); batch = int(sys.argv[3]); rounds = int(sys.argv[4])
spark = get_spark(f"seen_growth_{{cores}}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
n_hosts = max(16, pages // 2000)
_scratch = _os.environ.get("SCALING_SCRATCH",
                           "/dev/shm" if _os.path.isdir("/dev/shm") else "/tmp")
corpus_path = f"{{_scratch}}/scaling_corpus_{{pages}}_0"
_gen_done = f"{{corpus_path}}/_GEN_DONE"
if not _os.path.exists(_gen_done):
    build_corpus_df(spark, seed=42, n_generic=pages, n_hosts=n_hosts,
                    out_degree=10, include_douban=False,
                    num_partitions=max(cores * 2, 16)).write.mode(
                        "overwrite").parquet(corpus_path)
    open(_gen_done, "w").close()
corpus = spark.read.parquet(corpus_path)
cfg = EngineConfig(batch_size=batch, num_partitions=cores, use_bloom=True,
                   bloom_min_seen=1,
                   bloom_capacity=max(pages * 2, 1 << 20), checkpoint_every=0)
task = generic_task(max_depth=256, n_seeds=batch, n_hosts=n_hosts)
eng = FrontierEngine(spark, [task], corpus, cfg,
                     workdir=f"{{_scratch}}/seen_growth_work")
from pyspark.sql import functions as F
_warm = corpus.sample(min(1.0, (cores * 30_000) / max(pages, 1)), 7).select(
    eng._parse_udf(
        F.lit("generic_crawl\x00link"), F.col("url"), F.col("text"),
        F.create_map().cast("map<string,string>"),
    ).alias("p")
)
_warm.selectExpr("sum(size(p.requests))").collect()
t = time.time()
eng.run(max_rounds=rounds, record_order=False)
dt = time.time() - t
print("RESULT " + json.dumps({{
    "cores": cores, "pages": pages, "batch": batch,
    "rounds": len(eng.metrics), "secs": round(dt, 2),
    "phases": eng.metrics,
}}))
spark.stop()
import shutil
shutil.rmtree(f"{{_scratch}}/seen_growth_work", ignore_errors=True)
"""

_HB, _HE = "<!-- SEEN_GROWTH_BEGIN -->", "<!-- SEEN_GROWTH_END -->"


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    cores = int(os.environ.get("SEEN_GROWTH_CORES", "16"))
    pages = 60_000 if quick else int(os.environ.get("SEEN_GROWTH_PAGES", "2000000"))
    batch = 5_000 if quick else int(os.environ.get("SEEN_GROWTH_BATCH", "200000"))
    rounds = 8 if quick else int(os.environ.get("SEEN_GROWTH_ROUNDS", "9"))

    env = dict(os.environ,
               SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "24g"),
               SPARK_GRAFT_PRETOUCH=os.environ.get("SPARK_GRAFT_PRETOUCH", "1"))
    code = RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(pages), str(batch),
         str(rounds)],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    res = None
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            res = json.loads(line[7:])
    if res is None:
        raise RuntimeError(f"run failed:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")

    lines = [
        _HB,
        "## Seen-set growth: per-round cost vs seen size",
        "",
        f"One crawl, local[{cores}], batch={batch:,}, {res['rounds']} rounds,",
        "ShardedBloom engaged from round 1 (`bloom_min_seen=1`). The seen",
        "set grows by one batch per round; per-round cost must stay flat",
        "because every seen-check component is O(round), not O(seen):",
        "bloom probe over the round's frontier, fold of one bounded delta",
        "into fixed-size shards, exact anti-join of maybe-seen rows only.",
        "A driver-resident filter (the design this replaced) would grow",
        "with the collect/rebroadcast of every seen hash.",
        "",
        "| round | seen before | t_select | t_seen | t_frontier | round total |",
        "|---|---|---|---|---|---|",
    ]
    seen = 0
    totals = []
    for m in res["phases"]:
        tot = (m["t_select"] + m["t_fetch_parse"] + m.get("t_seen", 0)
               + m.get("t_ledgers", 0) + m["t_frontier"])
        totals.append(tot)
        lines.append(
            f"| {m['round']} | {seen:,} | {m['t_select']} | "
            f"{m.get('t_seen', 0)} | {m['t_frontier']} | {round(tot, 2)} |"
        )
        seen += m["batch"]
    mid = sorted(totals)[len(totals) // 2]
    lines += [
        "",
        f"- median round total: {round(mid, 2)} s; last round "
        f"{round(totals[-1], 2)} s with {seen - res['phases'][-1]['batch']:,} "
        "hashes already seen",
        _HE,
    ]
    section = "\n".join(lines) + "\n"
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    body = open(path).read() if os.path.exists(path) else ""
    if _HB in body and _HE in body:
        body = body.split(_HB)[0] + section + body.split(_HE, 1)[1]
    else:
        body = body.rstrip() + "\n\n" + section
    with open(path, "w") as f:
        f.write(body)
    print(json.dumps({"metric": "seen_growth_round_totals", "unit": "sec",
                      "totals": [round(t, 2) for t in totals],
                      "rounds": res["rounds"], "batch": batch}))


if __name__ == "__main__":
    main()
