"""Per-job timeline profile of one scaling leg.

Runs the SAME crawl as BENCH/scaling.py at one core count with the
Spark event log enabled, then parses the log into a job timeline:
job wall times, the driver-only gaps between consecutive jobs, and a
per-round rollup. The gaps are the Amdahl serial floor that caps N→4N
scaling efficiency — this script exists to point at them by name
(the triggering action's call site) instead of guessing.

Usage: python BENCH/jobgaps.py [cores] [pages] [batch] [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, "@@REPO@@")
import os as _os
_scratch = _os.environ.get("SCALING_SCRATCH",
                           "/dev/shm" if _os.path.isdir("/dev/shm") else "/tmp")
evdir = f"{_scratch}/jobgaps_events"
import shutil
shutil.rmtree(evdir, ignore_errors=True)
_os.makedirs(evdir, exist_ok=True)
from crawler_spark.session import get_spark
from crawler_spark.config import EngineConfig
from crawler_spark.plans.frontier import FrontierEngine
from crawler_spark.sources.corpus import build_corpus_df, generic_task

cores = int(sys.argv[1]); pages = int(sys.argv[2]); batch = int(sys.argv[3]); rounds = int(sys.argv[4])
_conf = {"spark.eventLog.enabled": "true",
         "spark.eventLog.dir": evdir,
         "spark.eventLog.compress": "false"}
_conf.update(json.loads(_os.environ.get("JOBGAPS_CONF", "{}")))
spark = get_spark(f"jobgaps_{cores}", cores=cores, shuffle_partitions=cores,
                  extra_conf=_conf)
spark.sparkContext.setLogLevel("ERROR")
n_hosts = max(16, pages // 2000)
corpus_path = f"{_scratch}/scaling_corpus_{pages}_0"
_gen_done = f"{corpus_path}/_GEN_DONE"
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
task = generic_task(max_depth=64, n_seeds=batch, n_hosts=n_hosts)
eng = FrontierEngine(spark, [task], corpus, cfg,
                     workdir=f"{_scratch}/jobgaps_work_{cores}")
from pyspark.sql import functions as F
_warm = corpus.sample(min(1.0, (cores * 30_000) / max(pages, 1)), 7).select(
    eng._parse_udf(
        F.lit("generic_crawl\x00link"), F.col("url"), F.col("text"),
        F.create_map().cast("map<string,string>"),
    ).alias("p")
)
_warm.selectExpr("sum(size(p.requests))").collect()
t0 = time.time()
eng.run(max_rounds=rounds, record_order=False)
dt = time.time() - t0
print("CRAWLSECS " + json.dumps({"secs": round(dt, 2),
    "warm_end_ms": int(t0 * 1000), "phases": eng.metrics}))
spark.stop()
import glob
logs = [p for p in glob.glob(evdir + "/*") if not p.endswith(".inprogress")] \
       or glob.glob(evdir + "/*")
print("EVENTLOG " + logs[0])
shutil.rmtree(f"{_scratch}/jobgaps_work_{cores}", ignore_errors=True)
"""


def main():
    global print  # tee every report line to a file: profiling legs
    # outlive terminal scrollback (and backgrounded shells) routinely
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    report = open(os.path.join(REPO, "BENCH", f"jobgaps_{cores}.txt"), "w")
    _print = print

    def print(*a, **kw):  # noqa: A001
        _print(*a, **kw)
        _print(*a, **kw, file=report)
        report.flush()
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 600_000
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    env = dict(os.environ,
               SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "24g"),
               SPARK_GRAFT_PRETOUCH=os.environ.get("SPARK_GRAFT_PRETOUCH", "1"))
    pin = []
    if os.path.exists("/usr/bin/taskset") and os.environ.get("SCALING_PIN", "1") == "1":
        base = int(os.environ.get("SCALING_PIN_BASE", "8"))
        pin = ["taskset", "-c",
               f"{base}-{base + cores - 1}" if cores > 1 else str(base)]
    code = RUNNER.replace("@@REPO@@", REPO)
    out = subprocess.run(
        pin + [sys.executable, "-c", code, str(cores), str(pages), str(batch),
               str(rounds)],
        capture_output=True, text=True, timeout=3600, env=env)
    crawl, evlog = None, None
    for line in out.stdout.splitlines():
        if line.startswith("CRAWLSECS "):
            crawl = json.loads(line[10:])
        if line.startswith("EVENTLOG "):
            evlog = line[9:].strip()
    if crawl is None or evlog is None:
        print(out.stdout[-3000:])
        print(out.stderr[-3000:])
        sys.exit(1)

    # Spark 4 event logs are rolling directories (eventlog_v2_<appid>/
    # events_*); older versions write a single file
    if os.path.isdir(evlog):
        parts = sorted(
            p for p in os.listdir(evlog) if p.startswith("events_")
        )
        lines = []
        for p in parts:
            with open(os.path.join(evlog, p)) as f:
                lines.extend(f)
    else:
        with open(evlog) as f:
            lines = list(f)
    jobs = {}
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": (props.get("spark.job.description")
                             or props.get("callSite.short", ""))[:90],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]

    t_begin = crawl["warm_end_ms"]
    seq = sorted((j for j in jobs.values()
                  if "end" in j and j["end"] >= t_begin),
                 key=lambda j: j["start"])
    total_job = sum(j["end"] - j["start"] for j in seq) / 1000.0
    gaps = []
    for a, b in zip(seq, seq[1:]):
        g = (b["start"] - a["end"]) / 1000.0
        if g > 0.05:
            gaps.append((g, a["desc"], b["desc"]))
    total_gap = sum(g for g, *_ in gaps)
    print(f"crawl wall: {crawl['secs']}s  jobs: {len(seq)} "
          f"({len(seq)/max(1,len(crawl['phases']))} per round)  "
          f"in-job: {total_job:.1f}s  gaps>50ms: {total_gap:.1f}s")

    # --- per-phase rollup: wall time attributed by the engine's
    # setJobDescription labels ("rK:phase" → phase). Overlapping jobs
    # (parallel broadcast-exchange subjobs) are merged into covered
    # wall intervals per phase so concurrency doesn't double-count;
    # the gap after a job is charged to that job's phase (it is the
    # driver-side think time of that phase).
    def phase_of(desc):
        d = desc.split(":", 1)
        return d[1] if len(d) == 2 and d[0].startswith("r") else (desc or "?")

    ivals = {}
    for j in seq:
        ivals.setdefault(phase_of(j["desc"]), []).append((j["start"], j["end"]))
    gap_by = {}
    for a, b in zip(seq, seq[1:]):
        g = (b["start"] - a["end"]) / 1000.0
        if g > 0:
            gap_by[phase_of(a["desc"])] = gap_by.get(phase_of(a["desc"]), 0) + g
    print(f"\n{'phase':28} {'wall_s':>8} {'gap_after_s':>12} {'jobs':>5}")
    for ph, iv in sorted(ivals.items(), key=lambda kv: -sum(e - s for s, e in kv[1])):
        iv.sort()
        covered, cur_s, cur_e = 0, None, None
        for s, e in iv:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            covered += cur_e - cur_s
        print(f"{ph:28} {covered/1000:8.1f} {gap_by.get(ph, 0):12.1f} {len(iv):5}")

    print("\njob timeline (dur s | gap-after s | desc):")
    for i, j in enumerate(seq):
        dur = (j["end"] - j["start"]) / 1000.0
        gap = (seq[i + 1]["start"] - j["end"]) / 1000.0 if i + 1 < len(seq) else 0
        print(f"  {dur:7.2f} | {gap:6.2f} | {j['desc']}")
    print("\nbiggest gaps:")
    for g, a, b in sorted(gaps, reverse=True)[:12]:
        print(f"  {g:6.2f}s after [{a}] before [{b}]")


if __name__ == "__main__":
    main()
