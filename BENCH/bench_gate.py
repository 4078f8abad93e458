"""Round-over-round bench regression gate (VERDICT r2 #8).

Compares a fresh bench result against the newest ``BENCH_r*.json`` in
the repo root: per-query wall-time ratios above WARN_RATIO are
reported, above FAIL_RATIO they are regressions. Small absolute times
are noise-floored (the sandbox is a shared-host VM; sub-second queries
swing 2-3× with neighbor load — see CLAUDE.md benchmark landmines), so
only slowdowns that are BOTH relatively and absolutely large trip the
gate.

Used by bench.py at the end of every run (messages to stderr; the
one-line JSON contract on stdout is untouched). Exit-on-fail only with
BENCH_GATE_STRICT=1 so the per-round driver bench never breaks on a
noisy neighbor window.

Known false-positive mode (VERDICT r3 #3, now mitigated): the FIRST
execution of a query in a fresh JVM pays whole-stage-codegen
compilation + class loading + Python-worker spin-up — 3-6× the steady
state for sub-second queries (measured: bigram_topk 6.5 s cold vs
1.0-1.4 s warm, robots_filter 3.4 s vs 1.1 s). bench.py therefore runs
one untimed warm pass per query before the timed best-of-2, so the
numbers this gate compares are steady-state on both sides. Cross-round
comparisons against pre-warm-pass baselines (r3 and older) can still
read warm-vs-cold for queries that were first-in-suite then.
"""

from __future__ import annotations

import glob
import json
import os
import re

WARN_RATIO = 1.5
FAIL_RATIO = 2.0
ABS_FLOOR_SECS = 0.5  # ignore swings below this absolute delta
HEADLINE_FLOOR = 5.0


def latest_round_file(repo_root: str) -> str | None:
    files = glob.glob(os.path.join(repo_root, "BENCH_r*.json"))
    if not files:
        return None

    def rnd(p):
        m = re.search(r"BENCH_r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    return max(files, key=rnd)


def _prev_result(path: str) -> dict | None:
    with open(path) as f:
        data = json.load(f)
    # driver files wrap the parsed line under "parsed"
    return data.get("parsed", data if "queries" in data else None)


def check(current: dict, repo_root: str) -> tuple[list[str], list[str]]:
    """(warnings, failures) comparing ``current`` to the newest
    recorded round. Empty lists when no prior round exists."""
    path = latest_round_file(repo_root)
    if path is None:
        return [], []
    prev = _prev_result(path)
    if not prev:
        return [], []
    warns: list[str] = []
    fails: list[str] = []
    base = os.path.basename(path)
    for name, old in (prev.get("queries") or {}).items():
        new = (current.get("queries") or {}).get(name)
        if new is None:
            fails.append(f"{name}: present in {base} but missing now")
            continue
        if old <= 0 or new - old < ABS_FLOOR_SECS:
            continue
        ratio = new / old
        msg = f"{name}: {old:.2f}s -> {new:.2f}s ({ratio:.2f}x) vs {base}"
        if ratio > FAIL_RATIO:
            fails.append(msg)
        elif ratio > WARN_RATIO:
            warns.append(msg)
    old_f = (prev.get("frontier") or {}).get("crawl_secs")
    new_f = (current.get("frontier") or {}).get("crawl_secs")
    if old_f and new_f and new_f - old_f > HEADLINE_FLOOR:
        ratio = new_f / old_f
        msg = f"frontier crawl: {old_f:.1f}s -> {new_f:.1f}s ({ratio:.2f}x) vs {base}"
        if ratio > FAIL_RATIO:
            fails.append(msg)
        elif ratio > WARN_RATIO:
            warns.append(msg)
    return warns, fails
