"""Config-file boot path (reference cmd/worker/worker.go:62-131).

Mirrors the reference's boot sequence: load a TOML (or JSON) config →
parse the ``Tasks`` array exactly like ``ParseTaskConfig``
(worker.go:215-252) → resolve each task's rule tree. Rules come from
either:

- the code registry keyed by task name (``crawler_spark.rules.
  REFERENCE_TASKS`` — the analogue of the reference resolving rules
  from its compiled ``doubanbook``/``doubangroup`` packages), or
- inline ``[[Tasks.rules]]`` blocks carrying ``RuleSpec`` fields —
  the dynamic-rule surface. The reference loads rule *code* (JS
  strings run in an otto VM, engine/schedule.go:76-122); here rules
  are *data* interpreted by one vectorized parse UDF, so a config
  document can define a brand-new extraction pipeline at runtime with
  no Python changes.

Accepted task keys use the reference's names (``Name``, ``Reload``,
``WaitTime``, ``MaxDepth``, ``Limits`` with ``EventCount``/
``EventDur``) with snake_case equivalents also accepted; ``Fetcher``
and ``Cookie`` are parsed and ignored (no network in this engine).
``Limits`` follows MultiLimiter semantics (limiter/limiter.go:22-27,
41-44): every tier is waited on, so the slowest rate binds —
budget_count/budget_window_s are taken from the min-rate tier.
"""

from __future__ import annotations

import dataclasses
import json
import tomllib

from crawler_spark.config import EngineConfig, RuleSpec, TaskConfig
from crawler_spark.rules import REFERENCE_TASKS


def _get(d: dict, *names, default=None):
    for n in names:
        if n in d:
            return d[n]
    return default


def _binding_limit(limits: list[dict]) -> tuple[int, int]:
    """(budget_count, budget_window_s) of the slowest tier."""
    best = None
    for tier in limits:
        count = int(_get(tier, "EventCount", "event_count", default=0))
        dur = int(_get(tier, "EventDur", "event_dur", default=1))
        if count <= 0 or dur <= 0:
            continue
        rate = count / dur
        # tie-break toward the longer window (coarser discretization)
        key = (rate, -dur)
        if best is None or key < best[0]:
            best = (key, count, dur)
    return (best[1], best[2]) if best else (0, 60)


def rule_from_dict(d: dict) -> RuleSpec:
    fields = {f.name for f in dataclasses.fields(RuleSpec)}
    unknown = set(d) - fields
    if unknown:
        raise ValueError(f"unknown rule keys: {sorted(unknown)}")
    kw = dict(d)
    for k in ("item_fields", "int_fields"):
        if k in kw:
            kw[k] = tuple(kw[k])
    return RuleSpec(**kw)


def task_from_dict(d: dict) -> TaskConfig:
    name = _get(d, "Name", "name")
    if not name:
        raise ValueError("task entry without Name")
    ref = REFERENCE_TASKS.get(name)
    # ParseTaskConfig semantics (worker.go:223-235): Reload always
    # taken from config; WaitTime/MaxDepth only override when > 0
    kw: dict = {"name": name}
    base = ref if ref is not None else TaskConfig(name=name)
    kw["reload"] = bool(_get(d, "Reload", "reload", default=False))
    wait = int(_get(d, "WaitTime", "wait_time", default=0) or 0)
    kw["wait_time"] = wait if wait > 0 else base.wait_time
    depth = int(_get(d, "MaxDepth", "max_depth", default=0) or 0)
    kw["max_depth"] = depth if depth > 0 else base.max_depth
    limits = _get(d, "Limits", "limits", default=None)
    if limits:
        kw["budget_count"], kw["budget_window_s"] = _binding_limit(limits)
    else:
        kw["budget_count"] = base.budget_count
        kw["budget_window_s"] = base.budget_window_s
    inline_rules = _get(d, "rules", "Rules", default=None)
    if inline_rules:
        kw["rules"] = tuple(rule_from_dict(r) for r in inline_rules)
    else:
        kw["rules"] = base.rules
    seeds = _get(d, "seeds", "Seeds", default=None)
    if seeds:
        kw["seeds"] = tuple((s[0], int(s[1]), s[2]) for s in seeds)
    else:
        kw["seeds"] = base.seeds
    return TaskConfig(**kw)


def engine_from_dict(d: dict) -> EngineConfig:
    fields = {f.name for f in dataclasses.fields(EngineConfig)}
    unknown = set(d) - fields
    if unknown:
        raise ValueError(f"unknown engine keys: {sorted(unknown)}")
    return EngineConfig(**d)


def load_config(path: str) -> tuple[list[TaskConfig], EngineConfig]:
    """Parse a TOML (or .json) config file into (tasks, engine cfg)."""
    if path.endswith(".json"):
        with open(path) as f:
            doc = json.load(f)
    else:
        with open(path, "rb") as f:
            doc = tomllib.load(f)
    tasks = [task_from_dict(t) for t in _get(doc, "Tasks", "tasks", default=[])]
    engine = engine_from_dict(_get(doc, "engine", "Engine", default={}))
    return tasks, engine
