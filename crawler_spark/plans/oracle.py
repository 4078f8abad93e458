"""Go-oracle: a pure-Python executable spec of the reference crawl loop.

Faithful to the reference's single-worker execution (the only
deterministic order the Go engine has — with WorkCount=5 and the async
``go Push`` at engine/schedule.go:307-309 its order is racy, so the
single-worker run is fixed as the ordering spec, SURVEY.md §5/R2):

- two FIFO queues classed on ``Priority > 0`` with the priority queue
  drained first (engine/schedule.go:177-206);
- pull → depth check (strict ``>``, collect/request.go:87-92) →
  visited check → mark-visited *before* fetch
  (engine/schedule.go:264-277);
- identity ``md5(url + method)`` (collect/request.go:95-98) — with the
  north_star's canonicalization applied to the url first;
- fetch = corpus lookup by canonical url (missing ⇒ failure, cf.
  collect/collect.go:35-37);
- first failure of a ``Reload`` request: un-mark visited, clear
  reload, re-push; otherwise record in failures
  (engine/schedule.go:350-364);
- parse emits child requests in document-match order, pushed at the
  parent's processing point (engine/schedule.go:293-309).

Generalized to batch rounds (``batch_size`` B, per-(task,host) round
``budget``): with B=1 and no budget this IS the Go loop; for B>1 it
defines the engine's round semantics, which the Spark implementation
must reproduce exactly (tests/test_frontier.py).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from crawler_spark.config import TaskConfig
from crawler_spark.functions.parse import parse_page
from crawler_spark.functions.urlnorm import canonicalize_url, host_of_url


def url_hash(canon_url: str, method: str = "GET") -> str:
    """hex(md5(canonical_url + method)) — collect/request.go:95-98."""
    return hashlib.md5((canon_url + method).encode("utf-8")).hexdigest()


@dataclass
class OracleRequest:
    seq: int
    task: str
    url: str
    canon_url: str
    host: str
    url_hash: str
    depth: int
    priority: int
    rule: str
    reload: bool
    temp: dict = field(default_factory=dict)


@dataclass
class OracleResult:
    crawl_order: list  # dicts: seq,url,canon_url,url_hash,depth,priority,rule,round,fetched
    seen: set  # final visited url_hash set
    items: list  # dicts with envelope task/rule/url + fields
    failures: dict  # url_hash -> url
    robots_denied: list  # urls dropped by robots
    rounds: int


def robots_allowed(robots: list[tuple[str, str, bool]] | None, host: str, path: str) -> bool:
    """Longest-matching-prefix robots decision; default allow.

    robots rules: (host, path_prefix, allow). North_rule addition —
    the Go reference has no robots handling.
    """
    if not robots:
        return True
    best_len, best_allow = -1, True
    for rh, prefix, allow in robots:
        if rh == host and path.startswith(prefix) and len(prefix) > best_len:
            best_len, best_allow = len(prefix), allow
    return best_allow


def _path_of(canon_url: str) -> str:
    rest = canon_url.split("://", 1)[-1]
    i = rest.find("/")
    return rest[i:] if i >= 0 else "/"


class GoOracle:
    """Batched deterministic executor of the reference semantics."""

    def __init__(
        self,
        tasks: list[TaskConfig],
        corpus: dict[str, str],  # canon_url -> page text
        batch_size: int = 1,
        host_budget: int | None = None,  # uniform per-(task,host)-per-round
        # override; None = per-task TaskConfig.host_budget_per_round
        # (the reference's per-task LimitConfig, cmd/worker/worker.go:238-249)
        robots: list[tuple[str, str, bool]] | None = None,
        max_rounds: int = 10_000,
        add_tasks_after: dict[int, list[TaskConfig]] | None = None,
        round_seconds: float = 60.0,  # must match EngineConfig.round_seconds
    ):
        self.tasks = {t.name: t for t in tasks}
        self.corpus = corpus
        self.batch_size = batch_size if batch_size and batch_size > 0 else 1 << 30
        self.host_budget = host_budget
        self.round_seconds = round_seconds
        self.robots = robots
        self.max_rounds = max_rounds
        # dynamic task submission (AddResource, master/master.go:188-201):
        # after round k completes, the tasks in add_tasks_after[k] are
        # registered and their seeds pushed (next seq values → they sort
        # after everything emitted through round k)
        self.add_tasks_after = add_tasks_after or {}

    def _budget_of(self, task_name: str) -> int:
        """Per-(task,host) round budget: the uniform override when
        given, else the task's own politeness discretization — the
        same ``host_budget_per_round`` the engine bakes into its
        tasks dim, so heterogeneous per-task budgets stay in spec."""
        if self.host_budget is not None:
            return self.host_budget
        return self.tasks[task_name].host_budget_per_round(self.round_seconds)

    def _mk_request(self, task, url, priority, rule, depth, reload, temp, seq):
        canon = canonicalize_url(url)
        return OracleRequest(
            seq=seq,
            task=task,
            url=url,
            canon_url=canon,
            host=host_of_url(url),
            url_hash=url_hash(canon),
            depth=depth,
            priority=priority,
            rule=rule,
            reload=reload,
            temp=temp or {},
        )

    def run(self) -> OracleResult:
        seq = 0
        frontier: list[OracleRequest] = []
        for t in self.tasks.values():
            for url, priority, rule in t.seeds:
                frontier.append(
                    self._mk_request(t.name, url, priority, rule, 0, t.reload, {}, seq)
                )
                seq += 1

        seen: set[str] = set()
        failures: dict[str, str] = {}
        crawl_order: list[dict] = []
        items: list[dict] = []
        robots_denied: list[str] = []
        rounds = 0

        while frontier and rounds < self.max_rounds:
            rounds += 1
            # --- eligibility: depth, robots, not-seen (drop permanently)
            eligible, keep = [], []
            for r in frontier:
                if r.depth > self.tasks[r.task].max_depth:
                    continue  # dropped at pull time (request.go:87-92)
                if r.url_hash in seen:
                    continue  # dropped at pull time (schedule.go:272-275)
                if not robots_allowed(self.robots, r.host, _path_of(r.canon_url)):
                    robots_denied.append(r.url)
                    continue
                eligible.append(r)
            if not eligible:
                break
            # --- pull order: priority>0 FIFO first, then FIFO (seq)
            eligible.sort(key=lambda r: (0 if r.priority > 0 else 1, r.seq))
            # --- batch selection: within-eligible dedup keep-first,
            # per-(task,host) budget, global batch cap — greedy in pull
            # order (first puller wins, schedule.go:272-277)
            batch, host_taken, batch_hashes = [], {}, set()
            for r in eligible:
                if len(batch) >= self.batch_size:
                    keep.append(r)  # deferred, stays in frontier
                    continue
                if r.url_hash in batch_hashes:
                    keep.append(r)  # dup stays queued; dropped next round
                    continue
                hk = (r.task, r.host)
                if host_taken.get(hk, 0) >= self._budget_of(r.task):
                    keep.append(r)  # over budget: deferred
                    continue
                batch.append(r)
                batch_hashes.add(r.url_hash)
                host_taken[hk] = host_taken.get(hk, 0) + 1
            # --- mark visited BEFORE fetch (schedule.go:277)
            seen |= batch_hashes
            # --- fetch + parse, parents in pull order
            new_requests: list[OracleRequest] = []
            for pos, r in enumerate(batch):
                text = self.corpus.get(r.canon_url)
                fetched = text is not None
                crawl_order.append(
                    {
                        "seq": r.seq,
                        "url": r.url,
                        "canon_url": r.canon_url,
                        "url_hash": r.url_hash,
                        "host": r.host,
                        "depth": r.depth,
                        "priority": r.priority,
                        "rule": r.rule,
                        "round": rounds,
                        "fetched": fetched,
                    }
                )
                if not fetched:
                    # SetFailure (schedule.go:350-364)
                    if r.reload and r.url_hash in seen:
                        seen.discard(r.url_hash)
                        retry = OracleRequest(**{**r.__dict__, "seq": seq, "reload": False})
                        seq += 1
                        new_requests.append(retry)
                    else:
                        failures[r.url_hash] = r.url
                    continue
                spec = self.tasks[r.task].rule_map().get(r.rule)
                if spec is None:
                    continue  # rule not found → skip (schedule.go:287-291)
                reqs, page_items = parse_page(spec, r.url, text, r.temp)
                for e in reqs:
                    new_requests.append(
                        self._mk_request(
                            r.task,
                            e["url"],
                            e["priority"],
                            e["rule"],
                            r.depth + 1,
                            e["reload"],
                            e["temp"],
                            seq,
                        )
                    )
                    seq += 1
                for it in page_items:
                    items.append(
                        {"task": r.task, "rule": r.rule, "url": r.url, **it}
                    )
            frontier = keep + new_requests
            for t in self.add_tasks_after.get(rounds, []):
                self.tasks[t.name] = t
                for url, priority, rule in t.seeds:
                    frontier.append(
                        self._mk_request(
                            t.name, url, priority, rule, 0, t.reload, {}, seq
                        )
                    )
                    seq += 1
        return OracleResult(
            crawl_order=crawl_order,
            seen=seen,
            items=items,
            failures=failures,
            robots_denied=robots_denied,
            rounds=rounds,
        )
