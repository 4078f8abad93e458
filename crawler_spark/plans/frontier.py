"""FrontierEngine — the crawl loop as round-based DataFrame supersteps.

Each round is one batched analogue of the reference's worker loop
(engine/schedule.go:258-312), with the Go engine's channel/goroutine
machinery replaced by declarative dataflow:

    frontier_t
      → [depth filter]           request.Check, collect/request.go:87-92
      → [robots filter]          north_rule addition
      → [bloom prefilter + exact left-anti join vs seen]
                                 HasVisited, engine/schedule.go:272-275
      → [pull-order = (priority>0 DESC, seq ASC)]
                                 two-FIFO scheduler, schedule.go:177-206
      → [within-eligible dup keep-first]   first-puller-wins, 272-277
      → [per-(task,host) budget window rank]
                                 token-bucket limiter discretized,
                                 limiter/limiter.go:32-49
      → [global LIMIT batch_size]  → batch  (mark seen BEFORE fetch,
                                 schedule.go:277)
      → [inner join pages corpus on canon_url = simulated fetch;
         miss = fetch failure]   collect/collect.go:25-43
      → [vectorized parse UDF → explode requests/items]
                                 schedule.go:286-309
      → items appended; emitted requests + reload retries unioned into
        frontier_{t+1}; seen ∪= batch hashes (minus reload un-marks,
        schedule.go:350-364)

Determinism: request seq ids encode (round, parent pull rank, match
index) as a strided int64 — strictly increasing in exactly the order
the single-worker Go loop would push them, without any global
row_number over the unbounded frontier (no single-partition sort).

Driver/executor split — what is collected and why it scales:
the selected *batch* is bounded by ``cfg.batch_size`` **by
construction** (it is the politeness-limited fetch set for one round),
so collecting it to the driver is O(batch), not O(frontier): the same
rows must reach the driver anyway for the crawl-order log, the bloom
update, and the failure/retry ledger. Everything unbounded — the
frontier, the seen set, the corpus scan, parsing, link explosion —
stays distributed:

- the corpus is only ever touched by a broadcast-hash **inner** join
  against the bounded batch — the full probe while it fits
  (``fetch_broadcast_max``), a broadcast left-semi key filter on the
  scan plus a bounded hits⋈probe join above that
  (``keys_broadcast_max``) — so the corpus never shuffles at any
  batch size (on a real cluster the pages table is bucketed by
  ``canon_url`` making the probe partition-pruned);
- the seen set is append-only parquet; membership = sharded
  executor-side Bloom prefilter (cogroup of frontier and shard store
  on the shard id — definitely-new rows skip the seen join entirely,
  and no single process ever holds the whole filter) + exact
  left-anti join for maybe-seen rows only — no false drops, bloom
  false positives only cost the exact check;
- hot hosts cannot serialize a reducer: the per-(task,host) budget
  window bounds any host's batch share, and the frontier itself is
  hash-partitioned by url_hash (uniform) not by host;
- frontier_{t+1} is compacted (statically-dead depth rows and
  dominated per-url duplicates dropped — see ``_compact_frontier``;
  outputs provably unchanged) and materialized to a parquet snapshot
  (lineage truncation + bounded executor memory; non-durable
  snapshots are deleted as soon as the next round lands); the
  snapshots on the ``checkpoint_every`` grid are kept durable for
  exact resume. Compaction bounds the frontier by distinct unseen
  urls rather than emitted edges — the property that lets a 10^10-URL
  crawl hold its frontier at all.
- with ``frontier_base_every`` > 1 the materialization is Iceberg-v2
  merge-on-read: rounds between base rewrites append only their NEW
  rows (children + retries) as delta file-sets — O(children) written
  per round, not O(frontier), killing the ~100× per-round write
  amplification a 10^10-row frontier would otherwise pay — with the
  retry originals (consumed yet un-marked from seen) carried in a
  tombstone delete-set anti-joined at eligibility; every k-th round
  and every durable checkpoint compacts base+deltas back into one
  self-contained base. Outputs are bit-identical either way
  (tests/test_frontier_delta.py pins retries, budget deferral,
  resume, and add_task against the oracle).
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from crawler_spark.config import EngineConfig, TaskConfig
from crawler_spark.functions.parse import make_parse_udf
from crawler_spark.functions.urlnorm import url_hash_expr, with_canon_host
from crawler_spark.operators.bloom import ShardedBloom
from crawler_spark.operators.robots import filter_robots_allowed, prepare_robots
from crawler_spark.operators.seenstore import band_expr, seen_members
from crawler_spark.sources.tableio import TableIO

FRONTIER_SCHEMA = StructType(
    [
        StructField("task", StringType()),
        StructField("url", StringType()),
        StructField("canon_url", StringType()),
        StructField("host", StringType()),
        StructField("url_hash", StringType()),
        StructField("depth", IntegerType()),
        StructField("priority", IntegerType()),
        StructField("rule", StringType()),
        StructField("reload", BooleanType()),
        StructField("temp", StringType()),
        StructField("seq", LongType()),
    ]
)
_FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]

# seq = (round+1) << 45 | pull_rank << 18 | match_index  — strictly
# increasing in (round, parent pull order, emission order), the exact
# single-worker push order. Caps (validated where the driver knows the
# number, documented where it can't): 2^18-1 rounds, 2^27-1 batch rows
# per round (the top rank slot is the add_task seed band), 2^18
# links/page. The rank band got the widest slice because batch size is
# the axis that actually grows with cluster size — a 1000-executor run
# wants 10^7-10^8-row rounds, while round count and per-page link
# count stay flat.
_ROUND_SHIFT = 45
_RANK_SHIFT = 18
_RANK_CAP = (1 << (_ROUND_SHIFT - _RANK_SHIFT)) - 1  # top band = add_task seeds
_ROUND_CAP = (1 << (63 - _ROUND_SHIFT)) - 1  # keep seq in signed-long range

_BATCH_COLS = [
    "task", "url", "canon_url", "host", "url_hash", "depth", "priority",
    "rule", "reload", "temp", "seq", "pull_rank",
]


class FrontierEngine:
    def __init__(
        self,
        spark: SparkSession,
        tasks: list[TaskConfig],
        corpus: DataFrame,
        cfg: EngineConfig | None = None,
        robots: DataFrame | None = None,
        workdir: str | None = None,
    ):
        self.spark = spark
        self.tasks = {t.name: t for t in tasks}
        self.cfg = cfg or EngineConfig()
        if self.cfg.batch_size >= _RANK_CAP:
            raise ValueError(
                f"batch_size {self.cfg.batch_size} overflows the seq "
                f"pull_rank band (max {_RANK_CAP - 1}); shard the crawl "
                "into more rounds instead"
            )
        # grouped + collected ONCE (config-scale dim): per-round
        # filter_robots_allowed calls skip the re-collect and the
        # decision becomes a broadcast join + codegen fold — no shuffle
        self.robots = prepare_robots(robots)
        self.workdir = workdir or self.cfg.checkpoint_dir or "/tmp/crawler_spark_work"
        # charset decode hook (reference transcodes every fetched body
        # before parse, collect/collect.go:85-96): a raw-bytes corpus
        # (html, no text column) always decodes; a pre-decoded corpus
        # (the input_hint shape) decodes rows with NULL text only when
        # cfg.decode_html is set — the decode stage is omitted entirely
        # otherwise so all-JVM parse rounds stay Python-free
        has_text = "text" in corpus.columns
        self._decode_html = "html" in corpus.columns and (
            self.cfg.decode_html or not has_text
        )
        if not has_text:
            corpus = corpus.withColumn("text", F.lit(None).cast("string"))
        cols = ["canon_url", "url", "warc_ts", "text"]
        if self._decode_html:
            cols.append("html")
        self.corpus = corpus.select(*cols)
        self.round = 0
        self.metrics: list[dict] = []
        self.setup_secs = 0.0
        self.setup_breakdown: dict = {}
        # seen prefilter backend: bloom or cuckoo (north_rule names
        # both), same store schema / fold cadence / probe tiers —
        # cfg.seen_filter swaps only the per-shard membership kernel
        if not self.cfg.use_bloom:
            self._sharded = None
        elif self.cfg.seen_filter == "cuckoo":
            from crawler_spark.operators.cuckoo import ShardedCuckoo

            self._sharded = ShardedCuckoo(
                self.cfg.bloom_shards, self.cfg.bloom_capacity, self.cfg.bloom_fpp
            )
        else:
            self._sharded = ShardedBloom(
                self.cfg.bloom_shards, self.cfg.bloom_capacity, self.cfg.bloom_fpp
            )
        # every engine table (frontier, seen, ledgers, bloom shards)
        # goes through the TableIO seam: Iceberg tables when the
        # runtime jar is present, versioned parquet here (SURVEY §7 R1)
        self.io = TableIO(spark, self.workdir, mode=self.cfg.table_format)
        self._bloom_round: int | None = None  # current shard-store round
        self._folded_upto = 0  # last seen round folded into the store
        self._bloom_drop_pending: int | None = None  # old store, dropped at round end
        # sorted-run compaction state (operators/seenstore.py):
        # round -> bands written at that compaction event (None = a
        # legacy unbanded full run). A band's coverage = the newest
        # round containing it; wave compaction rewrites one band group
        # per event. Fully superseded rounds are dropped at round end
        # like the bloom store (the persisted eligible may still
        # reference their files).
        self._seen_run_state: dict[int, list[int] | None] = {}
        self._seen_runs_drop_pending: list[int] = []
        # rule names are per-task (RuleTree.Trunk per task); dispatch key
        # is "task\x00rule"
        self._flat_rules = {
            f"{t.name}\x00{r.name}": r for t in tasks for r in t.rules
        }
        self._parse_udf = make_parse_udf(self._flat_rules)
        self._tasks_dim = self._build_tasks_dim()
        self._pending_seeds: list[tuple] = []
        self._prev_frontier_round: int | None = None
        self._snapshot_round = 0
        # base+delta frontier state (cfg.frontier_base_every > 1):
        # the frontier relation = base snapshot at _base_round ∪ the
        # per-round deltas in _delta_rounds, minus the _tombstones
        # delete-set (retry-original seqs — the only consumed rows the
        # seen anti-join doesn't already exclude). All three reset at
        # every base rewrite.
        self._base_round = 0
        self._delta_rounds: list[int] = []
        self._tombstones: list[int] = []
        # add_task seeds injected since the last base rewrite: they
        # live only in this (tiny, driver-built) frame until a base
        # materializes them, so delta-mode part reads must re-union it
        self._injected_df: DataFrame | None = None
        self._seen_count = 0
        # round-0 seed snapshot overlapped with round 1 (see run()):
        # the pending write future and the bounded single-round cache
        self._seed_fut = None
        self._seed_cache: DataFrame | None = None
        self._cand_cache: DataFrame | None = None
        self._tagged_cache: DataFrame | None = None
        self._bg = None  # lazy 1-worker pool (overlap_seen_write)
        self._bg_ledger = None  # lazy 1-worker pool (order/items writes)
        self._any_budget = any(t.budget_count > 0 for t in tasks)
        self._any_items = any(
            r.item_fields or r.match_regex for t in tasks for r in t.rules
        )
        self._any_reload = any(t.reload for t in tasks) or any(
            r.emit_reload for t in tasks for r in t.rules
        )

    def _build_tasks_dim(self) -> DataFrame:
        tasks = list(self.tasks.values())
        return self.spark.createDataFrame(
            pd.DataFrame(
                {
                    "task": [t.name for t in tasks],
                    "max_depth": [t.max_depth for t in tasks],
                    "host_budget": [
                        t.host_budget_per_round(self.cfg.round_seconds)
                        for t in tasks
                    ],
                }
            )
        )

    # ---------------- dynamic task submission ----------------
    def add_task(self, task: TaskConfig) -> None:
        """Dynamic task submission — the reference's AddResource RPC
        (proto/crawler/crawler.proto:6-19 → master/master.go:188-201):
        register a new crawl task while the engine is stopped between
        rounds; its seeds enter the frontier on the next ``run``
        continuation and are crawled from the following round.

        Seed seqs are placed at the top of the current round's seq
        band (round << _ROUND_SHIFT | _RANK_CAP << _RANK_SHIFT | j),
        i.e. after every
        request emitted up to and including round ``self.round`` and
        before anything round ``self.round + 1`` emits — exactly where
        the Go engine's Push lands them relative to the single-worker
        order (GoOracle ``add_tasks_after`` mirrors this).
        """
        if task.name in self.tasks:
            raise ValueError(f"task {task.name!r} already registered")
        self.tasks[task.name] = task
        for r in task.rules:
            self._flat_rules[f"{task.name}\x00{r.name}"] = r
        self._parse_udf = make_parse_udf(self._flat_rules)
        self._tasks_dim = self._build_tasks_dim()
        self._any_budget = any(t.budget_count > 0 for t in self.tasks.values())
        self._any_items = self._any_items or any(
            r.item_fields or r.match_regex for r in task.rules
        )
        self._any_reload = self._any_reload or task.reload or any(
            r.emit_reload for r in task.rules
        )
        base = (self.round << _ROUND_SHIFT) + (_RANK_CAP << _RANK_SHIFT)
        # continue numbering after seeds already pending from earlier
        # add_task calls this round — two tasks added between the same
        # rounds must keep a total seq order (t1's seeds strictly
        # before t2's, like the oracle's monotone push counter)
        offset = len(self._pending_seeds)
        if offset + len(task.seeds) > (1 << _RANK_SHIFT):
            raise ValueError(
                f"add_task: {offset + len(task.seeds)} pending seeds exceed "
                f"the per-round add_task seq band ({1 << _RANK_SHIFT}); run "
                "a round between submissions or split the seed list"
            )
        for j, (url, priority, rule) in enumerate(task.seeds):
            self._pending_seeds.append(
                (task.name, url, 0, priority, rule, task.reload, None,
                 base + offset + j)
            )

    def _merge_pending_seeds(self, frontier: DataFrame) -> DataFrame:
        if not self._pending_seeds:
            return frontier
        seed_schema = (
            "task string, url string, depth int, priority int, rule string,"
            " reload boolean, temp string, seq long"
        )
        df = self.spark.createDataFrame(self._pending_seeds, seed_schema)
        injected = (
            with_canon_host(df)
            .withColumn("url_hash", url_hash_expr(F.col("canon_url")))
            .select(_FRONTIER_COLS)
        )
        self._pending_seeds = []
        self._injected_df = (
            injected
            if self._injected_df is None
            else self._injected_df.unionByName(injected)
        )
        return frontier.unionByName(injected)

    # ---------------- state paths / driver-side ledgers ----------------
    def _p(self, *parts: str) -> str:
        return os.path.join(self.workdir, *parts)

    def _bg_pool(self):
        """Single-thread pool for the overlapped seen-write/fold chain
        (cfg.overlap_seen_write). One worker on purpose: the chain is
        internally ordered, and a second concurrent job stream is only
        there to fill executor idle time during driver think time, not
        to multiply scheduler pressure. PySpark's pinned-thread mode
        gives the worker its own JVM thread, so job descriptions and
        interrupts stay scoped to it."""
        if self._bg is None:
            from concurrent.futures import ThreadPoolExecutor

            self._bg = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="frontier-seen"
            )
        return self._bg

    def _ledger_pool(self):
        """Second 1-worker pool for the order/items ledger writes
        (VERDICT r4 next #1: overlap them with the frontier write the
        way the seen chain already overlaps). Separate from the seen
        pool on purpose — the seen chain is an ordered dependency
        chain, while order/items only read the round's persisted
        batch/parsed caches and can run beside both the chain and the
        main thread's frontier materialization; the main thread joins
        the future before those caches unpersist."""
        if self._bg_ledger is None:
            from concurrent.futures import ThreadPoolExecutor

            self._bg_ledger = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="frontier-ledger"
            )
        return self._bg_ledger

    def _jd(self, label: str) -> None:
        """Tag subsequent jobs with the engine phase (shows up in the
        Spark UI / event log; BENCH/jobgaps.py groups job wall time by
        these labels to attribute the N-vs-4N scaling floor). Driver-
        side thread-local property — zero executor cost."""
        self.spark.sparkContext.setJobDescription(f"r{self.round}:{label}")

    def _ledger_append(self, name: str, pdf: pd.DataFrame, round_no: int) -> None:
        """Driver-side append (no Spark job in parquet mode) for
        *bounded* per-round bookkeeping (failures, lineage)."""
        self.io.write_round_pandas(pdf, name, round_no)

    def _ledger_write_df(
        self, df: DataFrame, name: str, round_no: int, n_files: int = 2
    ) -> None:
        """Distributed ledger append (unbounded-safe): the seen set,
        crawl-order log, and items never pass through the driver."""
        self.io.write_round(df, name, round_no, n_files=n_files)

    def _write_manifest(self) -> None:
        with open(self._p("manifest.json"), "w") as f:
            json.dump(
                {
                    "round": self.round,
                    "snapshot_round": self._snapshot_round,
                    # band count the seen_runs layout was written with:
                    # band=<b> dirs are only meaningful under the same
                    # seen_bands, so resume validates it (ADVICE r4)
                    "seen_bands": self.cfg.seen_bands,
                },
                f,
            )

    def _truncate_ledgers(self, upto_round: int) -> None:
        """Drop ledger rounds after ``upto_round`` (stale future state
        when resuming from an older snapshot)."""
        for name in ("seen", "order", "items", "failures", "lineage",
                     "seen_runs"):
            self.io.drop_after(name, upto_round)

    def _fold_bloom(self, upto_round: int, delta_df: DataFrame | None = None) -> None:
        """Fold seen rounds (folded_upto, upto] into the shard store —
        one distributed job (build or OR-merge), never a driver loop.
        First call doubles as backfill (threshold crossing or resume).

        ``delta_df``: the round's already-persisted seen delta (batch
        hashes minus reload un-marks). When it covers exactly the
        unfolded range (the common fold_every=1 cadence) the fold reads
        it instead of re-scanning the whole seen ledger — the ledger
        union grows with rounds, the delta doesn't."""
        if upto_round == self._bloom_round:
            return
        self._jd("bloom-fold")
        if (
            delta_df is not None
            and self._bloom_round is not None
            and self._folded_upto == upto_round - 1
        ):
            old = self.io.read_round("bloom", self._bloom_round)
            delta = delta_df.select("url_hash")
        else:
            seen_all = self._read_seen_upto(upto_round)
            if seen_all is None:
                return
            if self._bloom_round is None:
                old, delta = None, seen_all
            else:
                old = self.io.read_round("bloom", self._bloom_round)
                delta = seen_all.filter(F.col("round") > self._folded_upto)
        shards = self._sharded.fold(old, delta)
        self.io.write_round(shards, "bloom", upto_round, n_files=1)
        old_round = self._bloom_round
        self._bloom_round = upto_round
        self._folded_upto = upto_round
        if old_round is not None:
            # deferred to end-of-round: the persisted `eligible` still
            # has this round's store in its lineage (the cogroup
            # probe), and a cache-block loss before the frontier
            # materializes would recompute it from the deleted path
            self._bloom_drop_pending = old_round

    # ---------------- sorted-run seen probe ----------------
    def _use_sorted_probe(self) -> bool:
        # both table modes: parquet rounds are listed from the round
        # dir, iceberg data files come from the table's `.files`
        # metadata table (sources/tableio.py round_files) — the probe
        # itself reads row groups by path either way
        return self.cfg.sorted_seen_probe

    def _band_cover(self, band: int) -> int:
        """Newest run round covering ``band`` (0 = none): seen rounds
        ≤ this are folded into the band's level-1 run files."""
        rs = [
            r
            for r, bands in self._seen_run_state.items()
            if bands is None or band in bands
        ]
        return max(rs) if rs else 0

    def _seen_run_paths(self) -> tuple[dict[int, list[str]], list[str]]:
        """Current probe file sets, from ONE metadata listing per
        table (real iceberg catalogs meter ``.files`` reads — the old
        per-band filtered queries cost up to bands+loose metadata
        reads per round, VERDICT r4 missing #2): each band's list =
        its level-1 run files + the loose ledger rounds newer than
        ITS OWN coverage. The per-band loose cutoff (VERDICT r4 wrong
        #3) replaces the global min-cover cutoff that made every
        freshly-compacted band re-probe up to ``seen_compact_every``
        already-folded rounds after a wave. A loose ledger file holds
        every band's keys, so it appears in each lagging band's list;
        a task only looks up its own keys in it. The shared set is
        now always empty (kept in the signature for unbanded probe
        callers). Paths are pinned into the probe plan as literals —
        concurrent writes or deferred drops never shift a built
        plan."""
        B = max(1, self.cfg.seen_bands)
        runs = self.io.table_files("seen_runs")
        loose = self.io.table_files("seen")
        band_paths: dict[int, list[str]] = {}
        for b in range(B):
            c = self._band_cover(b)
            if c:
                rf = runs.get(c, {})
                paths = (
                    sorted(p for ps in rf.values() for p in ps)
                    if self._seen_run_state[c] is None
                    else list(rf.get(b, []))
                )
            else:
                paths = []
            for r in sorted(loose):
                if r > c:
                    paths += [p for ps in loose[r].values() for p in ps]
            band_paths[b] = paths
        return band_paths, []

    def _maybe_compact_seen(self, rnd: int) -> None:
        """Leveled LSM compaction in band waves (VERDICT r3 #3): every
        ~``seen_compact_every / waves`` loose ledger rounds, merge the
        most-stale 1/waves of the hash bands — their current run files
        plus the loose rounds — into a fresh band-partitioned sorted
        run at round ``rnd``. Each band still compacts about every
        ``seen_compact_every`` rounds, but the largest single write
        wave is O(seen / waves), never a full-seen rewrite. Runs inside
        the overlapped seen chain."""
        k = self.cfg.seen_compact_every
        if not self._use_sorted_probe() or k <= 0:
            return
        B = max(1, self.cfg.seen_bands)
        # more waves than bands would leave empty wave groups and a
        # min() over an empty generator mid-round (ADVICE r4): clamp —
        # W > B adds no granularity anyway (a wave rewrites ≥ 1 band)
        W = max(1, min(self.cfg.seen_compact_waves, B))
        newest = max(self._seen_run_state, default=0)
        loose_map = self.io.table_files("seen")
        n_loose = sum(1 for r in loose_map if r > newest)
        if n_loose <= max(1, k // W):
            return
        self._jd("seen-compact")
        seen_all = self._read_seen_upto(rnd)
        if seen_all is None:
            return
        groups = [[b for b in range(B) if b % W == g] for g in range(W)]
        g = min(range(W), key=lambda i: min(self._band_cover(b) for b in groups[i]))
        bands = groups[g]
        covers = {b: self._band_cover(b) for b in bands}
        be = band_expr("url_hash", B)
        in_group = F.pmod(be, F.lit(W)) == g
        # ledger contribution with a PER-BAND cover cutoff: a band
        # whose cover is newer than the group's oldest must not
        # re-contribute rounds its run already folded — those keys
        # would be written twice and the duplicates would persist in
        # level-1 runs across every future compaction (ADVICE r4).
        if len(set(covers.values())) > 1:
            cov = None
            for b in bands:
                cov = (
                    F.when(be == b, covers[b])
                    if cov is None
                    else cov.when(be == b, covers[b])
                )
            keep = in_group & (F.col("round") > cov)
        else:
            keep = in_group & (F.col("round") > min(covers.values()))
        part = seen_all.filter(keep).select("url_hash")
        # run contribution, grouped by covering run (one batched
        # metadata listing — VERDICT r4 missing #2): banded run files
        # are per-band directories (disjoint, no filter needed); an
        # unbanded legacy run holds EVERY band's keys, so its rows are
        # restricted to exactly the bands it still covers — group
        # members covered by a newer run already carry those rounds
        # (the duplicate source ADVICE r4 flagged).
        runs_map = self.io.table_files("seen_runs")
        by_run: dict[tuple[int, bool], list[int]] = {}
        for b in bands:
            if covers[b]:
                unbanded = self._seen_run_state[covers[b]] is None
                by_run.setdefault((covers[b], unbanded), []).append(b)
        for (c, unbanded), bs in sorted(by_run.items()):
            rf = runs_map.get(c, {})
            if unbanded:
                fs = sorted(p for ps in rf.values() for p in ps)
            else:
                fs = sorted(p for b in bs for p in rf.get(b, []))
            if not fs:
                continue
            old = self.spark.read.parquet(*fs).select("url_hash")
            if unbanded:
                old = old.filter(be.isin([int(b) for b in bs]))
            part = part.unionByName(old)
        n_files = max(
            len(bands), min(16, self._seen_count // (W * 2_000_000) + 1)
        )
        self.io.write_round(
            part.withColumn("band", be),
            "seen_runs",
            rnd,
            n_files=n_files,
            sort_within="url_hash",
            partition_col="band",
        )
        self._seen_run_state[rnd] = list(bands)
        # runs that no longer provide any band's newest coverage are
        # dead; deferred to round end — this round's persisted eligible
        # may still reference their files (same pattern as the bloom
        # store drop)
        referenced = {self._band_cover(b) for b in range(B)} - {0}
        for r in [r for r in self._seen_run_state if r not in referenced]:
            del self._seen_run_state[r]
            self._seen_runs_drop_pending.append(r)

    # ---------------- seeds ----------------
    def seed_frontier(self) -> DataFrame:
        rows = []
        seq = 0
        for t in self.tasks.values():
            for url, priority, rule in t.seeds:
                rows.append((t.name, url, 0, priority, rule, t.reload, None, seq))
                seq += 1
        seed_schema = (
            "task string, url string, depth int, priority int, rule string,"
            " reload boolean, temp string, seq long"
        )
        # Arrow path (pandas → createDataFrame): the row-list path
        # pickles tuple-by-tuple and is the dominant pre-loop setup
        # cost at bench-scale seed lists (600k seeds ≈ 10s vs <1s);
        # identical rows/schema either way
        pdf = pd.DataFrame(
            rows,
            columns=["task", "url", "depth", "priority", "rule",
                     "reload", "temp", "seq"],
        )
        df = self.spark.createDataFrame(pdf, seed_schema)
        return (
            with_canon_host(df)
            .withColumn("url_hash", url_hash_expr(F.col("canon_url")))
            .select(_FRONTIER_COLS)
        )

    # ---------------- round stages ----------------
    # pull order (two-FIFO scheduler: priority>0 class first, then
    # enqueue order) is materialized as the `_pclass` column in
    # _select_batch and ordered as (_pclass asc, seq asc) throughout

    def _eligible(self, frontier: DataFrame, seen: DataFrame | None) -> DataFrame:
        if self._tombstones:
            # base+delta mode delete-set: retry originals were consumed
            # (pulled, failed, un-marked from seen, re-pushed with a
            # fresh seq) but their old rows still sit in base/delta
            # files until the next compaction. seq is globally unique,
            # and the set is bounded by reload retries within one base
            # window — a broadcast anti-join, the same plan an Iceberg
            # v2 reader generates for its delete files.
            tomb = self.spark.createDataFrame(
                [(int(s),) for s in self._tombstones], "seq long"
            )
            frontier = frontier.join(F.broadcast(tomb), "seq", "left_anti")
        e = frontier.join(F.broadcast(self._tasks_dim), "task").filter(
            F.col("depth") <= F.col("max_depth")
        )
        e = filter_robots_allowed(e, self.robots)
        if seen is not None:
            if (
                self.cfg.use_bloom
                and self._sharded is not None
                and self._seen_count >= self.cfg.bloom_min_seen
            ):
                # lazy first fold = distributed backfill (threshold
                # crossing mid-run, or resume into an engaged filter)
                if self._bloom_round is None:
                    self._fold_bloom(self.round)
                shards = self.io.read_round("bloom", self._bloom_round)
                if self._sharded.store_bytes() <= self.cfg.bloom_broadcast_max:
                    # small store: broadcast the shard bytes and probe
                    # with a scalar pandas UDF on url_hash only — no
                    # frontier shuffle, no full-row Python round-trip
                    tagged = self._sharded.check_broadcast(e, "url_hash", shards)
                else:
                    # 10^10-scale store: cogroup probe — each task
                    # holds one shard, the filter is never assembled
                    tagged = self._sharded.check(e, "url_hash", shards)
                # three consumers read `tagged` (maybe, new, and the
                # probe's key projection): persist so the downstream
                # exchanges read the cache instead of re-running the
                # frontier scan + filter probe per branch. The EAGER
                # count (forces materialization before AQE launches the
                # consumer exchanges as CONCURRENT jobs — concurrent
                # tasks do not deduplicate an unmaterialized cache) is
                # shape-gated: A/B at the 2M/600k scaling shape
                # (best-of-2 interleaved): eager 147.2 s / 480
                # user-cpu-s, lazy-persist 146.9 s / 483, no-persist
                # 153.8 s / 509 — but at the sf0.1 bench shape (20k
                # batches) the blocking job per round cost the headline
                # −12% (VERDICT r3 #2), so small batches keep the lazy
                # persist only.
                tagged = tagged.persist()
                self._tagged_cache = tagged  # unpersisted at end of round
                # batch_size <= 0 = "all eligible" — unbounded counts
                # as large (the bloom only engages past bloom_min_seen)
                if (
                    self.cfg.batch_size <= 0
                    or self.cfg.batch_size >= self.cfg.eager_probe_min_batch
                ):
                    self._jd("eligible:probe")
                    tagged.count()
                maybe = tagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
                new = tagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
                # maybe-seen rows take the exact check (bloom false
                # positives only cost this check); definitely-new rows
                # still get an exact anti-join against the *unfolded*
                # recent rounds (bounded by fold_every × batch) so the
                # filter's coverage never lags the ledger
                if self._use_sorted_probe():
                    # sorted-run row-group probe: O(maybe · log seen),
                    # no O(seen) shuffle — the full-ledger anti-join
                    # below was the last per-round full-ledger cost at
                    # spec scale (VERDICT r2 #1). `hits` is bounded by
                    # the maybe keys; AQE broadcasts the anti-join.
                    band_paths, shared = self._seen_run_paths()
                    hits = seen_members(
                        maybe.select("url_hash"),
                        shared,
                        self.cfg.num_partitions,
                        band_paths=band_paths,
                        n_bands=self.cfg.seen_bands,
                    )
                    checked = maybe.join(hits, "url_hash", "left_anti")
                else:
                    checked = maybe.join(
                        seen.select("url_hash"), "url_hash", "left_anti"
                    )
                if self._folded_upto < self.round:
                    unfolded = seen.filter(
                        F.col("round") > self._folded_upto
                    ).select("url_hash")
                    new = new.join(F.broadcast(unfolded), "url_hash", "left_anti")
                e = new.unionByName(checked)
            else:
                # bloom disengaged: the seen set is bounded (below
                # bloom_min_seen when the bloom is on; caller-bounded
                # otherwise) — broadcast it explicitly while it fits
                # the keys budget. Spark's 10 MB auto threshold flips
                # this anti-join to a sort-merge at ~220k hashes,
                # which shuffles the FULL-WIDTH frontier — the single
                # biggest avoidable shuffle of a young crawl's round.
                seen_keys = seen.select("url_hash")
                if self._seen_count <= self.cfg.keys_broadcast_max:
                    seen_keys = F.broadcast(seen_keys)
                e = e.join(seen_keys, "url_hash", "left_anti")
        return e

    def _select_batch(self, eligible: DataFrame) -> DataFrame:
        """Winner selection on NARROW rows.

        Everything between eligibility and the batch cut used to
        shuffle full frontier rows (~250 B: urls, rule, temp, …) —
        at millions of frontier rows per round that shuffle volume is
        the scaling bottleneck. All the selection logic only needs
        (url_hash, pull-order key, host-budget key), so this runs on a
        ~50 B projection and `_rejoin_batch` recovers the full rows
        for the bounded batch afterwards with a broadcast join.

        Dedup (first-wins per url_hash) is a groupBy + struct-min, NOT
        a row_number window: min() gets a map-side partial aggregate,
        so only distinct url_hashes reach the shuffle — a window ranks
        after shuffling every row. ``seq`` is globally unique (round/
        pull_rank/match_index encoding; retries can't collide with
        children because a retried parent fetched nothing), so the
        lexicographic struct-min is decided by (_pclass, seq) and the
        extra carried fields never affect which row wins.

        Budget path: same narrow rows through the skew-salted
        two-phase per-(task,host) top-k — a hot host (the corpus
        generator gives one host ~30% of pages) must not serialize one
        reducer. Phase 1 ranks within (task, host, salt): any row with
        salted rank > budget can't be in the true per-host top-budget
        either → safe to drop. Phase 2 is the exact rank over the
        ≤ salts×budget survivors per host. A skipped dup never
        consumes budget — the Go loop drops it before the limiter.
        """
        pclass = F.when(F.col("priority") > 0, 0).otherwise(1)
        carried = [pclass.alias("_pclass"), F.col("seq")]
        if self._any_budget:
            carried += [F.col("task"), F.col("host"), F.col("host_budget")]
        nodup = (
            eligible.select("url_hash", F.struct(*carried).alias("_t"))
            .groupBy("url_hash")
            .agg(F.min("_t").alias("_w"))
            .select("url_hash", "_w.*")
        )
        if not self._any_budget:
            # no politeness caps anywhere → the host windows are
            # identity filters; skip their shuffles entirely
            return nodup
        order = [F.col("_pclass").asc(), F.col("seq").asc()]
        n_salts = max(1, self.cfg.max_salts)
        if n_salts > 1:
            salted = nodup.withColumn(
                "_salt", F.pmod(F.xxhash64("url_hash"), F.lit(n_salts))
            )
            w_salt = Window.partitionBy("task", "host", "_salt").orderBy(*order)
            nodup = (
                salted.withColumn("_salt_rank", F.row_number().over(w_salt))
                .filter(F.col("_salt_rank") <= F.col("host_budget"))
            )
        w_host = Window.partitionBy("task", "host").orderBy(*order)
        candidates = nodup.withColumn(
            "_host_rank", F.row_number().over(w_host)
        ).filter(F.col("_host_rank") <= F.col("host_budget"))
        # the global batch cut happens in _with_pull_rank (TakeOrdered
        # for small batches, distributed rank+filter for large ones)
        return candidates.select("url_hash", "_pclass", "seq")

    def _with_pull_rank(self, candidates: DataFrame) -> DataFrame:
        """Global batch cut + dense 0-based pull_rank in pull order.

        Small-to-mid batch_size: TakeOrderedAndProject (bounded
        per-partition heaps + driver merge — candidates are narrow
        ~48 B rows, so the merge is MBs even at 512k) then one
        single-partition window over ≤ batch_size rows.

        Large/unbounded batch_size: histogram cut, then the exact rank
        assembled from the histogram itself — one to two bounded
        collects per round, NO third pass. One map-side aggregation
        over the candidate set (bucket = seq >> (_RANK_SHIFT+7), i.e.
        128 parent pull-ranks per bucket — near-uniform for child
        bands) gives the driver a small per-bucket count table;
        because pull order is (_pclass, seq), the batch is a PREFIX of
        the bucket sequence, so the cut is a two-literal comparison,
        never a bucket list. DENSE buckets (seed_frontier / add_task
        number seqs consecutively, piling one bucket arbitrarily high)
        are re-histogrammed one level finer (seq >> 7 — ≤ 128 rows per
        sub-bucket, since seq is globally unique) in ONE extra
        aggregation covering every over-full bucket, which both cuts
        the threshold bucket at sub-bucket grain (survivors ≤
        batch_size + 127) and bounds the rank window groups below.

        pull_rank = bucket prefix-sum (driver-side, from the counts
        already collected) + row_number within the bucket: the bucket
        offsets broadcast-join onto the survivors and the within-
        bucket rank is a window partitioned by bucket — group size ≤
        the bucket bound, so no global sort, no single giant
        partition, and the whole assignment stays in JVM codegen.
        This replaced a third job (range-shuffle boundary sampling +
        per-partition count collect) and an Arrow mapInPandas stage
        per round (VERDICT r4 next #1: per-round driver round-trips
        are the engine-owned slice of the scaling floor). Everything
        heavier than an aggregation-with-partials is O(batch), not
        O(frontier); the candidate relation is persisted so each
        round computes it exactly once.
        """
        order = [F.col("_pclass").asc(), F.col("seq").asc()]
        bsize = self.cfg.batch_size if self.cfg.batch_size > 0 else (1 << 62)
        if bsize <= self.cfg.rank_window_max:
            batch = candidates.orderBy(*order).limit(bsize)
            w = Window.orderBy(*order)
            return batch.withColumn("pull_rank", F.row_number().over(w) - 1)
        cand = candidates.persist()
        self._cand_cache = cand  # unpersisted at end of round
        L1, L2 = _RANK_SHIFT + 7, 7
        import time as _time

        self._jd("rank:eligible+histogram")
        hist = sorted(
            (r["p"], r["b"], r["cnt"])
            for r in cand.groupBy(
                F.col("_pclass").alias("p"),
                F.shiftright("seq", L1).alias("b"),
            )
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        b1c = F.shiftright("seq", L1)
        b2c = F.shiftright("seq", L2)
        # offsets rows: (pclass, b1, b2, offset) with b2 = -1 for
        # buckets ranked whole; every survivor joins exactly one row
        off_rows: list[tuple[int, int, int, int]] = []
        if not hist:
            survivors = cand  # empty candidate set; keep the plan shape
            dense_cond = F.lit(False)
        else:
            # cum_before must stay "rows strictly before the threshold
            # bucket" in BOTH exit modes — breaking on the bucket that
            # crosses bsize AND exhausting an under-full histogram
            # (total < bsize, where the last bucket is the threshold
            # and its own count must not be added)
            cum_before, thr, prev_c = 0, hist[0], 0
            kept: list[tuple[int, int, int, int]] = []  # (p, b, cnt, cum)
            for p, b, c in hist:
                cum_before += prev_c
                thr = (p, b, c)
                kept.append((p, b, c, cum_before))
                if cum_before + c >= bsize:
                    break
                prev_c = c
            tp, tb, c_thr = thr
            before_thr = (F.col("_pclass") < tp) | (
                (F.col("_pclass") == tp) & (b1c < tb)
            )
            in_thr = (F.col("_pclass") == tp) & (b1c == tb)
            # over-full buckets anywhere in the prefix are split at L2
            # (the threshold bucket for the cut; the rest so no rank
            # window group exceeds max(rank_refine_max, 128))
            dense = [
                (p, b) for p, b, c, _ in kept if c > self.cfg.rank_refine_max
            ]
            sub: dict[tuple[int, int], list[tuple[int, int]]] = {}
            if dense:
                self._jd("rank:refine")
                dense_f = None
                for p, b in dense:
                    e = (F.col("_pclass") == p) & (b1c == b)
                    dense_f = e if dense_f is None else (dense_f | e)
                for r in (
                    cand.filter(dense_f)
                    .groupBy(
                        F.col("_pclass").alias("p"),
                        b1c.alias("b"),
                        b2c.alias("b2"),
                    )
                    .agg(F.count("*").alias("cnt"))
                    .collect()
                ):
                    sub.setdefault((r["p"], r["b"]), []).append(
                        (r["b2"], r["cnt"])
                    )
            if (tp, tb) in sub and bsize < (1 << 62):
                cum2, t2b = 0, None
                for b2, c2 in sorted(sub[(tp, tb)]):
                    t2b = b2
                    cum2 += c2
                    if cum_before + cum2 >= bsize:
                        break
                # prefix logic self-corrects when total < bsize: the
                # loop exhausts and t2b is the last sub-bucket, so
                # every threshold-bucket row survives
                in_thr = in_thr & (b2c <= t2b)
            survivors = cand.filter(before_thr | in_thr)
            for p, b, c, cum in kept:
                if (p, b) in sub:
                    acc = cum
                    for b2, c2 in sorted(sub[(p, b)]):
                        off_rows.append((p, b, b2, acc))
                        acc += c2
                else:
                    off_rows.append((p, b, -1, cum))
            if dense:
                dense_cond = None
                for p, b in dense:
                    e = (F.col("_pclass") == p) & (b1c == b)
                    dense_cond = e if dense_cond is None else (dense_cond | e)
            else:
                dense_cond = F.lit(False)
        # driver round-trips done (the offsets join and bucket window
        # below are lazy) — mark the rank half of t_select here
        self._t_rank_done = _time.time()
        off_df = self.spark.createDataFrame(
            off_rows, "_pclass int, _b1 long, _b2 long, _off long"
        )
        keyed = survivors.withColumn("_b1", b1c).withColumn(
            "_b2", F.when(dense_cond, b2c).otherwise(F.lit(-1).cast("long"))
        )
        w = Window.partitionBy("_pclass", "_b1", "_b2").orderBy(F.col("seq").asc())
        out = (
            keyed.join(F.broadcast(off_df), ["_pclass", "_b1", "_b2"])
            .withColumn(
                "pull_rank",
                (F.col("_off") + F.row_number().over(w) - F.lit(1)).cast("long"),
            )
            .drop("_b1", "_b2", "_off")
        )
        if bsize < (1 << 62):
            out = out.filter(F.col("pull_rank") < bsize)
        return out

    def _rejoin_batch(self, eligible: DataFrame, ranked: DataFrame) -> DataFrame:
        """Recover full frontier rows for the cut batch.

        ``ranked`` is the bounded narrow batch (≤ batch_size rows of
        url_hash/seq/pull_rank); joining it back against the persisted
        eligible relation on (url_hash, seq) — a unique key — is a
        broadcast hash join, so the full-width rows never shuffle at
        all. The keys are ~50 B/row, so they broadcast up to
        keys_broadcast_max (wider than the full-probe limit);
        unbounded/huger batches fall back to a plain join (on a real
        cluster that join is co-partitioned with the frontier's
        url_hash layout)."""
        # binary (unhex) key halves the driver-built broadcast bytes —
        # the collect+rebroadcast is round-serial (same rationale as
        # the fetch semi-key); seq alone would suffice for uniqueness
        # but the hash keeps the join co-partitionable with a
        # url_hash-bucketed frontier on a real cluster
        keys = ranked.select(
            F.unhex("url_hash").alias("_k16"),
            F.col("seq").alias("_kseq"),
            "pull_rank",
        )
        if 0 < self.cfg.batch_size <= self.cfg.keys_broadcast_max:
            keys = F.broadcast(keys)
        e = eligible.select(_FRONTIER_COLS)
        return e.join(
            keys,
            (F.unhex(e["url_hash"]) == keys["_k16"])
            & (e["seq"] == keys["_kseq"]),
        ).drop("_k16", "_kseq")

    def _parse_plan(self, hits: DataFrame) -> DataFrame:
        """The per-round ``parsed`` relation, split by rule kind.

        Link-only rules (no temp carry, no items, no boolean match —
        e.g. every rule of a plain BFS crawl) compile to a
        `regexp_extract_all` + `transform` expression that runs inside
        whole-stage codegen: the page bodies never cross into Python.
        Everything else takes the shared Arrow UDF (parse_page), the
        executable-spec path. When every rule is JVM-expressible the
        Python branch is omitted entirely — no workers fork, no Arrow
        serialization of bodies. Equality of the two paths is pinned
        by tests/test_rules.py and by every engine-vs-oracle suite
        (the oracle always interprets parse_page).

        Mixed rule sets run as ONE projection over one pass of `hits`
        (the unpersisted corpus-join relation — two filtered branches
        would execute the corpus scan + fetch join once per branch):
        the Arrow UDF's text argument is masked to NULL for
        JVM-expressible rows, so their bodies never cross into Python
        (the UDF's None-text guard returns the empty result, which the
        outer `when` discards in favor of the codegen expression).
        """
        from crawler_spark.functions.parse import jvm_expressible, jvm_parsed_expr

        head = ["url_hash", "task", "rule", "depth", "pull_rank", "warc_ts",
                "req_url"]
        keycol = F.concat_ws("\x00", F.col("task"), F.col("rule"))
        fast = (
            [(k, s) for k, s in self._flat_rules.items() if jvm_expressible(s)]
            if self.cfg.jvm_parse
            else []
        )
        if not fast:
            return hits.select(
                *head,
                self._parse_udf(
                    keycol, F.col("req_url"), F.col("text"), F.col("temp")
                ).alias("parsed"),
            )
        case = None
        for k, spec in fast:
            e = jvm_parsed_expr(spec, F.col("text"))
            case = F.when(keycol == F.lit(k), e) if case is None else case.when(
                keycol == F.lit(k), e
            )
        if len(fast) == len(self._flat_rules):
            return hits.select(*head, case.alias("parsed"))
        is_fast = keycol.isin([k for k, _ in fast])
        slow = self._parse_udf(
            keycol,
            F.col("req_url"),
            F.when(~is_fast, F.col("text")),
            F.col("temp"),
        )
        return hits.select(
            *head, F.when(is_fast, case).otherwise(slow).alias("parsed")
        )

    def _children(self, parsed: DataFrame):
        base = (self.round) << _ROUND_SHIFT
        children = (
            parsed.select(
                "task",
                F.col("depth").alias("parent_depth"),
                "pull_rank",
                F.explode("parsed.requests").alias("emit"),
            )
            .select(
                "task",
                F.col("emit.url").alias("url"),
                (F.col("parent_depth") + 1).alias("depth"),
                F.col("emit.priority").alias("priority"),
                F.col("emit.rule").alias("rule"),
                F.col("emit.reload").alias("reload"),
                F.col("emit.temp").alias("temp"),
                (
                    F.lit(base)
                    + F.col("pull_rank").cast("long") * F.lit(1 << _RANK_SHIFT)
                    + F.col("emit.match_index")
                ).alias("seq"),
            )
        )
        # identity columns stay in whole-stage codegen (no Arrow
        # round-trip): this is out_degree × batch rows every round —
        # the engine's hottest scalar kernel
        children = with_canon_host(children).withColumn(
            "url_hash", url_hash_expr(F.col("canon_url"))
        ).select(_FRONTIER_COLS)
        return children

    def _compact_frontier(self, df: DataFrame) -> DataFrame:
        """Drop frontier rows that can never be fetched.

        Two provably-dead classes (outputs are bit-identical to the
        uncompacted engine — the oracle-equality suite is the gate):

        1. **Statically dead**: ``depth > task.max_depth``. The Go
           worker pulls such a request and drops it with no side
           effects — no seen mark, no failure (request.go:87-92,
           schedule.go:267-270) — so removing it early changes
           nothing. On a BFS crawl the deepest emitted level is the
           largest cohort; carrying it forever is pure dead weight.
        2. **Dominated duplicates**: within one url_hash, pull order is
           (_pclass, seq) and the engine/oracle fetch at most one row
           per url per round (first-puller-wins). A reload=False row,
           once pulled, marks the url seen *permanently* (visited
           before fetch, schedule.go:277; only a reload retry ever
           un-marks, schedule.go:350-364). Hence every row ordered
           after the first reload=False row can never surface: until
           the sealer is consumed it is outranked, afterwards the url
           is seen. Keep the prefix up to and including that sealer.

        This bounds the frontier by O(distinct unseen urls) instead of
        O(emitted edges) — on a cyclic graph (out-degree k, revisit
        rate r) the uncompacted frontier grows by ~k·batch rows per
        round without bound. When no task/rule can emit reload=True
        the prefix is just the minimum row, which a groupBy struct-min
        computes with a map-side partial aggregate (only distinct
        url_hashes reach the shuffle); the general case runs a
        running-count window per url_hash.
        """
        df = (
            df.join(
                F.broadcast(self._tasks_dim.select("task", "max_depth")),
                "task",
                "left",
            )
            .filter(F.col("depth") <= F.col("max_depth"))
            .drop("max_depth")
        )
        pclass = F.when(F.col("priority") > 0, 0).otherwise(1)
        if self._any_reload:
            w = (
                Window.partitionBy("url_hash")
                .orderBy(pclass.asc(), F.col("seq").asc())
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            sealed = F.when(F.coalesce(F.col("reload"), F.lit(False)), 0).otherwise(1)
            return (
                df.withColumn(
                    "_sealed_before", F.coalesce(F.sum(sealed).over(w), F.lit(0))
                )
                .filter(F.col("_sealed_before") == 0)
                .drop("_sealed_before")
            )
        rest = [c for c in _FRONTIER_COLS if c != "url_hash"]
        fields = [pclass.alias("_pclass"), F.col("seq").alias("_seq")] + [
            F.col(c) for c in rest
        ]
        # seq is globally unique, so the struct-min is decided by the
        # (_pclass, _seq) prefix; the carried fields never tie-break
        return (
            df.select("url_hash", F.struct(*fields).alias("_t"))
            .groupBy("url_hash")
            .agg(F.min("_t").alias("_w"))
            .select("url_hash", *[F.col(f"_w.{c}").alias(c) for c in rest])
            .select(_FRONTIER_COLS)
        )

    def _materialize_frontier(
        self, df: DataFrame, round_no: int, force_snapshot: bool = False
    ) -> DataFrame:
        """Materialize frontier_{t+1} as a round snapshot (TableIO:
        Iceberg snapshot when available, parquet round dir here).

        A table write on purpose — NOT localCheckpoint and NOT a
        cross-round persist(): long-lived cached blocks are never
        reclaimed from Python in this runtime and degrade every
        subsequent job (~30× for localCheckpoint; a persisted-frontier
        "cache mode" was built and measured 7× slower by round 3 at
        800k pages before being removed). The write truncates
        lineage, bounds executor memory, and doubles as the resume
        checkpoint. Non-durable snapshots (rounds not on the
        checkpoint_every grid) are deleted as soon as the next round
        lands.
        """
        cfg = self.cfg
        self._jd("frontier-snapshot")
        durable = force_snapshot or (
            cfg.checkpoint_every > 0 and round_no % cfg.checkpoint_every == 0
        )
        if cfg.frontier_compact:
            df = self._compact_frontier(df)
        # url_hash repartition caps task count (unions would otherwise
        # accumulate partitions round over round); few reduce/writer
        # partitions — file creates fork chmod on libhadoop-less local
        # FS, and read parallelism comes from row-group splits + the
        # next round's shuffles, not file count. Map-side (canonicalize
        # UDF etc.) keeps full upstream parallelism.
        df = df.repartition(
            min(cfg.snapshot_writers, cfg.num_partitions), "url_hash"
        )
        self.io.overwrite_round(df, "frontier", round_no)
        out = self.io.read_round("frontier", round_no, FRONTIER_SCHEMA)
        if durable:
            self._snapshot_round = round_no
        if (
            self._prev_frontier_round is not None
            and self._prev_frontier_round != round_no
        ):
            self.io.drop_round("frontier", self._prev_frontier_round)
        # keep non-durable snapshots only until the next round lands
        self._prev_frontier_round = None if durable else round_no
        return out

    def _read_frontier_parts(self) -> DataFrame:
        """The current frontier relation in base+delta mode: the base
        snapshot ∪ every pending per-round delta. All parts are parquet
        reads, so lineage stays truncated exactly as with the full
        rewrite; the tombstone delete-set is applied in `_eligible`."""
        f = self.io.read_round("frontier", self._base_round, FRONTIER_SCHEMA)
        for dr in self._delta_rounds:
            f = f.unionByName(
                self.io.read_round("frontier_delta", dr, FRONTIER_SCHEMA)
            )
        if self._injected_df is not None:
            # add_task seeds not yet materialized by a base rewrite
            f = f.unionByName(self._injected_df)
        return f

    def _drop_deltas(self) -> None:
        """Reset the delta window after a base rewrite materialized it
        (deltas, tombstones, and injected add_task seeds all flowed
        into the base structurally, via eligible ∪ children)."""
        for dr in self._delta_rounds:
            self.io.drop_round("frontier_delta", dr)
        self._delta_rounds = []
        self._tombstones = []
        self._injected_df = None

    # ---------------- main loop ----------------
    def run(
        self,
        max_rounds: int | None = None,
        record_order: bool = True,
        resume: bool = False,
    ) -> dict:
        import time as _time

        _t_run0 = _time.time()
        cfg = self.cfg
        max_rounds = max_rounds or cfg.max_rounds
        if resume:
            with open(self._p("manifest.json")) as f:
                man = json.load(f)
            self.round = man["snapshot_round"]
            self._snapshot_round = self.round
            self._truncate_ledgers(self.round)
            # durable checkpoints are always self-contained bases (a
            # checkpoint-grid round forces a base rewrite), so resume
            # starts with an empty delete-set; orphan deltas from the
            # abandoned rounds are dead files — drop them
            self._base_round = self.round
            self._delta_rounds = []
            self._tombstones = []
            self._injected_df = None
            self.io.drop_after("frontier_delta", self.round)
            frontier = self.io.read_round(
                "frontier", self.round, FRONTIER_SCHEMA
            )
            seen = self._read_seen_upto(self.round)
            # stale shard stores from the interrupted run are rebuilt
            # lazily (distributed) at first engaged _eligible — never a
            # driver loop over seen hashes; only the count is needed.
            # Reset the in-memory pointers too: an engine object reused
            # across runs (run → add_task → run(resume=True)) would
            # otherwise read the just-deleted store path
            self.io.drop_table("bloom")
            self._bloom_round = None
            self._folded_upto = 0
            self._bloom_drop_pending = None
            # surviving compacted runs ≤ snapshot_round cover only
            # retained ledger rounds — still valid IF this engine's
            # band count matches the one the runs were written with:
            # band=<b> dirs map hash ranges to directories only under
            # the same seen_bands, so a mismatched resume would probe
            # the wrong band's files and silently re-crawl seen URLs
            # (ADVICE r4 medium). The manifest records the writer's
            # band count; on mismatch — or a pre-manifest workdir —
            # the runs are dropped and the probe falls back to the
            # loose ledger rounds (always complete: the seen ledger is
            # append-only and fully retained) until compaction
            # rebuilds runs under the new banding. Same-band resume
            # rebuilds per-band coverage from the band=* layout.
            # (Rounds a pending drop never removed are harmless: a
            # superseded run is extra coverage, never wrong answers.)
            if man.get("seen_bands") == self.cfg.seen_bands:
                self._seen_run_state = {
                    r: (self.io.run_bands("seen_runs", r) or None)
                    for r in self.io.rounds("seen_runs")
                }
            else:
                self.io.drop_table("seen_runs")
                self._seen_run_state = {}
            self._seen_runs_drop_pending = []
            self._seen_count = seen.count() if seen is not None else 0
        else:
            if os.path.exists(self.workdir):
                shutil.rmtree(self.workdir)
            os.makedirs(self.workdir, exist_ok=True)
            _t_seedgen = _time.time()
            seeds = self.seed_frontier()
            self.setup_breakdown = {"seed_build": round(_time.time() - _t_seedgen, 2)}
            _t_snap = _time.time()
            if self.cfg.overlap_seen_write and not self._pending_seeds:
                # overlap the round-0 seed snapshot with round 1: the
                # write is only needed on disk once a later round reads
                # frontier parts (delta mode) or rewrites the base, so
                # round 1 selects from a persisted copy of the seed
                # relation while the background worker writes the
                # snapshot — 7-10 s of serial pre-loop wall hidden
                # behind round-1 select (BASELINE.md setup attribution).
                # Bounded single-round cache, unpersisted at the end of
                # round 1 (NOT the forbidden cross-round frontier
                # persist — see CLAUDE.md); the write future is joined
                # before any frontier-table access.
                seeds = seeds.persist()
                self._seed_cache = seeds
                self._seed_fut = self._bg_pool().submit(
                    self._materialize_frontier, seeds, 0
                )
                frontier = seeds
                self.setup_breakdown["seed_snapshot"] = 0.0  # overlapped
            else:
                frontier = self._materialize_frontier(seeds, 0)
                self.setup_breakdown["seed_snapshot"] = round(
                    _time.time() - _t_snap, 2
                )
            seen = None
            self.round = 0
            self._base_round = 0
            self._delta_rounds = []
            self._tombstones = []
            self._injected_df = None

        frontier = self._merge_pending_seeds(frontier)

        # pre-loop setup cost (seed materialization / resume reads) —
        # serial-ish and round-count-independent, so the scaling
        # harness needs it split out of the per-round phase totals
        self.setup_secs = round(_time.time() - _t_run0, 2)

        # SPARK_GRAFT_PHASE_DEBUG=1: force an action after each select
        # sub-stage so t_select decomposes (eligible / rank-cut /
        # rejoin / parse / summary). Diagnostic only — the extra
        # actions re-walk cached data, so absolute times are slightly
        # inflated; never enable for official benchmark legs.
        _dbg = os.environ.get("SPARK_GRAFT_PHASE_DEBUG") == "1"

        rounds_done = 0
        while rounds_done < max_rounds:
            _t0 = _time.time()
            self._t_rank_done = None
            _dbg_t: dict[str, float] = {}
            _td = _t0
            # --- batch selection, fully distributed. The batch stays a
            # (persisted) DataFrame; the driver never sees frontier
            # rows — only bounded failure/lineage aggregates below.
            # pull_rank via a window over the already-LIMITed batch
            # (≤ batch_size rows, so the single-partition sort is
            # bounded by config, not by data).
            eligible = self._eligible(frontier, seen).persist()
            if _dbg:
                eligible.count()
                _dbg_t["eligible"] = round(_time.time() - _td, 2)
                _td = _time.time()
            ranked = self._with_pull_rank(self._select_batch(eligible))
            if _dbg:
                ranked = ranked.persist()
                ranked.count()
                _dbg_t["rank_cut"] = round(_time.time() - _td, 2)
                _td = _time.time()
            batch = self._rejoin_batch(eligible, ranked).persist()
            if _dbg:
                batch.count()
                _dbg_t["rejoin"] = round(_time.time() - _td, 2)
                _td = _time.time()

            # --- simulated fetch: join bounded batch into corpus.
            # Three tiers, all keeping the corpus (the 100 TB side,
            # with page bodies) OUT of any shuffle:
            #   1. batch ≤ fetch_broadcast_max: broadcast the full
            #      probe (~150 B/row) — one broadcast-hash join.
            #   2. batch ≤ keys_broadcast_max: broadcast only the join
            #      keys (~50 B/row) as a LEFT-SEMI filter on the corpus
            #      scan, then shuffle-join the ≤ batch-sized hits
            #      against the probe — the shuffle moves two bounded
            #      relations, never the corpus.
            #   3. beyond that: plain shuffle join (a driver-built
            #      broadcast of that size is itself a serial
            #      bottleneck; on a real cluster the bucketed corpus
            #      makes the join shuffle-free either way).
            # narrow probe: only the columns parse/children/items need
            # downstream — host/priority/reload/seq stay behind in the
            # (persisted) batch, shrinking the per-round broadcast
            probe = batch.select(
                "canon_url", "url_hash", "task", "rule", "temp", "depth",
                "pull_rank", F.col("url").alias("req_url"),
            )
            bsz = self.cfg.batch_size
            if bsz and 0 < bsz <= self.cfg.fetch_broadcast_max:
                hits = self.corpus.join(F.broadcast(probe), "canon_url", "inner")
            elif bsz and 0 < bsz <= self.cfg.keys_broadcast_max:
                # semi-filter key = the 16-byte md5 of the canonical
                # url (unhex of the batch's url_hash), not the
                # ~60 B canon_url string: the driver-built broadcast is
                # the round's serial floor (BASELINE.md), and binary
                # hashes cut its size ~4×. The corpus side derives the
                # same bytes in codegen (url_hash_expr — md5 equality
                # stands in for url equality exactly as it does for the
                # whole seen set)
                k16 = F.unhex(F.col("url_hash")).alias("_k16")
                fetched_pages = self.corpus.join(
                    F.broadcast(probe.select(k16)),
                    F.unhex(url_hash_expr(F.col("canon_url"))) == F.col("_k16"),
                    "semi",
                )
                hits = fetched_pages.join(probe, "canon_url", "inner")
            else:
                hits = self.corpus.join(probe, "canon_url", "inner")
            if not self.cfg.corpus_unique:
                # recaptured corpus: keep one capture per url (latest
                # warc_ts, ties by text — dedup_corpus's order) so
                # children/items/order are not emitted once per
                # capture. Window over the bounded batch hits only —
                # the corpus side still never shuffles.
                w_cap = Window.partitionBy("url_hash").orderBy(
                    F.col("warc_ts").desc(), F.col("text").asc()
                )
                hits = (
                    hits.withColumn("_rn", F.row_number().over(w_cap))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn")
                )
            if self._decode_html:
                # decode fetched bytes for rows the corpus didn't
                # pre-decode. The UDF input is masked to NULL when
                # `text` exists, so bytes cross into Python only for
                # rows that actually need transcoding; `html` is
                # dropped before parse/persist (body-width hygiene
                # below applies to it doubly)
                from crawler_spark.functions.decode import decode_html_udf

                hits = hits.withColumn(
                    "text",
                    F.coalesce(
                        F.col("text"),
                        decode_html_udf(
                            F.when(F.col("text").isNull(), F.col("html"))
                        ),
                    ),
                ).drop("html")
            # page bodies must NOT outlive the parse: `text` is the
            # dominant row width (KBs vs ~100 B of keys), and `parsed`
            # is persisted — caching bodies would hold round-sized
            # gigabytes of payload that nothing downstream reads
            # (children/items/summary consume only keys + the parse
            # struct). Project them away before the persist so the
            # cache is narrow and the Arrow batches carry bodies
            # exactly once, into the parse (JVM codegen for link-only
            # rules; Arrow UDF otherwise — see _parse_plan).
            parsed = self._parse_plan(hits).persist()
            if _dbg:
                parsed.count()
                _dbg_t["parse"] = round(_time.time() - _td, 2)
                _td = _time.time()

            # --- the ONE per-round collect: per-(task,host) scheduled
            # counts (termination + lineage) with the failure rows —
            # the only per-request rows the driver must see, bounded by
            # batch — folded into the same aggregation (collect_list
            # skips the nulls of fetched rows). One Spark job where
            # round 1 had two, cutting the serial per-round floor;
            # materializes the batch + parsed caches as a side effect.
            fail_struct = F.when(
                F.col("_fetched").isNull(),
                F.struct(
                    "url", "canon_url", "url_hash", "depth", "priority",
                    "rule", "reload", "temp", "seq", "pull_rank",
                ),
            )
            # distinct: a corpus carrying the same canon_url at two
            # warc_ts would otherwise duplicate batch rows through the
            # join and inflate `scheduled` (bounded set — cheap)
            self._jd("summary:fetch+parse")
            summary_pd = (
                batch.join(
                    parsed.select("url_hash").distinct()
                    .withColumn("_fetched", F.lit(True)),
                    "url_hash",
                    "left",
                )
                .groupBy("task", "host")
                .agg(
                    F.count("*").alias("scheduled"),
                    F.collect_list(fail_struct).alias("fails"),
                )
                .toPandas()
            )
            _t_select = _time.time()
            if _dbg:
                _dbg_t["summary"] = round(_t_select - _td, 2)
            fail_rows = [
                {
                    "task": r["task"],
                    "host": r["host"],
                    **(f if isinstance(f, dict) else f.asDict()),
                }
                for _, r in summary_pd.iterrows()
                for f in r["fails"]
            ]
            failures_pd = pd.DataFrame(
                fail_rows,
                columns=["task", "host", "url", "canon_url", "url_hash",
                         "depth", "priority", "rule", "reload", "temp",
                         "seq", "pull_rank"],
            )
            n_failed = len(failures_pd)
            retry_pd = failures_pd[failures_pd["reload"].astype(bool)].copy()
            hard_fail = failures_pd[~failures_pd["reload"].astype(bool)]
            retry_hashes = list(retry_pd["url_hash"])
            # original seqs of the retried rows — in base+delta mode
            # these rows stay in older files (consumed, yet un-marked
            # from seen by the reload path) and must join the
            # tombstone delete-set; captured before the re-push
            # overwrites seq below
            retry_orig_seqs = [int(s) for s in retry_pd["seq"]]
            sched_pd = summary_pd[["task", "host", "scheduled"]]
            _t_fetch = _time.time()
            n_batch = int(sched_pd["scheduled"].sum()) if len(sched_pd) else 0
            if n_batch == 0:
                eligible.unpersist()
                batch.unpersist()
                parsed.unpersist()
                if _dbg:
                    ranked.unpersist()
                if self._cand_cache is not None:
                    self._cand_cache.unpersist()
                    self._cand_cache = None
                if self._tagged_cache is not None:
                    self._tagged_cache.unpersist()
                    self._tagged_cache = None
                break
            if n_batch >= _RANK_CAP:
                # only reachable with batch_size=0/negative (all
                # eligible) — a sized batch was validated at __init__
                raise RuntimeError(
                    f"round {self.round + 1} selected {n_batch} rows, "
                    f"overflowing the seq pull_rank band ({_RANK_CAP}); "
                    "set a batch_size"
                )
            if self.round + 1 >= _ROUND_CAP:
                raise RuntimeError(
                    f"round counter reached the seq band cap ({_ROUND_CAP})"
                )
            self.round += 1
            rounds_done += 1
            rnd = self.round
            # first failure of a reload request: un-mark + re-push with
            # reload cleared and a fresh seq
            retry_pd["reload"] = False
            retry_pd["seq"] = (rnd << _ROUND_SHIFT) + (
                retry_pd["pull_rank"].astype("int64") * (1 << _RANK_SHIFT)
            )

            # --- seen delta: batch hashes minus same-round reload
            # un-marks (schedule.go:350-364). Hashes come to the driver
            # only when the bloom actually needs them; otherwise the
            # delta is a distributed parquet append.
            seen_delta = batch.select("url_hash")
            if retry_hashes:
                # left-anti against the (tiny, driver-resident) retry
                # frame instead of an isin literal — a million-row
                # batch would otherwise inline megabytes into the plan
                retry_h = self.spark.createDataFrame(
                    [(h,) for h in retry_hashes], "url_hash string"
                )
                seen_delta = seen_delta.join(
                    F.broadcast(retry_h), "url_hash", "left_anti"
                )
            n_delta = n_batch - len(retry_hashes)
            self._seen_count += n_delta
            fold_due = (
                self._sharded is not None
                and self._bloom_round is not None
                and rnd - self._folded_upto >= self.cfg.bloom_fold_every
            )

            def _seen_chain(seen_delta=seen_delta, rnd=rnd, fold_due=fold_due):
                # seen-ledger append, then fold the delta into the
                # engaged shard store every fold_every rounds; in
                # between, _eligible covers the unfolded rounds with an
                # exact broadcast anti-join. Returns next round's seen
                # relation (built after the write so the file listing
                # sees the new round).
                self._jd("seen-write")
                # sorted run: makes the round's file probe-able by the
                # sorted-seen row-group check (one in-task sort of
                # ≤ batch rows; plain unsorted append otherwise)
                self.io.write_round(
                    seen_delta,
                    "seen",
                    rnd,
                    n_files=1,
                    sort_within="url_hash" if self._use_sorted_probe() else None,
                )
                if fold_due:
                    self._fold_bloom(rnd, delta_df=seen_delta)
                self._maybe_compact_seen(rnd)
                return self._read_seen_upto(None)

            # these jobs depend only on the persisted batch — overlap
            # them with the order/items writes and the frontier
            # snapshot (joined below, before the caches unpersist)
            seen_fut = None
            if self.cfg.overlap_seen_write:
                seen_fut = self._bg_pool().submit(_seen_chain)
            else:
                seen = _seen_chain()
            _t_seen = _time.time()

            # order/items ledger writes: both read only the round's
            # persisted batch/parsed caches, so they overlap with the
            # frontier materialization below on a second driver thread
            # (VERDICT r4 next #1 — the serial per-round job train was
            # the engine-owned slice of the scaling floor); the future
            # joins before the caches unpersist. Outputs are identical
            # to the sequential mode (cfg.overlap_seen_write=False).
            def _ledger_chain(rnd=rnd):
                if record_order:
                    self._jd("order-write")
                    fetched_flag = parsed.select("url_hash").distinct().withColumn(
                        "fetched", F.lit(True)
                    )
                    order_df = (
                        batch.join(fetched_flag, "url_hash", "left")
                        .select(
                            "pull_rank", "seq", "task", "url", "canon_url",
                            "url_hash", "host", "depth", "priority", "rule",
                            F.coalesce("fetched", F.lit(False)).alias("fetched"),
                        )
                    )
                    self._ledger_write_df(order_df, "order", rnd)
                if self._any_items:
                    self._jd("items-write")
                    items_df = parsed.select(
                        "task", "rule", F.col("req_url").alias("url"),
                        "warc_ts", "pull_rank",
                        F.explode("parsed.items").alias("fields"),
                    )
                    self._ledger_write_df(items_df, "items", rnd)

            ledger_fut = None
            if self.cfg.overlap_seen_write and (record_order or self._any_items):
                ledger_fut = self._ledger_pool().submit(_ledger_chain)
            else:
                _ledger_chain()
            self._ledger_append(
                "failures",
                hard_fail[["task", "url", "canon_url", "url_hash", "host",
                           "depth", "rule"]],
                rnd,
            )
            # per-(task,host) lineage (north_rule: per-partition
            # lineage + metrics), assembled driver-side from the two
            # bounded collects — no extra Spark job
            lineage = sched_pd.set_index(["task", "host"])
            fail_counts = (
                failures_pd.groupby(["task", "host"]).size().rename("failed")
                if n_failed
                else None
            )
            lineage["failed"] = fail_counts if fail_counts is not None else 0
            lineage["failed"] = lineage["failed"].fillna(0).astype("int64")
            lineage["fetched"] = lineage["scheduled"] - lineage["failed"]
            self._ledger_append("lineage", lineage.reset_index(), rnd)

            _t_ledg = _time.time()

            # --- JOB 3: next frontier. Base rounds rewrite the full
            # compacted state (deferred ∪ children ∪ retries); delta
            # rounds (cfg.frontier_base_every > 1) append only the
            # round's NEW rows — O(children) written instead of
            # O(frontier) — and rely on the seen anti-join plus the
            # retry tombstones to exclude consumed rows, Iceberg-v2
            # merge-on-read style. Durable checkpoints force a base so
            # resume state stays one self-contained snapshot.
            if self._seed_fut is not None:
                # the overlapped round-0 snapshot must be on disk (and
                # its bookkeeping settled) before this round touches
                # the frontier table — base rewrite or delta-parts read
                self._seed_fut.result()
                self._seed_fut = None
            children = self._children(parsed)
            base_due = (
                self.cfg.frontier_base_every <= 1
                or rnd - self._base_round >= self.cfg.frontier_base_every
                or (
                    self.cfg.checkpoint_every > 0
                    and rnd % self.cfg.checkpoint_every == 0
                )
            )
            retry_df = (
                None
                if retry_pd.empty
                else self.spark.createDataFrame(
                    retry_pd[_FRONTIER_COLS], FRONTIER_SCHEMA
                )
            )
            # writer-side consumed-key exclusion, both modes: this
            # round's seen delta (batch hashes minus reload un-marks)
            # is permanently seen — a hash can only be un-marked by the
            # round that crawled it, and a seen hash is never eligible
            # again — so children/deferred dups carrying those hashes
            # are dead rows every later round would re-probe through
            # the bloom + anti-join. Dropping them at write is O(batch)
            # (broadcast anti-join) and shrinks a cyclic graph's
            # frontier parts ~30%. Retry rows re-enter AFTER the filter
            # (their hashes are exactly the un-marked ones).
            # 16-byte binary key (unhex of the hex md5): the consumed
            # broadcast is driver-built and round-serial — binary keys
            # halve its collect+build bytes (same rationale as the
            # fetch semi-key and rejoin keys); the big side derives
            # the same bytes in whole-stage codegen
            consumed_keys = seen_delta.select(F.unhex("url_hash").alias("_ck16"))
            if self.cfg.batch_size and 0 < self.cfg.batch_size <= self.cfg.keys_broadcast_max:
                consumed_keys = F.broadcast(consumed_keys)
            if base_due:
                # keys-tier guard (seq is 8 B/row): a batch bounded by
                # config broadcasts (the big eligible side never
                # shuffles); an unbounded/huge batch takes the shuffle
                # anti-join rather than forcing a giant single-threaded
                # driver broadcast
                batch_seqs = batch.select("seq")
                if self.cfg.batch_size and 0 < self.cfg.batch_size <= self.cfg.keys_broadcast_max:
                    batch_seqs = F.broadcast(batch_seqs)
                deferred = eligible.join(
                    batch_seqs, "seq", "left_anti"
                ).select(_FRONTIER_COLS)
                merged = deferred.unionByName(children)
                new_frontier = merged.join(
                    consumed_keys,
                    F.unhex(merged["url_hash"]) == consumed_keys["_ck16"],
                    "left_anti",
                ).select(_FRONTIER_COLS)
                if retry_df is not None:
                    new_frontier = new_frontier.unionByName(retry_df)
                frontier = self._materialize_frontier(new_frontier, rnd)
                self._drop_deltas()
                self._base_round = rnd
            else:
                # delta files are compacted like bases: the raw explode
                # carries ~out_degree× duplicate url_hashes, and every
                # later round until the next base would drag them
                # through eligibility (measured 3× select-phase cost at
                # bench shape). First-wins within the round's children
                # composes with the cross-part first-wins at selection
                # (min over blocks = global min), so reads see the same
                # winners as the uncompacted union.
                delta = children.select(_FRONTIER_COLS)
                if self.cfg.frontier_compact:
                    delta = self._compact_frontier(delta)
                delta = delta.join(
                    consumed_keys,
                    F.unhex(delta["url_hash"]) == consumed_keys["_ck16"],
                    "left_anti",
                ).select(_FRONTIER_COLS)
                if retry_df is not None:
                    delta = delta.unionByName(retry_df)
                self._jd("frontier-delta")
                self.io.write_round(
                    delta,
                    "frontier_delta",
                    rnd,
                    n_files=min(self.cfg.snapshot_writers, self.cfg.num_partitions),
                )
                self._delta_rounds.append(rnd)
                self._tombstones.extend(retry_orig_seqs)
                frontier = self._read_frontier_parts()
            if seen_fut is not None:
                # join the overlapped seen-write/fold chain before the
                # caches it reads (batch → seen_delta) unpersist
                seen = seen_fut.result()
            if ledger_fut is not None:
                # order/items writes read the same caches — join first
                ledger_fut.result()
            parsed.unpersist()
            eligible.unpersist()
            batch.unpersist()
            if _dbg:
                ranked.unpersist()
            if self._cand_cache is not None:
                self._cand_cache.unpersist()
                self._cand_cache = None
            if self._tagged_cache is not None:
                self._tagged_cache.unpersist()
                self._tagged_cache = None
            if self._seed_cache is not None:
                # single-round seed cache (overlapped round-0 snapshot):
                # the frontier relation is file-backed from here on
                self._seed_cache.unpersist()
                self._seed_cache = None
            if self._bloom_drop_pending is not None:
                self.io.drop_round("bloom", self._bloom_drop_pending)
                self._bloom_drop_pending = None
            for r in self._seen_runs_drop_pending:
                self.io.drop_round("seen_runs", r)
            self._seen_runs_drop_pending = []
            _t_end = _time.time()

            self.metrics.append(
                {
                    "round": rnd,
                    "batch": int(n_batch),
                    "fetched": int(n_batch - n_failed),
                    "failures": int(len(hard_fail)),
                    "retries": int(len(retry_pd)),
                    "t_select": round(_t_select - _t0, 2),
                    # distributed-rank path only: split of t_select at
                    # the last rank collect (histogram/refine — rank
                    # half vs fetch+parse+summary half; the offsets
                    # join + bucket window are lazy, so they land in
                    # the fetch half)
                    "t_sel_rank": (
                        round(self._t_rank_done - _t0, 2)
                        if self._t_rank_done is not None
                        else None
                    ),
                    "t_fetch_parse": round(_t_fetch - _t_select, 2),
                    "t_seen": round(_t_seen - _t_fetch, 2),
                    "t_ledgers": round(_t_ledg - _t_seen, 2),
                    "t_frontier": round(_t_end - _t_ledg, 2),
                    # JSON-encoded so the metrics parquet stays a flat
                    # string column; empty when debug mode is off
                    **({"dbg": json.dumps(_dbg_t)} if _dbg else {}),
                }
            )
            self._write_manifest()

        if self._seed_fut is not None:
            # loop exited before round 1 settled the overlapped seed
            # snapshot (empty first batch / max_rounds=0): the write
            # must land before anything reads the frontier table
            self._seed_fut.result()
            self._seed_fut = None
        if self._seed_cache is not None:
            self._seed_cache.unpersist()
            self._seed_cache = None
        if self._delta_rounds:
            # the run ended mid-delta-window: fold base ∪ deltas minus
            # the tombstone delete-set into one self-contained base at
            # the final round, so the external contract (one durable
            # frontier dir at `round`, resumable with an empty
            # delete-set) is identical to the full-rewrite mode
            f = self._read_frontier_parts()
            if self._tombstones:
                tomb = self.spark.createDataFrame(
                    [(int(s),) for s in self._tombstones], "seq long"
                )
                f = f.join(F.broadcast(tomb), "seq", "left_anti")
            frontier = self._materialize_frontier(
                f, self.round, force_snapshot=True
            )
            self._drop_deltas()
            self._base_round = self.round
            self._write_manifest()
        elif self._snapshot_round != self.round:
            # the last round's snapshot already exists on disk — just
            # promote it to durable (re-writing would overwrite the
            # path the DataFrame reads from)
            self._snapshot_round = self.round
            self._prev_frontier_round = None
            self._write_manifest()
        pd.DataFrame(self.metrics or [{"round": 0}]).to_parquet(
            self._p("metrics.parquet")
        )
        return {"rounds": self.round, "metrics": self.metrics, "workdir": self.workdir}

    # ---------------- result readers ----------------
    def _read_seen_upto(self, round_no: int | None) -> DataFrame | None:
        if not self.io.exists("seen"):
            return None
        df = self.io.read("seen")
        if round_no is not None:
            df = df.filter(F.col("round") <= round_no)
        return df

    def read_order(self) -> DataFrame:
        return self.io.read("order").orderBy("round", "pull_rank")

    def read_seen(self) -> DataFrame:
        df = self._read_seen_upto(None)
        if df is None:
            return self.spark.createDataFrame([], "url_hash string, round long")
        return df

    def read_items(self) -> DataFrame:
        if not self.io.exists("items"):
            return self.spark.createDataFrame(
                [],
                "task string, rule string, url string, fields string, round int",
            )
        return self.io.read("items")

    def read_failures(self) -> DataFrame:
        if not self.io.exists("failures"):
            return self.spark.createDataFrame(
                [], "task string, url string, url_hash string, round int"
            )
        return self.io.read("failures")

    def read_metrics(self) -> pd.DataFrame:
        return pd.read_parquet(self._p("metrics.parquet"))

    def read_lineage(self) -> DataFrame:
        return self.io.read("lineage")
