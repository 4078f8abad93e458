"""Continuous-mode frontier ingest via Structured Streaming.

The reference's scheduler loop is an unbounded channel consumer with
no event-time/watermark notion (engine/schedule.go:177-206) — its
batch analogue (plans/frontier.py) is what ordering parity is defined
against. This module is the streaming face of the same dataflow for
deployments where discovered URLs arrive continuously:

    readStream(parquet dir of discovered requests)
      → canonicalize + hash (same identity as the batch engine)
      → watermark on discovery time
      → streaming dedup on url_hash within the watermark
        (dropDuplicatesWithinWatermark — the URL-seen set with state
        TTL; exact global dedup stays in the batch engine's seen table)
      → per-(host, window) arrival counts (politeness telemetry)
      → foreachBatch parquet append

State stays bounded by the watermark TTL — at 10^10-URL scale the
streaming layer only pre-dedups the recent horizon; the authoritative
seen-set check happens in the batch rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from crawler_spark.functions.urlnorm import url_hash_expr, with_canon_host

DISCOVERED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("discovered_at", TimestampType()),
        StructField("priority", IntegerType()),
        StructField("rule", StringType()),
    ]
)


def discovered_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return with_canon_host(
        spark.readStream.schema(DISCOVERED_SCHEMA).parquet(input_dir)
    ).withColumn("url_hash", url_hash_expr(F.col("canon_url")))


def deduped_requests(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming URL-seen within the watermark horizon."""
    return (
        stream.withWatermark("discovered_at", watermark)
        .dropDuplicatesWithinWatermark(["url_hash"])
    )


def host_window_counts(
    stream: DataFrame, watermark: str = "10 minutes", window: str = "1 minute"
) -> DataFrame:
    """Per-host tumbling-window arrival counts (politeness telemetry)."""
    return (
        stream.withWatermark("discovered_at", watermark)
        .groupBy(F.window("discovered_at", window).alias("w"), F.col("host"))
        .agg(F.count("*").alias("n_discovered"))
        .select(
            F.col("w.start").alias("window_start"),
            "host",
            "n_discovered",
        )
    )


GATE_OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("canon_url", StringType()),
        StructField("url_hash", StringType()),
        StructField("priority", IntegerType()),
        StructField("rule", StringType()),
        StructField("discovered_at", TimestampType()),
    ]
)

GATE_STATE_SCHEMA = StructType(
    [
        StructField("window_id", StringType()),  # int64-as-str (py4j-safe)
        StructField("used", IntegerType()),
    ]
)


def politeness_gate(
    stream: DataFrame,
    budget_count: int,
    budget_window_s: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator: per-host politeness admission control.

    The streaming analogue of the reference's rate limiter
    (limiter.go: LimitConfig{EventCount, EventDur} token window; same
    discretization as the batch engine's host_budget) as an
    applyInPandasWithState operator: state per host = (current
    event-time window id, admissions used). A request is admitted
    while used < budget_count within its discovery-time window;
    excess requests in the window are dropped (the batch engine's
    deferred-requeue is the durable path — streaming admission is the
    fast path, like the Go limiter's Wait on the live channel).

    Rows are processed in event-time order inside each (host, batch)
    group so admission is deterministic under Trigger.AvailableNow;
    state is bounded: two fields per live host, no growth with
    history. At 10^10-URL scale the groupBy(host) state store shards
    across executors like any keyed state.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def gate(key, pdfs, state):
        import pandas as pd

        (host,) = key
        if state.exists:
            win_id_s, used = state.get
            win_id = int(win_id_s)
        else:
            win_id, used = -1, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("discovered_at", kind="mergesort")
        keep = []
        for i, ts in enumerate(rows["discovered_at"]):
            w = int(pd.Timestamp(ts).timestamp()) // budget_window_s
            if w > win_id:
                win_id, used = w, 0
            elif w < win_id:
                # late event into an already-advanced window (within
                # the watermark): its window's budget ledger is gone —
                # admitting would risk exceeding budget_count for that
                # window, so the gate drops it. Never reset `used`
                # here: a late row must not re-open the current
                # window's budget (that would over-admit 2×).
                continue
            if used < budget_count:
                used += 1
                keep.append(i)
        state.update((str(win_id), used))
        out = rows.iloc[keep][
            ["host", "url", "canon_url", "url_hash", "priority", "rule",
             "discovered_at"]
        ]
        yield out

    return (
        stream.withWatermark("discovered_at", watermark)
        .groupBy("host")
        .applyInPandasWithState(
            gate,
            GATE_OUTPUT_SCHEMA,
            GATE_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
) -> None:
    """Drain everything currently in input_dir (Trigger.AvailableNow)
    through dedup into a parquet sink, then stop."""
    q = (
        deduped_requests(discovered_stream(spark, input_dir), watermark)
        .select("url", "canon_url", "host", "url_hash", "priority", "rule",
                "discovered_at")
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
