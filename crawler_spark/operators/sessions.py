"""Event sessionization — gap-timeout sessions over a click/event log.

The training-data pipeline shape for web interaction logs (and the
crawl analogue of politeness windows): per user, order events by time
and start a new session whenever the gap to the previous event exceeds
a timeout. One shuffle on the key; both the lag and the running sum
ride the same window partitioning, so Catalyst plans a single
Exchange + Sort and two WindowExec passes over sorted runs — no
per-row Python, no driver state.

Determinism across engines: the gap test uses integer microsecond
arithmetic (``unix_micros`` / DuckDB ``epoch_us``), never float
seconds, and ties on ``ts`` are broken by the id column, so the
session numbering is bit-stable between Spark and the DuckDB twin.

At 10^10 events the plan is unchanged: hash-partition by user (skew =
one hot user's events in one partition — bounded by per-user activity,
not corpus size), sorted-run windows, then the rollup reuses the same
partitioning (no second shuffle for the groupBy on (user, session)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Append a per-key ``session_no`` (1-based) to each event row.

    A new session starts at the first event of a key and whenever
    ``ts - prev_ts > gap_minutes`` (strict; an event exactly on the
    boundary continues the session).
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(order_id).asc())
    # parquet naive timestamps load as TIMESTAMP_NTZ, which unix_micros
    # rejects; the session timezone is pinned to UTC (session.py) so the
    # cast to TIMESTAMP is value-preserving.
    ts_us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    new_s = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > F.lit(gap_us)),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(
        "session_no", F.sum(new_s).over(running).cast("long")
    )


def session_rollup(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    gap_minutes: int = 30,
    value: str = "value",
) -> DataFrame:
    """Per-session aggregate: bounds, event count, 6-dp value total."""
    s = sessionize(events, key, ts, order_id, gap_minutes)
    return s.groupBy(key, "session_no").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum(value), 6).alias("total_value"),
    )


def session_rollup_sql(gap_minutes: int = 30) -> str:
    """DuckDB twin over the pre-registered ``events`` view."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    return f"""
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), f AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > {gap_us}
                     THEN 1 ELSE 0 END AS new_s
      FROM o
    ), s AS (
      SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS session_no
      FROM f
    )
    SELECT user_id, session_no,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, round(sum(value), 6) AS total_value
    FROM s GROUP BY user_id, session_no
    """
