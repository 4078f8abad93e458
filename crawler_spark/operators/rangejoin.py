"""Range join — point-in-interval matching, the non-equi join Spark
lacks as a first-class operator (DuckDB plans an IEJoin for it).

The training-pipeline shape: "every event that falls inside any of
these time windows" (incident windows, promo windows, capture
windows). Two physical strategies, same semantics:

1. ``point_in_interval_join`` — broadcast nested-loop on the raw
   BETWEEN predicate. Correct for any interval set; right choice when
   the interval side is small (it broadcasts, the big side never
   shuffles). This is also the plan Spark itself picks for a non-equi
   join with a broadcastable side.

2. ``point_in_interval_join_bucketed`` — the 100 TB path when the
   interval side is too large to broadcast. Both sides are mapped to a
   fixed time grain: each interval explodes to the grains it overlaps,
   each point owns exactly one grain, and the join becomes an
   EQUI-join on the grain (hash shuffle, AQE-skew-splittable), with
   the exact BETWEEN predicate re-applied as a post-filter. A point's
   grain is unique, so a (point, interval) pair can match on at most
   one grain — no dedup pass is needed. Explosion factor is bounded by
   interval_span / grain, a knob the caller sizes so the exploded
   interval relation stays O(intervals × spans/grain), never
   O(points × intervals).

Bounds are inclusive on both ends ([start, end]), matching SQL
BETWEEN so DuckDB twins are literal.

Timestamps: parquet naive timestamps load as TIMESTAMP_NTZ, which
``unix_micros`` rejects; the session timezone is pinned to UTC
(session.py), so casting to TIMESTAMP is value-preserving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _us(col):
    return F.unix_micros(F.col(col).cast("timestamp"))


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
) -> DataFrame:
    """Inner join: every (point, interval) pair with
    ``start <= point_ts <= end``. Interval side is broadcast — use
    only when it is dimension-sized."""
    cond = (points[point_ts] >= intervals[start]) & (
        points[point_ts] <= intervals[end]
    )
    return points.join(F.broadcast(intervals), cond, "inner")


def point_in_interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    grain_minutes: int = 60,
) -> DataFrame:
    """Same result as :func:`point_in_interval_join`, built as an
    equi-join on a time grain so the interval side may be arbitrarily
    large (one hash shuffle each side, no broadcast, no nested loop).
    """
    grain_us = int(grain_minutes) * 60 * 1_000_000
    iv = intervals.withColumn(
        "_grain",
        F.explode(
            F.sequence(
                F.floor(_us(start) / grain_us),
                F.floor(_us(end) / grain_us),
            )
        ),
    )
    pt = points.withColumn("_grain", F.floor(_us(point_ts) / grain_us))
    joined = pt.join(iv, "_grain", "inner").filter(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) <= F.col(end))
    )
    return joined.drop("_grain")
