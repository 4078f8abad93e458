"""As-of join — "latest capture at or before t" semantics.

A web-scale corpus is recaptured over time (the engine's
``corpus_unique=False`` mode, input_hint ``warc_ts``): consumers ask
"which snapshot of this page was live at time t?". That is an as-of
join: for each left row, the single latest right row with
``right_ts <= left_ts`` on the same key.

Spark has no ASOF JOIN operator (DuckDB/Pandas do). The scale-safe
plan is the union-and-window formulation:

  1. tag right rows side=0, left rows side=1, union them;
  2. one shuffle on the key, window ordered by (ts, side);
  3. ``last(value, ignorenulls=True)`` carries the most recent right
     attributes forward onto each left row;
  4. keep side=1.

ONE shuffle total, no range-explosion, no per-key driver loop — the
same cost as a regular sort-merge join, and skew behaves like any
window (AQE handles stragglers). Ties at equal ts resolve
right-before-left, i.e. a capture stamped exactly t is visible at t
(<=, matching DuckDB ASOF semantics).

The right side must be unique per (key, ts) for a deterministic
answer; callers pre-aggregate (queries.py dedups by max). By default
the operator asserts nothing, mirroring DuckDB which picks an
arbitrary row on ties; pass ``check_unique=True`` (debug mode — one
extra aggregation job over the right side) to fail fast on duplicate
(key, ts) pairs instead of silently returning one of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    carry: list[str],
    check_unique: bool = False,
) -> DataFrame:
    """For each left row, append the ``carry`` columns of the latest
    right row with ``right[right_ts] <= left[left_ts]`` on ``key``
    (null when no right row precedes it).

    Output: all left columns + carry columns.
    """
    if check_unique:
        dup = (
            right.groupBy(key, right_ts)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            r = dup[0]
            raise ValueError(
                "asof_join right side is not unique per "
                f"({key}, {right_ts}): e.g. {r[key]!r} @ {r[right_ts]!r} "
                f"appears {r['count']} times — pre-aggregate the right "
                "side (keep the wanted row per key+ts) before joining"
            )
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in carry],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        *carry,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r_tag.unionByName(l_tag)
    for c in carry:
        u = u.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns], *carry
    )
