"""sessionize/session_rollup (operators/sessions.py): semantic
invariants beyond the DuckDB hash-twin — gap law (no intra-session gap
exceeds the timeout, every session break does), boundary inclusivity,
and numbering contiguity.
"""

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from crawler_spark.operators.sessions import session_rollup, sessionize

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s), u, float(v))
         for i, (u, s, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, value double",
    )


def test_gap_law_on_real_events(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    gap = 30
    s = sessionize(events, gap_minutes=gap)
    nxt = F.lead(F.unix_micros(F.col("ts").cast("timestamp"))).over(
        Window.partitionBy("user_id", "session_no").orderBy(
            F.col("ts").asc(), F.col("event_id").asc()
        )
    )
    # within a session, no consecutive gap exceeds the timeout
    bad = (
        s.withColumn("next_us", nxt)
        .filter(
            F.col("next_us").isNotNull()
            & (
                (F.col("next_us") - F.unix_micros(F.col("ts").cast("timestamp")))
                > gap * 60_000_000
            )
        )
        .count()
    )
    assert bad == 0


def test_boundary_exact_gap_continues_session(spark):
    # 30 min exactly => same session (strict >); 30 min + 1 us => new
    ev = _ev(spark, [(1, 0, 1.0), (1, 1800, 1.0)])
    assert (
        sessionize(ev, gap_minutes=30).select("session_no").distinct().count()
        == 1
    )
    ev2 = spark.createDataFrame(
        [
            (0, T0, 1, 1.0),
            (1, T0 + dt.timedelta(seconds=1800, microseconds=1), 1, 1.0),
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    assert (
        sessionize(ev2, gap_minutes=30).select("session_no").distinct().count()
        == 2
    )


def test_numbering_contiguous_and_rollup_counts(spark):
    # user 1: 3 sessions (0s, 1h, 3h); user 2: 1 session
    ev = _ev(
        spark,
        [(1, 0, 1.0), (1, 10, 2.0), (1, 3600, 3.0), (1, 10800, 4.0),
         (2, 0, 5.0), (2, 100, 6.0)],
    )
    roll = session_rollup(ev, gap_minutes=30).collect()
    by_user = {}
    for r in roll:
        by_user.setdefault(r.user_id, []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r.session_no)
    assert [r.session_no for r in u1] == [1, 2, 3]
    assert [r.n_events for r in u1] == [2, 1, 1]
    assert u1[0].total_value == pytest.approx(3.0)
    assert [r.session_no for r in by_user[2]] == [1]
    assert by_user[2][0].n_events == 2
