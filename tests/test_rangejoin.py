"""Range join (operators/rangejoin.py): the bucketed equi-join
formulation must be row-identical to the broadcast BETWEEN join, at
grain sizes that force multi-grain interval spans; bounds inclusive on
both ends.
"""

import datetime as dt

from pyspark.sql import functions as F

from crawler_spark.operators.rangejoin import (
    point_in_interval_join,
    point_in_interval_join_bucketed,
)

T0 = dt.datetime(2024, 1, 1)


def _pts(spark, secs):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(seconds=s)) for i, s in enumerate(secs)],
        "pid long, ts timestamp",
    )


def _ivs(spark, spans):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=a), T0 + dt.timedelta(seconds=b))
            for i, (a, b) in enumerate(spans)
        ],
        "iid long, w_start timestamp, w_end timestamp",
    )


def _pairs(df):
    return sorted((r.pid, r.iid) for r in df.select("pid", "iid").collect())


def test_boundary_inclusive_both_ends(spark):
    pts = _pts(spark, [0, 100, 200, 201])
    ivs = _ivs(spark, [(100, 200)])
    want = [(1, 0), (2, 0)]
    assert _pairs(point_in_interval_join(pts, ivs, "ts", "w_start", "w_end")) == want
    assert (
        _pairs(
            point_in_interval_join_bucketed(
                pts, ivs, "ts", "w_start", "w_end", grain_minutes=1
            )
        )
        == want
    )


def test_multi_grain_span_no_duplicates(spark):
    # one interval spanning 50 grains: each matching point appears once
    pts = _pts(spark, list(range(0, 3000, 100)))
    ivs = _ivs(spark, [(250, 2750)])
    got = _pairs(
        point_in_interval_join_bucketed(
            pts, ivs, "ts", "w_start", "w_end", grain_minutes=1
        )
    )
    assert got == _pairs(
        point_in_interval_join(pts, ivs, "ts", "w_start", "w_end")
    )
    assert len(got) == len(set(got))


def test_bucketed_matches_broadcast_on_real_events(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    hot = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.min("ts").alias("w_start"))
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(5)
        .select(
            F.col("user_id").alias("hot_user"),
            "w_start",
            F.expr("w_start + INTERVAL 3 HOURS").alias("w_end"),
        )
    )
    cols = ["event_id", "hot_user"]
    a = point_in_interval_join(events, hot, "ts", "w_start", "w_end").select(
        *cols
    )
    b = point_in_interval_join_bucketed(
        events, hot, "ts", "w_start", "w_end", grain_minutes=45
    ).select(*cols)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
