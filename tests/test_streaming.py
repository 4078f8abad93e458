"""Structured Streaming frontier ingest: watermarked dedup + windowed
per-host counts, drained with Trigger.AvailableNow."""

import os

import pandas as pd


def _write_batch(input_dir: str, name: str, rows: list[tuple]):
    os.makedirs(input_dir, exist_ok=True)
    pdf = pd.DataFrame(
        rows, columns=["url", "discovered_at", "priority", "rule"]
    )
    pdf["discovered_at"] = pd.to_datetime(pdf["discovered_at"])
    pdf["priority"] = pdf["priority"].astype("int32")
    pdf.to_parquet(
        os.path.join(input_dir, f"{name}.parquet"),
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )


def test_streaming_dedup_available_now(spark, tmp_path):
    from crawler_spark.streaming.continuous import run_available_now

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        input_dir,
        "b0",
        [
            ("https://A.com/x#f", "2024-01-01 00:00:00", 0, "link"),
            ("https://a.com/x", "2024-01-01 00:00:10", 0, "link"),  # dup of ^ (canon)
            ("https://b.com/y", "2024-01-01 00:00:20", 1, "link"),
        ],
    )
    run_available_now(spark, input_dir, out_dir, ckpt)
    out = spark.read.parquet(out_dir).collect()
    # canonical dedup folded the first two into one
    assert len(out) == 2
    assert {r.canon_url for r in out} == {"https://a.com/x", "https://b.com/y"}

    # incremental: a later file with one dup + one new url
    _write_batch(
        input_dir,
        "b1",
        [
            ("https://b.com/y", "2024-01-01 00:01:00", 0, "link"),  # dup within wm
            ("https://c.com/z", "2024-01-01 00:01:30", 0, "link"),
        ],
    )
    run_available_now(spark, input_dir, out_dir, ckpt)
    out2 = spark.read.parquet(out_dir).collect()
    assert {r.canon_url for r in out2} == {
        "https://a.com/x", "https://b.com/y", "https://c.com/z",
    }
    assert len(out2) == 3


def test_streaming_politeness_gate(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-host
    admission control — budget_count per budget_window_s of EVENT
    time, state carried across triggers."""
    from crawler_spark.streaming.continuous import (
        discovered_stream,
        politeness_gate,
    )

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        input_dir,
        "b0",
        [
            # host a: 3 requests in window [00:00, 00:30) — budget 2
            ("https://a.com/1", "2024-01-01 00:00:01", 0, "link"),
            ("https://a.com/2", "2024-01-01 00:00:05", 0, "link"),
            ("https://a.com/3", "2024-01-01 00:00:10", 0, "link"),  # dropped
            # next window admits again
            ("https://a.com/4", "2024-01-01 00:00:31", 0, "link"),
            # host b: under budget
            ("https://b.com/1", "2024-01-01 00:00:02", 0, "link"),
        ],
    )

    def drain():
        q = (
            politeness_gate(
                discovered_stream(spark, input_dir),
                budget_count=2,
                budget_window_s=30,
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    got = sorted(r.url for r in spark.read.parquet(out_dir).collect())
    assert got == [
        "https://a.com/1", "https://a.com/2", "https://a.com/4",
        "https://b.com/1",
    ]

    # state persists across triggers: same window as /4 — only one
    # more admission fits (budget 2, /4 already used 1)
    _write_batch(
        input_dir,
        "b1",
        [
            ("https://a.com/5", "2024-01-01 00:00:35", 0, "link"),
            ("https://a.com/6", "2024-01-01 00:00:40", 0, "link"),  # dropped
        ],
    )
    drain()
    got2 = sorted(r.url for r in spark.read.parquet(out_dir).collect())
    assert got2 == [
        "https://a.com/1", "https://a.com/2", "https://a.com/4",
        "https://a.com/5", "https://b.com/1",
    ]

    # a late event (earlier window, within watermark) must neither be
    # admitted into its closed window nor reset the current window's
    # used count (which would over-admit the rows after it)
    _write_batch(
        input_dir,
        "b2",
        [
            ("https://a.com/7", "2024-01-01 00:00:03", 0, "link"),  # late→drop
            ("https://a.com/8", "2024-01-01 00:00:50", 0, "link"),  # window full
        ],
    )
    drain()
    got3 = sorted(r.url for r in spark.read.parquet(out_dir).collect())
    assert got3 == got2  # nothing new admitted


def test_streaming_host_window_counts(spark, tmp_path):
    from crawler_spark.streaming.continuous import (
        discovered_stream,
        host_window_counts,
    )

    input_dir = str(tmp_path / "in")
    _write_batch(
        input_dir,
        "b0",
        [
            ("https://a.com/1", "2024-01-01 00:00:05", 0, "link"),
            ("https://a.com/2", "2024-01-01 00:00:25", 0, "link"),
            ("https://a.com/3", "2024-01-01 00:01:05", 0, "link"),
            ("https://b.com/1", "2024-01-01 00:00:45", 0, "link"),
        ],
    )
    counts = host_window_counts(discovered_stream(spark, input_dir))
    q = (
        counts.writeStream.format("memory")
        .queryName("host_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (str(r.window_start), r.host): r.n_discovered
        for r in spark.sql("SELECT * FROM host_counts").collect()
    }
    assert rows[("2024-01-01 00:00:00", "a.com")] == 2
    assert rows[("2024-01-01 00:01:00", "a.com")] == 1
    assert rows[("2024-01-01 00:00:00", "b.com")] == 1
