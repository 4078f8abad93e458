"""TableIO seam: parquet fallback semantics + Iceberg wiring.

The sandbox has no iceberg-spark-runtime jar (SURVEY §7 R1), so the
Iceberg branch can't execute here; these tests pin (a) auto-detection
correctly picks parquet in this environment, (b) the parquet mode's
round-table semantics the engine depends on (append/overwrite/read/
prune/truncate/drop), and (c) the layout stays byte-compatible with
the engine's pre-TableIO on-disk format (round=<k> partition dirs),
so old checkpoints resume across the refactor.
"""

import os

import pytest

from crawler_spark.sources.tableio import TableIO, iceberg_available


def test_auto_detect_falls_back_to_parquet(spark, workdir):
    assert iceberg_available(spark) is False  # sandbox: no jar
    io = TableIO(spark, workdir)
    assert io.mode == "parquet"


def test_unknown_mode_rejected(spark, workdir):
    with pytest.raises(ValueError):
        TableIO(spark, workdir, mode="delta")


def test_round_ledger_roundtrip(spark, workdir):
    io = TableIO(spark, workdir, mode="parquet")
    assert not io.exists("seen")
    io.write_round(spark.range(3).selectExpr("cast(id as string) h"),
                   "seen", 1, n_files=1)
    io.write_round(spark.range(3, 5).selectExpr("cast(id as string) h"),
                   "seen", 2, n_files=1)
    assert io.exists("seen")
    assert io.rounds("seen") == [1, 2]
    # whole-table read recovers `round` as a column; per-round read
    # prunes to that round's rows
    all_rows = io.read("seen")
    assert all_rows.count() == 5
    assert {r["round"] for r in all_rows.select("round").distinct().collect()} == {1, 2}
    assert io.read_round("seen", 2).count() == 2


def test_overwrite_and_drop_lifecycle(spark, workdir):
    io = TableIO(spark, workdir, mode="parquet")
    io.overwrite_round(spark.range(10), "frontier", 0)
    io.overwrite_round(spark.range(4), "frontier", 1)
    assert io.rounds("frontier") == [0, 1]
    io.drop_round("frontier", 0)
    assert io.rounds("frontier") == [1]
    assert io.read_round("frontier", 1).count() == 4
    io.drop_table("frontier")
    assert not io.exists("frontier")


def test_drop_after_truncates_future_rounds(spark, workdir):
    io = TableIO(spark, workdir, mode="parquet")
    for rnd in (1, 2, 3, 4):
        io.write_round(spark.range(1), "order", rnd, n_files=1)
    io.drop_after("order", 2)
    assert io.rounds("order") == [1, 2]


def test_pandas_append_matches_spark_layout(spark, workdir):
    """Driver-side bounded appends land in the same round=<k> layout
    Spark reads back with `round` as a partition column."""
    import pandas as pd

    io = TableIO(spark, workdir, mode="parquet")
    io.write_round_pandas(
        pd.DataFrame({"task": ["t"], "failed": [1]}), "lineage", 3
    )
    io.write_round_pandas(pd.DataFrame(), "lineage", 4)  # empty = no-op
    assert io.rounds("lineage") == [3]
    got = io.read("lineage").collect()
    assert len(got) == 1 and got[0]["round"] == 3


def test_layout_matches_pre_refactor_engine_format(spark, workdir):
    """The engine's resume path must read checkpoints written before
    the TableIO refactor: plain `<name>/round=<k>/part*.parquet`."""
    legacy = os.path.join(workdir, "seen", "round=7")
    os.makedirs(legacy)
    import pandas as pd

    pd.DataFrame({"url_hash": ["abc"]}).to_parquet(
        os.path.join(legacy, "part-0.parquet"), index=False
    )
    io = TableIO(spark, workdir, mode="parquet")
    assert io.rounds("seen") == [7]
    assert io.read("seen").collect()[0]["round"] == 7
