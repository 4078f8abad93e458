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


# ------------------------------------------------------------------
# Iceberg-mode smoke coverage (VERDICT r2 #7): no iceberg-spark-runtime
# jar exists in this sandbox (SURVEY §7 R1), so the branch is driven
# against a Python stand-in catalog that implements the exact
# DataFrameWriterV2 / SQL surface TableIO touches (create / append /
# overwritePartitions / DELETE / DROP). When the jar IS present the
# live test below runs instead of skipping.
# ------------------------------------------------------------------


class _FakeWriterV2:
    def __init__(self, store, df, tbl):
        self._store, self._df, self._tbl = store, df, tbl

    def partitionedBy(self, *cols):
        return self

    def create(self):
        assert self._tbl not in self._store, "create over existing table"
        self._store[self._tbl] = self._df

    def append(self):
        self._store[self._tbl] = self._store[self._tbl].unionByName(self._df)

    def overwritePartitions(self):
        from pyspark.sql import functions as F

        old = self._store[self._tbl]
        rounds = [r["round"] for r in self._df.select("round").distinct().collect()]
        kept = old.filter(~F.col("round").isin(rounds))
        self._store[self._tbl] = kept.unionByName(self._df)


class _FakeCatalog:
    def __init__(self, store):
        self._store = store

    def tableExists(self, tbl):
        return tbl in self._store


class _FakeIcebergSession:
    """The slice of SparkSession TableIO's iceberg branch touches,
    backed by an in-memory {table: DataFrame} store."""

    def __init__(self, spark):
        self._spark = spark
        self.store = {}
        self.catalog = _FakeCatalog(self.store)
        self.sqls = []

    def createDataFrame(self, *a, **kw):
        return self._spark.createDataFrame(*a, **kw)

    def table(self, tbl):
        return self.store[tbl]

    def sql(self, q):
        import re as _re

        from pyspark.sql import functions as F

        self.sqls.append(q)
        m = _re.match(r"DELETE FROM (\S+) WHERE round (=|>) (\d+)", q)
        if m:
            tbl, op, k = m.group(1), m.group(2), int(m.group(3))
            if tbl in self.store:
                cond = (
                    F.col("round") != k if op == "=" else ~(F.col("round") > k)
                )
                self.store[tbl] = self.store[tbl].filter(cond)
            return
        m = _re.match(r"DROP TABLE IF EXISTS (\S+)", q)
        if m:
            self.store.pop(m.group(1), None)
            return
        raise AssertionError(f"unexpected SQL in iceberg branch: {q}")


def _patched_writeTo(monkeypatch, fake, spark):
    # patch the CONCRETE DataFrame class (pyspark 4 puts the classic
    # implementation behind the pyspark.sql.DataFrame ABC)
    cls = type(spark.range(1))
    monkeypatch.setattr(
        cls, "writeTo", lambda df, tbl: _FakeWriterV2(fake.store, df, tbl)
    )


def test_iceberg_branch_smoke_with_stub_catalog(spark, workdir, monkeypatch):
    import pandas as pd

    fake = _FakeIcebergSession(spark)
    _patched_writeTo(monkeypatch, fake, spark)
    io = TableIO.__new__(TableIO)
    io.spark, io.root, io.catalog, io.mode = fake, workdir, "crawler", "iceberg"

    df1 = spark.createDataFrame(pd.DataFrame({"url_hash": ["a", "b"]}))
    df2 = spark.createDataFrame(pd.DataFrame({"url_hash": ["c"]}))
    io.write_round(df1, "seen", 1, n_files=1)          # create
    io.write_round(df2, "seen", 2, sort_within="url_hash")  # append + sort
    assert io.exists("seen") and io.rounds("seen") == [1, 2]
    assert io.read_round("seen", 2).columns == ["url_hash"]
    assert {r.url_hash for r in io.read_round("seen", 2).collect()} == {"c"}
    assert io.read("seen").count() == 3

    # snapshot semantics: overwritePartitions replaces the round
    io.overwrite_round(df1, "frontier", 5)
    io.overwrite_round(df2, "frontier", 5)
    assert {r.url_hash for r in io.read_round("frontier", 5).collect()} == {"c"}

    # lifecycle: DELETE-by-round, truncate-after, drop
    io.drop_round("seen", 1)
    assert io.rounds("seen") == [2]
    io.write_round(df1, "seen", 3)
    io.drop_after("seen", 2)
    assert io.rounds("seen") == [2]
    io.drop_table("seen")
    assert not io.exists("seen")
    # bounded pandas append goes through the same session write
    io.write_round_pandas(pd.DataFrame({"x": [1]}), "lineage", 1)
    assert io.rounds("lineage") == [1]
    assert any("DELETE FROM" in q for q in fake.sqls)


def test_iceberg_branch_live_roundtrip(spark, workdir):
    """Runs only with iceberg-spark-runtime on the classpath — the
    sandbox skips LOUDLY (SURVEY §7 R1); CI with the jar exercises the
    real catalog."""
    import pytest

    from crawler_spark.sources.tableio import iceberg_available

    if not iceberg_available(spark):
        pytest.skip(
            "iceberg-spark-runtime jar not on classpath (sandbox SURVEY §7 "
            "R1) — iceberg branch covered by the stub-catalog smoke test"
        )
    io = TableIO(spark, workdir, mode="iceberg")
    df = spark.range(3).withColumnRenamed("id", "url_hash")
    io.write_round(df, "seen", 1, n_files=1)
    assert io.rounds("seen") == [1]
    io.drop_table("seen")
