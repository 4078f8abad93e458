"""Iceberg-mode sorted seen probe (VERDICT r3 missing #1 / next #2).

No iceberg-spark-runtime jar exists in this sandbox (SURVEY §7 R1), so
the branch runs against a FILE-BACKED stand-in catalog: tables are
parquet directories laid out exactly like Iceberg partitions
(``round=<k>/band=<b>/``), ``<tbl>.files`` returns a real
(file_path, partition) metadata frame over the actual data files, and
the DataFrameWriterV2 surface (create/append/overwritePartitions) is
implemented over those directories. That makes the engine's iceberg
branch executable end-to-end: the sorted-run probe must SELECT its
path (no full-ledger anti-join fallback), list run files through the
``.files`` metadata table, read their row groups, and stay
oracle-exact — the parts a live catalog would exercise minus the
manifest format itself (covered by the loud-skip live test in
test_tableio.py when a jar is present).
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil

import pytest

from crawler_spark.config import EngineConfig
from crawler_spark.plans.frontier import FrontierEngine
from crawler_spark.sources.corpus import CORPUS_SCHEMA, build_corpus_pdf, generic_task
from crawler_spark.sources.tableio import TableIO

from tests.test_frontier import assert_equivalent, run_oracle


def _col_name(c) -> str:
    m = re.search(r"'([^']+)'", str(c))
    assert m, f"unsupported partition column {c}"
    return m.group(1)


class _Writer:
    def __init__(self, cat, df, tbl):
        self.cat, self.df, self.tbl = cat, df, tbl
        self.part_cols: list[str] = []

    def partitionedBy(self, *cols):
        self.part_cols = [_col_name(c) for c in cols]
        return self

    def _dir(self):
        return os.path.join(self.cat.root, self.tbl)

    def create(self):
        assert not os.path.exists(self._dir()), "create over existing table"
        os.makedirs(self._dir())
        with open(self._dir() + ".spec.json", "w") as f:
            # schema stored like a real catalog stores it: an EMPTY
            # table (or empty append) must still read with its schema
            json.dump(
                {"partition": self.part_cols, "schema": self.df.schema.json()},
                f,
            )
        self._write("append")

    def append(self):
        self._write("append")

    def overwritePartitions(self):
        spec = self.cat.spec(self.tbl)
        assert spec and spec[0] == "round"
        for r in self.df.select("round").distinct().collect():
            shutil.rmtree(
                os.path.join(self._dir(), f"round={r['round']}"),
                ignore_errors=True,
            )
        self._write("append")

    def _write(self, mode):
        spec = self.cat.spec(self.tbl)
        w = self.df.write.mode(mode)
        if spec:
            w = w.partitionBy(*spec)
        w.parquet(self._dir())


class _FileCatalog:
    """The SparkSession slice TableIO's iceberg branch touches, backed
    by partition-layout parquet directories + a ``.files`` metadata
    view over the real data files."""

    def __init__(self, spark, root):
        self._spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.catalog = self

    # -- catalog shim --
    def tableExists(self, tbl):
        return os.path.isdir(os.path.join(self.root, tbl))

    def _meta(self, tbl) -> dict:
        p = os.path.join(self.root, tbl) + ".spec.json"
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def spec(self, tbl) -> list[str]:
        return self._meta(tbl).get("partition", [])

    # -- session shim --
    def createDataFrame(self, *a, **kw):
        return self._spark.createDataFrame(*a, **kw)

    def table(self, name):
        if name.endswith(".files"):
            tbl = name[: -len(".files")]
            rows = []
            for p in glob.glob(
                os.path.join(self.root, tbl, "**", "*.parquet"), recursive=True
            ):
                part = {"round": None, "band": None}
                for seg in p.split(os.sep):
                    if "=" in seg:
                        k, v = seg.split("=", 1)
                        if k in part:
                            part[k] = int(v)
                # file URI, not a plain path: pins the probe's
                # normalization of iceberg-style paths
                rows.append((f"file://{p}", (part["round"], part["band"])))
            return self._spark.createDataFrame(
                rows or [(None, (None, None))],
                "file_path string, partition struct<round:int,band:int>",
            ).filter("file_path is not null")
        d = os.path.join(self.root, name)
        if not glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True):
            from pyspark.sql.types import StructType

            schema_json = self._meta(name).get("schema")
            assert schema_json, f"no files and no schema for {name}"
            return self._spark.createDataFrame(
                [], StructType.fromJson(json.loads(schema_json))
            )
        return self._spark.read.parquet(d)

    def sql(self, q):
        m = re.match(r"DELETE FROM (\S+) WHERE round (=|>) (\d+)", q)
        if m:
            tbl, op, k = m.group(1), m.group(2), int(m.group(3))
            for d in glob.glob(os.path.join(self.root, tbl, "round=*")):
                r = int(os.path.basename(d).split("=")[1])
                if (op == "=" and r == k) or (op == ">" and r > k):
                    shutil.rmtree(d, ignore_errors=True)
            return
        m = re.match(r"DROP TABLE IF EXISTS (\S+)", q)
        if m:
            shutil.rmtree(os.path.join(self.root, m.group(1)), ignore_errors=True)
            try:
                os.remove(os.path.join(self.root, m.group(1)) + ".spec.json")
            except OSError:
                pass
            return
        raise AssertionError(f"unexpected SQL: {q}")


@pytest.fixture()
def iceberg_io(spark, workdir, monkeypatch):
    cat = _FileCatalog(spark, os.path.join(workdir, "warehouse"))
    cls = type(spark.range(1))
    monkeypatch.setattr(
        cls, "writeTo", lambda df, tbl: _Writer(cat, df, tbl)
    )
    io = TableIO.__new__(TableIO)
    io.spark, io.root, io.catalog, io.mode = cat, workdir, "crawler", "iceberg"
    # route _tbl to the plain name (the fake keys tables by name)
    monkeypatch.setattr(TableIO, "_tbl", lambda self, name: name, raising=True)
    return io


def test_round_files_and_bands_via_files_metadata(spark, iceberg_io):
    import pandas as pd

    from crawler_spark.operators.seenstore import band_expr

    io = iceberg_io
    df = spark.createDataFrame(
        pd.DataFrame({"url_hash": [f"{i:032x}" for i in range(64)]})
    )
    io.write_round(df, "seen", 1, n_files=1, sort_within="url_hash")
    assert io.rounds("seen") == [1]
    assert io.run_bands("seen", 1) == []  # unbanded table: no band field
    files = io.round_files("seen", 1)
    assert files and all(f.startswith("file://") for f in files)

    banded = df.withColumn("band", band_expr("url_hash", 4))
    io.write_round(
        banded, "seen_runs", 2, n_files=4, sort_within="url_hash",
        partition_col="band",
    )
    bands = io.run_bands("seen_runs", 2)
    assert bands == sorted(
        {r["band"] for r in banded.select("band").distinct().collect()}
    )
    for b in bands:
        fs = io.round_files("seen_runs", 2, band=b)
        assert fs and all(f"band={b}/" in f for f in fs)


def test_engine_iceberg_mode_probe_selected_and_oracle_exact(
    spark, workdir, iceberg_io
):
    """The whole engine over the iceberg branch: engaged bloom + sorted
    probe + wave compaction, run files listed via ``.files`` — no
    parquet-mode fallback, outputs bit-identical to the spec."""
    pdf = build_corpus_pdf(
        seed=42, n_generic=60, n_hosts=5, out_degree=4,
        n_lists=2, books_per_list=3, n_topics=4,
    )
    tasks = [generic_task(max_depth=3)]
    corpus_df = spark.createDataFrame(pdf, CORPUS_SCHEMA)
    cfg = EngineConfig(
        batch_size=8, num_partitions=4, max_rounds=20, use_bloom=True,
        bloom_capacity=1 << 14, bloom_min_seen=0, bloom_shards=4,
        seen_compact_every=2, seen_bands=4, seen_compact_waves=2,
        checkpoint_every=0,
    )
    eng = FrontierEngine(spark, tasks, corpus_df, cfg, workdir=workdir)
    eng.io = iceberg_io  # swap the storage seam before any run() write
    assert eng.io.mode == "iceberg" and eng._use_sorted_probe()
    eng.run(max_rounds=20)
    oracle = run_oracle(tasks, pdf, batch_size=8, max_rounds=20)
    assert_equivalent(eng, oracle)
    # compaction went through the iceberg writer and the probe lists
    # its banded files through .files metadata
    assert eng._seen_run_state
    band_paths, shared = eng._seen_run_paths()
    assert band_paths and shared == []
    for b, paths in band_paths.items():
        assert paths and all(p.startswith("file://") for p in paths)
        run_ps = [p for p in paths if "/seen_runs/" in p]
        assert run_ps and all(f"band={b}/" in p for p in run_ps)
        # the rest are this band's loose ledger rounds (> its cover)
        assert all("/seen/" in p for p in paths if p not in run_ps)


def test_seen_run_paths_one_files_scan_per_table(spark, workdir, iceberg_io):
    """The probe's path listing must issue exactly ONE ``.files``
    metadata read per table per round (VERDICT r4 missing #2): real
    catalogs meter metadata traffic, and the old per-band filtered
    queries cost up to seen_bands+loose reads each round."""
    import pandas as pd

    from crawler_spark.operators.seenstore import band_expr

    io = iceberg_io
    df = spark.createDataFrame(
        # prefixes spread over the full 32-bit space so all 4 bands fill
        pd.DataFrame({"url_hash": [f"{i << 26:08x}" + "0" * 24 for i in range(64)]})
    )
    io.write_round(
        df.withColumn("band", band_expr("url_hash", 4)),
        "seen_runs", 2, n_files=4, sort_within="url_hash",
        partition_col="band",
    )
    io.write_round(df, "seen", 3, n_files=1, sort_within="url_hash")
    io.write_round(df, "seen", 4, n_files=1, sort_within="url_hash")

    cat = io.spark  # the _FileCatalog shim doubles as the session
    calls = []
    orig = type(cat).table

    def counting_table(self, name):
        if name.endswith(".files"):
            calls.append(name)
        return orig(self, name)

    type(cat).table = counting_table
    try:
        m = io.table_files("seen_runs")
        assert calls == ["seen_runs.files"]
        assert set(m) == {2} and set(m[2]) == {0, 1, 2, 3}
        calls.clear()
        m2 = io.table_files("seen")
        assert calls == ["seen.files"]
        assert set(m2) == {3, 4} and list(m2[3]) == [None]
    finally:
        type(cat).table = orig


def test_iceberg_banded_append_is_clustered(spark, workdir, iceberg_io):
    """ADVICE r4: a partitioned iceberg append must cluster rows by
    the partition spec first (real non-fanout writers reject — or
    fan out tiny files for — unclustered appends). Canary: writing
    hash-scattered input through the banded path produces ~n_files
    files, not (input partitions × bands)."""
    import glob
    import os

    import pandas as pd

    from crawler_spark.operators.seenstore import band_expr

    io = iceberg_io
    keys = [f"{(i * 2654435761) & 0xFFFFFFFF:08x}" + "0" * 24 for i in range(256)]
    df = (
        spark.createDataFrame(pd.DataFrame({"url_hash": keys}))
        .repartition(4)  # hash-scattered: every partition holds every band
        .withColumn("band", band_expr("url_hash", 4))
    )
    io.write_round(
        df, "seen_runs", 1, n_files=4, sort_within="url_hash",
        partition_col="band",
    )
    files = glob.glob(
        os.path.join(io.spark.root, "seen_runs", "**", "*.parquet"),
        recursive=True,
    )
    # clustered: each range task holds one band slice -> ~1 file/band;
    # unclustered would give up to 4 tasks x 4 bands = 16
    assert len(files) <= 6, files
    assert io.run_bands("seen_runs", 1) == [0, 1, 2, 3]
