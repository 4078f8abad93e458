"""spark-submit --py-files boot path (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

The package is zipped, the repo is NOT on PYTHONPATH, and the driver
runs from a foreign cwd — so every ``crawler_spark`` import (driver
and executor side) must resolve from the ``--py-files`` zip, exactly
as on a real cluster. Scheduled/fetched counts are pinned to the
GoOracle for the same config + corpus."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

from crawler_spark.loader import task_from_dict
from crawler_spark.plans.oracle import GoOracle
from crawler_spark.sources.corpus import (
    CORPUS_SCHEMA,
    GENERIC_LINK_RE,
    build_corpus_pdf,
    generic_url,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_pyfiles_zip(path: str) -> str:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "crawler_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


def test_spark_submit_pyfiles_crawl(tmp_path, spark):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(os.path.dirname(sys.executable)), "bin", "spark-submit"
    )
    if not (spark_submit and os.path.exists(spark_submit)):
        import pyspark

        spark_submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
    assert os.path.exists(spark_submit), "spark-submit not found"

    pdf = build_corpus_pdf(
        seed=42, n_generic=40, n_hosts=4, out_degree=4,
        n_lists=0, books_per_list=0, n_topics=0,
    )
    corpus_path = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(pdf, CORPUS_SCHEMA).coalesce(1).write.parquet(corpus_path)

    task_doc = {
        "Name": "from_submit",
        "MaxDepth": 3,
        "seeds": [[generic_url(42, 0, 4), 1, "link"]],
        "rules": [
            {"name": "link", "link_regex": GENERIC_LINK_RE, "next_rule": "link"}
        ],
    }
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "Tasks": [task_doc],
        "engine": {
            "batch_size": 16, "num_partitions": 4,
            "use_bloom": False, "max_rounds": 20,
        },
    }))

    zip_path = _make_pyfiles_zip(str(tmp_path / "crawler_spark.zip"))
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # imports must come from --py-files
    }
    env["SPARK_LOCAL_IP"] = "127.0.0.1"
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.driver.host=127.0.0.1",
            "--conf", "spark.driver.bindAddress=127.0.0.1",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            # sandbox local-FS landmines (see crawler_spark/session.py)
            "--conf",
            "spark.hadoop.fs.file.impl=org.apache.hadoop.fs.RawLocalFileSystem",
            "--conf",
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version=2",
            "--conf",
            "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "spark_submit_entry.py"),
            "--config", str(cfg), "--corpus", corpus_path,
            "--workdir", str(tmp_path / "wd"), "--max-rounds", "20",
        ],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # NOT the repo: nothing importable from cwd
        env=env,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])
    res = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert res["tasks"] == ["from_submit"]

    oracle = GoOracle(
        [task_from_dict(task_doc)],
        dict(zip(pdf["canon_url"], pdf["text"])),
        batch_size=16,
        max_rounds=20,
    ).run()
    assert res["urls_scheduled"] == len(oracle.crawl_order)
    assert res["urls_fetched"] == sum(
        1 for o in oracle.crawl_order if o["fetched"]
    )
