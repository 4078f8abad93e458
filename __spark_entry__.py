"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship crawl-shaped pipeline over sf0.001 —
  exact dedup (URL-seen analogue) → quality scoring → per-source
  politeness-style budget window → priority ordering. One plan
  exercising hash-dedup anti-join, broadcast join, window rank, and
  whole-stage-codegen scalar functions.
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator
  from SURVEY.md §2 + the training-data pipeline operators; twins live
  in ``crawler_spark/queries.py`` and are value-checked against DuckDB
  (see scripts/check_contract.py for the local mirror of the gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    from crawler_spark.operators.dedup import exact_dedup
    from crawler_spark.operators.textstats import quality_score

    keep = exact_dedup(docs).select(F.col("keep_doc_id").alias("doc_id"))
    quality = quality_score(docs)
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        docs.join(F.broadcast(keep), "doc_id")  # seen-set dedup analogue
        .join(quality, "doc_id")
        .withColumn("rank_in_source", F.row_number().over(w))  # host budget
        .filter(F.col("rank_in_source") <= 10)
        .select("doc_id", "source", "lang", "quality", "rank_in_source")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawler_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from crawler_spark.queries import ORACLES

    return dict(ORACLES)
