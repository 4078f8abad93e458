"""Items sink: per-task columnar tables from the items ledger.

The reference stores each task's extracted items in a MySQL table
named after the task, columns = the rule's ItemFields + Url + Time,
all stringly typed (storage/sqlstorage/sqlstorage.go:67-84; table
auto-create sqldb/sqldb.go:72-90; non-strings JSON-marshalled on
flush, sqlstorage.go:100-115). Here the engine's items ledger rows
``(task, rule, url, warc_ts, fields:json)`` are projected into one
parquet table per task with explicit all-string ItemFields columns —
the same shape, columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.config import TaskConfig


def item_fields_of(task: TaskConfig) -> list[str]:
    fields: list[str] = []
    for r in task.rules:
        for f in r.item_fields:
            if f not in fields:
                fields.append(f)
        if r.match_regex and "match_url" not in fields:
            fields.append("match_url")
    return fields


def task_items_table(items: DataFrame, task: TaskConfig) -> DataFrame:
    """Columnar per-task items table: ItemFields + url + warc_ts.

    ``from_json`` with an explicit all-string schema mirrors the
    reference's MEDIUMTEXT columns; missing fields come back NULL →
    coalesced to '' (ExtractStr's miss value, parsebook.go:117-124).
    """
    fields = item_fields_of(task)
    if not fields:
        return items.filter(F.col("task") == task.name).select("url", "warc_ts")
    schema = ", ".join(f"`{f}` string" for f in fields)
    parsed = (
        items.filter(F.col("task") == task.name)
        .withColumn("_f", F.from_json("fields", schema))
    )
    cols = [
        F.coalesce(F.col(f"_f.`{f}`"), F.lit("")).alias(f) for f in fields
    ]
    return parsed.select(*cols, "url", "warc_ts")


def write_task_tables(
    items: DataFrame, tasks: list[TaskConfig], out_dir: str
) -> dict[str, str]:
    """One parquet table per task (≙ CREATE TABLE <task> + batched
    INSERTs, sqldb.go:72-109). Returns task → path."""
    out = {}
    for t in tasks:
        path = f"{out_dir}/{t.name}"
        task_items_table(items, t).write.mode("overwrite").parquet(path)
        out[t.name] = path
    return out
