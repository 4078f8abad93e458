"""robots.txt rule enforcement (north_rule addition; the Go reference
has no robots handling).

Rules live in a small dimension table ``(host, path_prefix, allow)``.
Decision = longest matching prefix for the request's host; default
allow. Implemented entirely with built-in expressions: broadcast join
on host, ``startswith`` prefix filter, longest-prefix pick via a
max_by aggregate — no UDF, stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def path_of(url_col):
    """Path component (incl. query) of a canonical URL column.

    Splits on the FIRST '://' like the executable spec
    (plans/oracle.py:_path_of splits once) — substring_index(…, -1)
    splits on the LAST occurrence, so a URL embedding another URL in
    its query (…/r?u=http://b.com/x) would yield the wrong path and
    flip robots decisions."""
    pos = F.locate("://", url_col)
    rest = F.when(
        pos > 0, F.substring(url_col, pos + F.lit(3), F.lit(1 << 30))
    ).otherwise(url_col)
    slash = F.instr(rest, "/")
    return F.when(slash > 0, F.substring(rest, slash, F.lit(1 << 30))).otherwise(
        F.lit("/")
    )


def filter_robots_allowed(
    frontier: DataFrame, robots: DataFrame | None, url_col: str = "canon_url"
) -> DataFrame:
    """Keep only frontier rows allowed by robots rules.

    frontier must have ``host``; robots has (host, path_prefix, allow).
    """
    if robots is None:
        return frontier
    path = path_of(F.col(url_col)).alias("_path")
    f = frontier.withColumn("_path", path)
    r = robots.select(
        F.col("host").alias("_rhost"),
        F.col("path_prefix").alias("_prefix"),
        F.col("allow").alias("_allow"),
    )
    matched = (
        f.join(F.broadcast(r), (f["host"] == r["_rhost"]), "left")
        .withColumn(
            "_hit",
            F.col("_prefix").isNotNull() & F.col("_path").startswith(F.col("_prefix")),
        )
        .groupBy(*[f[c] for c in frontier.columns])
        .agg(
            F.max_by(
                F.col("_allow"), F.when(F.col("_hit"), F.length("_prefix"))
            ).alias("_decision")
        )
        .withColumn("_allowed", F.coalesce(F.col("_decision"), F.lit(True)))
    )
    return matched.filter(F.col("_allowed")).drop("_decision", "_allowed", "_path")
