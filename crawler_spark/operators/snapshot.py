"""Snapshot diff — change-data-capture between two crawl captures.

A recurring crawl produces successive snapshots of the same key space
(canon_url -> content). The operational question between two captures
is "what changed?": pages that appeared, disappeared, changed content,
or stayed identical. The reference engine answers it implicitly (its
reload path re-fetches and overwrites, engine/engine.go's reload
branch); a warehouse over crawl snapshots needs it as an explicit
operator — it drives re-crawl scheduling and incremental downstream
refresh.

Spark-first shape: one full-outer sort-merge join on the key. Both
sides hash-partition on the same key so the join is a single co-
partitioned shuffle each; content equality is checked on a compact
content hash (never the bodies), so at 100 TB the joined width is
key + 2 hashes regardless of page size. AQE's skew-join split handles
a pathological key distribution. FULL OUTER is required — inner would
drop adds/removes, and a union of two anti-joins plus an inner join
would scan each side twice for the same answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Per-key CDC status between two snapshots:
    (key, status ∈ {added, removed, changed, same}).

    ``old``/``new`` must carry ``key`` and ``hash_col`` (a digest of
    the content — compare hashes, not bodies).
    """
    o = old.select(F.col(key), F.col(hash_col).alias("_old_hash"))
    n = new.select(F.col(key), F.col(hash_col).alias("_new_hash"))
    j = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("_old_hash").isNull(), F.lit("added"))
        .when(F.col("_new_hash").isNull(), F.lit("removed"))
        .when(F.col("_old_hash") != F.col("_new_hash"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return j.select(F.col(key), status.alias("status"))


def diff_rollup(diff: DataFrame, key: str = "doc_id") -> DataFrame:
    """Per-status counts over a snapshot diff — the crawl-delta metric
    row (map-side partial count; 4 output rows)."""
    return diff.groupBy("status").agg(F.count(key).alias("n"))
