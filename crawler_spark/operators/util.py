"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Ensure CPU-bound per-row stages run at full parallelism.

    A small single-row-group parquet file scans as ONE partition, so a
    tokenize/hash pipeline over it would run on one core no matter how
    many the session has. At 100 TB the scan has thousands of splits
    and this guard makes the repartition a no-op; on the sandbox's
    tiny single-file tables it unlocks the other cores for the price
    of one trivial shuffle. Hash-partitioning on ``key`` (not
    round-robin) keeps downstream groupBys on the same key
    shuffle-free.
    """
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= min(n, 8):
        return df
    return df.repartition(n, key)

