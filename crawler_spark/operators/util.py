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


# ------------------------------------------------------------------
# Vectorized md5-hex key parsing (shared by the bloom/cuckoo kernels)
# ------------------------------------------------------------------
# The seen-set prefilter probes the whole frontier every round, so the
# Python-side kernel is the hottest pandas-UDF code in the engine.
# Per-row `int(v[:16], 16)` generator parses plus a regex fullmatch
# were ~80% of its batch time; this module replaces both with one
# ASCII-nibble lookup table pass over an (N, 32) byte matrix.

import numpy as np
import pandas as pd

_NIB = np.full(256, 0xFF, dtype=np.uint8)
for _c in b"0123456789":
    _NIB[_c] = _c - ord("0")
for _c in b"abcdef":
    _NIB[_c] = _c - ord("a") + 10


def md5_nibbles(values: pd.Series):
    """Parse a series of md5-hex strings into nibble rows.

    Returns ``(ok, nib)``: ``ok`` is a bool ndarray marking values
    that are exactly 32 lowercase-hex chars (everything else —
    null, wrong length, uppercase, non-hex — must take the caller's
    scalar fallback, keeping bit-identical semantics with the
    per-row path); ``nib`` is the (N, 32) uint8 nibble matrix, valid
    only where ``ok``.
    """
    vals = values.fillna("")
    # length check BEFORE the fixed-width S32 conversion: S32 silently
    # truncates longer strings (a 33-hex-digit key must stay invalid —
    # its uint64 halves would overflow / alias)
    ok = (vals.str.len() == 32).to_numpy(dtype=bool)
    b = np.frombuffer(
        vals.to_numpy(dtype="S32").tobytes(), dtype=np.uint8
    ).reshape(-1, 32)
    nib = _NIB[b]
    ok &= ~(nib == 0xFF).any(axis=1)
    return ok, nib


def nib_u64(nib: np.ndarray, a: int, b: int) -> np.ndarray:
    """Join nibble columns [a, b) into big-endian uint64s — the same
    value as ``int(hexstr[a:b], 16)`` (b - a ≤ 16)."""
    w = b - a
    shifts = (np.arange(w - 1, -1, -1, dtype=np.uint64) * np.uint64(4))
    return np.bitwise_or.reduce(
        nib[:, a:b].astype(np.uint64) << shifts, axis=1
    )
