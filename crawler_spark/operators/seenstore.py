"""Sorted-run exact membership probe for the URL-seen ledger.

Round 2's engaged-prefilter path still resolved maybe-seen rows with a
left-anti join against the FULL seen ledger — an O(seen) shuffle every
round, the last full-ledger cost on the hot path at the spec's 10^10
URLs (VERDICT r2 #1). This module is the batch analogue of the Go
engine's O(1) ``Visited`` map lookup (engine/schedule.go:272-275):

- every seen-ledger round is written as a SORTED parquet run
  (``TableIO.write_round(..., sort_within="url_hash")``), and a
  background compaction periodically merges all rounds into a few
  large sorted runs (LSM shape: ledger rounds are level-0, the
  compacted ``seen_runs`` table is level-1);
- the exact check groups the (bounded) maybe-seen keys by the same
  md5-prefix shard id as the bloom store and, inside one
  ``applyInPandas`` stage, each task probes ONLY the parquet ROW
  GROUPS whose [min, max] url_hash statistics contain one of its keys
  (binary search per row group; runs are sorted so the ranges are
  tight). Row-group statistics are cached per file in the (reused)
  Python worker, so steady-state probes touch only data pages that
  actually contain a probed key;
- hits come back as a small distinct relation the engine anti-joins
  (AQE broadcasts it when small).

Per-round cost: shuffle O(maybe keys) + read O(row groups containing
hits) ≈ O(maybe · log seen). The ledger itself never shuffles and is
never fully read. Correctness does not depend on files being sorted
(stats-based pruning is valid for any layout and the probe re-sorts
each row group it reads) — sorting only makes pruning tight.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from crawler_spark.operators.bloom import shard_expr

HASH_COL = "url_hash"

# executor-side, per-worker-process (spark.python.worker.reuse keeps
# workers alive): path -> list of (min, max) per row group, or None
# when a group has no usable statistics (then it is always read).
# Run files are immutable (compaction writes NEW dirs), so no
# invalidation is needed.
_RG_STATS_CACHE: dict[str, list[tuple[str, str] | None]] = {}


def _file_rg_stats(path: str):
    import pyarrow.parquet as pq

    stats = _RG_STATS_CACHE.get(path)
    if stats is not None:
        return stats, None
    pf = pq.ParquetFile(path)
    names = pf.schema_arrow.names
    ci = names.index(HASH_COL)
    out: list[tuple[str, str] | None] = []
    for i in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(i).column(ci).statistics
        if st is None or not st.has_min_max:
            out.append(None)
        else:
            out.append((str(st.min), str(st.max)))
    _RG_STATS_CACHE[path] = out
    return out, pf


def _probe_file(path: str, keys: np.ndarray) -> np.ndarray:
    """Members of sorted ``keys`` present in ``path``'s url_hash
    column, reading only row groups whose [min,max] may contain one."""
    import pyarrow.parquet as pq

    stats, pf = _file_rg_stats(path)
    hits: list[np.ndarray] = []
    for i, rng in enumerate(stats):
        if rng is None:
            sub = keys
        else:
            lo, hi = rng
            left = int(np.searchsorted(keys, lo, "left"))
            right = int(np.searchsorted(keys, hi, "right"))
            if right <= left:
                continue
            sub = keys[left:right]
        if pf is None:
            pf = pq.ParquetFile(path)
        arr = (
            pf.read_row_group(i, columns=[HASH_COL])
            .column(0)
            .to_numpy(zero_copy_only=False)
            .astype("U32")
        )
        arr.sort()  # correct even if the file was written unsorted
        pos = np.searchsorted(arr, sub)
        ok = pos < arr.size
        m = np.zeros(sub.size, dtype=bool)
        m[ok] = arr[pos[ok]] == sub[ok]
        if m.any():
            hits.append(sub[m])
    if not hits:
        return np.empty(0, dtype="U32")
    return np.concatenate(hits)


def seen_members(
    keys_df, paths: list[str], n_groups: int, hash_col: str = HASH_COL
):
    """DataFrame of the DISTINCT keys from ``keys_df`` that are present
    in any of the given parquet run files.

    ``paths`` is pinned at plan-build time (broadcast list, not a
    directory listing), so cache-loss recomputation reads exactly the
    same file set even if newer runs have landed since.
    """
    spark = keys_df.sparkSession
    bc = spark.sparkContext.broadcast(sorted(paths))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(pdf[hash_col].dropna().to_numpy().astype("U32"))
        if keys.size == 0 or not bc.value:
            return pd.DataFrame({hash_col: pd.Series([], dtype=object)})
        found = [_probe_file(p, keys) for p in bc.value]
        out = np.unique(np.concatenate(found)) if found else np.empty(0, "U32")
        return pd.DataFrame({hash_col: out})

    return (
        keys_df.select(hash_col)
        .withColumn("_g", shard_expr(hash_col, n_groups))
        .groupBy("_g")
        .applyInPandas(fn, f"{hash_col} string")
    )
