"""Connected components over an edge table — min-label propagation
with pointer jumping, run to convergence.

Why a crawl engine needs it: the web graph's component structure
drives crawl scoping (a frontier seeded inside one component never
leaves it), and near-duplicate document pairs (LSH candidates,
operators/dedup.py) only become *dedup groups* through transitive
closure — doc A~B and B~C must land A, B, C in one group even when
A~C was never a candidate pair. The Go reference has no graph
operators at all; this is pure scale-era surface.

Algorithm (all built-in DataFrame ops, deterministic):

  label_0(v) = v
  propagate: label(v) ← min(label(v), min_{u∈N(v)} label(u))
  compress : label(v) ← label(label(v))        (pointer jumping)
  stop when Σ label stops decreasing (labels are monotone non-
  increasing and every change strictly decreases the sum, so one
  cheap global aggregate per round is an exact change detector —
  no per-row diff join).

Plain propagation needs O(diameter) rounds; the compress step
squares the pointer-chase each round, so chains collapse in
O(log d) rounds — the same reason the large-star/small-star and
Hash-to-Min MapReduce CC algorithms iterate logarithmically.

Scale shape per round: one shuffle of the symmetric edge list on dst
(joined against the label table, #nodes rows — orders of magnitude
smaller than edges), one map-side-combined min aggregate, one
label⋈label self-join on node id. The edge list itself is projected
to two long columns and persisted once; labels are the only relation
that reshuffles per round. At 10^10 edges you'd pre-partition both
sym-edge copies by join key once (bucketing) so every round's joins
are exchange-free.

No reference analogue (the Go engine has no graph ops); DuckDB twin
is the exact transitive closure via a recursive CTE, so convergence —
not just the per-round recurrence — is what the oracle checks.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scratch_dir() -> str:
    scratch = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if scratch is None and os.path.isdir("/dev/shm"):
        scratch = "/dev/shm/spark-local"
    if scratch is None:
        scratch = tempfile.gettempdir()
    os.makedirs(scratch, exist_ok=True)
    return scratch


def connected_components(
    edges: DataFrame, max_iterations: int = 50, workdir: str | None = None
) -> DataFrame:
    """Label every node of the undirected graph ``edges(src, dst)``
    with its component's minimum node id.

    Returns (node, component). Runs propagate+compress rounds until
    the label-sum fixpoint (exact; see module docstring), erroring
    out past ``max_iterations`` rather than returning a half-merged
    labeling.

    The label table is materialized to parquet every round and read
    back, so each round's plan is a flat scan: the recurrence
    references `labels` four times, and without the cut the analyzed
    plan (not the execution — persist covers that) grows 4× per round
    and Catalyst analysis time explodes exponentially (measured: 1.3 s
    → 37.6 s by round 4 on a 60-node graph). Same discipline as the
    frontier's per-round snapshots and GraphX's periodic Pregel
    checkpoints; the final returned frame scans the last snapshot, and
    the snapshot directory lives until the session's scratch is
    cleaned (`workdir` lets callers own placement/cleanup).
    """
    spark = edges.sparkSession
    base = workdir or tempfile.mkdtemp(prefix="cc_", dir=_scratch_dir())
    e = edges.select("src", "dst")
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    nodes = sym.select(F.col("src").alias("node")).distinct()

    path = f"{base}/labels_0"
    nodes.withColumn("label", F.col("node")).write.mode("overwrite").parquet(
        path
    )
    labels = spark.read.parquet(path)
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    for it in range(1, max_iterations + 1):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        prop = (
            labels.join(nbr_min, labels["node"] == nbr_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
        )
        ptr = prop.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        nxt_path = f"{base}/labels_{it}"
        (
            prop.join(ptr, prop["label"] == ptr["pnode"], "left")
            .select(
                "node", F.coalesce("plabel", F.col("label")).alias("label")
            )
            .write.mode("overwrite")
            .parquet(nxt_path)
        )
        nxt = spark.read.parquet(nxt_path)
        cur_sum = nxt.agg(F.sum("label")).collect()[0][0]
        shutil.rmtree(path, ignore_errors=True)
        path, labels = nxt_path, nxt
        if cur_sum == prev_sum:
            sym.unpersist()
            return labels.select("node", F.col("label").alias("component"))
        prev_sum = cur_sum

    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def connected_components_sql(edges_cte: str, extra_ctes: str = "") -> str:
    """DuckDB twin: exact transitive closure by recursive CTE —
    min reachable node id per node. ``edges_cte`` must select
    (src, dst); ``extra_ctes`` (optional, 'name AS (...),' chains)
    are spliced in first so edges_cte can reference them.
    """
    return f"""
    WITH RECURSIVE {extra_ctes} edges AS ({edges_cte}),
    sym AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
    ),
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    reach(node, root) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT s.dst, r.root FROM reach r JOIN sym s ON s.src = r.node
    )
    SELECT node, min(root) AS component FROM reach GROUP BY node
    """


def dedup_groups(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Transitive near-duplicate grouping: LSH candidate pairs →
    connected components → every document labeled with its group's
    canonical (minimum) doc id; docs in no pair form singleton groups.

    ``pairs`` must have (doc_a, doc_b). Returns
    (doc_id, group_id, group_size) — group_size counts members, so
    `group_size > 1` filters to actual duplicate clusters and
    `doc_id = group_id` picks one keeper per cluster.
    """
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    grouped = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, F.col("doc_id") == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("group_id"),
        )
    )
    sizes = grouped.groupBy("group_id").agg(
        F.count("*").alias("group_size")
    )
    return grouped.join(sizes, "group_id").select(
        "doc_id", "group_id", "group_size"
    )
