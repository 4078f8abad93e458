"""Fixed-iteration PageRank over an edge table — host-graph ranking.

A crawl frontier's natural prioritization signal at 100 TB is link
authority: rank hosts (or pages) by the stationary walk over the
host-link graph, then feed the score into the frontier's priority
column. The reference's two-level FIFO (schedule.go:177-206) has no
authority signal; this is the scale-era upgrade.

Shape per iteration (the classic dataflow PageRank):

  contribs = edges ⋈ ranks on src      (shuffle on src)
  sums     = contribs.groupBy(dst).sum (map-side partial agg)
  ranks    = nodes ⟕ sums              (keeps dangling/no-inlink nodes)

Everything is built-in expressions — whole-stage codegen, map-side
combine on the sum, and AQE free to pick broadcast vs shuffle joins
per iteration. Fixed iteration count keeps it deterministic and
oracle-able (the DuckDB twin unrolls the same iterations as chained
CTEs); convergence-driven stopping would be a driver loop over a
`diff > eps` aggregate — same plan per round, so the fixed-k evidence
carries.

At 10^10 edges: pre-partition `edges` by src once and persist; each
iteration then reuses the exchange and only the (node, rank) table
(~#nodes, orders of magnitude smaller than edges) reshuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    round_to: int | None = 6,
) -> DataFrame:
    """Rank nodes of a directed graph ``edges(src, dst)``.

    rank_0 = 1.0; rank_{t+1}(v) = (1-d) + d * Σ rank_t(u)/outdeg(u)
    over edges u→v (the uniform-start, unnormalized formulation).
    Dangling nodes keep rank (1-d) plus whatever links in.

    Returns (node, rank) for every node appearing as src or dst.
    """
    edges = edges.select("src", "dst")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # edges with the constant outdeg attached once — iteration joins
    # only touch (src, dst, outdeg) ⋈ (node, rank)
    ew = edges.join(out_deg, "src")
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contribs = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("insum"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("insum"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    if round_to is not None:
        ranks = ranks.select("node", F.round("rank", round_to).alias("rank"))
    return ranks


def pagerank_sql(
    edges_cte: str, iterations: int = 3, damping: float = 0.85
) -> str:
    """DuckDB twin: the same fixed iterations unrolled as chained CTEs.

    ``edges_cte`` must select columns (src, dst).
    """
    d = damping
    parts = [
        f"WITH edges AS ({edges_cte}),",
        "nodes AS (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges),",
        "ew AS (SELECT e.src, e.dst, o.outdeg FROM edges e JOIN"
        " (SELECT src, count(*) AS outdeg FROM edges GROUP BY src) o"
        " ON e.src = o.src),",
        "r0 AS (SELECT node, 1.0 AS rank FROM nodes),",
    ]
    for t in range(iterations):
        parts.append(
            f"r{t + 1} AS (SELECT n.node,"
            f" {1 - d} + {d} * coalesce(s.insum, 0.0) AS rank"
            " FROM nodes n LEFT JOIN"
            f" (SELECT ew.dst, sum(r.rank / ew.outdeg) AS insum"
            f"  FROM ew JOIN r{t} r ON ew.src = r.node GROUP BY ew.dst) s"
            " ON n.node = s.dst),"
        )
    parts.append(
        f"final AS (SELECT node, round(rank, 6) AS rank FROM r{iterations})"
    )
    return "\n".join(parts) + "\nSELECT node, rank FROM final"
