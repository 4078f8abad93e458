"""robots.txt rule enforcement (north_rule addition; the Go reference
has no robots handling).

Rules live in a small dimension table ``(host, path_prefix, allow)``.
Decision = longest matching prefix for the request's host; default
allow; among equal-length matches the FIRST rule in input order wins
(plans/oracle.py:robots_allowed uses strict ``>`` over the rule list).

Plan shape: the rule table is pre-grouped to one row per host carrying
an ordered ``array<struct<prefix,allow>>``, broadcast-joined once, and
the longest matching prefix is picked by a higher-order ``aggregate``
expression — the frontier side never shuffles and the whole decision
stays inside whole-stage codegen. (Round 2 resolved longest-prefix
with ``groupBy(*frontier.columns)`` + ``max_by``, which hash-shuffled
every frontier row at full width each round and left ties to whichever
row ``max_by`` saw last.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RULES_SCHEMA = "host string, rules array<struct<prefix:string,allow:boolean>>"


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


def prepare_robots(robots: DataFrame | None) -> DataFrame | None:
    """Group a (host, path_prefix, allow) rule table to one row per
    host with the host's rules as an ordered array.

    The table is a config-scale dimension (the engine broadcasts it
    regardless), so the grouping runs on the driver: a distributed
    ``collect_list`` has no defined order, and rule order is the
    oracle's tie-break. Collected ONCE — the engine calls this at
    init, not per round.

    Rule order is EXPLICIT (ADVICE r3): a ``rule_order`` column, when
    present, defines "input order" — file-backed or repartitioned rule
    tables should carry one, because ``collect()`` order is partition
    order, not load order. Without it, ``monotonically_increasing_id``
    is attached before the collect: mono-ids ascend with (partition
    index, offset), which IS the input order for the local-relation /
    single-file tables the config loader produces, and it makes the
    assumption checkable instead of implicit."""
    if robots is None:
        return None
    order = (
        F.col("rule_order")
        if "rule_order" in robots.columns
        else F.monotonically_increasing_id()
    )
    rows = robots.select(
        "host", "path_prefix", "allow", order.alias("_ord")
    ).collect()
    by_host: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: r["_ord"]):
        by_host.setdefault(r["host"], []).append((r["path_prefix"], bool(r["allow"])))
    data = [(h, rules) for h, rules in by_host.items()]
    spark = robots.sparkSession
    return spark.createDataFrame(data, _RULES_SCHEMA)


def _is_prepared(robots: DataFrame) -> bool:
    return "rules" in robots.columns


def filter_robots_allowed(
    frontier: DataFrame, robots: DataFrame | None, url_col: str = "canon_url"
) -> DataFrame:
    """Keep only frontier rows allowed by robots rules.

    frontier must have ``host``; robots is either the raw
    (host, path_prefix, allow) table or the output of
    :func:`prepare_robots` (pass the prepared form when calling
    repeatedly — e.g. per crawl round — to skip the re-collect)."""
    if robots is None:
        return frontier
    prepped = robots if _is_prepared(robots) else prepare_robots(robots)
    r = prepped.select(F.col("host").alias("_rhost"), F.col("rules").alias("_rules"))
    f = frontier.withColumn("_path", path_of(F.col(url_col)))
    joined = f.join(F.broadcast(r), f["host"] == r["_rhost"], "left")
    matching = F.filter(
        F.col("_rules"), lambda rule: F.col("_path").startswith(rule["prefix"])
    )
    # fold in rule order with strict '>' — first longest match wins,
    # exactly robots_allowed's loop; no matching rule → len -1 stays
    best = F.aggregate(
        matching,
        F.struct(
            F.lit(-1).alias("len"), F.lit(None).cast("boolean").alias("allow")
        ),
        lambda acc, rule: F.when(
            F.length(rule["prefix"]) > acc["len"],
            F.struct(
                F.length(rule["prefix"]).alias("len"), rule["allow"].alias("allow")
            ),
        ).otherwise(acc),
    )
    # no rules for the host (null array) → null aggregate → default allow
    return (
        joined.filter(F.coalesce(best["allow"], F.lit(True)))
        .drop("_rhost", "_rules", "_path")
    )
