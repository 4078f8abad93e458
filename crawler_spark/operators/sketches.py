"""Distributed sketch operators: HyperLogLog distinct counting.

The 100 TB frontier question "how many distinct URLs has each host
contributed?" cannot afford an exact ``count(DISTINCT url)`` — that is
a full shuffle of every distinct key. The mergeable-sketch answer is
HyperLogLog (Flajolet et al. 2007): each executor folds its partition
into m register maxima (a map-side partial aggregate, bytes per
group), registers merge with ``max``, and the estimate is read off the
merged registers. Spark's built-in ``approx_count_distinct`` is this
same algorithm, but its register layout is implementation-defined —
this module implements the sketch from first principles with md5 as
the hash so the DuckDB oracle can run the IDENTICAL algorithm and the
driver's value-hash compare stays exact.

Determinism contract (why this is hash-compare-safe):
- register index and rank (leading-zero count) are computed from md5
  hex DIGITS with instr/substr/regexp arithmetic — pure integer/string
  ops, no platform floats;
- the register fold is ``max`` (order-free), the union fold is a
  BIGINT sum of ``power(2, 49 - rho)`` terms (exact in int64, order-
  free) — no floating-point accumulation anywhere;
- floats appear only in the final per-group estimate (one ln/division
  on exact integer inputs), rounded to a BIGINT.

All expressions are emitted by shared builders used verbatim by both
the Spark operator and the DuckDB twin (the simhash_sql pattern,
dedup.py:257). Reference analogue: the Go engine's global visited-map
cardinality (engine/engine.go's seen map) — here generalized to
grouped distinct counts that never materialize the distinct set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.util import spread

# m = 256 registers (p = 8): first 2 md5 hex digits pick the register,
# the next 12 hex digits (48 bits) feed the leading-zero rank, so
# rho ∈ [1, 49].
HLL_M = 256
_RHO_MAX = 49
# alpha_256 = 0.7213 / (1 + 1.079/256) — the standard bias constant
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _hexval(h: str, start: int, ndigits: int) -> str:
    """SQL integer value of ``ndigits`` hex digits of ``h`` starting at
    1-based ``start`` (instr/substr arithmetic, valid in Spark SQL and
    DuckDB alike)."""
    parts = [
        f"(instr('0123456789abcdef', substr({h}, {start + i}, 1)) - 1)"
        f" * {16 ** (ndigits - 1 - i)}"
        for i in range(ndigits)
    ]
    return "(" + " + ".join(parts) + ")"


def reg_expr(h: str) -> str:
    """Register index 0..m-1 from the first 2 hex digits of ``h``."""
    return _hexval(h, 1, 2)


def rho_expr(h: str) -> str:
    """Leading-zero rank of the 48-bit stream in hex digits 3..14 of
    ``h``: 4 zeros per leading '0' digit plus the zeros inside the
    first non-zero digit, plus 1. Empty stream (all zeros) -> 49.
    String/integer ops only — digit-exact in every dialect."""
    s = f"substr({h}, 3, 12)"
    stripped = f"regexp_replace({s}, '^0+', '')"
    first = f"substr({stripped}, 1, 1)"
    extra = (
        f"(CASE WHEN {first} = '1' THEN 3"
        f" WHEN {first} IN ('2','3') THEN 2"
        f" WHEN {first} IN ('4','5','6','7') THEN 1"
        f" ELSE 0 END)"
    )
    return (
        f"(CASE WHEN length({stripped}) = 0 THEN {_RHO_MAX}"
        f" ELSE 4 * (12 - length({stripped})) + {extra} + 1 END)"
    )


def estimate_exprs(m: int = HLL_M) -> dict[str, str]:
    """Final-stage expressions over the merged registers of one group
    (aggregated columns ``n_regs`` = present registers and ``s_present``
    = BIGINT sum of 2^(49-max_rho)). Returns SQL for v_zero, s_sum and
    the rounded estimate — the estimator's branch rule (linear counting
    for small range) exactly as published."""
    v_zero = f"({m} - n_regs)"
    # absent registers have M_j = 0 and contribute 2^(49-0) each to the
    # integer-domain harmonic sum
    s_sum = f"(s_present + CAST({v_zero} AS BIGINT) * CAST(power(2, {_RHO_MAX}) AS BIGINT))"
    # CAST the bias constant: DuckDB types a bare float literal as
    # DECIMAL and overflows multiplying it up; DOUBLE matches Spark
    raw = (
        f"(CAST({HLL_ALPHA!r} AS DOUBLE) * {m} * {m}"
        f" * power(2, {_RHO_MAX}) / {s_sum})"
    )
    linear = f"({m} * ln(CAST({m} AS DOUBLE) / {v_zero}))"
    est = (
        f"CAST(round(CASE WHEN {raw} <= {2.5 * m} AND {v_zero} > 0"
        f" THEN {linear} ELSE {raw} END) AS BIGINT)"
    )
    return {"v_zero": v_zero, "s_sum": s_sum, "est": est}


def hll_registers(
    df: DataFrame, key: str, group: str, m: int = HLL_M
) -> DataFrame:
    """Merged HLL registers per group: (group, reg, max_rho).

    This IS the distributed sketch: the groupBy is one shuffle of at
    most m rows per group (partial ``max`` runs map-side), independent
    of how many distinct keys each group holds. Registers from
    different scans/days merge with the same ``max`` — pinned by
    tests/test_sketches.py's union-merge property test.
    """
    h = f"md5({key})"
    return (
        spread(df)
        .select(
            F.col(group),
            F.expr(reg_expr(h)).alias("reg"),
            F.expr(rho_expr(h)).alias("rho"),
        )
        .groupBy(group, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_distinct(
    df: DataFrame, key: str, group: str, m: int = HLL_M
) -> DataFrame:
    """HLL distinct-count estimate per group:
    (group, n_regs, v_zero, s_sum, est_distinct).

    The integer sketch state (n_regs, s_sum) rides along so the
    estimate is auditable; est_distinct is the only float-touched
    column and it is rounded to a BIGINT.
    """
    regs = hll_registers(df, key, group, m)
    folded = regs.groupBy(group).agg(
        F.count("*").alias("n_regs"),
        F.sum(
            F.expr(f"CAST(power(2, {_RHO_MAX} - max_rho) AS BIGINT)")
        ).alias("s_present"),
    )
    ex = estimate_exprs(m)
    return folded.select(
        group,
        "n_regs",
        F.expr(ex["v_zero"]).cast("int").alias("v_zero"),
        F.expr(ex["s_sum"]).alias("s_sum"),
        F.expr(ex["est"]).alias("est_distinct"),
    )


def hll_distinct_sql(
    table: str, key: str, group: str, m: int = HLL_M
) -> str:
    """DuckDB twin of ``hll_distinct`` — same register/rank/estimator
    expressions from the same builders."""
    h = f"md5({key})"
    ex = estimate_exprs(m)
    return f"""
    WITH regs AS (
      SELECT {group}, {reg_expr(h)} AS reg, MAX({rho_expr(h)}) AS max_rho
      FROM {table} GROUP BY {group}, {reg_expr(h)}
    ), folded AS (
      -- DuckDB SUM(BIGINT) widens to HUGEINT; cast back so the twin's
      -- dtype matches Spark's LongType exactly
      SELECT {group}, COUNT(*) AS n_regs,
             CAST(SUM(CAST(power(2, {_RHO_MAX} - max_rho) AS BIGINT)) AS BIGINT)
               AS s_present
      FROM regs GROUP BY {group}
    )
    SELECT {group}, n_regs,
           CAST({ex["v_zero"]} AS INT) AS v_zero,
           {ex["s_sum"]} AS s_sum,
           {ex["est"]} AS est_distinct
    FROM folded
    """
