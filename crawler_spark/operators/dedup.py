"""Document deduplication operators for training-data pipelines.

All operators are pure DataFrame compositions (JVM expressions inside
whole-stage codegen — no Python in the hot path) and every one has an
ANSI-SQL twin in ``crawler_spark.queries`` runnable by DuckDB, so the
driver's oracle can value-check them.

Shared text model (identical across Spark and the SQL oracles):
    tokens(text)   = regexp_extract_all(lower(text), '[a-z0-9]+')
    shingles(text) = distinct 3-gram word shingles joined by ' '

Operators:
- exact_dedup          md5(text) group-by, keep min doc_id
- ngram_jaccard_pairs  all-pairs Jaccard over 3-gram shingles via
                       shingle-explode + self-join (shuffle on the
                       shingle key; at 100 TB you'd pre-filter by
                       MinHash bands — see minhash_lsh_pairs — so the
                       quadratic verify only runs inside tiny buckets)
- minhash_lsh_pairs    k md5 minhashes → bands → bucket-join candidate
                       pairs (the scale path: candidate generation is
                       linear in corpus size, pairs only within equal
                       band buckets)
- simhash_buckets      32-bit SimHash per doc from token md5 bit votes

The reference crawler has no dedup beyond the URL-seen set; these are
the corpus-level operators a crawl→training-data pipeline needs
(brief requirement), built on the same hashing primitives as the
frontier's seen set (md5, collect/request.go:95-98).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.util import spread

TOKENS_EXPR = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
# 3-gram word shingles, distinct, space-joined. Short docs MUST
# short-circuit: Spark's sequence(1, 0) is the DESCENDING [1, 0]
# (unlike DuckDB's empty generate_series(1, 0)), so without the guard
# a doc with < 3 tokens evaluates slice(tokens, 0, 3) and throws
# INVALID_PARAMETER_VALUE.START. With the guard both engines agree on
# an empty shingle list (null text → null tokens → size -1 → empty).
_SHINGLES_FROM = (
    "case when size({t}) >= 3 then"
    " array_distinct(transform(sequence(1, size({t}) - 2),"
    " i -> concat_ws(' ', slice({t}, i, 3))))"
    " else cast(array() as array<string>) end"
)
SHINGLES_EXPR = _SHINGLES_FROM.format(t=TOKENS_EXPR)


def with_shingles(
    docs: DataFrame, id_col: str = "doc_id", materialize: bool = True
) -> DataFrame:
    """(id, shingles), persisted by default.

    The materialization barrier is load-bearing, not a cache nicety:
    when the shingle expression stays fused into a downstream
    explode/Generate, Spark re-evaluates the tokenize+shingle lambda
    pathologically (measured 7× slower end-to-end at sf0.1), and every
    dedup consumer explodes or double-joins this relation. At 100 TB
    this persist is the pipeline's materialized tokenize stage (a
    parquet intermediate); the dataflow is identical.
    """
    sh = spread(docs, id_col).select(
        id_col, F.expr(SHINGLES_EXPR).alias("shingles")
    )
    return sh.persist() if materialize else sh


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup: content hash → first (min doc_id) survivor."""
    return (
        spread(docs).groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dups"))
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold (a < b).

    Explode shingles → self-join on shingle → |A∩B| per pair →
    J = common / (|A| + |B| - common). The shingle join shuffles on
    the shingle key, so common shingles dominate cost — at scale run
    minhash_lsh_pairs first and verify only candidates.
    """
    sh = with_shingles(docs)  # persisted; read twice: sizes + explode
    sizes = sh.select("doc_id", F.size("shingles").alias("n_shingles"))
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    a = ex.alias("a")
    b = ex.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signature(
    docs: DataFrame, k: int = 8, shingles: DataFrame | None = None
) -> DataFrame:
    """k MinHash values per doc: min over shingles of md5(i || shingle).

    Lexicographic min of the md5 hex string == numeric min of the
    128-bit hash; identical in any SQL engine. Pass a precomputed
    ``shingles`` relation to avoid re-tokenizing (lsh_jaccard_pairs
    persists one shingle relation and feeds every stage from it).
    """
    sh = shingles if shingles is not None else with_shingles(docs)
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(i)), F.lit("|"), F.col("shingle")))).alias(
            f"mh{i}"
        )
        for i in range(k)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame, k: int = 8, bands: int = 4,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of k/bands minhashes.

    Scale path for near-dup dedup: signature build is one pass, band
    bucketing is a groupBy on (band_id, band_key) — candidate pairs
    are generated only inside equal buckets, never all-pairs.
    """
    rows_per_band = k // bands
    sig = minhash_signature(docs, k, shingles=shingles)
    band_cols = []
    for bidx in range(bands):
        cols = [f"mh{bidx * rows_per_band + j}" for j in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(bidx).alias("band_id"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    # persisted: the bucket self-join reads `banded` twice, and without
    # the persist each side re-runs tokenize → shingle → 8×md5 minhash
    # over the full corpus (Catalyst does not always reuse the exchange
    # across the join's two branches under AQE). The banded relation is
    # 3 small columns/doc — at 100 TB this is the materialized stage
    # between the signature pass and the bucket join.
    banded = (
        sig.select("doc_id", F.explode(F.array(*band_cols)).alias("band"))
        .select("doc_id", "band.band_id", "band.band_key")
        .persist()
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def lsh_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, k: int = 8, bands: int = 4
) -> DataFrame:
    """Near-dup pairs at scale: MinHash-LSH candidate generation +
    exact Jaccard verification on candidates only.

    The all-pairs shingle self-join (ngram_jaccard_pairs) is quadratic
    in shingle document-frequency; this pipeline is linear: signature
    pass → band bucket join → exact array_intersect on the (small)
    candidate set. Same hash family as minhash_lsh_pairs, so the
    DuckDB oracle reproduces it bit-for-bit.

    ONE shingle relation, persisted, feeds all three stages (signature,
    verify-left, verify-right) — tokenize+shingle is the dominant
    scalar cost and must run once over the corpus, not three times. At
    100 TB the persist becomes a materialized parquet stage between the
    tokenize pass and the joins; the dataflow is identical.
    """
    sh = with_shingles(docs)  # persisted; feeds all three stages
    cand = minhash_lsh_pairs(docs, k=k, bands=bands, shingles=sh)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.size("sh_a") + F.size("sh_b") - F.col("common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _simhash_bit_exprs(nbits: int = 32, hash_col: str = "h"):
    """SQL expressions (dialect-neutral) for SimHash bit votes.

    Bit j of token t = bit (3 - j%4) of hex digit j//4 of md5(t),
    extracted with instr/substr arithmetic that Spark SQL and DuckDB
    evaluate identically. ``hash_col`` must hold md5(tok), projected
    ONCE upstream — Catalyst does not CSE across independent aggregate
    expressions, so inlining md5 here would hash every token 32×.
    """
    exprs = []
    for j in range(nbits):
        digit = f"(instr('0123456789abcdef', substr({hash_col}, {j // 4 + 1}, 1)) - 1)"
        bit = f"(cast(floor({digit} / {2 ** (3 - j % 4)}) as int) % 2)"
        exprs.append(f"sum(case when {bit} = 1 then 1 else -1 end)")
    return exprs


def simhash(docs: DataFrame, nbits: int = 32) -> DataFrame:
    """32-bit SimHash per doc (bit j set iff the token-vote sum > 0)."""
    ex = spread(docs).select(
        "doc_id", F.explode(F.expr(TOKENS_EXPR)).alias("tok")
    ).select("doc_id", F.md5("tok").alias("h"))
    votes = ex.groupBy("doc_id").agg(
        *[F.expr(e).alias(f"v{j}") for j, e in enumerate(_simhash_bit_exprs(nbits))]
    )
    acc = F.lit(0).cast("long")
    for j in range(nbits):
        acc = acc + F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(0)
    return votes.select("doc_id", acc.alias("simhash"))


def simhash_sql(table: str = "documents", nbits: int = 32) -> str:
    """DuckDB/ANSI twin of ``simhash`` (same bit math, same hashing;
    md5 projected once in the hashed CTE, mirroring the Spark plan)."""
    votes = ",\n      ".join(
        f"{e} AS v{j}" for j, e in enumerate(_simhash_bit_exprs(nbits))
    )
    bits = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(nbits)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM {table}
    ), hashed AS (
      SELECT doc_id, md5(tok) AS h FROM toks
    ), votes AS (
      SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, {bits} AS simhash FROM votes
    """
