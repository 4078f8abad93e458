"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

Everything is built-in-expression only (whole-stage codegen; no Python
in the hot path) and each operator has a DuckDB-expressible SQL twin in
``crawler_spark.queries``. Shared primitives:

    tokens  = regexp_extract_all(lower(text), '[a-z0-9]+')
    stopset = tiny English function-word list (langid heuristic)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.operators.dedup import TOKENS_EXPR
from crawler_spark.operators.util import spread

EN_STOPWORDS = (
    "the,a,an,of,and,or,to,in,is,are,was,were,be,been,that,this,with,for,"
    "as,on,at,by,from,it,its,not,but,have,has,had"
)


def language_id(docs: DataFrame, threshold: float = 0.05) -> DataFrame:
    """n-gram-free language heuristic: share of tokens that are English
    function words; ≥ threshold → 'en', else 'other'. (A real system
    uses char-n-gram profiles per language; the heuristic exercises the
    same dataflow shape: tokenize → dictionary membership → ratio.)"""
    stop_arr = f"split('{EN_STOPWORDS}', ',')"
    # cast(… as double): bare 1.0 literals are DECIMAL in Spark SQL and
    # would make round() return decimal, not double
    ratio = F.expr(
        f"cast(size(array_intersect({TOKENS_EXPR}, {stop_arr})) as double)"
        f" / greatest(size(array_distinct({TOKENS_EXPR})), 1)"
    )
    return spread(docs).select(
        "doc_id",
        "lang",
        F.round(ratio, 4).alias("en_ratio"),
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("other")).alias(
            "pred_lang"
        ),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document quality in [0,1]:
    length score (chars/500 capped) × word-length sanity × alpha ratio.
    """
    n_chars = F.length("text")
    n_tokens = F.expr(f"size({TOKENS_EXPR})")
    mean_word = F.expr(
        f"aggregate({TOKENS_EXPR}, cast(0 as double), (a, t) -> a + length(t))"
    ) / F.greatest(n_tokens, F.lit(1))
    alpha_ratio = F.length(F.regexp_replace(F.lower("text"), "[^a-z]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 10), 1.0).otherwise(0.5)
    return spread(docs).select(
        "doc_id",
        F.round(len_score * word_score * alpha_ratio, 4).alias("quality"),
        F.round(mean_word, 4).alias("mean_word_len"),
        n_tokens.alias("n_tokens"),
    )


def token_count(docs: DataFrame) -> DataFrame:
    """Word tokens + a BPE-ish subword estimate: ceil(len(token)/4)
    summed (≈ GPT-style 4-chars-per-token heuristic, per token)."""
    n_tokens = F.expr(f"size({TOKENS_EXPR})")
    subwords = F.expr(
        f"aggregate({TOKENS_EXPR}, cast(0 as bigint),"
        " (a, t) -> a + cast(ceil(length(t) / 4.0) as bigint))"
    )
    return spread(docs).select(
        "doc_id", n_tokens.alias("n_words"), subwords.alias("n_subword_est")
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k terms per document by smoothed tf-idf.

    tfidf = tf × ln((N+1)/(df+1)); rank within doc by the 6-dp-rounded
    score (desc) then term (asc) — rounding before ranking makes the
    order deterministic across engines (ln differs by ≲1 ulp between
    libm and the JVM). N comes in via a broadcast single-row aggregate,
    not a driver-side count, so the whole thing is one declarative plan:
    explode → two partial-agg groupBys → broadcast joins → window.
    """
    ex = spread(docs).select(
        "doc_id", F.explode(F.expr(TOKENS_EXPR)).alias("term")
    )
    tf = ex.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = docs.agg(F.count("*").alias("n_docs"))
    from pyspark.sql import Window

    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


def hash_sample(
    docs: DataFrame,
    rates: DataFrame,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified sampling — the pipeline op that turns
    100 TB into a training mix. ``rates`` is a tiny dim
    (stratum, permille): a row is kept iff the md5 of its key lands
    under its stratum's per-mille threshold. Hash-based (not rand())
    so the sample is reproducible, join-stable across runs, and
    consistent between engines; broadcast join + codegen, no shuffle
    of the fact side. Strata absent from ``rates`` are dropped
    (permille 0)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 1000
    )
    return (
        docs.join(F.broadcast(rates), on=stratum_col, how="inner")
        .filter(bucket < F.col("permille"))
        .drop("permille")
    )


def fingerprint(docs: DataFrame, gram: int = 8, prefix: int = 200) -> DataFrame:
    """Rolling-hash document fingerprint: min md5 over the character
    8-grams of the first ``prefix`` chars (winnowing with window = all;
    stable under small suffix edits)."""
    expr = (
        f"array_min(transform(sequence(1, greatest(length(substr(text, 1, {prefix})) - {gram - 1}, 1)),"
        f" i -> md5(substr(substr(text, 1, {prefix}), i, {gram}))))"
    )
    return spread(docs).select("doc_id", F.expr(expr).alias("fingerprint"))


# bigrams share the corpus tokenizer; the size-guard mirrors
# SHINGLES_EXPR (dedup.py): Spark's sequence(1, 0) is DESCENDING, so
# short docs must short-circuit to an empty list, which is also what
# DuckDB's generate_series(1, 0) yields — the twins agree on <2-token
# and null-text rows.
BIGRAMS_EXPR = (
    "case when size({t}) >= 2 then"
    " transform(sequence(1, size({t}) - 1),"
    " i -> concat(element_at({t}, i), ' ', element_at({t}, i + 1)))"
    " else cast(array() as array<string>) end"
).format(t=TOKENS_EXPR)


def bigram_topk(docs: DataFrame, k: int = 20) -> DataFrame:
    """Global top-k bigram collocations over the corpus.

    Scale shape: explode → hash-agg with map-side partial combine →
    TakeOrdered(k) — the count shuffle moves one row per distinct
    bigram, and the top-k never sorts the full distribution. Ties
    break on the bigram string so the cut is deterministic across
    engines.
    """
    ex = spread(docs).select(F.explode(F.expr(BIGRAMS_EXPR)).alias("bigram"))
    counts = ex.groupBy("bigram").agg(F.count("*").alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("bigram").asc()).limit(k)
