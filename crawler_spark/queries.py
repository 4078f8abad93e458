"""Driver-contract queries: each engine operator demonstrated as a
DataFrame query over the driver's testdata tables, with a DuckDB-
runnable ANSI-SQL twin for value-level verification.

Keys map to SURVEY.md §2 operators (crawl engine) plus the
training-data pipeline operators (dedup / similarity / text analysis).
Every computed column is aliased identically in the DataFrame and the
SQL so the driver's order-insensitive value-hash compare matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.operators import asof as A
from crawler_spark.operators import components as C
from crawler_spark.operators import dedup as D
from crawler_spark.operators import graphrank as G
from crawler_spark.operators import robots as R
from crawler_spark.operators import similarity as S
from crawler_spark.operators import textstats as T
from crawler_spark.operators.multimodal import (
    attach_fake_payload,
    extract_features,
    resize_images,
    sample_frames,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# crawl-engine operator demos (SURVEY.md §2.1/§2.2)
# ---------------------------------------------------------------------------


def q_url_hash(spark, sf_dir):
    """Operator #7 (Unique id, collect/request.go:95-98): md5 identity
    hash over a text key, JVM-side."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.concat(F.col("text"), F.lit("GET"))).alias("url_hash")
    )


def q_url_hash_sql():
    return (
        "SELECT doc_id, md5(text || 'GET') AS url_hash FROM documents"
    )


def q_depth_filter(spark, sf_dir):
    """Operator #4 (depth check, request.go:87-92): strict-> filter."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") <= 3)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"))
    )


def q_depth_filter_sql():
    return (
        "SELECT l_returnflag, count(*) AS cnt FROM lineitem"
        " WHERE l_linenumber <= 3 GROUP BY l_returnflag"
    )


def q_priority_schedule(spark, sf_dir):
    """Operator #3 (two-level priority FIFO, schedule.go:177-206):
    priority class first, then FIFO (event_id = enqueue seq)."""
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            "event_type",
            "value",
            F.when(F.col("value") > 80, 0).otherwise(1).alias("pclass"),
        )
        .orderBy(F.col("pclass").asc(), F.col("event_id").asc())
        .limit(500)
    )


def q_priority_schedule_sql():
    return (
        "SELECT event_id, event_type, value,"
        " CASE WHEN value > 80 THEN 0 ELSE 1 END AS pclass"
        " FROM events ORDER BY pclass ASC, event_id ASC LIMIT 500"
    )


def q_seen_antijoin(spark, sf_dir):
    """Operators #5/#6 (URL-seen dedup via left-anti join,
    schedule.go:272-277): frontier=events, seen=customer keys."""
    events = _t(spark, sf_dir, "events")
    seen = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("user_id"))
    )
    return (
        events.join(seen, "user_id", "left_anti")
        .groupBy("event_type")
        .agg(F.count("*").alias("unseen_cnt"))
    )


def q_seen_antijoin_sql():
    return (
        "SELECT event_type, count(*) AS unseen_cnt FROM events"
        " WHERE user_id NOT IN"
        " (SELECT c_custkey FROM customer WHERE c_acctbal > 0)"
        " GROUP BY event_type"
    )


def q_dedup_first_wins(spark, sf_dir):
    """Within-batch dup keep-first (schedule.go:272-277 pull-time
    dedup): first event per (user_id, event_type) in seq order."""
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


def q_dedup_first_wins_sql():
    return (
        "SELECT user_id, event_type, first_event_id FROM ("
        " SELECT user_id, event_type, event_id AS first_event_id,"
        "  row_number() OVER (PARTITION BY user_id, event_type"
        "   ORDER BY event_id) AS rn FROM events) WHERE rn = 1"
    )


def q_host_budget(spark, sf_dir):
    """Operator #8 (politeness budget → per-host top-k window,
    limiter/limiter.go:16-49 discretized): first 5 events per
    event_type in time order."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("event_type", "event_id", "rk")
    )


def q_host_budget_sql():
    return (
        "SELECT event_type, event_id, rk FROM ("
        " SELECT event_type, event_id, row_number() OVER ("
        "  PARTITION BY event_type ORDER BY ts, event_id) AS rk"
        " FROM events) WHERE rk <= 5"
    )


def q_fetch_join(spark, sf_dir):
    """Operator #10 (simulated fetch = inner equi-join, broadcast
    small side; collect.go:25-43): orders × customer dim."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def q_fetch_join_sql():
    return (
        "SELECT c_mktsegment, count(*) AS n_orders,"
        " round(sum(o_totalprice), 2) AS revenue"
        " FROM orders JOIN customer ON o_custkey = c_custkey"
        " GROUP BY c_mktsegment"
    )


def q_fetch_failures(spark, sf_dir):
    """Operator #24 (failure path: requests with no page — anti-join;
    collect.go:35-37, schedule.go:350-364): orders w/o lineitems."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("failed_cnt"))
    )


def q_fetch_failures_sql():
    return (
        "SELECT o_orderstatus, count(*) AS failed_cnt FROM orders"
        " WHERE o_orderkey NOT IN (SELECT DISTINCT l_orderkey FROM lineitem)"
        " GROUP BY o_orderstatus"
    )


def q_regex_link_extract(spark, sf_dir):
    """Operators #16-17/19 (regex link extraction, parsebook.go:45-88):
    extractall + explode over documents.text."""
    return (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.expr(r"regexp_extract_all(text, '(sc[a-z]+)', 1)")
            ).alias("link"),
        )
        .groupBy("link")
        .agg(F.count("*").alias("cnt"))
    )


def q_regex_link_extract_sql():
    return (
        "SELECT link, count(*) AS cnt FROM ("
        " SELECT doc_id, unnest(regexp_extract_all(text, '(sc[a-z]+)', 1)) AS link"
        " FROM documents) GROUP BY link"
    )


def q_regex_field_extract(spark, sf_dir):
    """Operator #18 (single-capture field extract, ExtractStr
    parsebook.go:117-124: first match or '')."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_extract("text", r"(value [a-z]+)", 1).alias("field"),
    )


def q_regex_field_extract_sql():
    # DuckDB regexp_extract returns '' on no-match like Spark
    return (
        "SELECT doc_id, regexp_extract(text, '(value [a-z]+)', 1) AS field"
        " FROM documents"
    )


def q_regex_bool_match(spark, sf_dir):
    """Operator #20 (boolean content match, parseurl.go:61-78)."""
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("spark.*window"))
        .groupBy("lang")
        .agg(F.count("*").alias("matched"))
    )


def q_regex_bool_match_sql():
    return (
        "SELECT lang, count(*) AS matched FROM documents"
        " WHERE regexp_matches(text, 'spark.*window') GROUP BY lang"
    )


def q_union_frontier(spark, sf_dir):
    """Operator #23 (union of emitted requests into the frontier,
    schedule.go:306-309) + distinct."""
    a = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    b = _t(spark, sf_dir, "events").select(F.col("user_id").alias("key"))
    return (
        a.unionByName(b).distinct().agg(F.count("*").alias("n_distinct_keys"))
    )


def q_union_frontier_sql():
    return (
        "SELECT count(*) AS n_distinct_keys FROM ("
        " SELECT o_custkey AS key FROM orders"
        " UNION SELECT user_id AS key FROM events)"
    )


def q_agg_metrics(spark, sf_dir):
    """Operator #35 / §2.2 aggregations (lineage metrics rollups):
    TPC-H Q1-shaped pricing summary."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_agg_metrics_sql():
    return (
        "SELECT l_returnflag, l_linestatus,"
        " round(sum(l_quantity), 2) AS sum_qty,"
        " round(sum(l_extendedprice), 2) AS sum_base_price,"
        " round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,"
        " round(avg(l_discount), 6) AS avg_disc,"
        " count(*) AS count_order"
        " FROM lineitem GROUP BY l_returnflag, l_linestatus"
    )


def q_rollup_metrics(spark, sf_dir):
    """Grouping-sets surface: ROLLUP over region/nation (metrics
    lineage rollup per round/host analogue)."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    cust = _t(spark, sf_dir, "customer")
    j = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_cust"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_cust",
        )
    )


def q_rollup_metrics_sql():
    return (
        "SELECT coalesce(r_name, 'ALL') AS region_name,"
        " coalesce(n_name, 'ALL') AS nation_name, count(*) AS n_cust"
        " FROM customer JOIN nation ON c_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey"
        " GROUP BY ROLLUP (r_name, n_name)"
    )


def q_topk_global(spark, sf_dir):
    """Sort/limit surface (TakeOrdered — the per-round batch cut)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


def q_topk_global_sql():
    return (
        "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders"
        " ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"
    )


def q_event_windows(spark, sf_dir):
    """Event-time tumbling windows (streaming §2.2 batch analogue):
    hourly counts + sums."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_event_windows_sql():
    return (
        "SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events,"
        " round(sum(value), 2) AS sum_value FROM events GROUP BY 1"
    )


def q_running_state(spark, sf_dir):
    """Stateful-stream analogue: per-user running event count in time
    order (applyInPandasWithState batch twin)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 100)
        .select(
            "user_id", "event_id", F.count("*").over(w).alias("running_cnt")
        )
    )


def q_running_state_sql():
    return (
        "SELECT user_id, event_id, count(*) OVER ("
        " PARTITION BY user_id ORDER BY ts, event_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt"
        " FROM events WHERE user_id < 100"
    )


def q_json_props(spark, sf_dir):
    """Scalar-function surface incl. JSON (sqlstorage.go:100-115
    marshals non-strings to JSON): extract props.k."""
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .filter(F.col("k") > 90)
    )


def q_json_props_sql():
    return (
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k"
        " FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) > 90"
    )


# ---------------------------------------------------------------------------
# training-data pipeline operators
# ---------------------------------------------------------------------------


def q_semi_join(spark, sf_dir):
    """Left-semi join surface (the dual of the seen anti-join):
    customers that do have orders, per segment."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        cust.join(orders, "c_custkey", "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("active_cnt"))
    )


def q_semi_join_sql():
    return (
        "SELECT c_mktsegment, count(*) AS active_cnt FROM customer"
        " WHERE c_custkey IN (SELECT o_custkey FROM orders)"
        " GROUP BY c_mktsegment"
    )


def q_clean_text(spark, sf_dir):
    """Normalization scalar surface: lower + collapse whitespace +
    strip non-alnum, keyed by md5 for verification."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), "[^a-z0-9 ]", ""),
        " +",
        " ",
    )
    return _t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(norm).alias("norm_hash")
    )


def q_clean_text_sql():
    return (
        "SELECT doc_id, md5(regexp_replace(regexp_replace("
        "lower(trim(text)), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
        " AS norm_hash FROM documents"
    )


def q_minhash_signature(spark, sf_dir):
    """The raw MinHash signature table (k=8 md5 minima per doc)."""
    return D.minhash_signature(_t(spark, sf_dir, "documents"), k=8)


def q_minhash_signature_sql():
    mh = ", ".join(
        f"min(md5('{i}' || '|' || shingle)) AS mh{i}" for i in range(8)
    )
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 2, 0)),
               i -> array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[i:i+2], ' ')
             )) AS shingles
      FROM documents
    ), ex AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM t
    )
    SELECT doc_id, {mh} FROM ex GROUP BY doc_id
    """


def q_dedup_exact(spark, sf_dir):
    return D.exact_dedup(_t(spark, sf_dir, "documents"))


def q_dedup_exact_sql():
    return (
        "SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,"
        " count(*) AS n_dups FROM documents GROUP BY md5(text)"
    )


def q_ngram_jaccard(spark, sf_dir):
    return D.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)


def q_ngram_jaccard_sql():
    return """
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 2, 0)),
               i -> array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[i:i+2], ' ')
             )) AS shingles
      FROM documents
    ), sizes AS (
      SELECT doc_id, len(shingles) AS n_shingles FROM t
    ), ex AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM t
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(common * 1.0 / (sa.n_shingles + sb.n_shingles - common), 4) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE round(common * 1.0 / (sa.n_shingles + sb.n_shingles - common), 4) >= 0.5
    """


def q_minhash_lsh(spark, sf_dir):
    return D.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), k=8, bands=4)


def _minhash_lsh_ctes():
    """The minhash-LSH candidate pipeline as a reusable CTE chain
    ('t AS …, ex …, sig …, banded …') — shared by the minhash_lsh
    oracle and the dedup_groups oracle, which closes over its pairs."""
    mh = ",\n      ".join(
        f"min(md5('{i}' || '|' || shingle)) AS mh{i}" for i in range(8)
    )
    bands = []
    for b in range(4):
        cols = f"mh{b * 2} || '|' || mh{b * 2 + 1}"
        bands.append(f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_key FROM sig")
    banded = " UNION ALL ".join(bands)
    return f"""t AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 2, 0)),
               i -> array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[i:i+2], ' ')
             )) AS shingles
      FROM documents
    ), ex AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM t
    ), sig AS (
      SELECT doc_id, {mh} FROM ex GROUP BY doc_id
    ), banded AS (
      {banded}
    )"""


_MINHASH_PAIRS_SELECT = """
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    """


def q_minhash_lsh_sql():
    return f"WITH {_minhash_lsh_ctes()}{_MINHASH_PAIRS_SELECT}"


def q_ngram_jaccard_lsh(spark, sf_dir):
    """Scale path: LSH candidates + exact Jaccard verify (linear
    candidate generation instead of the quadratic shingle self-join)."""
    return D.lsh_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5)


def q_ngram_jaccard_lsh_sql():
    mh = ",\n      ".join(
        f"min(md5('{i}' || '|' || shingle)) AS mh{i}" for i in range(8)
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id,"
        f" md5(mh{b * 2} || '|' || mh{b * 2 + 1}) AS band_key FROM sig"
        for b in range(4)
    )
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 2, 0)),
               i -> array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[i:i+2], ' ')
             )) AS shingles
      FROM documents
    ), ex AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM t
    ), sig AS (
      SELECT doc_id, {mh} FROM ex GROUP BY doc_id
    ), banded AS (
      {bands}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           round(len(list_intersect(ta.shingles, tb.shingles)) * 1.0
                 / (len(ta.shingles) + len(tb.shingles)
                    - len(list_intersect(ta.shingles, tb.shingles))), 4) AS jaccard
    FROM cand
    JOIN t ta ON ta.doc_id = doc_a
    JOIN t tb ON tb.doc_id = doc_b
    WHERE round(len(list_intersect(ta.shingles, tb.shingles)) * 1.0
                / (len(ta.shingles) + len(tb.shingles)
                   - len(list_intersect(ta.shingles, tb.shingles))), 4) >= 0.5
    """


def q_simhash(spark, sf_dir):
    return D.simhash(_t(spark, sf_dir, "documents"))


def q_simhash_sql():
    return D.simhash_sql("documents")


def q_ann_brute_force(spark, sf_dir):
    return S.brute_force_topk(_t(spark, sf_dir, "embeddings"), n_queries=5, k=3)


def q_ann_brute_force_sql():
    return """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, e.vec_id AS cand_id,
             round(
               list_sum(list_transform(generate_series(1, len(qv)),
                 i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(generate_series(1, len(qv)),
                    i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
             , 6) AS score
      FROM embeddings e JOIN q ON e.vec_id != q.query_id
    )
    SELECT query_id, cand_id, score, rank FROM (
      SELECT query_id, cand_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, cand_id ASC) AS rank
      FROM scored)
    WHERE rank <= 3
    """


_COSINE_SQL = """
             round(
               list_sum(list_transform(generate_series(1, len(qv)),
                 i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(generate_series(1, len(qv)),
                    i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
                    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))
             , 6)"""


def q_ann_ivf(spark, sf_dir):
    """IVF with a computed k-means-lite coarse quantizer (deterministic
    sampled centroids + argmin assignment), not a pre-labeled cell."""
    return S.ivf_topk(_t(spark, sf_dir, "embeddings"), n_queries=5, k=3, step=127)


def q_ann_ivf_sql():
    sqdist = """round(list_sum(list_transform(generate_series(1, len(e.embedding)),
               i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.centv[i] AS DOUBLE))
                  * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.centv[i] AS DOUBLE)))), 6)"""
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS centv FROM embeddings WHERE vec_id % 127 = 0
    ), assigned AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {sqdist} ASC, c.cid ASC) AS rn
        FROM embeddings e CROSS JOIN cent c) WHERE rn = 1
    ), q AS (
      SELECT e.vec_id AS query_id, e.embedding AS qv, a.cell AS qcell
      FROM embeddings e JOIN assigned a ON a.vec_id = e.vec_id
      WHERE e.vec_id < 5
    ), scored AS (
      SELECT q.query_id, e.vec_id AS cand_id, {_COSINE_SQL} AS score
      FROM embeddings e
      JOIN assigned a ON a.vec_id = e.vec_id
      JOIN q ON a.cell = q.qcell AND e.vec_id != q.query_id
    )
    SELECT query_id, cand_id, score, rank FROM (
      SELECT query_id, cand_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, cand_id ASC) AS rank
      FROM scored)
    WHERE rank <= 3
    """


def q_ann_lsh(spark, sf_dir):
    """Hyperplane-LSH ANN with Hamming-1 multi-probe. n_planes trades
    recall against pruning (2^planes buckets); 4 planes + multi-probe
    measures 0.56 recall@5 at 31% candidate fraction on this corpus —
    at larger scale you raise planes and/or add hash tables."""
    return S.lsh_bucket_topk(
        _t(spark, sf_dir, "embeddings"), n_queries=5, k=3, n_planes=4, dim=64
    )


def q_ann_lsh_sql(n_planes: int = 8, dim: int = 64):
    # same constant-folded weight matrix as the Spark plan
    # (S.hyperplane_weights): identical numeric literals on both
    # sides → identical buckets → identical hashes
    def wlit(p):
        return "[" + ", ".join(repr(w) for w in S.hyperplane_weights(p, dim)) + "]"

    dots = " + ".join(
        f"""(CASE WHEN list_sum(list_transform(generate_series(0, len(embedding) - 1),
          i -> CAST(embedding[i + 1] AS DOUBLE) * ({wlit(p)})[i + 1]))
          > 0 THEN {1 << p} ELSE 0 END)"""
        for p in range(n_planes)
    )
    return f"""
    WITH sig AS (
      SELECT vec_id, embedding, {dots} AS bucket FROM embeddings
    ), q AS (
      SELECT s.vec_id AS query_id, s.embedding AS qv,
             CASE WHEN t.g = 0 THEN s.bucket
                  ELSE xor(s.bucket, (1 << (t.g - 1))) END AS qb
      FROM sig s CROSS JOIN generate_series(0, {n_planes}) AS t(g)
      WHERE s.vec_id < 5
    ), scored AS (
      SELECT q.query_id, e.vec_id AS cand_id, q.qv, e.embedding, {_COSINE_SQL} AS score
      FROM sig e JOIN q ON e.bucket = q.qb AND e.vec_id != q.query_id
    )
    SELECT query_id, cand_id, score, rank FROM (
      SELECT query_id, cand_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, cand_id ASC) AS rank
      FROM scored)
    WHERE rank <= 3
    """


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, cell-blocked (SemDeDup shape):
    linear candidate generation via multi-assigned k-means-lite cells,
    exact cosine verify on candidates only. Threshold 0.45 ≈ the top
    pair-density knee of the synthetic corpus (random 64-d vectors
    have no true dups; real near-dup corpora use 0.9+)."""
    return S.neardup_cosine_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.45, step=127, probes=3
    )


def q_embedding_neardup_sql(step: int = 127, probes: int = 3,
                            threshold: float = 0.45):
    sqdist = """round(list_sum(list_transform(generate_series(1, len(e.embedding)),
               i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.centv[i] AS DOUBLE))
                  * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.centv[i] AS DOUBLE)))), 6)"""
    cosine = """round(
        list_sum(list_transform(generate_series(1, len(ea)),
          i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(generate_series(1, len(ea)),
             i -> CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE))))
         * sqrt(list_sum(list_transform(generate_series(1, len(eb)),
             i -> CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))))), 6)"""
    return f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS centv FROM embeddings
      WHERE vec_id % {step} = 0
    ), assigned AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {sqdist} ASC, c.cid ASC) AS rn
        FROM embeddings e CROSS JOIN cent c) WHERE rn <= {probes}
    ), cand AS (
      SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      FROM assigned x JOIN assigned y
        ON x.cell = y.cell AND x.vec_id < y.vec_id
    ), verified AS (
      SELECT cand.a, cand.b, {cosine} AS score
      FROM cand
      JOIN (SELECT vec_id, embedding AS ea FROM embeddings) pa ON pa.vec_id = cand.a
      JOIN (SELECT vec_id, embedding AS eb FROM embeddings) pb ON pb.vec_id = cand.b
    )
    SELECT a, b, score FROM verified WHERE score >= {threshold}
    """


def q_lang_id(spark, sf_dir):
    return T.language_id(_t(spark, sf_dir, "documents"))


def q_lang_id_sql():
    stop = T.EN_STOPWORDS
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    ratio = (
        f"len(list_intersect(list_distinct({toks}), string_split('{stop}', ',')))"
        f" * 1.0 / greatest(len(list_distinct({toks})), 1)"
    )
    return (
        f"SELECT doc_id, lang, round({ratio}, 4) AS en_ratio,"
        f" CASE WHEN {ratio} >= 0.05 THEN 'en' ELSE 'other' END AS pred_lang"
        f" FROM documents"
    )


def q_quality(spark, sf_dir):
    return T.quality_score(_t(spark, sf_dir, "documents"))


def q_quality_sql():
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    mean_word = (
        f"list_sum(list_transform({toks}, t -> CAST(length(t) AS DOUBLE)))"
        f" / greatest(len({toks}), 1)"
    )
    alpha = (
        "length(regexp_replace(lower(text), '[^a-z]', '', 'g'))"
        " * 1.0 / greatest(length(text), 1)"
    )
    len_score = "least(length(text) / 500.0, 1.0)"
    word_score = (
        f"CASE WHEN {mean_word} >= 3 AND {mean_word} <= 10 THEN 1.0 ELSE 0.5 END"
    )
    return (
        f"SELECT doc_id,"
        f" round({len_score} * {word_score} * {alpha}, 4) AS quality,"
        f" round({mean_word}, 4) AS mean_word_len,"
        f" len({toks}) AS n_tokens"
        f" FROM documents"
    )


def q_token_count(spark, sf_dir):
    return T.token_count(_t(spark, sf_dir, "documents"))


def q_token_count_sql():
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    return (
        f"SELECT doc_id, len({toks}) AS n_words,"
        f" CAST(list_sum(list_transform({toks},"
        f" t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_subword_est"
        f" FROM documents"
    )


def q_fingerprint(spark, sf_dir):
    return T.fingerprint(_t(spark, sf_dir, "documents"))


def q_fingerprint_sql():
    return """
    SELECT doc_id,
           list_min(list_transform(
             generate_series(1, greatest(length(substr(text, 1, 200)) - 7, 1)),
             i -> md5(substr(substr(text, 1, 200), i, 8)))) AS fingerprint
    FROM documents
    """


def q_multimodal_features(spark, sf_dir):
    """Binary-column plumbing (mapInPandas decode stub). The decode is
    deterministic md5 arithmetic over the payload bytes, so it has an
    exact DuckDB twin — the Arrow/binary contract itself is what the
    Spark side exercises."""
    docs = _t(spark, sf_dir, "documents")
    return extract_features(attach_fake_payload(docs)).select(
        "media_id", "kind", "n_bytes", "content_hash", "width", "height"
    )


def _hex4(h: str, start: int) -> str:
    """SQL int value of 4 hex digits of ``h`` starting at 1-based
    ``start`` (same instr/substr trick as simhash_sql)."""
    parts = [
        f"(instr('0123456789abcdef', substr({h}, {start + i}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(parts) + ")"


def q_multimodal_features_sql():
    # payload = utf-8 bytes of text → md5(text); fake dims follow
    # operators/multimodal.py:_decode_stub exactly
    h = "md5(text)"
    return f"""
    SELECT doc_id AS media_id,
           'image' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash,
           CAST(64 + {_hex4(h, 1)} % 1984 AS INT) AS width,
           CAST(64 + {_hex4(h, 5)} % 1984 AS INT) AS height
    FROM documents
    """


def q_multimodal_frames(spark, sf_dir):
    """Video frame sampling over binary payloads: mapInPandas with a
    cardinality change (1 media row → n_frames frame rows) — the
    Spark-side contract of an ffmpeg frame grabber, deterministic
    stub decode, exact DuckDB twin."""
    docs = _t(spark, sf_dir, "documents")
    return sample_frames(attach_fake_payload(docs, kind="video"))


def q_multimodal_frames_sql():
    h = "md5(text)"
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id, {h} AS h,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ), f AS (
      SELECT media_id, h, n_bytes,
             1 + ({_hex4('h', 9)} % 7) AS n_frames
      FROM m
    )
    SELECT media_id,
           CAST(t.i AS INT) AS frame_index,
           (t.i * n_bytes) // n_frames AS timestamp_ms,
           md5(h || '_' || CAST(t.i AS VARCHAR)) AS frame_hash
    FROM f CROSS JOIN generate_series(0, 6) AS t(i)
    WHERE t.i < n_frames
    """


def q_multimodal_resize(spark, sf_dir):
    """Aspect-preserving thumbnail planning over image payloads —
    integer-exact target dims, 6-dp scale string."""
    docs = _t(spark, sf_dir, "documents")
    return resize_images(attach_fake_payload(docs, kind="image"), max_side=256)


def q_multimodal_resize_sql(max_side: int = 256):
    h = "md5(text)"
    return f"""
    WITH dims AS (
      SELECT doc_id AS media_id,
             CAST(64 + {_hex4(h, 1)} % 1984 AS INT) AS width,
             CAST(64 + {_hex4(h, 5)} % 1984 AS INT) AS height
      FROM documents
    )
    SELECT media_id, width, height,
           CAST(CASE WHEN greatest(width, height) <= {max_side} THEN width
                ELSE (width * {max_side}) // greatest(width, height) END AS INT)
             AS out_width,
           CAST(CASE WHEN greatest(width, height) <= {max_side} THEN height
                ELSE (height * {max_side}) // greatest(width, height) END AS INT)
             AS out_height,
           CASE WHEN greatest(width, height) <= {max_side} THEN '1.000000'
                ELSE printf('%.6f', {max_side}.0 / greatest(width, height)) END
             AS scale
    FROM dims
    """


def q_asof_join(spark, sf_dir):
    """As-of join (recaptured-corpus semantics, input_hint warc_ts):
    for each purchase event, the user's latest click at-or-before it.
    Spark has no ASOF JOIN; operators/asof.py is the one-shuffle
    union+window formulation, and the DuckDB twin uses the native
    ASOF LEFT JOIN — two independent algorithms, same rows."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # right side made unique per (key, ts) so the as-of pick is
    # deterministic (DuckDB picks an arbitrary row on exact ties)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", F.col("ts").alias("click_ts"), "click_id")
    )
    return A.asof_join(
        purchases, clicks, key="user_id", left_ts="ts",
        right_ts="click_ts", carry=["click_id", "click_ts"],
    )


def q_asof_join_sql():
    return """
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts AS click_ts, max(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """


_HOST_RANK_EDGES_SQL = """
    SELECT src, dst FROM (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey) e
    UNION ALL
    SELECT dst AS src, src AS dst FROM (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey) e2
"""


def q_host_rank(spark, sf_dir):
    """Fixed-iteration PageRank over the customer↔supplier link graph
    (the host-authority signal a 100 TB frontier prioritizes on; the
    Go reference's FIFO has none). 3 unrolled iterations, oracled by
    the same iterations as chained CTEs. Ranks rounded to 4dp: both
    engines sum contributions in different orders (~1e-11 spread on
    O(100) values), so 6dp would sit flips on the rounding boundary."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return G.pagerank(edges, iterations=3, round_to=4)


def q_host_rank_sql():
    sql = G.pagerank_sql(_HOST_RANK_EDGES_SQL, iterations=3)
    return sql.replace("round(rank, 6)", "round(rank, 4)")


_ROBOTS_RULES = [
    # (host, path_prefix, allow) — longest matching prefix wins;
    # '/src1' also matches '/src1x/...' (pure prefix, no segment
    # boundary), and the longer '/src12' allow-override tests the
    # longest-prefix pick
    *[(f"h{i}.example.com", "/src1", False) for i in range(5)],
    *[(f"h{i}.example.com", "/src12", True) for i in range(3)],
]


def q_robots_filter(spark, sf_dir):
    """robots.txt enforcement as a standalone contract query (the
    engine applies the same operator inside _eligible): synthesize a
    deterministic url per document, drop rows denied by the
    longest-matching-prefix rule table."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("h"), (F.col("doc_id") % 20).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        "source",
    )
    frontier = docs.select(
        "doc_id",
        "host",
        F.concat(
            F.lit("http://"), F.col("host"), F.lit("/"), F.col("source"),
            F.lit("/"), F.col("doc_id").cast("string"),
        ).alias("canon_url"),
    )
    robots = spark.createDataFrame(
        _ROBOTS_RULES, "host string, path_prefix string, allow boolean"
    )
    return R.filter_robots_allowed(frontier, robots).select("doc_id", "host")


def q_robots_filter_sql():
    vals = ", ".join(
        f"('{h}', '{p}', {str(a).lower()})" for h, p, a in _ROBOTS_RULES
    )
    return f"""
    WITH f AS (
      SELECT doc_id,
             'h' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS host,
             '/' || source || '/' || CAST(doc_id AS VARCHAR) AS path
      FROM documents
    ), r AS (
      SELECT * FROM (VALUES {vals}) AS t(host, path_prefix, allow)
    ), dec AS (
      SELECT f.doc_id, f.host,
             arg_max(r.allow, length(r.path_prefix)) AS decision
      FROM f LEFT JOIN r
        ON f.host = r.host AND starts_with(f.path, r.path_prefix)
      GROUP BY f.doc_id, f.host
    )
    SELECT doc_id, host FROM dec WHERE coalesce(decision, true)
    """


def q_tfidf(spark, sf_dir):
    """Top-3 tf-idf terms per document — the feature-extraction shape
    (explode → partial-agg groupBys → broadcast N → window top-k)
    a quality/topic scorer runs over the whole corpus."""
    return T.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


def q_tfidf_sql(k: int = 3):
    toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    return f"""
    WITH ex AS (
      SELECT doc_id, unnest({toks}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), nd AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             round(tf.tf * ln((CAST(n_docs AS DOUBLE) + 1.0)
                              / (CAST(df AS DOUBLE) + 1.0)), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tf, df, tfidf, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rank
      FROM scored)
    WHERE rank <= {k}
    """


_SAMPLE_RATES = [("en", 300), ("de", 500), ("zh", 0), ("fr", 1000)]


def q_hash_sample(spark, sf_dir):
    """Deterministic stratified sampling: per-language keep rates via
    md5-bucket thresholds — the reproducible training-mix downsample
    (same sample every run, no rand())."""
    rates = spark.createDataFrame(_SAMPLE_RATES, "lang string, permille int")
    return T.hash_sample(
        _t(spark, sf_dir, "documents"), rates
    ).select("doc_id", "lang", "source")


def q_hash_sample_sql():
    vals = ", ".join(f"('{s}', {p})" for s, p in _SAMPLE_RATES)
    bucket = _hex4("md5(CAST(doc_id AS VARCHAR))", 1) + " % 1000"
    return f"""
    WITH rates AS (SELECT * FROM (VALUES {vals}) AS t(lang, permille))
    SELECT doc_id, d.lang, source
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {bucket} < r.permille
    """


def q_sessionize(spark, sf_dir):
    """Gap-timeout sessionization (30 min) of the event log, rolled up
    per (user, session): the web-log training-pipeline shape — one
    shuffle on user_id shared by the lag window, the running-sum
    window, and the rollup groupBy."""
    from crawler_spark.operators.sessions import session_rollup

    return session_rollup(_t(spark, sf_dir, "events"), gap_minutes=30)


def q_sessionize_sql():
    from crawler_spark.operators.sessions import session_rollup_sql

    return session_rollup_sql(gap_minutes=30)


def q_range_join(spark, sf_dir):
    """Point-in-interval range join (Spark has no native one): the 8
    busiest users' first-2-hour windows vs every event, joined via the
    grain-bucketed equi-join (operators/rangejoin.py) — the 100 TB
    path where the interval side never broadcasts."""
    from crawler_spark.operators.rangejoin import (
        point_in_interval_join_bucketed,
    )

    events = _t(spark, sf_dir, "events")
    hot = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.min("ts").alias("w_start"))
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(8)
        .select(
            F.col("user_id").alias("hot_user"),
            "w_start",
            F.expr("w_start + INTERVAL 2 HOURS").alias("w_end"),
        )
    )
    j = point_in_interval_join_bucketed(
        events, hot, "ts", "w_start", "w_end", grain_minutes=30
    )
    return j.groupBy("hot_user", "w_start", "w_end").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_range_join_sql():
    return """
    WITH hot AS (
      SELECT user_id AS hot_user, min(ts) AS w_start,
             min(ts) + INTERVAL 2 HOUR AS w_end
      FROM events
      GROUP BY user_id
      ORDER BY count(*) DESC, user_id ASC
      LIMIT 8
    )
    SELECT hot_user, w_start, w_end,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users
    FROM hot JOIN events e
      ON e.ts BETWEEN hot.w_start AND hot.w_end
    GROUP BY hot_user, w_start, w_end
    """


def q_value_percentiles(spark, sf_dir):
    """Exact linear-interpolation percentiles of event value per type —
    the distribution-profiling pass a data-quality gate runs. Exact
    (not approx_percentile) so the DuckDB quantile_cont twin matches
    bit-for-bit at 6 dp; at 100 TB the same shape swaps in
    approx_percentile with a documented error bound."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr("percentile(value, 0.5D)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9D)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99D)"), 6).alias("p99"),
        )
    )


def q_value_percentiles_sql():
    return """
    SELECT event_type, count(*) AS n,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
    """


def q_bigram_topk(spark, sf_dir):
    """Global top-20 bigram collocations — token-level corpus stats
    (explode → partial-agg count → TakeOrdered), the n-gram LM /
    contamination-screen building block."""
    return T.bigram_topk(_t(spark, sf_dir, "documents"), k=20)


def q_bigram_topk_sql(k: int = 20):
    return f"""
    WITH t AS (
      SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      FROM documents
    ), ex AS (
      SELECT unnest(generate_series(1, len(toks) - 1)) AS i, toks FROM t
    ), b AS (
      SELECT toks[i] || ' ' || toks[i + 1] AS bigram FROM ex
    ), c AS (
      SELECT bigram, count(*) AS n FROM b GROUP BY bigram
    )
    SELECT bigram, n FROM c ORDER BY n DESC, bigram ASC LIMIT {k}
    """


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct count per language (operators/sketches.py):
    the mergeable-sketch answer to grouped count(DISTINCT) — m=256
    register maxima per group (map-side partial max, one m-rows-per-
    group shuffle), never a shuffle of the distinct keys themselves.
    Register/rank arithmetic is md5-digit-exact so the DuckDB twin runs
    the identical algorithm."""
    from crawler_spark.operators import sketches as K

    return K.hll_distinct(_t(spark, sf_dir, "documents"), key="text", group="lang")


def q_hll_distinct_sql():
    from crawler_spark.operators import sketches as K

    return K.hll_distinct_sql("documents", key="text", group="lang")


def q_snapshot_diff(spark, sf_dir):
    """Snapshot CDC (operators/snapshot.py): FULL OUTER join of two
    deterministic captures of the documents table (md5-bucket split:
    buckets 0-7 = old, 2-9 = new, every 3rd new bucket's content
    perturbed) → per-key added/removed/changed/same. One co-partitioned
    shuffle per side, hashes compared instead of bodies."""
    from crawler_spark.operators.snapshot import snapshot_diff

    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 10
    )
    base = docs.select("doc_id", "text", bucket.alias("b"))
    old = base.filter(F.col("b") < 8).select(
        "doc_id", F.md5("text").alias("content_hash")
    )
    new = base.filter(F.col("b") >= 2).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("b") % 3 == 0, F.concat(F.col("text"), F.lit("!"))
            ).otherwise(F.col("text"))
        ).alias("content_hash"),
    )
    return snapshot_diff(old, new)


def q_snapshot_diff_sql():
    bucket = _hex4("md5(CAST(doc_id AS VARCHAR))", 1) + " % 10"
    return f"""
    WITH base AS (
      SELECT doc_id, text, {bucket} AS b FROM documents
    ), old AS (
      SELECT doc_id, md5(text) AS content_hash FROM base WHERE b < 8
    ), new AS (
      SELECT doc_id,
             md5(CASE WHEN b % 3 = 0 THEN text || '!' ELSE text END)
               AS content_hash
      FROM base WHERE b >= 2
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.content_hash <> n.content_hash THEN 'changed'
                ELSE 'same' END AS status
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    """


def q_connected_components(spark, sf_dir):
    """Connected components (min-label propagation + pointer jumping,
    run to the label-sum fixpoint) over per-customer order chains:
    edge o_orderkey → next o_orderkey of the same customer, so each
    component is one customer's order path and the label is its
    minimum order key. Path graphs are label propagation's worst case
    (O(diameter) rounds); the compress step collapses them in
    O(log d), which is what this query pins. Oracle = exact
    transitive closure via DuckDB recursive CTE, so convergence — not
    a fixed iteration count — is what's checked."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    edges = o.select(
        F.col("o_orderkey").alias("src"),
        F.lead("o_orderkey").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    return C.connected_components(edges)


_ORDER_CHAIN_EDGES_SQL = """
      SELECT src, dst FROM (
        SELECT o_orderkey AS src,
               lead(o_orderkey) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderkey
               ) AS dst
        FROM orders
      ) WHERE dst IS NOT NULL
    """


def q_connected_components_sql():
    return C.connected_components_sql(_ORDER_CHAIN_EDGES_SQL)


def q_dedup_groups(spark, sf_dir):
    """Transitive near-dup grouping: minhash-LSH candidate pairs →
    connected components → (doc_id, group_id, group_size) with the
    group's minimum doc_id as canonical keeper and singletons kept as
    their own group. This is the missing last mile of LSH dedup at
    100 TB — A~B and B~C must collapse {A,B,C} even though A~C was
    never a candidate pair."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, k=8, bands=4)
    return C.dedup_groups(docs, pairs)


def q_dedup_groups_sql():
    return f"""
    WITH RECURSIVE {_minhash_lsh_ctes()},
    pairs AS ({_MINHASH_PAIRS_SELECT}),
    sym AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    cnodes AS (SELECT DISTINCT src AS node FROM sym),
    reach(node, root) AS (
      SELECT node, node FROM cnodes
      UNION
      SELECT s.dst, r.root FROM reach r JOIN sym s ON s.src = r.node
    ),
    comp AS (SELECT node, min(root) AS component FROM reach GROUP BY node),
    grouped AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS group_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT g.doc_id, g.group_id, s.group_size
    FROM grouped g JOIN (
      SELECT group_id, count(*) AS group_size FROM grouped GROUP BY group_id
    ) s USING (group_id)
    """


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    "url_hash": q_url_hash,
    "depth_filter": q_depth_filter,
    "priority_schedule": q_priority_schedule,
    "seen_antijoin": q_seen_antijoin,
    "dedup_first_wins": q_dedup_first_wins,
    "host_budget": q_host_budget,
    "fetch_join": q_fetch_join,
    "fetch_failures": q_fetch_failures,
    "regex_link_extract": q_regex_link_extract,
    "regex_field_extract": q_regex_field_extract,
    "regex_bool_match": q_regex_bool_match,
    "union_frontier": q_union_frontier,
    "agg_metrics": q_agg_metrics,
    "rollup_metrics": q_rollup_metrics,
    "topk_global": q_topk_global,
    "event_windows": q_event_windows,
    "running_state": q_running_state,
    "json_props": q_json_props,
    "semi_join": q_semi_join,
    "clean_text": q_clean_text,
    "minhash_signature": q_minhash_signature,
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard": q_ngram_jaccard,
    "ngram_jaccard_lsh": q_ngram_jaccard_lsh,
    "minhash_lsh": q_minhash_lsh,
    "simhash": q_simhash,
    "ann_brute_force": q_ann_brute_force,
    "ann_ivf": q_ann_ivf,
    "ann_lsh": q_ann_lsh,
    "embedding_neardup": q_embedding_neardup,
    "lang_id": q_lang_id,
    "quality": q_quality,
    "token_count": q_token_count,
    "fingerprint": q_fingerprint,
    "multimodal_features": q_multimodal_features,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_resize": q_multimodal_resize,
    "asof_join": q_asof_join,
    "host_rank": q_host_rank,
    "robots_filter": q_robots_filter,
    "tfidf_topterms": q_tfidf,
    "hash_sample": q_hash_sample,
    "sessionize": q_sessionize,
    "range_join": q_range_join,
    "value_percentiles": q_value_percentiles,
    "bigram_topk": q_bigram_topk,
    "hll_distinct": q_hll_distinct,
    "snapshot_diff": q_snapshot_diff,
    "connected_components": q_connected_components,
    "dedup_groups": q_dedup_groups,
}

ORACLES = {
    "url_hash": q_url_hash_sql(),
    "depth_filter": q_depth_filter_sql(),
    "priority_schedule": q_priority_schedule_sql(),
    "seen_antijoin": q_seen_antijoin_sql(),
    "dedup_first_wins": q_dedup_first_wins_sql(),
    "host_budget": q_host_budget_sql(),
    "fetch_join": q_fetch_join_sql(),
    "fetch_failures": q_fetch_failures_sql(),
    "regex_link_extract": q_regex_link_extract_sql(),
    "regex_field_extract": q_regex_field_extract_sql(),
    "regex_bool_match": q_regex_bool_match_sql(),
    "union_frontier": q_union_frontier_sql(),
    "agg_metrics": q_agg_metrics_sql(),
    "rollup_metrics": q_rollup_metrics_sql(),
    "topk_global": q_topk_global_sql(),
    "event_windows": q_event_windows_sql(),
    "running_state": q_running_state_sql(),
    "json_props": q_json_props_sql(),
    "semi_join": q_semi_join_sql(),
    "clean_text": q_clean_text_sql(),
    "minhash_signature": q_minhash_signature_sql(),
    "dedup_exact": q_dedup_exact_sql(),
    "ngram_jaccard": q_ngram_jaccard_sql(),
    "ngram_jaccard_lsh": q_ngram_jaccard_lsh_sql(),
    "minhash_lsh": q_minhash_lsh_sql(),
    "simhash": q_simhash_sql(),
    "ann_brute_force": q_ann_brute_force_sql(),
    "ann_ivf": q_ann_ivf_sql(),
    "ann_lsh": q_ann_lsh_sql(4),
    "embedding_neardup": q_embedding_neardup_sql(),
    "lang_id": q_lang_id_sql(),
    "quality": q_quality_sql(),
    "token_count": q_token_count_sql(),
    "fingerprint": q_fingerprint_sql(),
    "multimodal_features": q_multimodal_features_sql(),
    "multimodal_frames": q_multimodal_frames_sql(),
    "multimodal_resize": q_multimodal_resize_sql(),
    "asof_join": q_asof_join_sql(),
    "host_rank": q_host_rank_sql(),
    "robots_filter": q_robots_filter_sql(),
    "tfidf_topterms": q_tfidf_sql(),
    "hash_sample": q_hash_sample_sql(),
    "sessionize": q_sessionize_sql(),
    "range_join": q_range_join_sql(),
    "value_percentiles": q_value_percentiles_sql(),
    "bigram_topk": q_bigram_topk_sql(),
    "hll_distinct": q_hll_distinct_sql(),
    "snapshot_diff": q_snapshot_diff_sql(),
    "connected_components": q_connected_components_sql(),
    "dedup_groups": q_dedup_groups_sql(),
}
