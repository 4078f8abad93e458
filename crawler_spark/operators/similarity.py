"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k per query — the correctness
  baseline. Dot product / norms via built-in higher-order functions
  (aggregate/zip_with) entirely JVM-side; the query set is broadcast
  (small) so the big side never shuffles.
- ivf_topk: coarse-quantized variant — probe only candidates in the
  query's partition (here the ``label`` column stands in for the IVF
  cell id; on a real corpus you'd assign cells with a k-means pass).
  This is the 100 TB path: candidate generation is an equi-join on the
  cell id, pruning ~(1 - 1/cells) of the corpus per query.
- lsh_bucket_topk: random-hyperplane signs via deterministic md5-based
  pseudo-projections — bucket equi-join candidates, exact re-rank.

Scores are computed in double and rounded to 6 dp so the DuckDB
oracle (list_cosine_similarity) hashes identically.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.operators.util import spread

DOT_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0 as double), (acc, v) -> acc + v)"
)
NORM_EXPR = (
    "sqrt(aggregate({a}, cast(0 as double),"
    " (acc, v) -> acc + cast(v as double) * cast(v as double)))"
)


def cosine_col(a: str, b: str):
    dot = F.expr(DOT_EXPR.format(a=a, b=b))
    na = F.expr(NORM_EXPR.format(a=a))
    nb = F.expr(NORM_EXPR.format(a=b))
    return dot / (na * nb)


def brute_force_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 3
) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries vs all others."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = spread(emb, "vec_id").select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine_col("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "score", "rank")
    )


SQDIST_EXPR = (
    "aggregate(zip_with({a}, {b},"
    " (x, y) -> (cast(x as double) - cast(y as double))"
    " * (cast(x as double) - cast(y as double))),"
    " cast(0 as double), (acc, v) -> acc + v)"
)


def ivf_cells(emb: DataFrame, step: int = 127, probes: int = 1) -> DataFrame:
    """Deterministic k-means-lite coarse quantizer: (vec_id, cell).

    Centroids are a fixed deterministic sample (every ``step``-th
    vec_id — data-independent, reproducible in any engine); assignment
    is argmin squared distance, ties broken by centroid id. Distances
    are sequential double folds over the dimension order and rounded
    to 6 dp, so Spark and the DuckDB twin pick identical cells. The
    centroid set is tiny → broadcast join; assignment is one map-side
    pass over the corpus (the 100 TB path: no shuffle until the
    per-cell probe join).

    ``probes > 1`` returns the top-``probes`` nearest cells per vector
    (multi-assignment — the standard recall lever for cell-blocked
    near-dup and multi-probe IVF search).
    """
    cent = emb.filter(F.pmod(F.col("vec_id"), F.lit(step)) == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centv")
    )
    dist = F.round(
        F.expr(SQDIST_EXPR.format(a="embedding", b="centv")), 6
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_dist").asc(), F.col("cid").asc())
    return (
        emb.select("vec_id", "embedding")
        .join(F.broadcast(cent))
        .withColumn("_dist", dist)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= probes)
        .select("vec_id", F.col("cid").alias("cell"))
    )


def ivf_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 3, step: int = 127
) -> DataFrame:
    """IVF-style ANN: probe only the query's cell (candidate pruning
    by equi-join on the computed cell id), exact cosine re-rank
    inside. Cells come from ``ivf_cells`` (k-means-lite quantizer)."""
    cells = ivf_cells(emb, step=step)
    emb = spread(emb, "vec_id").join(cells, "vec_id")
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("cell").alias("qcell"),
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cv"),
        F.col("cell").alias("ccell"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("ccell") == F.col("qcell"))
            & (F.col("cand_id") != F.col("query_id")),
        )
        .withColumn("score", F.round(cosine_col("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "score", "rank")
    )


def neardup_cosine_pairs(
    emb: DataFrame, threshold: float = 0.45, step: int = 127, probes: int = 3
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, cell-blocked (SemDeDup
    shape: cluster the corpus, compare only within clusters).

    Candidate generation is LINEAR: each vector lands in its
    ``probes`` nearest k-means-lite cells (multi-assignment recovers
    pairs that straddle a cell boundary), candidates are an equi-join
    on the cell id, and the exact cosine verify runs only on
    candidates. The O(n²) all-pairs comparison never happens — at
    100 TB the per-cell join is the whole cost, bounded by
    probes²/n_cells of the pair space. Output: (a, b, score) with
    a < b, score = cosine rounded to 6 dp, score >= threshold.

    tests/test_similarity.py pins recall vs the exact all-pairs
    baseline; the DuckDB twin reproduces cells and scores bit-for-bit.
    """
    emb = spread(emb, "vec_id")
    # persisted: both sides of the candidate self-join read `cells`,
    # and without the barrier each side re-runs the centroid-distance
    # window (the dominant scalar cost — n_vecs × n_cells × dim
    # multiply-adds) over the full corpus, exactly the recompute
    # pattern the LSH band relation had. Two narrow columns per
    # (vector, probe) — at 100 TB this is the materialized
    # cell-assignment stage between quantization and the block join.
    cells = ivf_cells(emb, step=step, probes=probes).persist()
    a = cells.select(F.col("vec_id").alias("a"), "cell")
    b = cells.select(F.col("vec_id").alias("b"), "cell")
    cand = (
        a.join(b, "cell")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    ea = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    return (
        cand.join(ea, "a")
        .join(eb, "b")
        .withColumn("score", F.round(cosine_col("ea", "eb"), 6))
        .filter(F.col("score") >= threshold)
        .select("a", "b", "score")
    )


def neardup_pairs_exact(emb: DataFrame, threshold: float = 0.45) -> DataFrame:
    """All-pairs exact near-dup baseline (quadratic — recall oracle
    for tests only, never the scale path)."""
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("score", F.round(cosine_col("ea", "eb"), 6))
        .filter(F.col("score") >= threshold)
        .select("a", "b", "score")
    )


def hyperplane_weights(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: weight for (plane, i)
    is ``instr('0123456789abcdef', substr(md5('{plane}_{i}'), 1, 1))
    - 8.5`` — i.e. first-hex-digit value - 7.5 — the exact per-row
    formula round 2 evaluated inside the aggregate lambda. The matrix
    is a compile-time constant (n_planes × dim), so it is computed
    ONCE here and embedded as array literals; the DuckDB twin inlines
    the same numeric literals (identical values → identical hashes)."""
    return [
        int(hashlib.md5(f"{plane}_{i}".encode()).hexdigest()[0], 16) - 7.5
        for i in range(dim)
    ]


_DIM_CACHE: "weakref.WeakKeyDictionary[DataFrame, int]" = None  # type: ignore[assignment]


def _probed_dim(emb: DataFrame) -> int:
    """max(size(embedding)) of ``emb``, cached per DataFrame object
    (weak keys — dropping the frame drops the entry)."""
    global _DIM_CACHE
    import weakref

    if _DIM_CACHE is None:
        _DIM_CACHE = weakref.WeakKeyDictionary()
    d = _DIM_CACHE.get(emb)
    if d is None:
        row = emb.agg(F.max(F.size("embedding")).alias("d")).first()
        d = int(row["d"]) if row and row["d"] is not None else 0
        _DIM_CACHE[emb] = d
    return d


def lsh_signature(
    emb: DataFrame, n_planes: int = 8, dim: int | None = None
) -> DataFrame:
    """Sign bits of dot(embedding, pseudo-random hyperplanes) packed
    into an int bucket key.

    ``dim`` is the MAXIMUM embedding dimensionality; when None it is
    probed with a one-row ``max(size(embedding))`` aggregate (one small
    job — pass it explicitly in repeated/production use). The max (not
    an arbitrary row: ADVICE r3 — limit(1) is nondeterministic, and an
    embedding LONGER than the probed dim would null-pad zip_with,
    turning the whole dot fold NULL and silently zeroing the sign bit)
    makes mixed-dimension inputs correct: rows shorter than ``dim`` use
    the weight prefix (slice), identical to the old per-row sequence
    bound. The probed value is cached per plan so repeated calls on the
    same DataFrame run the job once."""
    if dim is None:
        dim = _probed_dim(emb)
    acc = F.lit(0)
    for p in range(n_planes):
        w = F.array(*[F.lit(x) for x in hyperplane_weights(p, dim)])
        # same sequential double fold (and FP order) as the round-2
        # expression: cast each component, multiply, left-fold from 0.0
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.slice(w, 1, F.size("embedding")),
                lambda x, wi: x * wi,
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        acc = acc + F.when(dot > 0, F.lit(1 << p)).otherwise(0)
    return spread(emb, "vec_id").select("vec_id", "embedding", acc.alias("bucket"))


def lsh_bucket_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 3, n_planes: int = 8,
    multiprobe: bool = True, dim: int | None = None,
) -> DataFrame:
    """LSH-bucketed ANN: candidates share the hyperplane-sign bucket.

    With ``multiprobe`` the query also probes every 1-bit-flip
    neighbor bucket (Hamming-1 multi-probe), which is what makes the
    recall defensible: a near neighbor that lands just across one
    hyperplane is still found. Implemented as an explode of the query
    side into n_planes+1 probe keys so the corpus join stays a plain
    equi-join (never a Hamming-distance theta-join); each candidate
    has one bucket, so probes can't duplicate a (query, cand) pair.
    """
    sig = lsh_signature(emb, n_planes, dim=dim)
    q0 = sig.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qb"),
            *[F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
        )
        q = q0.select(
            "query_id", "qv", F.explode(probes).alias("qb")
        )
    else:
        q = q0
    c = sig.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cv"),
        F.col("bucket").alias("cb"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("cb") == F.col("qb")) & (F.col("cand_id") != F.col("query_id")),
        )
        .withColumn("score", F.round(cosine_col("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "score", "rank")
    )
