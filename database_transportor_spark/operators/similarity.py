"""Embedding similarity search over an ``array<float>`` column.

Two paths, same contract:

- :func:`cosine_topk` — **brute-force** exact top-k: broadcast the (small)
  probe set against the full corpus, rank per query.  O(|probes|·N) dot
  products, all JVM-side (``zip_with`` + ``aggregate``) — the correctness
  baseline and perfectly adequate when probes are few.
- :func:`ivf_topk` — **IVF-style** approximate top-k: vectors are bucketed
  by nearest centroid once (the "index"); each query searches only its
  ``nprobe`` nearest centroid buckets.  The scan is then ~``nprobe/C`` of
  the corpus — the 100 TB path.  Centroids here are a deterministic sample
  (every ``stride``-th vector); swap in KMeans centroids for real recall.
- :func:`cosine_pairs` — embedding-cosine near-duplicate pairs above a
  threshold, IVF-bucketed so only same-bucket vectors compare.

No Python UDFs: a 64-dim dot product folds into a single codegen'd
expression.  For very high dims, a Pandas-UDF matmul over ``mapInPandas``
batches becomes faster — noted, not needed at this dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine", "cosine_topk", "ivf_topk", "cosine_pairs"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (double math)."""
    ad = F.transform(a, lambda v: v.cast("double"))
    bd = F.transform(b, lambda v: v.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact brute-force top-k: ``(query_id, neighbor_id, rank, cos)``.

    ``probes`` is broadcast (must be small); ranking is a window per query
    with a deterministic tiebreak on neighbor id.  Self-matches excluded.
    """
    p = probes.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    joined = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).crossJoin(F.broadcast(p))
    scored = joined.filter(F.col("neighbor_id") != F.col("query_id")).withColumn(
        "cos", cosine(F.col("__qv"), F.col("__cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _assign_buckets(
    df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, nprobe: int
) -> DataFrame:
    """Rank centroids per vector by cosine; keep the top ``nprobe``."""
    c = centroids.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cvec")
    )
    joined = df.crossJoin(F.broadcast(c)).withColumn(
        "__csim", cosine(F.col(vec_col), F.col("__cvec"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__csim").desc(), F.col("__cid"))
    return (
        joined.withColumn("__crank", F.row_number().over(w))
        .filter(F.col("__crank") <= nprobe)
        .drop("__cvec", "__csim", "__crank")
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    stride: int = 37,
    nprobe: int = 3,
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Index: every vector joins its single nearest centroid bucket (centroids
    = deterministic stride sample of the corpus).  Query: each probe fans
    out to its ``nprobe`` nearest buckets; candidates are only the vectors
    in those buckets (bucket equi-join — the shuffle is on bucket id, and
    the per-query scan is a fraction of the corpus).
    """
    centroids = corpus.filter((F.col(id_col) % stride) == 0)
    indexed = _assign_buckets(corpus, centroids, id_col, vec_col, nprobe=1).select(
        F.col("__cid").alias("bucket"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
    )
    queries = _assign_buckets(probes, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col("__cid").alias("bucket"),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
    )
    cand = queries.join(indexed, "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn("cos", cosine(F.col("__qv"), F.col("__cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    stride: int = 37,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (``cos >= threshold``),
    IVF-bucketed: only vectors sharing a nearest-centroid bucket are
    compared, so the join is bucket-local, not N².  (Near-identical vectors
    land in the same bucket with high probability; widen with nprobe>1
    assignment for higher recall.)"""
    centroids = corpus.filter((F.col(id_col) % stride) == 0)
    indexed = _assign_buckets(corpus, centroids, id_col, vec_col, nprobe=1).select(
        F.col("__cid").alias("bucket"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
    )
    a, b = indexed.alias("a"), indexed.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.__id") < F.col("b.__id")),
    ).select(
        F.col("a.__id").alias("id_a"),
        F.col("b.__id").alias("id_b"),
        F.col("a.__v").alias("__va"),
        F.col("b.__v").alias("__vb"),
    )
    return (
        cand.withColumn("cos", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
