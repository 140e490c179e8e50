"""Embedding similarity search over an ``array<float>`` column.

Three operators, same contract:

- :func:`cosine_topk` — **brute-force** exact top-k: broadcast the (small)
  probe set against the full corpus, rank per query.  O(|probes|·N) dot
  products — the correctness baseline and perfectly adequate when probes
  are few.
- :func:`ivf_topk` — **IVF-style** approximate top-k: vectors are bucketed
  by nearest centroid once (the "index"); each query searches only its
  ``nprobe`` nearest centroid buckets.  The scan is then ~``nprobe/C`` of
  the corpus — the 100 TB path.  Centroids here are a deterministic
  *bounded* sample (every ``stride``-th vector, capped at
  ``n_centroids``); swap in KMeans centroids for real recall.
- :func:`cosine_pairs` — embedding-cosine near-duplicate pairs above a
  threshold, IVF-bucketed so only same-bucket vectors compare.

Execution model: the centroid set is a *model*, not a table — it is
collected to the driver once (bounded, like any trained index) and closed
over by an Arrow-batched Pandas UDF, so bucket assignment is a single
narrow projection: no corpus×centroid cross join, no window over N·C rows,
no shuffle of vector payloads.  Dot products run as one numpy matmul per
Arrow batch — the vectorized path the PySpark guide prescribes for dense
math.  (A pure ``zip_with``/``aggregate`` expression formulation is
~100× slower: higher-order-function lambdas evaluate per element in
interpreted mode.)  The scalar :func:`cosine` expression remains for
spec-level use on single pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

from .pins import pin

__all__ = [
    "cosine",
    "cosine_scores",
    "cosine_topk",
    "ivf_topk",
    "rrf_fuse",
    "cosine_pairs",
    "quantize_embeddings",
    "random_projection",
    "kmeans_lloyd",
    "embedding_covariance",
    "pca_project",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns as a pure SQL
    expression (double math).  Fine for a handful of comparisons inside a
    spec; use :func:`cosine_scores` in bulk paths."""
    ad = F.transform(a, lambda v: v.cast("double"))
    bd = F.transform(b, lambda v: v.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


# DataType object, not the DDL string "double": string return types are
# parsed at decoration time and would make importing this module require an
# active SparkContext.
@pandas_udf(DoubleType())
def cosine_scores(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine similarity: one numpy matmul per Arrow batch."""
    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    num = np.einsum("ij,ij->i", A, B)
    den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(den == 0.0, 0.0, num / den)
    return pd.Series(out)


def _centroid_model(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    stride: int,
    method: str = "stride",
    n_centroids: int = 64,
    seed: int = 7,
) -> tuple[np.ndarray, np.ndarray]:
    """Centroid "model" for IVF bucketing, collected driver-side.

    ``method="stride"``: deterministic bounded sample (every ``stride``-th
    vector, capped at ``n_centroids``) — zero training cost, adequate
    bucketing for near-uniform corpora.
    ``method="kmeans"``: ``pyspark.ml`` KMeans with ``n_centroids``
    clusters — pays one training pass for real cell quality, exactly how
    a production IVF index is built.

    Returns (ids, row-normalized matrix) with ids ascending so downstream
    argsort tie-breaks resolve to the lowest centroid id.  The centroid
    count is bounded (that's what makes it a model, not a table); a few MB
    ships to executors inside the UDF closure.
    """
    if method == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = corpus.select(
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
        )
        model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(feats)
        mat = np.stack(
            [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
        )
        ids = np.arange(len(mat), dtype=np.int64)
    elif method == "stride":
        # Bounded: stride-filter then take the first ``n_centroids`` by id
        # (Spark compiles orderBy+limit to TakeOrdered — per-partition
        # top-k, driver merge), so driver memory is O(n_centroids) at ANY
        # corpus size, not O(N/stride).  The same rule is expressible in
        # ANSI SQL (``WHERE id % stride = 0 ORDER BY id LIMIT n``), which
        # is what lets the harness oracle-check the IVF queries.
        rows = (
            corpus.filter((F.col(id_col) % stride) == 0)
            .select(F.col(id_col), F.col(vec_col))
            .orderBy(id_col)
            .limit(n_centroids)
            .collect()
        )
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    else:
        raise ValueError(f"unknown centroid method {method!r}")
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return ids, mat / norms


def _bucket_assigner(ids: np.ndarray, cmat: np.ndarray, nprobe: int):
    """Pandas UDF mapping a vector column to its ``nprobe`` nearest
    centroid ids (cosine, ties to lowest id).  Pure projection."""

    @pandas_udf(ArrayType(LongType()))
    def assign(vs: pd.Series) -> pd.Series:
        M = np.stack(vs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        sims = (M / norms) @ cmat.T
        # stable argsort + ids sorted ascending ⇒ deterministic tie-break
        top = np.argsort(-sims, kind="stable", axis=1)[:, :nprobe]
        return pd.Series([ids[row].tolist() for row in top])

    return assign


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
        "cos", cosine_scores(F.col("__qv"), F.col("__cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    stride: int = 37,
    nprobe: int = 3,
    method: str = "stride",
    n_centroids: int = 64,
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Index: every vector is assigned its nearest centroid bucket in one
    narrow projection (centroid model broadcast in the UDF closure).
    Query: each probe fans out to its ``nprobe`` nearest buckets;
    candidates are only the vectors in those buckets, met via a bucket
    equi-join — the per-query scan is ~``nprobe/C`` of the corpus and the
    only shuffle is on the bucket id.
    """
    ids, cmat = _centroid_model(
        corpus, id_col, vec_col, stride, method=method, n_centroids=n_centroids
    )
    indexed = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _bucket_assigner(ids, cmat, 1)(F.col(vec_col)).getItem(0).alias("bucket"),
    )
    queries = probes.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(_bucket_assigner(ids, cmat, nprobe)(F.col(vec_col))).alias("bucket"),
    )
    cand = queries.join(indexed, "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn("cos", cosine_scores(F.col("__qv"), F.col("__cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int = 10,
    weights: list[float] | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval lists — the standard
    hybrid-retrieval combiner (lexical BM25 + embedding cosine is the
    canonical pair for training-data curation: decontamination probes
    and seed expansion both want "matches EITHER lexically or
    semantically").  Each input carries ``(query_col, id_col,
    rank_col)``; the fused score is ``sum over lists of
    1 / (k + rank)`` (Cormack et al.'s RRF, k=60 default) — rank-only,
    so raw scores with incomparable scales fuse without calibration.
    Returns ``(query, id, rrf_score DOUBLE, rank)``, top ``topk`` per
    query, score rounded to 6 decimals before ranking with the repo's
    usual doc-id tiebreak (ulp armor; with ≤2 lists the two-term sum is
    order-exact even unrounded).

    ``weights`` (optional, one per list): scales each list's
    contribution — ``w_i / (k + rank)`` — the standard lever when one
    retriever is more trusted (e.g. downweight the lexical leg for a
    decontamination probe tuned for paraphrases).  Unweighted calls are
    unchanged.

    Scale shape: the inputs are already (queries × k)-sized — the
    corpus-scale work happened upstream in the retrievers — so fusion
    is one union + one (query, id) aggregation + one window over
    list-sized frames.  Nothing here touches the corpus.

    Reference has no search surface (src/DBT.php — none); extension
    tier alongside ``bm25_topk`` / ``cosine_topk``.
    """
    if not rankings:
        raise ValueError("rrf_fuse: pass at least one ranking")
    if k < 1 or topk < 1:
        raise ValueError("rrf_fuse: k and topk must be >= 1")
    if weights is not None and len(weights) != len(rankings):
        raise ValueError(
            f"rrf_fuse: {len(weights)} weights for {len(rankings)} "
            "rankings — pass one per list"
        )
    ws = [1.0] * len(rankings) if weights is None else [
        float(w) for w in weights]
    parts = [
        r.select(
            F.col(query_col),
            F.col(id_col),
            F.col(rank_col).cast("long").alias("__r"),
            F.lit(w).alias("__w"),
        )
        for r, w in zip(rankings, ws)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    scored = u.groupBy(query_col, id_col).agg(
        F.round(
            F.sum(F.col("__w") / (F.lit(float(k)) + F.col("__r"))), 6
        ).alias("rrf_score")
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
    )


def cosine_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    stride: int = 37,
    method: str = "stride",
    n_centroids: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (``cos >= threshold``),
    IVF-bucketed: only vectors sharing a nearest-centroid bucket are
    compared, so the join is bucket-local, not N².  (Near-identical vectors
    land in the same bucket with high probability; widen with nprobe>1
    assignment for higher recall.)"""
    ids, cmat = _centroid_model(
        corpus, id_col, vec_col, stride, method=method, n_centroids=n_centroids
    )
    indexed = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        _bucket_assigner(ids, cmat, 1)(F.col(vec_col)).getItem(0).alias("bucket"),
    )
    indexed = pin(indexed)
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
        cand.withColumn("cos", cosine_scores(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    id_col: str | None = None,
    out_col: str = "qvec",
    scale_col: str = "qscale",
    rounding: str = "floor",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q_i = rnd(v_i * 127 /
    max|v|)`` with the per-vector ``max|v|`` emitted as ``scale_col`` so
    consumers dequantize with one multiply.  Cuts embedding storage 4x
    (float32 -> int8) — the standard trick for corpus-scale ANN indexes,
    where recall loss at int8 is negligible and scan bandwidth is the
    bottleneck.

    ``rounding="floor"`` (default) truncates toward -inf: every step is an
    exact IEEE-double operation (float32→double widen, multiply, divide,
    floor), so ANY engine reproduces the quantized codes bit-for-bit —
    which makes the op oracle-checkable across engines.  ``"half_up"``
    rounds to nearest (classic quantizer, ±0.5 LSB instead of -1..0 LSB
    error) but inherits the engine's tie-breaking, so treat codes as
    approximate when comparing across engines.  All-zero vectors emit
    scale 0 and all-zero codes.

    Scale shape: pure projection — array lambdas inside one narrow stage,
    no shuffle, no Python.  (Interpreted higher-order functions are fine
    here: one pass over ~1k floats per row is dwarfed by the parquet IO
    it saves.)
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs))
    if rounding == "floor":
        code = lambda x: F.floor(x * F.lit(127.0) / F.col(scale_col))  # noqa: E731
    elif rounding == "half_up":
        code = lambda x: F.round(x * F.lit(127.0) / F.col(scale_col)).cast("long")  # noqa: E731
    else:
        raise ValueError(f"unknown rounding {rounding!r}")
    q = F.when(
        F.col(scale_col) == 0.0,
        F.transform(v, lambda x: F.lit(0).cast("long")),
    ).otherwise(F.transform(v, code))
    keep = df.columns if id_col is None else [id_col]
    return (
        df.withColumn(scale_col, scale)
        .withColumn(out_col, q)
        .select(*keep, scale_col, out_col)
    )


def random_projection(
    df: DataFrame,
    vec_col: str,
    out_dim: int,
    seed: int = 0,
    out_col: str = "proj",
    scale: int = 1_000_000,
) -> DataFrame:
    """Signed random projection (Achlioptas/SimHash-style dimensionality
    reduction): ``proj[j] = Σ_k v[k]·s(j,k)`` with ``s ∈ {+1,−1}`` drawn
    from a universal-hash family — each output row j gets its own ODD
    multiplier ``a_j = knuth(j+seed+1) | 1`` and ``s(j,k)`` is bit 16 of
    ``a_j·(k+1) mod 2³²``.  (A single hash of the flat index ``j·dim+k``
    is a trap: the multiplicative lattice makes rows of the sign matrix
    ~94%-correlated, destroying the projection; per-row multipliers
    restore pairwise independence — measured row correlations at the
    random-noise level.)  Angles are approximately preserved
    (Johnson–Lindenstrauss), so the output feeds the same
    cosine/bucketing ops at a fraction of the width.

    Exactness contract: each component is first quantized to
    ``round(v·scale)`` as a 64-bit integer, so the signed sum is
    order-independent integer math — bit-identical on any engine and
    any partitioning (a float fold would differ in accumulation order).
    ``proj`` is the integer array; divide by ``scale`` to recover the
    float projection.

    Scale shape: ZERO shuffle — a pure per-row ``transform``/``aggregate``
    expression, JVM-side, no UDF; the projection matrix is never
    materialized anywhere (it is the hash function).
    """
    if out_dim < 1:
        raise ValueError("random_projection: out_dim must be >= 1")
    if seed < 0:
        # Spark's % keeps the dividend's sign: a negative multiplier
        # breaks the "bit 16 of a_j*(k+1) mod 2^32" math silently
        # (correlated rows), so reject rather than degrade
        raise ValueError("random_projection: seed must be >= 0")
    dim_expr = F.size(F.col(vec_col))
    vi = F.zip_with(
        F.col(vec_col),
        F.sequence(F.lit(0), dim_expr - 1),
        lambda v, k: F.struct(
            F.round(v.cast("double") * scale).cast("long").alias("v"),
            k.alias("k"),
        ),
    )
    def sign(j, k):
        a = ((j + F.lit(seed + 1)).cast("long") * F.lit(2654435761)) % F.lit(
            4294967296
        )
        a_odd = a + 1 - (a % 2)  # force odd: full-period multiplier
        h = (a_odd * (k + F.lit(1)).cast("long")) % F.lit(4294967296)
        return F.when((h / 65536).cast("long") % 2 == 0,
                      F.lit(1)).otherwise(F.lit(-1)).cast("long")

    proj = F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda j: F.aggregate(
            vi,
            F.lit(0).cast("long"),
            lambda acc, e: acc + e["v"] * sign(j, e["k"]),
        ),
    )
    return df.withColumn(out_col, proj)


def kmeans_lloyd(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    scale: int = 10**6,
    dim: int | None = None,
    on_invalid: str = "raise",
) -> DataFrame:
    """Deterministic fixed-iteration Lloyd's k-means over an embedding
    column, built so an independent engine reproduces it BIT-FOR-BIT
    (the oracle-checkable counterpart of ``pyspark.ml`` KMeans, whose
    sampled init and float accumulation order are not portable):

    - components are quantized to an exact integer grid
      (``round(x·scale)`` as long), so every distance is pure integer
      arithmetic — no float accumulation order anywhere;
    - centroids are snapped back to the same grid after each update
      (``round(sum/count)``: one double division + one round, identical
      in any engine);
    - init is the ``k`` lowest-``id_col`` vectors; distance ties assign
      to the lowest centroid id.

    Returns one row per non-empty final cluster: ``cluster``,
    ``n_points``, ``inertia`` (exact Σ of squared integer distances to
    the assigned centroid), ``centroid_sum`` (Σ of the UPDATED centroid
    components — a grid-exact checksum of the fit).  Clusters emptied
    during iteration carry their previous centroid forward.

    Scale shape: per iteration, ONE narrow projection computes all k
    distances in an Arrow-batched Pandas UDF (centroids close over the
    UDF — a broadcast model, like `ivf_topk`'s; numpy int64 matmul-style
    math is exact AND ~100× faster than interpreted zip_with lambdas,
    per this module's header), then ONE groupBy(k) aggregation with
    map-side partial sums; the driver only ever holds k×dim longs (the
    centroids), collected once per iteration — pagerank's
    bounded-collect pattern.  No N×k join materialization.
    Overflow: |q|≤scale·max|x|, so dist² per pair ≤ dim·(2·scale)²;
    inertia sums that over members — stay under 2^63 by choosing
    ``scale`` for your dim and corpus (1e6 leaves ~10^5 headroom at
    dim 64 for a trillion-row cluster).
    """
    from functools import reduce

    if on_invalid not in ("raise", "skip"):
        raise ValueError(
            f"kmeans_lloyd: on_invalid must be raise|skip, got {on_invalid!r}"
        )
    if dim is None:
        # first NON-NULL vector: size(NULL) is NULL (or -1 under
        # legacy.sizeOfNull), either of which would poison dim and make
        # every row look invalid — exactly the case validation exists for
        first = (
            df.filter(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)).alias("d"))
            .first()
        )
        if first is None or first["d"] is None:
            raise ValueError(
                f"kmeans_lloyd: no non-NULL {vec_col} vector to infer dim "
                "from (empty input or all-NULL column); pass dim= explicitly"
            )
        dim = int(first["d"])
    # NULL or ragged vectors otherwise crash deep inside the pandas UDF
    # (np.stack on ragged input) or surface as an opaque driver-side
    # TypeError on a NULL aggregate — validate with an actionable message
    # instead.  The check is FUSED into the quantize projection below (a
    # raise_error branch), so the clean common case pays zero extra jobs
    # and the expensive upstream lineage runs exactly once: the first
    # action on the persisted `pts` (the seed collect) materializes
    # quantize+validation together into the cache.
    invalid = F.col(vec_col).isNull() | (F.size(F.col(vec_col)) != F.lit(dim))
    if on_invalid == "skip":
        df = df.filter(~invalid)
        checked = F.col(vec_col)
    else:
        checked = F.when(
            invalid,
            F.raise_error(
                F.concat(
                    F.lit(f"kmeans_lloyd: row {id_col}="),
                    F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
                    F.lit(" has a "),
                    F.coalesce(
                        F.concat(F.size(F.col(vec_col)).cast("string"),
                                 F.lit("-element")),
                        F.lit("NULL"),
                    ),
                    F.lit(f" {vec_col} but dim={dim}; clean the input or "
                          "pass on_invalid='skip'"),
                )
            ).cast(df.schema[vec_col].dataType),
        ).otherwise(F.col(vec_col))
    q = F.transform(
        checked,
        lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast("long"),
    )
    # consumed by the seed collect + every assignment pass: persist so
    # the read+quantize scan runs once per fit, not once per iteration
    pts = pin(df.select(F.col(id_col).alias("__id"), q.alias("__q")))
    seed_rows = pts.orderBy("__id").limit(k).collect()
    cents: dict[int, list[int]] = {
        i: list(r["__q"]) for i, r in enumerate(seed_rows)
    }

    from pyspark.sql.types import IntegerType, StructField, StructType

    def assigned(cents_now: dict[int, list[int]]) -> DataFrame:
        cmat = np.array(
            [cents_now[c] for c in sorted(cents_now)], dtype=np.int64
        )

        @pandas_udf(
            StructType(
                [StructField("d", LongType()), StructField("c", IntegerType())]
            )
        )
        def assign(vs: pd.Series) -> pd.DataFrame:
            if len(vs) == 0:  # empty Arrow batch: np.stack would raise
                return pd.DataFrame({"d": pd.Series([], dtype="int64"),
                                     "c": pd.Series([], dtype="int32")})
            Q = np.stack(vs.to_numpy()).astype(np.int64)
            # exact int64: (B×k×dim) diff-square-sum; argmin's first-hit
            # rule IS the lowest-centroid-id tie-break
            D = ((Q[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            c = D.argmin(axis=1)
            d = D[np.arange(len(c)), c]
            return pd.DataFrame({"d": d, "c": c.astype(np.int32)})

        return pts.withColumn("__a", assign(F.col("__q")))

    for _ in range(iters - 1):
        a = assigned(cents)
        rows = (
            a.groupBy(F.col("__a.c").alias("cluster"))
            .agg(
                *[
                    F.round(F.sum(F.col("__q")[i]) / F.count("*"))
                    .cast("long")
                    .alias(f"m{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        for r in rows:  # empty clusters keep their previous centroid
            cents[int(r["cluster"])] = [int(r[f"m{i}"]) for i in range(dim)]

    final = assigned(cents)
    centroid_sum = reduce(
        lambda x, y: x + y,
        [
            F.round(F.sum(F.col("__q")[i]) / F.count("*")).cast("long")
            for i in range(dim)
        ],
    )
    return final.groupBy(F.col("__a.c").alias("cluster")).agg(
        F.count("*").alias("n_points"),
        F.sum(F.col("__a.d")).alias("inertia"),
        centroid_sum.alias("centroid_sum"),
    )


def _quantized_points(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    scale: int,
    dim: int | None,
    on_invalid: str,
    caller: str,
) -> tuple[DataFrame, int]:
    """Shared front door of the exact-arithmetic embedding aggregates
    (:func:`embedding_covariance`, :func:`pca_project`): infer ``dim``
    from the first NON-NULL vector, fuse NULL/ragged validation into the
    quantize projection (clean inputs pay zero extra jobs — the
    :func:`kmeans_lloyd` pattern), and return the PINNED
    ``(__id, __q)`` integer-grid points plus ``dim``."""
    if on_invalid not in ("raise", "skip"):
        raise ValueError(
            f"{caller}: on_invalid must be raise|skip, got {on_invalid!r}"
        )
    if dim is None:
        first = (
            df.filter(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)).alias("d"))
            .first()
        )
        if first is None or first["d"] is None:
            raise ValueError(
                f"{caller}: no non-NULL {vec_col} vector to infer dim "
                "from (empty input or all-NULL column); pass dim= explicitly"
            )
        dim = int(first["d"])
    invalid = F.col(vec_col).isNull() | (F.size(F.col(vec_col)) != F.lit(dim))
    if on_invalid == "skip":
        df = df.filter(~invalid)
        checked = F.col(vec_col)
    else:
        checked = F.when(
            invalid,
            F.raise_error(
                F.concat(
                    F.lit(f"{caller}: row {id_col}="),
                    F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
                    F.lit(" has a "),
                    F.coalesce(
                        F.concat(F.size(F.col(vec_col)).cast("string"),
                                 F.lit("-element")),
                        F.lit("NULL"),
                    ),
                    F.lit(f" {vec_col} but dim={dim}; clean the input or "
                          "pass on_invalid='skip'"),
                )
            ).cast(df.schema[vec_col].dataType),
        ).otherwise(F.col(vec_col))
    q = F.transform(
        checked,
        lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast("long"),
    )
    return pin(df.select(F.col(id_col).alias("__id"), q.alias("__q"))), dim


def _covariance_partials(pts: DataFrame, dim: int) -> DataFrame:
    """Arrow-batched exact second-moment partials: one row per non-empty
    batch carrying ``(cnt, s[dim], p[dim*dim])`` int64 sums — the X'X
    trick that makes covariance a SINGLE pass with d²-bounded state
    instead of an N×d² row explosion.  numpy int64 matmul is exact
    (same overflow bound as the caller documents), so partials from any
    partitioning sum to the same integers."""

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["__q"].to_numpy()).astype(np.int64)
            P = X.T @ X
            yield pd.DataFrame(
                {
                    "cnt": [len(pdf)],
                    "s": [X.sum(axis=0).tolist()],
                    "p": [P.ravel().tolist()],
                }
            )

    return pts.select("__q").mapInPandas(
        part, schema="cnt long, s array<long>, p array<long>"
    )


def embedding_covariance(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    dim: int | None = None,
    on_invalid: str = "raise",
) -> DataFrame:
    """Exact covariance matrix of an embedding column, one row per
    ``(i, j)`` pair: ``(i, j, sum_prod, cov)`` where ``sum_prod`` is the
    EXACT integer Σ qᵢ·qⱼ on the ``round(x·scale)`` grid (bit-identical
    in any engine — the module's oracle-portability contract, as in
    :func:`kmeans_lloyd`) and ``cov`` is the population covariance in
    original units, rounded to 6 dp.

    Scale shape: ONE corpus pass.  An Arrow-batched ``mapInPandas``
    reduces each batch to int64 ``(count, Σx, X'X)`` partials (d²-sized,
    row-count independent), the d² product sums aggregate in ONE tiny
    shuffle (posexplode of per-batch partials — batch-count × d² rows,
    not N × d²), and the d+1 first-moment sums collect to the driver
    (bounded state, the centroid-collect pattern).  No join touches the
    corpus; nothing here is O(N·d²) in rows shuffled.

    Overflow bound: |q| ≤ scale·max|x|; Σ|qᵢqⱼ| ≤ N·(scale·max|x|)² must
    stay under 2⁶³ — at scale=10⁶ and |x|≤4 that allows ~500 G rows;
    drop ``scale`` for bigger corpora or wilder values.
    """
    pts, dim = _quantized_points(
        df, id_col, vec_col, scale, dim, on_invalid, "embedding_covariance"
    )
    partials = pin(_covariance_partials(pts, dim))
    head = partials.agg(
        F.sum("cnt").alias("n"),
        *[F.sum(F.col("s")[i]).alias(f"s{i}") for i in range(dim)],
    ).first()
    if head is None or head["n"] is None or head["n"] == 0:
        raise ValueError("embedding_covariance: empty input")
    n = int(head["n"])
    s = [int(head[f"s{i}"]) for i in range(dim)]
    s_arr = F.array(*[F.lit(v).cast("long") for v in s])
    p_tab = (
        partials.select(F.posexplode("p").alias("idx", "pv"))
        .groupBy("idx")
        .agg(F.sum("pv").alias("sum_prod"))
    )
    i_c = (F.col("idx") / dim).cast("int").alias("i")
    j_c = (F.col("idx") % dim).cast("int").alias("j")
    nd = F.lit(float(n))
    # trailing + 0.0 canonicalizes IEEE negative zero (round can yield
    # -0.0 here and engines disagree on its sign; -0.0 + 0.0 == +0.0)
    cov = F.round(
        (
            F.col("sum_prod").cast("double")
            - F.element_at(s_arr, F.col("i") + 1).cast("double")
            * F.element_at(s_arr, F.col("j") + 1).cast("double") / nd
        )
        / nd
        / F.lit(float(scale) * float(scale)),
        6,
    ) + F.lit(0.0)
    return (
        p_tab.select(i_c, j_c, "sum_prod")
        .withColumn("cov", cov)
    )


def pca_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    scale: int = 10**6,
    dim: int | None = None,
    on_invalid: str = "raise",
    out_col: str = "pca",
) -> DataFrame:
    """Closed-form PCA: project ``vec_col`` onto the top-``k`` principal
    components of its EXACT integer-grid covariance (the
    :func:`embedding_covariance` accumulation), keeping all other
    columns and appending ``out_col`` (array<double>, length ``k``).

    The eigendecomposition runs on the DRIVER over the d×d matrix —
    bounded state exactly like the k-means centroid collect; the
    corpus-sized work is one Arrow partials pass plus one Arrow
    projection pass (numpy matmul per batch, centered on the exact
    mean).  Component signs follow the deterministic convention that
    each component's largest-|loading| coordinate is positive, so
    repeated fits (and refits on re-partitioned data — the partials are
    exact integers) give identical output.

    Returns the projected frame; the fitted model is exposed on it as
    ``df.pca_components`` (k×d numpy array) / ``df.pca_mean`` /
    ``df.pca_eigenvalues`` for callers that need to project new data.

    ``on_invalid`` governs BOTH passes: with ``'skip'`` the fit ignores
    NULL/ragged vectors and the projection emits NULL ``out_col`` for
    them (all input rows are kept); with ``'raise'`` either pass fails
    with the per-row actionable error.
    """
    pts, dim = _quantized_points(
        df, id_col, vec_col, scale, dim, on_invalid, "pca_project"
    )
    if not (1 <= k <= dim):
        raise ValueError(f"pca_project: k must be in [1, {dim}], got {k}")
    partials = pin(_covariance_partials(pts, dim))
    rows = partials.select("cnt", "s", "p").collect()
    if not rows:
        raise ValueError("pca_project: empty input")
    n = sum(r["cnt"] for r in rows)
    S = np.sum([np.asarray(r["s"], dtype=np.int64) for r in rows], axis=0)
    P = np.sum([np.asarray(r["p"], dtype=np.int64) for r in rows], axis=0)
    P = P.reshape(dim, dim)
    mean_q = S.astype(np.float64) / n
    cov = (P.astype(np.float64) - np.outer(mean_q, mean_q) * n) / n
    cov /= float(scale) ** 2
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    lam = evals[order]
    W = evecs[:, order].T  # k×d
    # deterministic sign: largest-|loading| coordinate positive
    for r in range(k):
        m = np.argmax(np.abs(W[r]))
        if W[r, m] < 0:
            W[r] = -W[r]
    mean = mean_q / float(scale)
    Wb, mb = W.copy(), mean.copy()

    # The projection pass must honour on_invalid like the fit did: a NULL
    # or ragged vector sharing an Arrow batch with valid rows would crash
    # np.stack ("all input arrays must have the same shape").  Skip mode
    # masks them to NULL Spark-side and the UDF scatters NULL back; raise
    # mode keeps the same per-row actionable raise_error as the fit.
    invalid = F.col(vec_col).isNull() | (F.size(F.col(vec_col)) != F.lit(dim))
    if on_invalid == "skip":
        vec_expr = F.when(~invalid, F.col(vec_col).cast("array<double>"))
    else:
        vec_expr = F.when(
            invalid,
            F.raise_error(
                F.concat(
                    F.lit(f"pca_project: row {id_col}="),
                    F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
                    F.lit(" has a "),
                    F.coalesce(
                        F.concat(F.size(F.col(vec_col)).cast("string"),
                                 F.lit("-element")),
                        F.lit("NULL"),
                    ),
                    F.lit(f" {vec_col} but dim={dim}; clean the input or "
                          "pass on_invalid='skip'"),
                )
            ).cast("array<double>"),
        ).otherwise(F.col(vec_col).cast("array<double>"))

    @pandas_udf(ArrayType(DoubleType()))
    def proj(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        mask = vs.notna().to_numpy()
        out_vals = np.empty(len(vs), dtype=object)
        out_vals[:] = None
        if mask.any():
            X = np.stack(vs.to_numpy()[mask]).astype(np.float64)
            Y = (X - mb[None, :]) @ Wb.T
            for i, row in zip(np.flatnonzero(mask), Y):
                out_vals[i] = row
        return pd.Series(out_vals)

    out = df.withColumn(out_col, proj(vec_expr))
    out.pca_components = W
    out.pca_mean = mean
    out.pca_eigenvalues = lam
    return out
