"""Fuzzy string matching: trigram-blocked approximate joins.

The migration problem the reference's exact ``refer`` cannot solve:
reconciling dimension values that *almost* match ("Acme Corp." vs
"ACME Corp") across source and target.  Exact equality misses them; a
similarity cross join is N×M.  The scalable middle path is the same
inverted-index shape as the word-level near-dup dedup
(``operators/dedup.py``), applied to CHARACTER n-grams:

    normalize (lower/trim) → distinct char n-grams → 8-byte hashes →
    explode → candidates meet on a gram-hash EQUI-join → count
    intersections per pair → Jaccard filter.

Only strings sharing at least one (non-capped) gram ever meet, so cost
is Σ posting-list² per gram, never N×M.  ``max_df`` caps degenerate
grams ("  a" in every row) exactly like the word-level ``max_df``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["char_ngram_hashes", "fuzzy_join", "fuzzy_pairs",
           "edit_distance_join", "resolve_entities"]


def char_ngram_hashes(col: Column | str, n: int = 3) -> Column:
    """Distinct ``xxhash64`` character n-grams of ``lower(trim(col))``
    (array<long>).  Strings shorter than ``n`` yield an empty array
    (they can never clear a gram-overlap threshold anyway).

    Same ``arrays_zip``-of-shifted-slices formulation as the word-level
    ``dedup.ngram_shingles``: the normalized string is split into a char
    array ONCE per row; a ``transform`` lambda that called ``substr`` on
    the string expression would re-evaluate the normalization per
    element — O(len²) string work per row."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(F.lower(F.trim(c)), "")
    n0 = F.size(chars) - (n - 1)
    z = F.arrays_zip(*[F.slice(chars, i + 1, n0) for i in range(n)])
    grams = F.transform(
        z, lambda s: F.xxhash64(F.concat(*[s[str(i)] for i in range(n)]))
    )
    return F.array_distinct(
        F.when(F.size(chars) < n, F.array().cast("array<long>")).otherwise(grams)
    )


def _gram_table(
    df: DataFrame, id_col: str, text_col: str, n: int, side: str
) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"id_{side}"),
        F.explode(char_ngram_hashes(text_col, n)).alias("g"),
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    threshold: float = 0.4,
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Approximate string join: all (left, right) pairs whose character
    ``n``-gram Jaccard similarity ≥ ``threshold``.  Returns ``(id_a,
    id_b, intersection, union_size)`` — exact integers, so the
    threshold decision is engine-portable.

    Scale shape: two explodes (narrow), one gram-hash equi-join (the
    only place candidates meet), one (id_a, id_b) count shuffle, two
    broadcastable size joins.  ``max_df`` drops grams whose posting
    list exceeds the cap ON BOTH SIDES SYMMETRICALLY (sizes count the
    surviving grams), preserving exact Jaccard over the capped gram
    space."""
    lg = _gram_table(left, left_id, left_col, n, "a")
    rg = _gram_table(right, right_id, right_col, n, "b")
    if max_df is not None:
        hot = (
            lg.select("g").unionAll(rg.select("g"))
            .groupBy("g").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("g")
        )
        lg = lg.join(F.broadcast(hot), "g", "left_anti")
        rg = rg.join(F.broadcast(hot), "g", "left_anti")
    sa = lg.groupBy("id_a").agg(F.count("*").alias("n_a"))
    sb = rg.groupBy("id_b").agg(F.count("*").alias("n_b"))
    inter = (
        lg.join(rg, "g")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("intersection"))
    )
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("union_size", F.col("n_a") + F.col("n_b") - F.col("intersection"))
        .filter(F.col("intersection") >= F.lit(threshold) * F.col("union_size"))
    )
    return out.select("id_a", "id_b", "intersection", "union_size")


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.4,
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Self-join variant: near-duplicate string values within one table
    (catalog/name dedup), ``id_a < id_b``.  Same inverted-index shape;
    the identity pair and both orientations are excluded before the
    count, so the pair shuffle carries each candidate once."""
    g = _gram_table(df, id_col, text_col, n, "a")
    if max_df is not None:
        hot = (
            g.groupBy("g").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df).select("g")
        )
        g = g.join(F.broadcast(hot), "g", "left_anti")
    sizes = g.groupBy("id_a").agg(F.count("*").alias("n_g"))
    b = g.select(F.col("id_a").alias("id_b"), "g")
    inter = (
        g.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("intersection"))
    )
    sb = sizes.select(F.col("id_a").alias("id_b"), F.col("n_g").alias("n_b"))
    out = (
        inter.join(sizes, "id_a")
        .join(sb, "id_b")
        .withColumn("union_size", F.col("n_g") + F.col("n_b") - F.col("intersection"))
        .filter(F.col("intersection") >= F.lit(threshold) * F.col("union_size"))
    )
    return out.select("id_a", "id_b", "intersection", "union_size")


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_distance: int = 2,
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Exact-threshold edit-distance join: all (left, right) pairs whose
    normalized strings (``lower(trim(…))`` — the same normalization the
    gram index uses) are within Levenshtein distance ``max_distance``.
    Returns ``(id_a, id_b, distance)``.

    Two tiers, as in every scalable record-linkage stack:

    1. **Block** on shared character n-grams (the :func:`fuzzy_join`
       inverted index), pruned by the count-filtering bound: one edit
       operation destroys at most ``n`` distinct grams, so a true match
       shares at least ``|grams| − n·max_distance`` grams WITH EACH
       SIDE — plus the length filter ``|len_a − len_b| ≤ max_distance``.
       Both prune before any string comparison runs.
    2. **Verify** survivors with Spark's thresholded ``levenshtein``
       (early-exits once the running distance exceeds the budget, so a
       verify costs O(len·max_distance), not O(len²)).

    Recall guarantee: a pair within ``max_distance`` is found whenever
    the shorter normalized string has more than ``n·max_distance``
    distinct grams (below that, edits can destroy every shared gram —
    raise recall for very short strings by dropping ``n`` to 2).
    ``max_df`` caps stopword-grade grams exactly as in
    :func:`fuzzy_join`; a capped gram weakens the count bound on
    affected pairs (the bound subtracts capped grams, kept sound by
    counting per-side sizes over surviving grams only).

    Scale shape: the gram equi-join is the only candidate generator
    (never N×M); verification adds two keyed joins to fetch the strings
    and one narrow projection.
    """
    if max_distance < 0:
        raise ValueError(
            f"edit_distance_join: max_distance must be >= 0, got {max_distance}"
        )
    lg = _gram_table(left, left_id, left_col, n, "a")
    rg = _gram_table(right, right_id, right_col, n, "b")
    if max_df is not None:
        hot = (
            lg.select("g").unionAll(rg.select("g"))
            .groupBy("g").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("g")
        )
        lg = lg.join(F.broadcast(hot), "g", "left_anti")
        rg = rg.join(F.broadcast(hot), "g", "left_anti")
    sa = lg.groupBy("id_a").agg(F.count("*").alias("n_a"))
    sb = rg.groupBy("id_b").agg(F.count("*").alias("n_b"))
    slack = n * max_distance
    cand = (
        lg.join(rg, "g")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
        .join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            (F.col("inter") >= F.col("n_a") - slack)
            & (F.col("inter") >= F.col("n_b") - slack)
        )
        .select("id_a", "id_b")
    )
    ltxt = left.select(
        F.col(left_id).alias("id_a"),
        F.lower(F.trim(F.col(left_col))).alias("__ta"),
    )
    rtxt = right.select(
        F.col(right_id).alias("id_b"),
        F.lower(F.trim(F.col(right_col))).alias("__tb"),
    )
    dist = F.levenshtein("__ta", "__tb", max_distance)
    return (
        cand.join(ltxt, "id_a")
        .join(rtxt, "id_b")
        .filter(
            F.abs(F.length("__ta") - F.length("__tb")) <= max_distance
        )
        .withColumn("distance", dist)
        .filter(F.col("distance") >= 0)
        .select("id_a", "id_b", F.col("distance").cast("long").alias("distance"))
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
    n: int = 3,
    max_df: int | None = None,
    order_col: str | None = None,
    keep: str = "min",
    cluster_col: str = "entity_id",
) -> DataFrame:
    """End-to-end entity resolution over one table: near-identical
    strings (Levenshtein ≤ ``max_distance`` after normalization)
    collapse to one canonical row per entity.

    Three stages, each the scale-shaped operator it names:

    1. :func:`edit_distance_join` self-join — blocked match pairs
       (never N×M);
    2. connected components over the pair graph
       (:func:`~.dedup.dedup_clusters`) — transitive closure, so
       "Acme Corp" ~ "Acme Corp." ~ "ACME  Corp" land in ONE entity
       even when the endpoints exceed the pairwise threshold;
    3. keep-one (:func:`~.dedup.dedup_keep_best`) — the ``keep``
       extreme of ``order_col`` (default: the id) survives per entity.

    Returns the surviving rows with ``cluster_col`` attached (the
    entity's min reachable id) — the dimension table a migration can
    then `refer` against.  Transitive closure is the right semantic for
    entity keys but DOES chain: raise ``max_distance`` with care.
    """
    pairs = edit_distance_join(
        df, df, id_col, text_col, id_col, text_col,
        max_distance=max_distance, n=n, max_df=max_df,
    ).filter(F.col("id_a") < F.col("id_b"))
    from .dedup import dedup_clusters, dedup_keep_best

    clusters = dedup_clusters(df.select(id_col), pairs, id_col=id_col)
    survivors = dedup_keep_best(
        df, clusters, id_col, order_col=order_col, keep=keep,
    )
    return survivors.join(
        clusters.select(F.col(id_col), F.col("cluster_id").alias(cluster_col)),
        id_col,
        "left",
    ).withColumn(
        cluster_col, F.coalesce(F.col(cluster_col), F.col(id_col))
    )
