"""Skew-aware join utilities.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) handles skewed
*sort-merge* joins transparently and is the first line of defense.  Salting
remains necessary when (a) the join must aggregate after the join and one
key dominates (AQE splits the join but the downstream groupBy still hot-
spots), or (b) the build side is too big to broadcast and a handful of keys
hold most of the probe rows.

:func:`salted_left_join` implements the standard prescription:

- probe side: each row gets a random-but-deterministic salt in
  ``[0, salts)`` (hash of a tiebreak column — reproducible across retries,
  unlike ``rand()``).
- build side: replicated ``salts`` times (one copy per salt value).
- join on (key, salt): a key's rows now spread over ``salts`` reducers.

Replication multiplies the build side, so salt ONLY the hot keys: pass
``hot_keys`` (or let :func:`hot_key_sample` estimate them with a cheap
sampled count) and the join splits into a salted lane for hot keys and a
plain lane for the long tail, unioned after.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hot_key_sample", "salted_left_join", "skew_report", "join_size_report"]


def hot_key_sample(
    df: DataFrame,
    key: str,
    threshold: int = 100_000,
    fraction: float = 0.01,
    seed: int = 7,
) -> list:
    """Estimate hot join keys from a sample: keys whose sampled count
    extrapolates past ``threshold`` rows.  One narrow sample + small
    aggregate — the driver only ever sees the (few) hot keys."""
    est = (
        df.sample(fraction=fraction, seed=seed)
        .groupBy(key)
        .agg((F.count("*") / fraction).alias("__est"))
        .filter(F.col("__est") >= threshold)
    )
    return [r[0] for r in est.select(key).collect()]


def salted_left_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_on: str,
    hot_keys: list,
    salts: int = 16,
) -> DataFrame:
    """Left join ``probe`` with ``build`` on ``key`` where ``hot_keys``
    are salted across ``salts`` reducers and the long tail joins plain.

    ``salt_on`` is any probe column with per-row variation (an id); the
    salt is ``pmod(xxhash64(salt_on), salts)`` — deterministic, so task
    retries produce identical partitioning.  Build columns that collide
    with probe columns are suffixed ``_b`` by the caller beforehand.
    """
    if not hot_keys:
        return probe.join(build, on=key, how="left")

    is_hot: Column = F.col(key).isin(hot_keys)

    hot_probe = probe.filter(is_hot).withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salts))
    )
    salt_values = F.explode(
        F.array(*[F.lit(i).cast("int") for i in range(salts)])
    ).alias("__salt")
    hot_build = build.filter(is_hot).select("*", salt_values)
    hot = hot_probe.join(hot_build, on=[key, "__salt"], how="left").drop("__salt")

    tail = probe.filter(~is_hot | F.col(key).isNull()).join(
        build, on=key, how="left"
    )
    return hot.unionByName(tail)


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 10,
) -> DataFrame:
    """Key-skew diagnostic before a join/groupBy on ``key_cols``: the
    ``top_k`` heaviest keys with their row counts and share of the
    table, plus each key's multiple of a perfectly uniform share
    (``skew_x``; 1.0 = balanced, 1000 = that key alone is 1000 tasks'
    worth of work).  The number a human checks before deciding between
    a plain join, :func:`salted_left_join`, or AQE skew splitting.

    Scale shape: one map-side-combined count per key, two tiny scalar
    aggregates over the count table (row total, key total), TakeOrdered
    of ``top_k`` — never a collect of the key domain.
    """
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("__rows"), F.count("*").alias("__keys")
    )
    # TakeOrdered FIRST: the 1-row totals frame joins onto k rows, never
    # onto the key domain
    top = (
        counts.orderBy(F.col("n").desc(), *[F.col(c).asc() for c in key_cols])
        .limit(top_k)
        .crossJoin(F.broadcast(totals))
    )
    w = Window.orderBy(F.col("n").desc(), *[F.col(c).asc() for c in key_cols])
    return top.select(
        *key_cols,
        F.col("n"),
        F.round(F.col("n") / F.col("__rows"), 6).alias("share"),
        F.round(F.col("n") * F.col("__keys") / F.col("__rows"), 2).alias("skew_x"),
    ).withColumn("rank", F.row_number().over(w))


def join_size_report(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str] | None = None,
    top_k: int = 10,
) -> DataFrame:
    """Exact pre-join cardinality + blowup diagnostic WITHOUT running the
    join: ``|A ⋈ B| = Σ_k n_A(k)·n_B(k)``, computed from the two per-key
    count tables.  Each side reduces map-side to (key, count) first, so
    the only join here is count-table ⋈ count-table — key-domain-sized,
    never fact-sized.  At 100 TB this answers "will this join explode,
    and which keys are responsible" for the cost of two aggregations,
    before committing a cluster to the real join (the companion to
    :func:`skew_report`, which looks at one side only).

    Returns the ``top_k`` contributing keys (named by ``left_keys``):
    per-key input counts, output rows, share of the total join output,
    cumulative blowup vs the larger input (``total_out`` on every row is
    the full join size), with a deterministic (out_rows desc, key asc)
    rank.
    """
    rk = right_keys or left_keys
    if not left_keys:
        raise ValueError("join_size_report: left_keys must be non-empty "
                         "(an empty key list would size a cross join)")
    if len(rk) != len(left_keys):
        raise ValueError(
            f"left_keys/right_keys arity mismatch: {left_keys} vs {rk}"
        )
    lc = left.groupBy(*left_keys).agg(F.count("*").alias("n_left"))
    rc = right.groupBy(*rk).agg(F.count("*").alias("n_right"))
    # align right key names onto left's so the equi-join coalesces keys
    for a, b in zip(left_keys, rk):
        if a != b:
            rc = rc.withColumnRenamed(b, a)
    contrib = lc.join(rc, on=list(left_keys)).select(
        *left_keys, "n_left", "n_right",
        (F.col("n_left") * F.col("n_right")).alias("out_rows"),
    )
    totals = contrib.agg(F.sum("out_rows").alias("__total"))
    top = (
        contrib.orderBy(
            F.col("out_rows").desc(), *[F.col(c).asc() for c in left_keys]
        )
        .limit(top_k)
        .crossJoin(F.broadcast(totals))
    )
    w = Window.orderBy(
        F.col("out_rows").desc(), *[F.col(c).asc() for c in left_keys]
    )
    return top.select(
        *left_keys,
        "n_left",
        "n_right",
        "out_rows",
        F.round(F.col("out_rows") / F.col("__total"), 6).alias("share"),
        F.col("__total").alias("total_out"),
    ).withColumn("rank", F.row_number().over(w))
