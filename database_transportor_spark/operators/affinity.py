"""Market-basket co-occurrence / association mining.

Classic retail-OLAP operator the reference's users run downstream of a
transport (the reference itself — DBT.php — stops at the transport; this
extends the analytics tier per SURVEY §2 extensions): which item pairs
co-occur in the same basket, with support and lift so "bought A ⇒ bought B"
rules can be ranked.  Also the blocking primitive for co-visitation
recommenders and token-co-occurrence (PMI) statistics — the basket is just
the grouping key.

Scale shape (the part that must survive 100 TB):

- The input collapses to DISTINCT (basket, item) first — raw fact tables
  repeat items per basket (a lineitem can list a part twice) and the pair
  join must never see that blow-up.
- ``max_basket`` caps the per-basket fan-out: a k-item basket yields
  C(k,2) pairs, so one pathological 10⁶-item basket would emit 5·10¹¹
  pairs.  The cap keeps each basket's smallest-N items via a spillable
  ``row_number`` sort — deterministic, bounded task memory under arbitrary
  skew (same guard contract as ``funnel``/``ewma``).
- The pair generator is an EQUI-join on the basket key (never a cross
  join): one shuffle keyed by basket, per-basket fan-out ≤ C(cap, 2).
- Support/lift use exact integer parts-per-million arithmetic, so results
  are bit-reproducible across engines (see the money-math policy in
  ``corpus.py``).
- The scalar basket total is a literal 1-row aggregate cross-joined
  (broadcast) onto the pair counts — same documented shape as
  ``text.py:lm_score``; build side is one row by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pins import pin

__all__ = ["cooccurrence_pairs"]

PPM = 1_000_000


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket: int | None = None,
) -> DataFrame:
    """Item-pair co-occurrence with exact integer support/lift.

    Returns one row per unordered item pair ``(item_a < item_b)`` that
    co-occurs in ≥ ``min_pair_count`` baskets::

        item_a, item_b, pair_count, count_a, count_b,
        support_ppm,   -- pair_count · 10⁶ div n_baskets
        lift_ppm       -- pair_count · n_baskets · 10⁶ div (count_a·count_b)

    ``lift_ppm > 10⁶`` means the pair co-occurs more often than independent
    items would; ``support_ppm`` is the basket-share in parts-per-million.
    Both are integer-exact (integer division) so external engines reproduce
    them bit-for-bit.

    ``max_basket`` keeps each basket's smallest-N items (deterministic) —
    REQUIRED on data with unbounded basket sizes; see the module header for
    why.  Item counts are computed over the SAME capped set so support and
    lift stay internally consistent.
    """
    if min_pair_count < 1:
        raise ValueError("cooccurrence_pairs: min_pair_count must be >= 1")
    items = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    if max_basket is not None:
        if max_basket < 2:
            raise ValueError("cooccurrence_pairs: max_basket must be >= 2")
        wg = Window.partitionBy("__b").orderBy("__i")
        items = (
            items.withColumn("__rn", F.row_number().over(wg))
            .filter(F.col("__rn") <= max_basket)
            .drop("__rn")
        )
    # consumed 4×: both pair-join sides, item supports, basket total —
    # persist so the distinct+cap runs once (review finding: multi-consumer
    # relations must be pinned or Spark recomputes the whole lineage)
    items = pin(items)

    left = items.select(F.col("__b"), F.col("__i").alias("item_a"))
    right = items.select(F.col("__b"), F.col("__i").alias("item_b"))
    pair_counts = (
        left.join(right, "__b")  # equi-join on the basket key — one shuffle
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
    )
    supports = items.groupBy("__i").agg(F.count("*").alias("__cnt"))
    # 1-row scalar total, broadcast-joined (documented nested-loop
    # exception, same shape as lm_score's totals frame)
    totals = items.agg(
        F.count_distinct(F.col("__b")).alias("__n_baskets")
    )
    out = (
        pair_counts.join(
            supports.select(
                F.col("__i").alias("item_a"), F.col("__cnt").alias("count_a")
            ),
            "item_a",
        )
        .join(
            supports.select(
                F.col("__i").alias("item_b"), F.col("__cnt").alias("count_b")
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            F.expr(f"pair_count * {PPM} div __n_baskets").alias(
                "support_ppm"
            ),
            # 128-bit numerator: pair_count·n_baskets·10⁶ exceeds BIGINT
            # once n_baskets reaches ~1e8 (Spark would wrap silently with
            # ANSI off); DECIMAL(38,0) here / HUGEINT in external SQL —
            # `div` still returns an exact BIGINT
            F.expr(
                f"CAST(pair_count AS DECIMAL(38,0)) * __n_baskets * {PPM} "
                "div (count_a * count_b)"
            ).alias("lift_ppm"),
        )
    )
    return out
