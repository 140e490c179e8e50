"""Experiment analysis: entity-level conversion rates and two-proportion
z-tests per variant pair.

The downstream-of-transport analytics step behind every A/B readout: given
an event stream with a variant assignment, compute per-variant conversion
(did the ENTITY convert, not how many times) and the pairwise z statistic
``(p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))`` with the pooled rate p̂.

Determinism contract: all counts are exact BIGINTs from a single
aggregation; rates are exposed as integer parts-per-million; the one
unavoidable double (the z statistic) is computed in a single closed-form
expression from those exact integers — identical expression shape on any
IEEE-754 engine — and rounded to 6 decimals as belt (same policy as the
percentile/EWMA oracles).

Scale shape: one DISTINCT-entity collapse + one groupBy(variant) — two
shuffles keyed by entity then variant.  The variant table is
variant-count-sized (tiny); the pairwise self-join runs on it, never on
the events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ab_test"]

PPM = 1_000_000


def ab_test(
    df: DataFrame,
    variant_col: str,
    entity_col: str,
    converted: str,
) -> DataFrame:
    """Pairwise two-proportion z-test over variant assignments.

    ``converted`` is a SQL boolean expression over the event row (e.g.
    ``"event_type = 'purchase'"``); an entity counts as converted if ANY
    of its rows satisfies it.  Entities must map to one variant each —
    if an entity appears under several variants it is counted in each
    (guard upstream; mixed assignment is an experiment bug, not an
    analysis choice).

    Returns one row per unordered variant pair (``variant_a <
    variant_b``)::

        variant_a, variant_b, n_a, n_b, conv_a, conv_b,
        rate_a_ppm, rate_b_ppm,   -- exact integer div
        z_score                   -- round(·, 6), sign: a minus b

    Zero-entity variants cannot occur (a variant exists only via rows);
    a pair where BOTH rates are 0 or both are 1 yields z_score NULL
    (pooled variance is 0 — no information), never a division error.
    """
    ent = (
        df.select(
            F.col(variant_col).alias("variant"),
            F.col(entity_col).alias("__e"),
            F.expr(converted).cast("boolean").alias("__c"),
        )
        .groupBy("variant", "__e")
        .agg(F.max(F.coalesce(F.col("__c"), F.lit(False))).alias("__conv"))
    )
    per_variant = ent.groupBy("variant").agg(
        F.count("*").alias("n"),
        F.sum(F.col("__conv").cast("long")).alias("conv"),
    )
    a = per_variant.select(
        F.col("variant").alias("variant_a"),
        F.col("n").alias("n_a"),
        F.col("conv").alias("conv_a"),
    )
    b = per_variant.select(
        F.col("variant").alias("variant_b"),
        F.col("n").alias("n_b"),
        F.col("conv").alias("conv_b"),
    )
    pairs = a.join(b, F.col("variant_a") < F.col("variant_b"))
    # one closed-form double expression from exact integers; NULL when the
    # pooled variance is zero (all-converted or none-converted overall)
    z = (
        "(CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) / "
        "sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * "
        "(1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * "
        "(1.0 / n_a + 1.0 / n_b))"
    )
    return pairs.select(
        "variant_a",
        "variant_b",
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.expr(f"conv_a * {PPM} div n_a").alias("rate_a_ppm"),
        F.expr(f"conv_b * {PPM} div n_b").alias("rate_b_ppm"),
        F.round(
            F.when(
                (F.col("conv_a") + F.col("conv_b") > 0)
                & (F.col("conv_a") + F.col("conv_b")
                   < F.col("n_a") + F.col("n_b")),
                F.expr(z),
            ),
            6,
        ).alias("z_score"),
    )
