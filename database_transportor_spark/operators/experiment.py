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

__all__ = ["ab_test", "linear_fit", "linear_fit_multi", "kaplan_meier"]

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


def linear_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    x_scale: int = 100,
    y_scale: int = 100,
    round_digits: int = 10,
) -> DataFrame:
    """Closed-form simple linear regression (y ~ a·x + b) per group in ONE
    aggregation pass — the canonical learn-at-scale pattern: no
    iterations, no driver-side data, just the five sufficient statistics
    (n, Σx, Σy, Σxy, Σx²[, Σy² for R²]) reduced map-side and solved in a
    closed-form expression.

    Determinism contract (same policy as :func:`ab_test`): x and y are
    quantized to exact integers (``round(v·scale)``), the sums accumulate
    in DECIMAL(38,0) — order-independent, overflow-safe for ~1e9 rows of
    1e7-scaled values — and the slope/intercept/R² doubles come from one
    fixed expression over those exact integers, rounded as belt.  Hash-
    identical on any IEEE-754 engine, which is what lets DuckDB oracle a
    regression.

    Scale shape: one map-side-combinable aggregate keyed by the group (or
    global); output is group-count-sized.  NULL x or y rows are excluded
    (SQL aggregate semantics over the products).
    """
    # per-row quantized values and their products stay in LONG (cheap,
    # codegen-friendly); only the sums widen to DECIMAL(38,0).  Measured
    # 2.3x on the x50 fixture vs per-row decimal multiplication.  Envelope:
    # |x_q|,|y_q| and every pairwise product must fit int64 (~9.2e18) —
    # i.e. values up to ~3e9 after scaling.
    gx = F.round(F.col(x_col) * x_scale).cast("long")
    gy = F.round(F.col(y_col) * y_scale).cast("long")
    both = F.when(F.col(x_col).isNotNull() & F.col(y_col).isNotNull(), True)
    x = F.when(both, gx)
    y = F.when(both, gy)
    dec = "decimal(38,0)"
    agg = [
        F.count(F.when(both, F.lit(1))).alias("n"),
        F.sum(x.cast(dec)).alias("__sx"),
        F.sum(y.cast(dec)).alias("__sy"),
        F.sum((x * y).cast(dec)).alias("__sxy"),
        F.sum((x * x).cast(dec)).alias("__sxx"),
        F.sum((y * y).cast(dec)).alias("__syy"),
    ]
    g = df.groupBy(*(group_cols or [])).agg(*agg)
    n = F.col("n").cast("decimal(38,0)")
    # num/den and the intercept's numerator/denominator stay EXACT decimals;
    # each output is then ONE double division (plus one exact constant-ratio
    # multiply for unit rescale) — no compound float expression whose ulp
    # could drift between engines.  Magnitude envelope: fits DECIMAL(38)/
    # HUGEINT up to ~1e8 rows of 1e7-scaled values (documented; the x100
    # fixture sweep is just inside it).
    num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
    den_x = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
    den_y = (n * F.col("__syy") - F.col("__sy") * F.col("__sy"))
    slope = (num.cast("double") / den_x.cast("double")) * (
        F.lit(float(x_scale)) / F.lit(float(y_scale))
    )
    ic_num = F.col("__sy") * den_x - num * F.col("__sx")
    ic_den = n * den_x * F.lit(int(y_scale)).cast("decimal(38,0)")
    intercept = ic_num.cast("double") / ic_den.cast("double")
    r2 = (num.cast("double") * num.cast("double")) / (
        den_x.cast("double") * den_y.cast("double")
    )
    return g.select(
        *(group_cols or []),
        F.col("n").cast("long").alias("n"),
        F.when(den_x == 0, None).otherwise(F.round(slope, round_digits)).alias("slope"),
        F.when(den_x == 0, None).otherwise(F.round(intercept, round_digits)).alias("intercept"),
        F.when((den_x == 0) | (den_y == 0), None).otherwise(F.round(r2, round_digits)).alias("r2"),
    )


def linear_fit_multi(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    group_cols: list[str] | None = None,
    ridge: float = 0.0,
) -> DataFrame:
    """Multivariate least squares per group via NORMAL EQUATIONS: one
    aggregation reduces the corpus to the k×k Gram matrix XᵀX and the
    k-vector Xᵀy (k = features + intercept), then a k×k solve runs per
    group over the group-count-sized stats frame — an Arrow-batched
    pandas solve, never a collect of the data.  ``ridge`` adds λI for
    ill-conditioned Grams.

    The 100 TB shape for fitting a linear model / quality scorer: corpus
    cost is ONE pass with map-side partial sums of k(k+3)/2 products;
    everything after is O(groups·k³) on vectors of size k², independent
    of row count.  Float sums are order-dependent (unlike
    :func:`linear_fit`'s decimal path), so results are approximate to
    partitioning — use linear_fit when bit-determinism matters.
    """
    import pandas as pd

    k = len(feature_cols)
    if k == 0:
        raise ValueError("linear_fit_multi: feature_cols must be non-empty")
    cols = [F.lit(1.0).alias("__x0")] + [
        F.col(c).cast("double").alias(f"__x{i+1}")
        for i, c in enumerate(feature_cols)
    ]
    base = df.select(
        *(group_cols or []), *cols, F.col(label_col).cast("double").alias("__y")
    ).na.drop(subset=[f"__x{i}" for i in range(k + 1)] + ["__y"])
    aggs = []
    for i in range(k + 1):
        for j in range(i, k + 1):
            aggs.append(
                F.sum(F.col(f"__x{i}") * F.col(f"__x{j}")).alias(f"__g_{i}_{j}")
            )
        aggs.append(F.sum(F.col(f"__x{i}") * F.col("__y")).alias(f"__b_{i}"))
    aggs.append(F.count("*").alias("n"))
    stats = base.groupBy(*(group_cols or [])).agg(*aggs)

    # group columns come back as strings (stable across Arrow round-trips);
    # the frame is group-count-sized, so re-typing downstream is cheap
    out_fields = ", ".join(
        ([f"{c} string" for c in (group_cols or [])])
        + ["n long", "intercept double", "coefficients array<double>"]
    )

    def _solve(iterator):
        import numpy as np

        for pdf in iterator:
            rows = []
            for _, r in pdf.iterrows():
                g = np.zeros((k + 1, k + 1))
                b = np.zeros(k + 1)
                for i in range(k + 1):
                    for j in range(i, k + 1):
                        g[i, j] = g[j, i] = r[f"__g_{i}_{j}"]
                    b[i] = r[f"__b_{i}"]
                if ridge:
                    g = g + ridge * np.eye(k + 1)
                try:
                    w = np.linalg.solve(g, b)
                except np.linalg.LinAlgError:
                    w, *_ = np.linalg.lstsq(g, b, rcond=None)
                rows.append(
                    [str(r[c]) for c in (group_cols or [])]
                    + [int(r["n"]), float(w[0]), [float(v) for v in w[1:]]]
                )
            names = list(group_cols or []) + ["n", "intercept", "coefficients"]
            yield pd.DataFrame(rows, columns=names)

    return stats.mapInPandas(_solve, schema=out_fields)


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival curve per group: at each distinct EVENT
    time ``t`` (times with only censored exits are folded into the risk
    math but emit no step, the standard estimator)::

        S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)

    with ``d_i`` events at ``t_i`` and ``n_i`` subjects still at risk
    (duration ≥ t_i).  ``event_col`` is boolean-ish: truthy = the event
    occurred at ``duration``, falsy = censored then.  Output:
    ``group…, t, n_risk, n_events, survival``.

    Shape: one (group, duration) aggregate collapses the corpus to the
    distinct-time table, then ordered windows over THAT (cumulative
    exits for n_risk, cumulative Σlog(1−d/n) for the product via
    exp∘sum∘log — Spark has no cumprod).  The everyone-dies time
    (``d == n``) needs explicit zeroing: Spark's ``log(0)`` is NULL,
    not −inf, and a NULL silently drops out of ``sum`` — so a
    cumulative died-out flag pins survival to exactly 0 from that time
    on.  All corpus-sized work is the one aggregate; windows run on
    |distinct durations| rows per group.
    """
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    ev = F.when(F.col(event_col).cast("boolean"), 1).otherwise(0)
    per_t = (
        df.filter(F.col(duration_col).isNotNull())
        .groupBy(*gcols, F.col(duration_col).alias("t"))
        .agg(
            F.sum(ev).alias("n_events"),
            F.count("*").alias("n_exits"),
        )
    )
    w = Window.partitionBy(*gcols).orderBy("t")
    prior_exits = F.coalesce(
        F.sum("n_exits").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    total = F.sum("n_exits").over(Window.partitionBy(*gcols))
    per_t = per_t.withColumn("n_risk", total - prior_exits)
    died_out = F.max(
        (F.col("n_events") == F.col("n_risk")).cast("int")
    ).over(w) == 1
    surv = F.when(died_out, F.lit(0.0)).otherwise(
        F.exp(
            F.sum(
                F.log(1.0 - F.col("n_events") / F.col("n_risk"))
            ).over(w)
        )
    )
    return (
        per_t.withColumn("survival", F.round(surv, round_to))
        .filter(F.col("n_events") > 0)
        .select(*gcols, "t", "n_risk", "n_events", "survival")
    )
