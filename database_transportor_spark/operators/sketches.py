"""Sketch / approximate aggregates — and their exact counterparts.

At 100 TB, exact ``count(distinct)`` and exact percentiles force a full
shuffle of the measured column; sketches answer the same questions with
bounded memory and a single map-side-combinable aggregation:

- :func:`approx_distinct` — HyperLogLog++ (``approx_count_distinct``),
  mergeable, relative error ``rsd``.
- :func:`approx_quantiles` — Greenwald-Khanna (``percentile_approx``),
  rank error ``1/accuracy``.
- :func:`grouped_median` / :func:`grouped_percentiles` — the exact
  versions (Spark ``percentile``), used as the oracle-checkable baseline
  and as the right choice when the group count is small.

All are built-in JVM aggregates — no Python, map-side partial merge, one
shuffle keyed by the group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "approx_distinct",
    "approx_quantiles",
    "grouped_median",
    "grouped_percentiles",
    "heavy_hitters",
    "kmv_sketch",
    "kmv_distinct",
    "kmv_pairwise",
    "hist_bin",
    "hist_measure",
    "hist_quantiles",
    "hist_table",
    "approx_agg",
    "grouped_percentiles_scalable",
]


def approx_distinct(
    df: DataFrame, keys: list[str], col: str, rsd: float = 0.02,
    out_col: str = "approx_distinct",
) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd=rsd).alias(out_col)
    )


def approx_quantiles(
    df: DataFrame,
    keys: list[str],
    col: str,
    probabilities: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    probs = F.array(*[F.lit(p) for p in probabilities])
    return df.groupBy(*keys).agg(
        F.percentile_approx(col, probs, F.lit(accuracy)).alias("quantiles")
    )


def grouped_percentiles(
    df: DataFrame, keys: list[str], col: str, probabilities: list[float]
) -> DataFrame:
    """Exact interpolated percentiles per group (one sort-based aggregate)."""
    probs = F.array(*[F.lit(p) for p in probabilities])
    return df.groupBy(*keys).agg(F.percentile(col, probs).alias("percentiles"))


def grouped_median(
    df: DataFrame, keys: list[str], col: str, out_col: str = "median"
) -> DataFrame:
    return df.groupBy(*keys).agg(F.median(col).alias(out_col))


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 10,
    exact: bool = True,
    support: float = 0.01,
) -> DataFrame:
    """Top-``k`` most frequent values of ``value_col`` (optionally per
    group), with deterministic (count desc, value asc) ordering.

    ``exact=True``: groupBy-count then rank — the count aggregation gets
    map-side combine (shuffle carries one row per distinct value per
    partition), and the rank window runs over the already-aggregated
    frequency table, which is |distinct| rows, not |input| rows.  For a
    global top-k (no groups) the final select is a TakeOrdered — no
    global sort materialization.

    ``exact=False``: pre-filter with ``DataFrame.freqItems`` (the
    Karp-Papadimitriou-Shenker one-pass heavy-hitters sketch, JVM-side)
    at ``support``, then count only the surviving candidate values —
    the two-pass "sketch to shortlist, count to verify" pattern that
    avoids shuffling the full distinct-value table when the value domain
    is huge (URLs, user agents) but the true heavy hitters are few.
    Only values above the support threshold are reliable; the second
    pass makes the reported counts exact.
    """
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    src = df
    if not exact:
        if gcols:
            raise ValueError(
                "heavy_hitters: sketch mode (exact=False) is global-only; "
                "use exact=True for grouped top-k"
            )
        cand = df.freqItems([value_col], support).collect()[0][0]
        src = df.filter(F.col(value_col).isin(list(cand)))
    counts = src.groupBy(*gcols, value_col).agg(F.count("*").alias("n"))
    if gcols:
        w = Window.partitionBy(*gcols).orderBy(
            F.col("n").desc(), F.col(value_col).asc()
        )
        return (
            counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    # TakeOrdered pulls the k winners; the rank window then runs on a
    # k-row frame (single tiny partition), never the full value domain
    top = counts.orderBy(F.col("n").desc(), F.col(value_col).asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col(value_col).asc())
    return top.withColumn("rank", F.row_number().over(w))


# ---------------------------------------------------------------------------
# KMV (bottom-k) / theta-style sketches: distinct INTERSECTIONS
# ---------------------------------------------------------------------------
#
# HLL answers "how many distinct per group" but cannot intersect two
# groups' sketches; the KMV (k minimum values) sketch can.  Keep the k
# smallest xxhash64 values of the measured column per group; any two
# sketches then estimate |A∩B|, |A∪B|, and Jaccard from k-sized arrays —
# the pairwise work runs on ONE ROW PER GROUP, never re-joining the
# corpus.  That is the 100 TB story: the corpus is scanned once to build
# the sketch table (same shuffle cost as an exact count-distinct), and
# every subsequent overlap question — all group pairs, new pairs later —
# is answered from the tiny sketch table alone.
#
# Determinism: xxhash64 is a fixed JVM hash, so a group's sketch is a
# deterministic set — estimates are bit-stable run to run, which is what
# lets the harness pin them behind an accuracy-contract oracle.

_TWO_POW_64 = float(1 << 64)


def _unit(h):
    """Map a signed-64 xxhash64 value to (0, 1]: rank of h in the wrapped
    key space.  Strictly positive so 1/u never divides by zero."""
    return (h.cast("double") + F.lit(float(1 << 63) + 1.0)) / F.lit(_TWO_POW_64)


def kmv_sketch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    k: int = 512,
    out_col: str = "kmv",
    fanout: int = 64,
) -> DataFrame:
    """Per-group bottom-``k`` sketch of ``xxhash64(value_col)``.

    Output: one row per group — ``keys..., kmv array<bigint>`` (sorted
    ascending, ``min(k, D)`` entries where D = the group's true distinct
    count).  A sketch with fewer than ``k`` entries is EXACT (it holds
    every distinct hash).

    Plan — two-stage exact bottom-k so parallelism never collapses to
    the group count (a 3-group corpus must not sort on 3 tasks):

    1. dedupe ``(group, bucket, hash)`` with one map-side-combinable
       aggregation, where ``bucket = pmod(hash, fanout)`` — a pure
       function of the hash, so per-bucket dedupe IS per-group dedupe;
    2. rank within ``(group, bucket)`` (``group_count × fanout``-way
       parallel sort) and keep ``rank <= k`` — the group's true bottom-k
       is a subset of the union of its buckets' bottom-ks;
    3. re-rank the ≤ ``fanout·k`` survivors per group (tiny input) and
       fold into the sorted array.

    Three exchanges total, but the corpus-sized sort in stage 2 runs at
    full cluster width; stages 3's input is sketch-sized by
    construction.  The dedupe shuffle carries distinct tuples — the same
    cost exact count-distinct pays.
    """
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"kmv_sketch: k must be >= 2, got {k}")
    if fanout < 1:
        raise ValueError(f"kmv_sketch: fanout must be >= 1, got {fanout}")
    nn = df.filter(F.col(value_col).isNotNull())
    hashed = (
        nn.select(
            *keys,
            F.xxhash64(value_col).alias("h"),
        )
        .withColumn("_b", F.pmod(F.col("h"), F.lit(fanout)))
        .groupBy(*keys, "_b", "h")
        .agg(F.lit(1).alias("_one"))
    )
    wb = Window.partitionBy(*keys, "_b").orderBy("h")
    survivors = (
        hashed.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") <= k)
    )
    wg = Window.partitionBy(*keys).orderBy("h")
    return (
        survivors.withColumn("_rg", F.row_number().over(wg))
        .filter(F.col("_rg") <= k)
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("h")).alias(out_col))
    )


def kmv_distinct(
    sketches: DataFrame, k: int, kmv_col: str = "kmv",
    out_col: str = "distinct_est",
) -> DataFrame:
    """Distinct-count estimate from a :func:`kmv_sketch` table.

    Unsaturated sketch (``size < k``) ⇒ the exact count.  Saturated ⇒
    the classic unbiased KMV estimator ``(k-1) / u_k`` with ``u_k`` the
    k-th minimum mapped to (0,1].  Zero-shuffle column math on the
    group-count-sized sketch table."""
    kmv = F.col(kmv_col)
    est = F.when(
        F.size(kmv) < k, F.size(kmv).cast("double")
    ).otherwise(F.lit(float(k - 1)) / _unit(F.element_at(kmv, k)))
    return sketches.withColumn(out_col, F.round(est).cast("long"))


def kmv_pairwise(
    sketches: DataFrame,
    keys: list[str],
    k: int,
    kmv_col: str = "kmv",
) -> DataFrame:
    """All-pairs overlap estimates between groups, from sketches alone.

    For each unordered group pair (a < b): theta = the smaller of the
    two sketches' k-th minima (an unsaturated sketch's theta is the
    whole key space — it is exact).  Survivors below theta form a
    uniform sample of A∪B, so::

        inter_est = |{h ∈ A∩B : h < theta}| / theta
        union_est = |{h ∈ A∪B : h < theta}| / theta
        jaccard_est = inter / union   (the exact ratio of the two counts)

    One self-join of the ONE-ROW-PER-GROUP sketch table (group-count
    sized, broadcastable) plus JVM array intersect/union on k-sized
    arrays — the corpus is never touched again.  Single-column groups
    only (the pair key is the column's value)."""
    if len(keys) != 1:
        raise ValueError("kmv_pairwise: exactly one group column required")
    key = keys[0]
    a = sketches.select(
        F.col(key).alias("group_a"), F.col(kmv_col).alias("_ka")
    )
    b = sketches.select(
        F.col(key).alias("group_b"), F.col(kmv_col).alias("_kb")
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    ka, kb = F.col("_ka"), F.col("_kb")
    # theta per side: k-th min if saturated, else +inf (exact side)
    inf = F.lit(float("inf"))
    ta = F.when(F.size(ka) >= k, _unit(F.element_at(ka, k))).otherwise(inf)
    tb = F.when(F.size(kb) >= k, _unit(F.element_at(kb, k))).otherwise(inf)
    theta = F.least(ta, tb)
    # raw-long threshold for the array filters: strictly below the k-th
    # minimum that defined theta (that element is the (k)th order stat —
    # counting it would bias the sample); on the exact side everything
    # survives.  Work in unit space to keep one comparison rule.
    below = lambda arr: F.filter(arr, lambda h: _unit(h) < theta)  # noqa: E731
    sa, sb = below(ka), below(kb)
    inter_n = F.size(F.array_intersect(sa, sb)).cast("double")
    union_n = F.size(F.array_union(sa, sb)).cast("double")
    safe_theta = F.when(theta == inf, F.lit(1.0)).otherwise(theta)
    return pairs.select(
        "group_a",
        "group_b",
        F.round(inter_n / safe_theta).cast("long").alias("inter_est"),
        F.round(union_n / safe_theta).cast("long").alias("union_est"),
        F.when(union_n > 0, F.round(inter_n / union_n, 6))
        .otherwise(F.lit(0.0))
        .alias("jaccard_est"),
    )


# ---------------------------------------------------------------------------
# Mergeable fixed-bin histograms: percentiles that roll up
# ---------------------------------------------------------------------------
#
# percentile_approx results cannot be merged (a p95 of p95s is not a
# p95), so incremental rollups (`refresh_rollup`) and coarse-from-fine
# hierarchies (`time_rollup`) could carry counts/sums/HLL but not
# quantiles.  A fixed-bin histogram CAN: counts are longs, merging is
# element-wise addition — associative, commutative, exact — and any
# quantile is read off the cumulative histogram with at-most-bin-width
# error.  That is the classic monitoring-system trade (Prometheus
# histograms): pick the bin layout once, merge forever.

def _hist_edges(lo: float, hi: float, bins: int, log: bool) -> list[float]:
    if not (hi > lo):
        raise ValueError(f"hist: need hi > lo, got [{lo}, {hi})")
    if bins < 1:
        raise ValueError(f"hist: bins must be >= 1, got {bins}")
    if log:
        if lo <= 0:
            raise ValueError("hist: log spacing needs lo > 0")
        ratio = (hi / lo) ** (1.0 / bins)
        return [lo * ratio ** i for i in range(bins + 1)]
    w = (hi - lo) / bins
    return [lo + w * i for i in range(bins + 1)]


def hist_bin(col, lo: float, hi: float, bins: int, log: bool = False):
    """Bin index expression for ``col`` over ``[lo, hi)``: 0 = underflow,
    1..bins = interior, bins+1 = overflow; NULL for NULL input.  Pure
    column math (codegen), shared by the leaf aggregate and any direct
    bucketing use."""
    _hist_edges(lo, hi, bins, log)  # validate
    x = F.col(col) if isinstance(col, str) else col
    xd = x.cast("double")
    if log:
        import math

        pos = F.log(xd / F.lit(float(lo))) / F.lit(math.log(hi / lo))
        raw = F.floor(pos * bins) + 1
    else:
        raw = F.floor((xd - F.lit(float(lo)))
                      / F.lit((hi - lo) / bins)) + 1
    return (
        F.when(xd.isNull(), F.lit(None).cast("long"))
        .when(xd < lo, F.lit(0))
        .when(xd >= hi, F.lit(bins + 1))
        .otherwise(F.least(F.greatest(raw, F.lit(1)), F.lit(bins)))
        .cast("long")
    )


def hist_measure(lo: float, hi: float, bins: int = 64, log: bool = False):
    """A decomposable histogram measure for
    :func:`~.rollup.time_rollup` / :func:`~.rollup.refresh_rollup`:
    returns the ``(leaf_fn, merge_fn)`` pair — leaf aggregates raw
    values into a ``bins+2``-long count array (underflow + interior +
    overflow), merge adds arrays element-wise.  Merging is EXACT (sums
    of longs), so a day-level histogram provably equals one built
    straight from raw data — the property approximate percentiles can
    never have.  Read quantiles out with :func:`hist_quantiles`.

    Cost: ``bins+2`` conditional-sum aggregates at the leaf — one
    map-side-combinable shuffle whose payload is one array per
    (group, bucket); keep ``bins`` ≤ a few hundred.
    """
    _hist_edges(lo, hi, bins, log)

    def leaf(col) -> "F.Column":
        b = hist_bin(col, lo, hi, bins, log)
        return F.array(*[
            F.sum(F.when(b == i, 1).otherwise(0)).cast("long")
            for i in range(bins + 2)
        ])

    def merge(name: str):
        c = F.col(name) if isinstance(name, str) else name
        return F.array(*[
            F.sum(F.element_at(c, i + 1)).cast("long")
            for i in range(bins + 2)
        ])

    return leaf, merge


def hist_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
    log: bool = False,
    out_col: str = "h",
) -> DataFrame:
    """Leaf histograms per group — same output as
    ``groupBy(keys).agg(hist_measure(...)[0](col))`` (bit-identical
    ``bins+2`` count arrays, all-NULL groups kept with all-zero
    histograms), built with the two-level plan: bin each row ONCE
    (:func:`hist_bin`, pure codegen), ``groupBy(keys, bin).count()``
    (one corpus shuffle, map-side combined), then assemble the array
    from the group×bin-sized count frame.

    Use THIS for leaf construction over raw data; keep the
    :func:`hist_measure` ``(leaf, merge)`` pair for merging and for
    contexts that need a single aggregate Column (streaming state,
    ``time_rollup`` custom measures).  Rationale, measured at sf0.1
    (600k rows, 120 bins): the measure leaf evaluates ``bins+2``
    conditional-sum aggregates per row — 4-7 s; this plan is 0.9-1.1 s
    cold for identical output, and the gap widens with ``bins``.  At
    100 TB the difference is the whole job: per-row work here is one
    ``floor`` + one CASE regardless of ``bins``, and the shuffle
    payload is (group, bin, count) partials — map-side combine caps
    them at groups×(bins+2) rows per task, strictly smaller than the
    measure leaf's array-per-group payload for any corpus that
    matters.
    """
    if not group_cols:
        raise ValueError("hist_table: need at least one group column")
    b = hist_bin(value_col, lo, hi, bins, log)
    counts = (
        df.groupBy(*group_cols, b.alias("__b"))
        .agg(F.count("*").alias("__c"))
    )
    # One-pass assembly over the group×bin-sized count frame.  NULL-__b
    # rows (all-NULL-valued groups) must stay on the roster but carry no
    # map entry: collect_list drops the NULL the un-otherwise'd when()
    # produces for them, so they assemble to an empty map ⇒ all-zero
    # array.  A roster-join alternative is NOT null-safe on nullable
    # group keys (NULL key never matches itself in a USING join) and
    # silently zeroed such groups' real counts.
    assembled = counts.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.collect_list(
                F.when(F.col("__b").isNotNull(), F.struct("__b", "__c"))
            )
        ).alias("__m")
    ).select(
        *group_cols,
        F.transform(
            F.sequence(F.lit(0), F.lit(bins + 1)),
            lambda i: F.coalesce(
                F.element_at("__m", i.cast("long")), F.lit(0).cast("long")
            ),
        ).alias(out_col),
    )
    return assembled


def hist_quantiles(
    df: DataFrame,
    hist_col: str,
    qs: list[float],
    lo: float,
    hi: float,
    bins: int | None = None,
    log: bool = False,
    prefix: str = "p",
) -> DataFrame:
    """Quantile estimates from a histogram column — one output column
    per q (``p50``, ``p95``, …), linear interpolation within the bin,
    error ≤ one bin width by construction.

    All zero-shuffle array expressions on the group-count-sized
    histogram table: cumulative counts via slice-aggregate (O(bins²)
    expression work per row — bins are small by contract), bin lookup
    via ``filter``/``size`` on the cumulative array, edges as literal
    arrays.  Underflow/overflow mass clamps to ``lo``/``hi`` (the
    sketch cannot see beyond its range — pick the range from a
    profiling pass, ``maintenance.profile_table``).
    """
    n = bins if bins is not None else (
        None  # resolved below from the array size contract
    )
    if n is None:
        raise ValueError("hist_quantiles: pass bins explicitly")
    edges = _hist_edges(lo, hi, n, log)
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"hist_quantiles: q must be in [0,1], got {q}")
    h = F.col(hist_col)
    total = F.aggregate(h, F.lit(0).cast("long"), lambda a, x: a + x)
    # cumulative counts: cum[i] = sum(h[1..i]) (1-based slice semantics)
    cum = F.transform(
        F.sequence(F.lit(1), F.size(h)),
        lambda i: F.aggregate(
            F.slice(h, F.lit(1), i), F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    # literal edge arrays for the interior bins: bin b (1-based among
    # the bins+2 histogram slots) spans [edge_lo[b], edge_lo[b] + w[b])
    edge_lo = F.array(*[F.lit(float(edges[max(0, i - 1)]))
                        for i in range(n + 2)])
    width = F.array(*[
        F.lit(float(edges[i] - edges[i - 1]) if 1 <= i <= n else 0.0)
        for i in range(n + 2)
    ])
    out = df
    for q in qs:
        target = F.lit(float(q)) * total.cast("double")
        # first 0-based slot whose cumulative count reaches the target
        idx = F.size(F.filter(cum, lambda c: c.cast("double") < target))
        idx = F.least(idx, F.lit(n + 1))
        prev_cum = F.when(idx == 0, F.lit(0).cast("long")).otherwise(
            F.element_at(cum, idx)
        )
        in_bin = F.element_at(h, idx + 1).cast("double")
        frac = F.when(
            in_bin > 0, (target - prev_cum.cast("double")) / in_bin
        ).otherwise(F.lit(0.0))
        est = (
            F.element_at(edge_lo, idx + 1)
            + frac * F.element_at(width, idx + 1)
        )
        est = F.when(total == 0, F.lit(None).cast("double")).otherwise(
            F.least(F.greatest(est, F.lit(float(lo))), F.lit(float(hi)))
        )
        name = f"{prefix}{int(q * 100) if (q * 100) == int(q * 100) else q}"
        out = out.withColumn(name, F.round(est, 6))
    return out


# ---------------------------------------------------------------------------
# Approximate query processing: sampled aggregates WITH error bars
# ---------------------------------------------------------------------------


def approx_agg(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str | None]],
    fraction: float,
    seed: int = 42,
    sigmas: float = 4.0,
) -> DataFrame:
    """Sampled group aggregates with principled confidence intervals —
    the AQP answer for dashboard-class queries over 100 TB: scan the
    ``fraction`` Bernoulli sample (one pass, no shuffle beyond the
    group agg), scale up with the Horvitz-Thompson estimator, and emit
    a ``±sigmas`` CLT interval per measure so the consumer KNOWS the
    error instead of guessing it.

    ``measures``: output name → ("sum"|"count", source col).  For each
    measure the output carries ``<name>`` (the estimate), ``<name>_lo``
    and ``<name>_hi``.  Under row-wise Bernoulli(f) sampling::

        est     = Σ_kept x / f                    (unbiased)
        Var(est)= Σ_all x² (1-f)/f  ≈  Σ_kept x² (1-f)/f²

    (count is sum with x=1).  The interval is ``est ± sigmas·√Var``.

    Accuracy scales with the group's sampled mass, not the corpus: a
    group with ~10⁴ sampled rows has ~1% relative error on count at 4σ.
    Rare groups (few sampled rows) get honest WIDE intervals — and may
    be missed entirely when no row survives the sample; AQP is for
    dominant-mass questions, not needle lookups.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"approx_agg: fraction must be in (0, 1], got {fraction}")
    for name, (kind, _col) in measures.items():
        if kind not in ("sum", "count"):
            raise ValueError(
                f"approx_agg: measure {name!r} must be sum|count, got {kind!r}"
            )
        if kind == "sum" and _col is None:
            raise ValueError(f"approx_agg: sum measure {name!r} needs a column")
    s = df.sample(fraction=fraction, seed=seed)
    aggs = []
    for name, (kind, col) in measures.items():
        x = F.lit(1.0) if kind == "count" else F.col(col).cast("double")
        aggs.append(F.sum(x).alias(f"__s_{name}"))
        aggs.append(F.sum(x * x).alias(f"__q_{name}"))
    g = s.groupBy(*keys).agg(*aggs)
    out_cols = [F.col(k) for k in keys]
    inv = 1.0 / fraction
    var_scale = (1.0 - fraction) / (fraction * fraction)
    for name in measures:
        est = F.coalesce(F.col(f"__s_{name}"), F.lit(0.0)) * F.lit(inv)
        se = F.sqrt(
            F.coalesce(F.col(f"__q_{name}"), F.lit(0.0)) * F.lit(var_scale)
        )
        out_cols.append(F.round(est, 6).alias(name))
        out_cols.append(F.round(est - F.lit(sigmas) * se, 6).alias(f"{name}_lo"))
        out_cols.append(F.round(est + F.lit(sigmas) * se, 6).alias(f"{name}_hi"))
    return g.select(*out_cols)


def grouped_percentiles_scalable(
    df: DataFrame,
    keys: list[str],
    col: str,
    probabilities: list[float],
    coarse_bins: int = 4096,
    out_col: str = "percentiles",
) -> DataFrame:
    """EXACT interpolated per-group percentiles with a plan that
    survives the few-groups × many-rows shape.

    Spark's ``percentile`` aggregate buffers every value of a group in
    its reducer — with 3 groups and 10⁸ rows that is 3 tasks holding
    3×10⁷ values each (the measured 27× x50 blow-up on
    ``quantile_bins``).  This plan never holds a group in one task:

    1. one agg: per-group ``n`` (non-null), ``min``, ``max``;
    2. one agg: counts per (group, coarse bin) — map-side combinable;
       a tiny per-group window over ≤ ``coarse_bins`` rows turns them
       into cumulative offsets, locating the BIN of every target rank
       ``floor/ceil(q·(n−1))``;
    3. rows are joined (broadcast) to their group's candidate-bin set —
       everything else is filtered out at the scan — and collapsed to
       (group, bin, value) counts, so duplicate-heavy bins cost their
       DISTINCT size; a per-(group, bin) window ranks the survivors and
       value-run arithmetic picks the exact rank values;
    4. thresholds interpolate Spark's ``percentile`` formula
       ``v[lo] + (q·(n−1) − lo)·(v[hi] − v[lo])`` — results are
       IDENTICAL (asserted in tests), only the plan differs.

    Degenerate groups (all-NULL) yield NULL percentiles; single-value
    groups short-circuit via min == max.  Output: ``keys…, out_col
    array<double>`` in ``probabilities`` order.
    """
    from pyspark.sql import Window

    if not probabilities:
        raise ValueError("grouped_percentiles_scalable: probabilities required")
    for q in probabilities:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"probability {q} outside [0, 1]")
    if coarse_bins < 2:
        raise ValueError("coarse_bins must be >= 2")

    def kjoin(a, b, cols, how="inner", hint=None):
        # empty key list (global percentiles) means the 1-row-per-"group"
        # frames attach via a documented 1-row broadcast crossJoin — an
        # empty `on` list would otherwise plan an unhinted cartesian
        right = hint(b) if hint is not None else b
        if cols:
            return a.join(right, cols, how)
        if how == "left":
            # crossJoin drops a's row when b is EMPTY (global all-NULL:
            # kvmap has no row) — a constant-key equi-join keeps the
            # left row so the NULL-percentiles contract holds for
            # keys=[] too
            return (
                a.withColumn("__k1", F.lit(1))
                .join(F.broadcast(b.withColumn("__k1", F.lit(1))),
                      ["__k1"], "left")
                .drop("__k1")
            )
        return a.crossJoin(F.broadcast(b))

    x = F.col(col).cast("double")
    nn = df.filter(x.isNotNull()).select(*keys, x.alias("__x"))
    # stats over ALL rows (count/min/max ignore NULLs) so all-NULL groups
    # keep a __n=0 row and surface as NULL percentiles instead of vanishing
    stats = df.groupBy(*keys).agg(
        F.count(x).alias("__n"),
        F.min(x).alias("__mn"),
        F.max(x).alias("__mx"),
    )
    B = coarse_bins
    # bin index 0..B-1; the max value folds into the last bin
    span = F.col("__mx") - F.col("__mn")
    binned = kjoin(nn, stats, keys, hint=F.broadcast).withColumn(
        "__b",
        F.when(span == 0, F.lit(0)).otherwise(
            F.least(
                F.floor((F.col("__x") - F.col("__mn")) / span * B),
                F.lit(B - 1),
            )
        ).cast("long"),
    )
    coarse = binned.groupBy(*keys, "__b").agg(F.count("*").alias("__c"))
    wb = Window.partitionBy(*keys).orderBy("__b")
    coarse = coarse.withColumn(
        "__below",
        F.coalesce(
            F.sum("__c").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    # target 0-based ranks per group: floor and ceil of q*(n-1)
    # (__n=0 groups would produce negative ranks — they get NULL output)
    ranks = stats.filter(F.col("__n") > 0).select(
        *keys,
        "__n",
        F.explode(
            F.array_distinct(
                F.array(*[
                    r
                    for q in probabilities
                    for r in (
                        F.floor(F.lit(q) * (F.col("__n") - 1)),
                        -F.floor(-F.lit(q) * (F.col("__n") - 1)),  # ceil
                    )
                ])
            )
        ).alias("__k"),
    )
    # locate each rank's bin: the coarse row with below <= k < below+c
    located = kjoin(ranks, coarse, keys).filter(
        (F.col("__below") <= F.col("__k"))
        & (F.col("__k") < F.col("__below") + F.col("__c"))
    ).select(*keys, "__k", "__b", "__below")
    need_bins = located.select(*keys, "__b").distinct()
    # collapse candidate rows to (group, bin, value) counts — duplicate
    # mass costs its distinct size, and the window below sorts ONLY the
    # candidate bins' distinct values
    cand = (
        binned.join(F.broadcast(need_bins), [*keys, "__b"])
        .groupBy(*keys, "__b", "__x")
        .agg(F.count("*").alias("__vc"))
    )
    wv = Window.partitionBy(*keys, "__b").orderBy("__x")
    cand = cand.withColumn(
        "__voff",
        F.coalesce(
            F.sum("__vc").over(wv.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    # rank k (within-bin rank k - below) lands on the value run covering it
    kv = located.join(cand, [*keys, "__b"]).filter(
        (F.col("__voff") <= F.col("__k") - F.col("__below"))
        & (F.col("__k") - F.col("__below") < F.col("__voff") + F.col("__vc"))
    ).select(*keys, "__k", F.col("__x").alias("__v"))
    kvmap = kv.groupBy(*keys).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("__k", "__v")))
        ).alias("__kv")
    )
    out = kjoin(stats, kvmap, keys, "left")
    exprs = []
    for q in probabilities:
        pos = F.lit(q) * (F.col("__n") - 1)
        lo = F.floor(pos)
        hi = -F.floor(-pos)
        vlo = F.element_at("__kv", lo)
        vhi = F.element_at("__kv", hi)
        exprs.append(vlo + (pos - lo) * (vhi - vlo))
    return out.select(
        *keys,
        F.when(F.col("__n") > 0, F.array(*exprs)).alias(out_col),
    )
