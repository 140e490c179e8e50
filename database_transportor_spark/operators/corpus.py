"""Corpus-level operators for LLM training-data pipelines.

These run AFTER per-document analysis (text.py) and near-dup detection
(dedup.py): benchmark decontamination, train/val/test splitting (row-level
and leakage-safe cluster-level), deterministic stratified sampling, sequence
packing, and PII redaction.  All are DataFrame-native — no Python in the hot
path — and each documents its 100 TB shape.

Determinism contract: every operator here must assign the same output to the
same row regardless of cluster size, partitioning, or run count — splits and
samples feed downstream training jobs and must be reproducible.  Two hash
families are offered:

- ``xxhash64`` (default): Spark's 64-bit xxHash — the production choice.
- ``multiplicative``: Knuth multiplicative hashing ``(id * 2654435761 + salt)
  mod 2^32`` — weaker mixing, but expressible in ANSI SQL, so the DuckDB
  oracle can verify the assignment bit-for-bit.  Only defined for integral
  ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import ngram_shingle_hashes

__all__ = [
    "normalize_urls",
    "corpus_report",
    "bucket_column",
    "decontaminate",
    "split_assign",
    "leakage_safe_split",
    "stratified_sample",
    "pack_sequences",
    "redact_pii",
    "corpus_shuffle",
    "upsample_domains",
    "temperature_weights",
    "source_divergence",
    "sample_to_token_budget",
    "zscore_filter",
    "mad_filter",
    "rank_normalize",
    "weighted_sample",
    "sample_per_group",
    "winsorize",
    "quantile_bins",
    "detect_pii",
    "PII_PATTERNS",
    "quantile_bin",
    "corpus_diff",
    "export_shards",
    "verify_export",
]

KNUTH = 2654435761  # 2^32 * golden ratio conjugate; classic multiplicative mix
M32 = 4294967296


def bucket_column(
    id_col: Column | str,
    n_buckets: int,
    salt: int = 0,
    hash_fn: str = "xxhash64",
) -> Column:
    """Deterministic bucket in ``[0, n_buckets)`` for an id column.

    ``xxhash64``: production default.  ``multiplicative``: ANSI-SQL-portable
    (integral ids only) so external engines can reproduce the assignment.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(c, F.lit(salt)), F.lit(n_buckets))
    if hash_fn == "multiplicative":
        return F.pmod(
            F.pmod(c.cast("long") * F.lit(KNUTH) + F.lit(salt), F.lit(M32)),
            F.lit(n_buckets),
        )
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing word
    ``n``-grams with an evaluation/benchmark set.

    Returns ``(id_col, doc_ngrams, overlap_ngrams, contamination)`` for
    every document with ≥1 shingle, where ``contamination`` = fraction of
    the document's distinct n-grams that appear anywhere in the benchmark
    set; rows below ``threshold`` are dropped (default 0.0 keeps all).

    Scale shape: the benchmark side (eval sets — MMLU, GSM8K, held-out
    suites) is tiny next to a 100 TB corpus, so its distinct shingle-hash
    set is **broadcast**; the corpus side is one narrow explode + broadcast
    semi-join + one groupBy(id) — a single shuffle keyed by document id,
    no corpus self-join anywhere.  Shingles are ``xxhash64`` longs (8-byte
    compare, no string movement); see ``ngram_shingle_hashes``.
    """
    bcol = bench_text_col or text_col
    bench_set = (
        benchmark.select(F.explode(ngram_shingle_hashes(bcol, n)).alias("__h"))
        .distinct()
    )
    posting = df.select(
        F.col(id_col), F.explode(ngram_shingle_hashes(text_col, n)).alias("__h")
    )
    hit = F.when(F.col("__bh").isNotNull(), 1).otherwise(0)
    out = (
        posting.join(
            F.broadcast(bench_set.select(F.col("__h").alias("__bh"))),
            posting["__h"] == F.col("__bh"),
            "left",
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("doc_ngrams"),
            F.sum(hit).alias("overlap_ngrams"),
        )
        .withColumn(
            "contamination", F.col("overlap_ngrams") / F.col("doc_ngrams")
        )
    )
    if threshold > 0.0:
        out = out.filter(F.col("contamination") >= threshold)
    return out


def split_assign(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: int = 0,
    hash_fn: str = "xxhash64",
    out_col: str = "split",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test assignment: hash the id into
    ``n_buckets`` and cut by cumulative weight.  Pure projection — zero
    shuffles, stable under any partitioning or cluster size, so the same
    document always lands in the same split across reruns and backfills.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive, got {weights!r}")
    total = sum(weights.values())
    bucket = bucket_column(id_col, n_buckets, salt, hash_fn)
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = bucket < int(round(acc * n_buckets))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    weights: dict[str, float] | None = None,
    salt: int = 0,
    hash_fn: str = "xxhash64",
    out_col: str = "split",
) -> DataFrame:
    """Split assignment keyed by near-duplicate **cluster**, not document:
    every member of a cluster gets the same split, so near-dups of a test
    document can never leak into train.  ``clusters`` is the output of
    :func:`dedup.dedup_clusters` (``id_col``, ``cluster_col``).

    Shape: one equi-join corpus⋈clusters on the id (both sides already
    keyed by document id; with the cluster map orders of magnitude smaller
    than the corpus it broadcasts), then the same zero-shuffle hash-cut as
    :func:`split_assign` applied to the cluster id.
    """
    labeled = df.join(clusters.select(id_col, cluster_col), id_col, "left")
    # Documents missing from the cluster map are their own singleton cluster.
    labeled = labeled.withColumn(
        cluster_col, F.coalesce(F.col(cluster_col), F.col(id_col))
    )
    return split_assign(
        labeled, cluster_col, weights, salt, hash_fn, out_col
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str,
    salt: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic ``k``-per-stratum sample: rank rows inside each stratum
    by a hash of their id and keep the ``k`` smallest.  Unlike
    ``df.sampleBy`` this is exactly-k, reproducible, and independent of
    partitioning.

    Shape: one shuffle (window partitioned by the strata).  At 100 TB
    prefer strata that are genuinely coarse (source, language); the window
    sorts each stratum — for huge strata swap in a per-partition top-k +
    merge (``RDD.takeOrdered`` shape) — but a hash-ranked window is exact
    and deterministic, which sampling for eval sets usually requires.
    """
    rank_key = bucket_column(id_col, M32, salt, hash_fn)
    w = Window.partitionBy(*strata_cols).orderBy(rank_key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    group_cols: list[str] | None = None,
    out_col: str = "pack_id",
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences
    ("packs") by contiguous fill: documents are laid on a tape in ``id``
    order (per group) and a document belongs to the pack where it *starts*
    — ``pack = floor(start_offset / budget)``.  This is the
    concatenate-then-chunk packing standard pretraining pipelines use
    (docs straddling a boundary belong to their starting chunk).

    Returns the input plus ``pack_id`` (globally unique when grouped:
    ``group ## pack_index``) and ``pack_offset`` (the document's start
    offset within its group's tape).

    Shape: one window cumulative-sum per group.  Packing is
    embarrassingly parallel across groups — at 100 TB the group should be
    a shard key (e.g. ``pmod(xxhash64(id), n_shards)`` or source+date), so
    each window partition is one shard and no global sort exists.  A
    cumulative sum over ``rows unbounded preceding`` is a streaming pass
    per partition, not a sort-the-world.
    """
    groups = group_cols or []
    w = (
        Window.partitionBy(*groups)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(tokens_col)).over(w) - F.col(tokens_col)).alias("pack_offset")
    out = df.withColumn("pack_offset", start)
    pack_idx = F.floor(F.col("pack_offset") / F.lit(budget))
    if groups:
        pack = F.concat_ws(
            "#", *[F.col(g).cast("string") for g in groups], pack_idx.cast("string")
        )
    else:
        pack = pack_idx.cast("string")
    return out.withColumn(out_col, pack)


# Patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB/Go scrubbers): no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+\d[\d()\- ]{7,}\d",
}


def redact_pii(
    df: DataFrame,
    text_col: str,
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
    count_cols: bool = True,
) -> DataFrame:
    """Redact PII spans from a text column, replacing each match with
    ``<PATTERN_NAME>`` and (optionally) counting matches per pattern.

    Pure projection — regexp_replace chains inside whole-stage codegen,
    zero shuffles, linear in corpus size.  Patterns are applied in dict
    order; counts are computed on the ORIGINAL text so later patterns
    can't eat earlier matches' counts.
    """
    pats = patterns or PII_PATTERNS
    out = out_col or text_col
    result = df
    if count_cols:
        for name, pat in pats.items():
            result = result.withColumn(
                f"n_{name}",
                F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))),
            )
    red = F.col(text_col)
    for name, pat in pats.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return result.withColumn(out, red)


def corpus_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    layout_partitions: int | None = None,
) -> DataFrame:
    """Deterministic seeded global shuffle for training order: every row
    gets a ``shard`` in ``[0, n_shards)`` and a ``shuffle_pos`` (its read
    position within the shard).  Reading shards ``0..n-1`` sequentially,
    each in ``shuffle_pos`` order, visits the corpus in a fixed
    pseudo-random permutation of ``hash(id, seed)`` — change ``seed`` to
    get an independent epoch order.

    Scale shape: there is NO global sort.  ``shard`` is a hash bucket and
    ``shuffle_pos`` is a window per shard — ``n_shards`` independent
    sorts that run in parallel and bound each sort at ``|corpus| /
    n_shards`` rows.  At 100 TB pick ``n_shards`` so a shard fits a
    training reader's input budget (thousands of shards).  Determinism
    contract as module docstring: identical output for any partitioning
    or cluster size.

    ``layout_partitions``: when a physical one-file-per-shard write
    follows (:func:`export_shards`), pass the shard count here — the
    frame is RANGE-repartitioned on ``shard`` into that many partitions
    BEFORE the window, which (a) satisfies the window's clustering
    requirement, so the whole op costs exactly ONE exchange of the
    corpus, and (b) places each shard WHOLLY in one task with at most
    ⌈n_shards/partitions⌉ shards per task — range partitioning keeps
    equal keys together and, unlike ``repartition(n, col)``'s
    murmur3-mod placement, cannot collide many shard values into one
    task while leaving others empty.  Default ``None`` keeps the plain
    window exchange (analytical callers that never write the layout).
    """
    key = bucket_column(id_col, M32, seed, hash_fn)
    w = Window.partitionBy("shard").orderBy(
        F.col("__skey").asc(), F.col(id_col).asc()
    )
    keyed = (
        df.withColumn("__skey", key)
        .withColumn("shard", F.pmod(F.col("__skey"), F.lit(n_shards)))
    )
    if layout_partitions is not None:
        keyed = keyed.repartitionByRange(layout_partitions, "shard")
    return (
        keyed.withColumn("shuffle_pos", F.row_number().over(w))
        .drop("__skey")
    )


def upsample_domains(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    id_col: str,
    salt: int = 0,
    hash_fn: str = "xxhash64",
    default_weight: float = 1.0,
) -> DataFrame:
    """Domain-mix rebalancing by deterministic repetition: a domain with
    weight ``w`` keeps ``floor(w)`` full copies of every row plus one
    extra copy for the deterministic ``frac(w)`` fraction of ids (chosen
    by id-hash, so the same rows are upsampled on every run).  ``w = 0``
    drops the domain; ``w = 3.5`` repeats half the rows 4x and half 3x —
    the "repeat low-resource sources N.5 times" knob every pretraining
    mix uses.

    Output: input rows times their copy count, with ``copy_idx`` (0-based)
    distinguishing repeats — downstream shuffling (``corpus_shuffle`` on
    ``(id, copy_idx)``) spreads copies across the epoch.

    Scale shape: zero shuffles — a literal CASE on the domain column, a
    hash compare, and one ``explode(sequence(...))``; output size is
    exactly ``sum_domain(w_d * |domain_d|)`` rows.  The weight table is a
    plan literal (not a join): domain counts are small by definition.
    """
    c = F.col(domain_col)
    wcol = F.lit(float(default_weight))
    for dom, wt in weights.items():
        wcol = F.when(c == dom, F.lit(float(wt))).otherwise(wcol)
    base = F.floor(wcol).cast("int")
    frac = wcol - F.floor(wcol)
    # the extra-copy draw reuses bucket_column's uniform [0, M32) hash;
    # strict < keeps frac=0 exact (no row ever drawn) on both engines
    draw = bucket_column(id_col, M32, salt, hash_fn)
    copies = base + F.when(draw < (frac * F.lit(float(M32))), 1).otherwise(0)
    return (
        df.withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(0), F.col("__copies") - 1))
        )
        .drop("__copies")
    )


def sample_to_token_budget(
    df: DataFrame,
    domain_col: str,
    tokens_col: str,
    budgets: dict[str, int],
    id_col: str,
    salt: int = 0,
    hash_fn: str = "xxhash64",
    precision: int = 1_000_000,
) -> DataFrame:
    """Downsample each domain to an expected total-token budget — the
    "give me 500B tokens of web, 50B of code" knob a pretraining mix
    needs when domains are capped by BUDGET rather than by weight
    (:func:`upsample_domains` rebalances by ratio; this one hits absolute
    token targets).

    Per domain ``d``: keep rate ``r_d = min(1, budget_d / total_tokens_d)``
    and keep a row iff ``hash(id) % precision < r_d * precision`` — so the
    kept set is deterministic, reproducible across runs and engines
    (``hash_fn="multiplicative"`` for ANSI-SQL portability), and a SUBSET
    relation holds as budgets shrink (the same hash order decides, so a
    smaller budget keeps a subset of a larger one — stable ablations).
    Domains without a budget pass through whole.

    Expected kept tokens per domain = ``r_d * total_d`` ≈ the budget
    (exact in expectation; variance shrinks with corpus size — at 100 TB
    the relative error is negligible, and the alternative exact cut would
    need a global sort).  Rows with a NULL domain never match a rate (SQL
    join semantics) and pass through whole, like unbudgeted domains.

    Shape: one tiny per-domain aggregation (map-side combined) joined back
    by BROADCAST, then a zero-shuffle hash filter.  The corpus is scanned
    twice (totals + filter) but never shuffled; at 100 TB feed ``totals``
    from table statistics or a rollup if the extra scan matters.
    """
    totals = df.groupBy(domain_col).agg(
        F.sum(F.col(tokens_col)).alias("__total")
    )
    if budgets:
        bcol = F.create_map(
            *[F.lit(x) for kv in budgets.items() for x in kv]
        )[F.col(domain_col)].cast("double")
    else:
        bcol = F.lit(None).cast("double")
    rates = totals.select(
        F.col(domain_col),
        F.when(
            bcol.isNull(), F.lit(1.0)  # unbudgeted domain: keep all
        ).otherwise(
            F.least(F.lit(1.0), bcol / F.col("__total").cast("double"))
        ).alias("__rate"),
    )
    draw = bucket_column(id_col, precision, salt, hash_fn)
    return (
        df.join(F.broadcast(rates), domain_col, "left")
        .filter(draw < F.coalesce(F.col("__rate"), F.lit(1.0)) * F.lit(float(precision)))
        .drop("__rate")
        .select(*df.columns)
    )


def zscore_filter(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    max_z: float = 3.0,
    out_col: str | None = None,
) -> DataFrame:
    """Distribution-based quality gate: drop rows whose ``value_col``
    deviates more than ``max_z`` population standard deviations from its
    group's mean (corpus-wide when ``group_cols`` is None) — the standard
    "drop perplexity/length outliers per source" filter.  NULL values,
    zero-variance groups, and rows whose group key is NULL (a NULL key
    never equi-joins its own group's stats — SQL join semantics) all
    pass: nothing to judge.  ``out_col`` keeps the computed z-score as a
    column instead of just filtering.

    Shape: one tiny per-group aggregate (mean + population stddev,
    map-side combined) broadcast back, then a zero-shuffle filter — the
    corpus is scanned twice but never shuffled.
    """
    gcols = list(group_cols or [])
    v = F.col(value_col).cast("double")
    stats = (
        df.groupBy(*gcols) if gcols else df.groupBy()
    ).agg(
        F.avg(v).alias("__mu"),
        F.stddev_pop(v).alias("__sd"),
    )
    joined = (
        df.join(F.broadcast(stats), gcols, "left")
        if gcols
        else df.crossJoin(F.broadcast(stats))
    )
    z = F.when(
        F.col("__sd").isNull() | (F.col("__sd") == 0) | v.isNull(), F.lit(None)
    ).otherwise(F.abs(v - F.col("__mu")) / F.col("__sd"))
    out = joined.filter(z.isNull() | (z <= F.lit(float(max_z))))
    if out_col is not None:
        return out.withColumn(out_col, z).select(*df.columns, out_col)
    return out.select(*df.columns)


def mad_filter(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    max_dev: float = 3.0,
    out_col: str | None = None,
) -> DataFrame:
    """Robust (median/MAD) outlier gate — :func:`zscore_filter`'s
    heavy-tail-safe sibling.  Mean/stddev are themselves dragged by the
    outliers they are supposed to catch; the median and the median
    absolute deviation are not, which is why robust gates are preferred
    for length/perplexity distributions with a long tail.

    Keeps rows where ``|x − median| / (1.4826·MAD) ≤ max_dev`` (1.4826
    scales MAD to σ under normality).  NULL values, zero-MAD groups
    (over half the group identical), and NULL group keys all pass —
    nothing to judge.  ``out_col`` keeps the robust deviation score.

    Shape: two tiny per-group aggregates (exact ``percentile`` — the
    median needs the group's sorted values, but the *output* is
    group-count sized) broadcast back, then a zero-shuffle filter.  The
    corpus is scanned three times and shuffled never; at 100 TB swap
    ``percentile`` for ``approx_percentile`` if the per-group sort of
    values inside the aggregate becomes the bottleneck (the gate's
    semantics tolerate an approximate center).
    """
    gcols = list(group_cols or [])
    v = F.col(value_col).cast("double")

    def _grp(frame: DataFrame):
        return frame.groupBy(*gcols) if gcols else frame.groupBy()

    def _join(frame: DataFrame, stats: DataFrame) -> DataFrame:
        return (
            frame.join(F.broadcast(stats), gcols, "left")
            if gcols
            else frame.crossJoin(F.broadcast(stats))
        )

    med = _grp(df).agg(F.percentile(v, F.lit(0.5)).alias("__med"))
    with_med = _join(df, med)
    mad = _grp(with_med).agg(
        F.percentile(F.abs(v - F.col("__med")), F.lit(0.5)).alias("__mad")
    )
    joined = _join(with_med, mad)
    dev = F.when(
        F.col("__mad").isNull() | (F.col("__mad") == 0) | v.isNull(),
        F.lit(None),
    ).otherwise(F.abs(v - F.col("__med")) / (F.lit(1.4826) * F.col("__mad")))
    out = joined.filter(dev.isNull() | (dev <= F.lit(float(max_dev))))
    if out_col is not None:
        return out.withColumn(out_col, dev).select(*df.columns, out_col)
    return out.select(*df.columns)


def rank_normalize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Percentile-rank normalization: map ``value_col`` onto [0, 1] by its
    rank within each group — ``(rank − 1) / (n − 1)`` (``percent_rank``).
    The mixture-curation primitive: raw quality scores from different
    sources/scorers aren't comparable, their ranks are; a corpus-wide
    "keep the top 30% per source" cut is a filter on this column.

    Ties share a rank (and thus a normalized value) — no tiebreak
    needed, output is fully deterministic.  Single-row groups map to
    0.0.  The arithmetic is exact-integer division: identical across
    engines, no rounding required.  NULL scores keep a NULL rank and do
    NOT occupy rank positions ("nothing to judge", matching the
    zscore/mad gates) — a blind window would rank them below every real
    score and a top-N% cut would silently misjudge unscored rows.

    Shape: ONE shuffle (window partitioned by the group), the same cost
    as any per-group sort.  Groups should be coarse (source, language);
    for corpus-wide normalization over 100 TB prefer grouping by a
    bucketed key + merging rank offsets, or an approx-quantile cut.
    """
    gcols = list(group_cols or [])
    w = Window.partitionBy(*gcols).orderBy(F.col(value_col).asc())
    v = F.col(value_col)
    scored = df.filter(v.isNotNull()).withColumn(
        out_col, F.percent_rank().over(w)
    )
    unscored = df.filter(v.isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    return scored.unionByName(unscored)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    prob: Column,
    salt: int = 0,
    hash_fn: str = "xxhash64",
    n_buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-row Bernoulli sampling with a *row-dependent*
    keep probability — the importance-sampling primitive for training
    mixes (keep high-quality docs with p≈1, down-weight boilerplate with
    p≈0.1, …).  ``prob`` is any Column expression in [0,1]; values are
    clamped.

    Unlike ``DataFrame.sample`` this is a pure deterministic projection:
    the same id keeps the same fate across reruns, backfills, cluster
    sizes and partitionings (``sample`` draws per-partition RNG streams,
    so output changes whenever partitioning does).  Zero shuffle; the
    filter sits directly above the scan, so column pruning and partition
    pruning still apply.
    """
    p = F.least(F.greatest(prob.cast("double"), F.lit(0.0)), F.lit(1.0))
    u = bucket_column(id_col, n_buckets, salt, hash_fn).cast("double") / F.lit(
        float(n_buckets)
    )
    return df.filter(u < p)


def sample_per_group(
    df: DataFrame,
    id_col: str,
    group_cols: list[str],
    k: int,
    salt: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exact ``k`` rows per group, chosen deterministically by hash
    order of the id (a reservoir-sample replacement that is stable
    across reruns, partitionings, and cluster sizes — per-partition RNG
    reservoirs are not).  Groups smaller than ``k`` keep all rows.

    Scale shape: one window shuffle keyed on the group; the sort key is
    the 8-byte hash, so the shuffle payload is the input rows once —
    no pre-aggregation pass, no collect.  With ``hash_fn=
    "multiplicative"`` the selection is ANSI-SQL-reproducible by
    external engines.
    """
    from pyspark.sql import Window

    u = bucket_column(id_col, 2**31, salt, hash_fn)
    w = Window.partitionBy(*group_cols).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorization: clip ``value_col`` to its exact per-group
    [``p_lo``, ``p_hi``] percentile band — the standard tail-taming
    step before z-scoring or regression-weighting features whose
    outliers are data errors rather than signal.

    Scale shape: the percentile bounds are ONE sort-based aggregate
    producing one row per group (map-side partial; group count rows
    total), broadcast-joined back; the clip itself is a narrow
    projection.  The measured column shuffles once for the percentile
    sort, the table itself never shuffles.

    Row-preserving by contract: the bounds join is a LEFT join, so rows
    whose group key is NULL (which a plain equi-join would drop) pass
    through unclipped, and a NULL value stays NULL — it is never
    fabricated into the lower bound (matching the zscore/mad gates'
    NULL-passes convention).
    """
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError(f"winsorize: need 0 <= p_lo < p_hi <= 1, got {p_lo}, {p_hi}")
    out_col = out_col or f"{value_col}_wins"
    gcols = list(group_cols or [])
    bounds = df.groupBy(*gcols).agg(
        F.percentile(value_col, F.lit(p_lo)).alias("__lo"),
        F.percentile(value_col, F.lit(p_hi)).alias("__hi"),
    )
    joined = (
        df.join(F.broadcast(bounds), gcols, "left")
        if gcols
        else df.crossJoin(F.broadcast(bounds))
    )
    v = F.col(value_col)
    clipped = F.least(F.greatest(v.cast("double"), F.col("__lo")), F.col("__hi"))
    guarded = F.when(v.isNull(), F.lit(None).cast("double")).otherwise(clipped)
    return joined.withColumn(out_col, guarded).drop("__lo", "__hi")


def detect_pii(
    df: DataFrame,
    columns: list[str] | None = None,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """PII exposure profile: for every (string column, pattern) pair, the
    count and rate of rows containing a match — the audit that decides
    WHERE :func:`redact_pii` must run before a corpus or migrated table
    is shared.  Returns ``(column, pattern, n_rows, n_hits, hit_rate)``;
    zero-hit pairs are included (the clean report is the contract).

    Scale shape: ALL (column, pattern) flags fold into ONE conditional
    aggregation over a single scan — never a scan per column or per
    pattern; the regexes run inside whole-stage codegen.
    """
    pats = patterns or PII_PATTERNS
    string_cols = [
        c for c, t in df.dtypes if t == "string"
        and (columns is None or c in columns)
    ]
    if columns:
        missing = [c for c in columns if c not in string_cols]
        if missing:
            raise ValueError(
                f"detect_pii: not string columns (or absent): {missing}"
            )
    if not string_cols or not pats:
        raise ValueError("detect_pii: need >=1 string column and pattern")
    aggs = [F.count("*").cast("long").alias("__n")]
    meta = []
    for i, c in enumerate(string_cols):
        for j, (name, rx) in enumerate(sorted(pats.items())):
            hit = F.col(c).rlike(rx)
            aggs.append(
                F.sum(F.coalesce(hit, F.lit(False)).cast("long"))
                .cast("long")
                .alias(f"__h{i}_{j}")
            )
            meta.append((c, name, f"__h{i}_{j}"))
    one = df.agg(*aggs)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.lit(p).alias("pattern"),
                        F.col("__n").alias("n_rows"),
                        F.col(h).alias("n_hits"),
                        F.round(F.col(h) / F.col("__n"), 6).alias("hit_rate"),
                    )
                    for c, p, h in meta
                ]
            )
        ).alias("r")
    ).select("r.*")


def temperature_weights(
    df: DataFrame,
    domain_col: str,
    temperature: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """Temperature-scaled domain mixing weights — the standard
    multilingual/multi-source rebalancing rule (mT5/XLM-R style):
    sampling share ``q_d ∝ p_d^(1/T)`` where ``p_d`` is the domain's
    natural share.  ``T = 1`` keeps natural proportions; ``T → ∞``
    approaches uniform; ``T < 1`` sharpens toward head domains.

    Returns one row per domain: ``(domain, n_docs, share, q, weight)``
    where ``q`` is the temperature-scaled sampling share and ``weight =
    q / share`` is the repetition factor to feed straight into
    :func:`upsample_domains` (weight > 1 = upsample, < 1 = subsample).

    Scale shape: ONE map-side-combined count aggregation over the corpus;
    everything after runs on the domain-count-sized frame (a window over
    at most |domains| rows).  Shares are exact-integer ratios; the only
    float op is the ``pow``, rounded for cross-engine stability.
    """
    if temperature <= 0:
        raise ValueError(f"temperature_weights: temperature must be > 0, got {temperature}")
    from pyspark.sql import Window

    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs")
    )
    w = Window.partitionBy()
    total = F.sum("n_docs").over(w)
    raw = F.pow(F.col("n_docs") / total, F.lit(1.0 / temperature))
    out = counts.withColumn("share", F.col("n_docs") / total).withColumn(
        "__raw", raw
    )
    zsum = F.sum("__raw").over(w)
    return (
        out.withColumn("q", F.col("__raw") / zsum)
        .withColumn("weight", F.col("q") / F.col("share"))
        .select(
            "domain", "n_docs",
            F.round("share", round_digits).alias("share"),
            F.round("q", round_digits).alias("q"),
            F.round("weight", round_digits).alias("weight"),
        )
    )


def source_divergence(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Per-source KL divergence of each source's unigram distribution
    from the whole-corpus distribution — the corpus-curation outlier
    detector: a scraped domain whose language model diverges sharply
    from the rest (spam, boilerplate farms, wrong-language feeds) shows
    up as a high ``kl_divergence`` long before a human reads it.

    ``KL(q_s ‖ p) = Σ_t q_s(t)·ln(q_s(t)/p(t))`` with ``q_s`` the
    source's token distribution and ``p`` the corpus's.  Every source
    token is by construction in the corpus, so ``p(t) > 0`` and no
    smoothing is needed; all counts are exact integers and the only
    float math is the final ratio+log (rounded, libm-ulp safe).

    Scale shape: ONE corpus shuffle — ``groupBy(source, token)`` with
    map-side partial counts.  Everything downstream runs on that
    (source×vocab)-sized table: corpus token counts re-aggregate it by
    token, per-source totals by source, both broadcast-joined back.
    The raw token stream is never shuffled twice and never joined.
    """
    from .text import tokens

    st = (
        df.select(
            F.col(domain_col).alias("__src"),
            F.explode(tokens(text_col)).alias("__t"),
        )
        .filter(F.col("__t") != "")
        .groupBy("__src", "__t")
        .agg(F.count("*").alias("__cst"))
    )
    tok_tot = st.groupBy("__t").agg(F.sum("__cst").alias("__ct"))
    src_tot = st.groupBy("__src").agg(F.sum("__cst").alias("__ns"))
    grand = tok_tot.agg(F.sum("__ct").alias("__n"))
    q = F.col("__cst").cast("double") / F.col("__ns").cast("double")
    p = F.col("__ct").cast("double") / F.col("__n").cast("double")
    return (
        st.join(F.broadcast(tok_tot), "__t")
        .join(F.broadcast(src_tot), "__src")
        .crossJoin(F.broadcast(grand))
        .groupBy(F.col("__src").alias(domain_col))
        .agg(
            F.max("__ns").alias("n_tokens"),
            # each term is a deterministic double; round it to a fixed
            # grid and sum as DECIMAL so the total is independent of
            # accumulation order (float += order differs across engines
            # and partitionings), then round for presentation
            F.round(
                F.sum(
                    F.round(q * F.log(q / p), 12).cast("decimal(28,12)")
                ),
                round_digits,
            )
            .cast("double")
            .alias("kl_divergence"),
        )
    )


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    group_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
    out_col: str = "bin",
) -> DataFrame:
    """Equi-depth (quantile) discretization: assign every row a bin in
    ``[1, n_bins]`` so each bin holds ~1/n_bins of the rows — the
    feature-engineering companion to ``column_histogram``'s equi-WIDTH
    bins (quantile bins are robust to heavy tails; width bins are not).

    ``tiebreak_cols`` pins the order among equal values (pass the row id);
    without it, ties at a bin boundary land deterministically only if
    (value, tiebreaks) is unique — the same caveat as any rank-based cut.
    NULL values sort LAST explicitly (Spark defaults NULLS FIRST on ASC,
    most SQL engines default NULLS LAST — pinning it makes external
    recomputation bit-exact), so NULLs fill the top bins; filter first if
    they should be excluded.

    Scale shape: one window shuffle per group (ntile is rank-based — a
    single per-group sort, spillable); no stats collection, no second
    pass.  Groups must not be so skewed that one group is the dataset —
    for a global cut pass group_cols=None and accept one sort
    (equivalently: pre-shard and accept approximate bins).
    """
    if n_bins < 1:
        raise ValueError("quantile_bins: n_bins must be >= 1")
    gcols = list(group_cols or [])
    order = [F.col(value_col).asc_nulls_last()] + [
        F.col(c).asc_nulls_last() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*gcols).orderBy(*order)
    return df.withColumn(out_col, F.ntile(n_bins).over(w))


def normalize_urls(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "url_norm",
    host_col: str | None = "url_host",
    domain_col: str | None = "url_domain",
    tracking_params: tuple[str, ...] = (
        "utm_[^&#=]*", "gclid", "fbclid", "ref", "mc_eid",
    ),
) -> DataFrame:
    """Canonicalize URLs for web-corpus dedup: lowercase scheme+authority,
    strip the fragment, default :80/:443 ports, a leading ``www.``,
    tracking query params (utm_* / gclid / fbclid / ref / mc_eid by
    default), and trailing slashes; optionally extract the host and a
    registrable-domain heuristic (last two labels).  Two crawls of the
    same page then collapse under exact dedup on ``out_col`` — the first
    line of web-scale dedup, far cheaper than any fuzzy pass.

    Scale shape: a chain of built-in ``regexp_replace``/``regexp_extract``
    column expressions — JVM-side, whole-stage-codegen, ZERO shuffles; no
    lookarounds, so the same patterns run on RE2 engines (oracle parity).
    """
    u = F.trim(F.col(url_col))
    # fragment never reaches the server — drop first
    u = F.regexp_replace(u, "#.*", "")
    # scheme + authority are case-insensitive; path/query are NOT
    auth = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    u = F.when(auth == "", u).otherwise(
        F.concat(F.lower(auth), F.substr(u, F.length(auth) + F.lit(1)))
    )
    # default ports and www. (capture groups, no lookarounds)
    u = F.regexp_replace(u, r"^(http://[^/:?#]*):80([/?].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]*):443([/?].*)?$", r"$1$2")
    u = F.regexp_replace(u, r"^(https?://)www\.", r"$1")
    # tracking params: non-first, then first-with-successor, then lone
    alt = "|".join(tracking_params)
    u = F.regexp_replace(u, rf"&({alt})=[^&#]*", "")
    u = F.regexp_replace(u, rf"\?({alt})=[^&#]*&", "?")
    u = F.regexp_replace(u, rf"\?({alt})=[^&#]*$", "")
    # empty-vs-"/" path before a query and trailing slashes are equivalent
    u = F.regexp_replace(u, r"/+\?", "?")
    u = F.regexp_replace(u, "/+$", "")
    out = df.withColumn(out_col, u)
    if host_col:
        out = out.withColumn(
            host_col,
            F.regexp_extract(F.col(out_col), r"^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1),
        )
    if domain_col:
        src = host_col if host_col else out_col
        out = out.withColumn(
            domain_col, F.regexp_extract(F.col(src), r"([^.]+\.[^.]+)$", 1)
        )
    return out


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
    chars_col: str | None = "n_chars",
    short_chars: int = 100,
    round_digits: int = 6,
) -> DataFrame:
    """One-call corpus data card: the numbers a training-data owner checks
    before anything else, as a single tiny frame —

    ``n_docs``, exact-duplicate pressure (``n_dup_texts`` = docs sharing a
    text with an earlier doc, ``dup_pct``), language spread (``n_langs``,
    ``top_lang`` + ``top_lang_pct``; deterministic tie-break = the
    lexicographically smallest of the most frequent), size shape
    (``avg_chars``, ``pct_short`` under ``short_chars``), and
    ``total_tokens`` (whitespace tokens; empty/blank text counts 0).

    Scale shape: one pass producing two map-side-combinable aggregates
    (global stats; per-lang counts for the top-lang pick — lang-domain-
    sized) joined by a 1-row broadcast.  No driver data, no second corpus
    scan; at 100 TB this is strictly cheaper than any one of the checks
    it replaces run alone.
    """
    t = F.col(text_col)
    chars = F.col(chars_col) if chars_col else F.length(t)
    tokens = F.when(
        F.trim(t) == "", F.lit(0)
    ).otherwise(F.size(F.split(F.trim(t), r"\s+")))
    n = F.count("*")
    stats = df.agg(
        n.alias("n_docs"),
        (n - F.count_distinct(t)).alias("n_dup_texts"),
        F.round((n - F.count_distinct(t)) / n, round_digits).alias("dup_pct"),
        F.round(F.sum(chars) / n, round_digits).alias("avg_chars"),
        F.round(
            F.sum(F.when(chars < short_chars, 1).otherwise(0)) / n, round_digits
        ).alias("pct_short"),
        F.sum(tokens).cast("long").alias("total_tokens"),
    )
    if lang_col is None:
        return stats
    per_lang = df.groupBy(lang_col).agg(F.count("*").alias("__cnt"))
    n_langs = per_lang.agg(F.count("*").cast("long").alias("n_langs"))
    # the per-lang table is lang-domain-sized, so TakeOrdered of 1 row is
    # the whole cost of the deterministic (count desc, lang asc) winner
    top = (
        per_lang.orderBy(F.col("__cnt").desc(), F.col(lang_col).asc())
        .limit(1)
        .select(F.col(lang_col).alias("top_lang"), F.col("__cnt").alias("__top_cnt"))
    )
    return (
        stats.crossJoin(F.broadcast(n_langs))
        .crossJoin(F.broadcast(top))
        .withColumn(
            "top_lang_pct",
            F.round(F.col("__top_cnt") / F.col("n_docs"), round_digits),
        )
        .drop("__top_cnt")
    )


def quantile_bin(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
    group_cols: list[str] | None = None,
    out_col: str = "bucket",
) -> DataFrame:
    """Quantile bucketing: assign each row the index (0-based) of its
    per-group quantile bin — the feature-discretization step before
    curriculum ordering, stratified sampling, or monotone-binned
    models.  Bucket ``i`` holds values in ``[q_{i/n}, q_{(i+1)/n})``
    with EXACT interpolated percentile thresholds, so the semantic is
    value-based (ties land in the same bucket), unlike ``ntile`` which
    splits equal ROW counts and tears ties apart nondeterministically.

    Scale shape: thresholds come from
    :func:`~.sketches.grouped_percentiles_scalable` — exact interpolated
    percentiles whose plan never buffers a whole group in one reducer
    (Spark's ``percentile`` aggregate does, which measured 27× at x50 on
    the 3-group price fixture) — broadcast back as one row per group,
    then a narrow projection counts thresholds ≤ the value.  NULL
    values get NULL buckets; rows with NULL group keys survive via the
    LEFT join.
    """
    if n_buckets < 2:
        raise ValueError(
            f"quantile_bin: n_buckets must be >= 2, got {n_buckets}"
        )
    from .sketches import grouped_percentiles_scalable

    gcols = list(group_cols or [])
    bounds = grouped_percentiles_scalable(
        df, gcols, value_col,
        [i / n_buckets for i in range(1, n_buckets)],
        out_col="__qs",
    )
    if gcols:
        joined = df.join(F.broadcast(bounds), gcols, "left")
    else:
        joined = df.join(F.broadcast(bounds))
    x = F.col(value_col).cast("double")
    bucket = F.size(F.filter("__qs", lambda q: q <= x))
    return joined.withColumn(
        out_col,
        F.when(x.isNull(), F.lit(None).cast("long"))
        .otherwise(bucket.cast("long")),
    ).drop("__qs")


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: list[str] | None = None,
) -> DataFrame:
    """Version-over-version corpus diff — ``(id, status)`` with status in
    ``added`` / ``removed`` / ``changed`` (unchanged documents are
    excluded): the "what did the rebuild actually change" audit every
    dataset-versioning workflow needs before shipping a new snapshot
    (pair with ``VersionedCatalog`` time travel to diff any two
    versions).

    ``content_cols`` defaults to every non-id column present on BOTH
    sides.  Document ids must be unique within each side (run the dedup
    tier first) — duplicate ids would fan the full-outer join out.

    Scale shape: each side first collapses to ``(id, xxhash64(cols))``
    — a narrow projection, so the ONE full-outer join (the only
    shuffle) moves 16 bytes a row instead of document text; change
    detection compares the 64-bit content hashes (collision odds 2^-64
    per pair — the standard content-address trade).  Each column is
    null-tagged before hashing (``xxhash64`` otherwise SKIPS NULL
    inputs, so a value moving between columns — ``(x, NULL)`` →
    ``(NULL, x)`` — would hash identically and silently classify as
    unchanged).  The result is change-sized after the filter.
    """
    if content_cols is None:
        content_cols = [c for c in old.columns
                        if c != id_col and c in new.columns]
    if not content_cols:
        raise ValueError(
            "corpus_diff: no shared content columns between the two sides"
        )
    missing = [c for c in content_cols
               if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"corpus_diff: columns missing on a side: {missing}")

    def sig(df: DataFrame, tag: str) -> DataFrame:
        # null-tag every column: NULL and the value must hash apart, and
        # a NULL must still advance the hash so column position matters
        enc = [
            F.coalesce(
                F.concat(F.lit("v:"), F.col(c).cast("string")),
                F.lit("\x00"),
            )
            for c in content_cols
        ]
        return df.select(F.col(id_col), F.xxhash64(*enc).alias(tag))

    j = sig(old, "__ho").join(sig(new, "__hn"), id_col, "full_outer")
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
    )
    return (
        j.select(F.col(id_col), status.alias("status"))
        .filter(F.col("status").isNotNull())
    )


def export_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    token_col: str | None = None,
    mode: str = "error",
    format: str = "parquet",
) -> DataFrame:
    """Materialize the training-ready corpus: ONE file per shard, rows
    physically in :func:`corpus_shuffle` epoch order, plus a verified
    per-shard manifest — the end of the curation pipeline, where a
    training reader takes over.  ``reference`` has no analogue (its
    sinks stop at row batches, ``src/DBT.php`` batch insert); this is
    the piece a 100 TB pretraining run actually consumes.

    Layout: ``path/shard=K/part-*.parquet`` with payload columns plus
    ``shuffle_pos`` (the read cursor).  Each shard lands in exactly one
    task (``repartition(n_shards, shard)``) and therefore exactly one
    file — the manifest's ``n_files`` column *measures* that contract
    from the written bytes rather than assuming it (if a future writer
    option like ``maxRecordsPerFile`` split a shard, ``n_files`` would
    say so).  Within the file rows are ``shuffle_pos``-sorted
    (``sortWithinPartitions``), so a sequential reader replays the
    deterministic permutation with zero seeking.

    Manifest (one row per NON-EMPTY shard, ascending): ``shard``,
    ``n_files``, ``bytes`` (physical, from ``_metadata.file_size``),
    ``n_rows``, ``n_tokens`` (``sum(token_col)``; NULL column when no
    ``token_col``), ``min_pos``/``max_pos`` (``1..n_rows`` iff the
    shard is complete — positions are per-shard ``row_number``, so a
    torn write shows as a gap), and ``id_checksum`` (sum of the 32-bit
    ``bucket_column`` hash of ids — an order-independent content
    fingerprint two exports can compare without reading payloads).

    Scale shape: one shuffle to lay the data out (hash partition +
    per-shard sort, each sort bounded at ``|corpus| / n_shards`` rows
    — pick thousands of shards at 100 TB, as for
    :func:`corpus_shuffle`), then the manifest is ONE map-side-
    combinable aggregate over the written files keyed by (shard, file)
    and collapsed per shard.  Reading back what was WRITTEN (not the
    input) makes the manifest an end-to-end receipt: row loss in the
    write would surface as an ``n_rows``/checksum mismatch against the
    source-side expectation, which is exactly what the oracle checks.

    Durability: the write is a plain Spark directory write (``mode=
    "error"`` refuses a half-written destination; Spark's ``_SUCCESS``
    marker gates readers).  For versioned/atomic publication write to
    a fresh directory per epoch and flip the consumer's pointer — the
    same recipe as ``VersionedCatalog``, which owns that protocol for
    engine-managed tables.
    """
    if n_shards < 1:
        raise ValueError("export_shards: n_shards must be >= 1")
    if mode not in ("error", "overwrite"):
        raise ValueError(
            f"export_shards: mode must be 'error' or 'overwrite', "
            f"got {mode!r}"
        )
    if id_col not in df.columns:
        raise ValueError(
            f"export_shards: id_col {id_col!r} not in frame "
            f"(have {df.columns})"
        )
    if token_col is not None and token_col not in df.columns:
        raise ValueError(
            f"export_shards: token_col {token_col!r} not in frame "
            f"(have {df.columns})"
        )
    # layout_partitions=n_shards: ONE exchange total — the range
    # repartition both feeds the position window and lands each shard
    # wholly (and near-uniformly, no hash-mod collisions) in one task
    shuffled = corpus_shuffle(df, id_col, n_shards, seed=seed,
                              hash_fn=hash_fn,
                              layout_partitions=n_shards)
    (
        shuffled.sortWithinPartitions("shard", "shuffle_pos")
        .write.format(format)
        .mode(mode)
        # pin static semantics: under a session-level dynamic
        # partitionOverwriteMode a smaller re-export would keep stale
        # shard dirs and the manifest would count them as current
        .option("partitionOverwriteMode", "static")
        .partitionBy("shard")
        .save(path)
    )
    return _shard_manifest_of(
        df.sparkSession, path, id_col, seed=seed, hash_fn=hash_fn,
        token_col=token_col, format=format,
    )


_MANIFEST_SCHEMA = (
    "shard long, n_files long, bytes long, n_rows long, "
    "n_tokens long, min_pos long, max_pos long, id_checksum long"
)


def _shard_manifest_of(
    spark,
    path: str,
    id_col: str,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    token_col: str | None = None,
    format: str = "parquet",
) -> DataFrame:
    """Compute the per-shard manifest from the files at ``path`` — the
    shared read-side of :func:`export_shards` (fresh receipt) and
    :func:`verify_export` (recount for audit)."""
    # drop any cached file listing for the destination: the session-
    # global FileStatusCache would otherwise serve a pre-write (or
    # pre-tamper) view of the directory — fatal for an AUDIT whose whole
    # point is the current on-disk truth
    spark.catalog.refreshByPath(path)
    try:
        written = spark.read.format(format).load(path)
    except Exception as e:
        # empty export (no data files to infer a schema from) or a
        # destination that is gone entirely — for the AUDIT caller the
        # latter is the disaster being hunted, and it must come back as
        # per-shard "missing" rows, not a raw reader error.  Match by
        # error class, not message text, where the exception carries one.
        klass = getattr(e, "getErrorClass", lambda: None)() or ""
        msg = str(e).lower()
        if not (
            klass in ("UNABLE_TO_INFER_SCHEMA", "PATH_NOT_FOUND")
            or "infer schema" in msg
            or "path does not exist" in msg
        ):
            raise
        return spark.createDataFrame([], _MANIFEST_SCHEMA)
    checksum = bucket_column(id_col, M32, seed, hash_fn)
    tok = F.col(token_col) if token_col is not None else F.lit(None)
    per_file = (
        written.select(
            F.col("shard").cast("long").alias("shard"),
            F.col("_metadata.file_path").alias("__file"),
            F.col("_metadata.file_size").alias("__fbytes"),
            F.col("shuffle_pos"),
            checksum.alias("__ck"),
            tok.cast("long").alias("__tok"),
        )
        .groupBy("shard", "__file", "__fbytes")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("__tok").alias("n_tokens"),
            F.min("shuffle_pos").alias("min_pos"),
            F.max("shuffle_pos").alias("max_pos"),
            F.sum("__ck").alias("id_checksum"),
        )
    )
    return (
        per_file.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("__fbytes").alias("bytes"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("min_pos").cast("long").alias("min_pos"),
            F.max("max_pos").cast("long").alias("max_pos"),
            F.sum("id_checksum").alias("id_checksum"),
        )
        .orderBy("shard")
    )


def verify_export(
    spark,
    path: str,
    manifest: DataFrame,
    id_col: str,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    token_col: str | None = None,
    format: str = "parquet",
) -> DataFrame:
    """Audit an existing :func:`export_shards` destination against its
    stored manifest: recount every shard from the files at ``path``
    (same aggregate as the original receipt) and return one row per
    DISCREPANT (shard, field) — empty means the export is intact.
    Pass the SAME ``id_col``/``seed``/``hash_fn``/``token_col`` the
    export used, or the checksum recompute is meaningless.

    This is the point-in-time integrity check for the cases a stored
    receipt exists to catch: a storage migration or sync that dropped
    or duplicated a file (``n_files``/``bytes``/``n_rows`` drift), a
    recompaction that split shards (``n_files``), or content
    corruption surviving row counts (``id_checksum``).  Fields:
    ``status`` is ``missing`` (shard in manifest, nothing on disk),
    ``unexpected`` (shard on disk, not in manifest), or ``mismatch``
    (per-field, with ``expected``/``actual``).

    Scale shape: identical to the manifest pass — one bounded scan of
    the export plus a shard-count-sized join; the manifest side is
    thousands of rows at most and broadcasts.
    """
    actual = _shard_manifest_of(
        spark, path, id_col, seed=seed, hash_fn=hash_fn,
        token_col=token_col, format=format,
    )
    fields = [c for c in actual.columns if c != "shard"]
    if token_col is None:
        fields.remove("n_tokens")  # NULL on both sides: nothing to audit
    exp = manifest.select(
        "shard", *[F.col(c).cast("long").alias(f"__e_{c}") for c in fields]
    )
    act = actual.select(
        "shard", *[F.col(c).alias(f"__a_{c}") for c in fields]
    )
    j = exp.join(F.broadcast(act), "shard", "full_outer")
    # a side is absent iff ALL its fields are NULL post-join (n_files
    # etc. are never NULL on a present side)
    exp_absent = F.col(f"__e_{fields[0]}").isNull()
    act_absent = F.col(f"__a_{fields[0]}").isNull()
    per_field = F.array(*[
        F.when(
            ~F.col(f"__e_{c}").eqNullSafe(F.col(f"__a_{c}")),
            F.struct(
                F.lit(c).alias("field"),
                F.col(f"__e_{c}").alias("expected"),
                F.col(f"__a_{c}").alias("actual"),
            ),
        )
        for c in fields
    ])
    return (
        j.select(
            "shard",
            F.when(exp_absent & ~act_absent, F.lit("unexpected"))
            .when(act_absent & ~exp_absent, F.lit("missing"))
            .alias("__status"),
            per_field.alias("__diffs"),
        )
        .select(
            "shard",
            F.explode(
                F.when(
                    F.col("__status").isNotNull(),
                    F.array(F.struct(
                        F.col("__status").alias("field"),
                        F.lit(None).cast("long").alias("expected"),
                        F.lit(None).cast("long").alias("actual"),
                    )),
                ).otherwise(F.filter("__diffs", lambda d: d.isNotNull()))
            ).alias("__d"),
        )
        .select(
            "shard",
            F.when(F.col("__d.field").isin("missing", "unexpected"),
                   F.col("__d.field")).otherwise(F.lit("mismatch"))
            .alias("status"),
            F.when(~F.col("__d.field").isin("missing", "unexpected"),
                   F.col("__d.field")).alias("field"),
            F.col("__d.expected").alias("expected"),
            F.col("__d.actual").alias("actual"),
        )
        .orderBy("shard", "field")
    )
