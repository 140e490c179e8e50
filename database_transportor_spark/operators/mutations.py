"""Key-based mutation operators: MERGE upsert and CDC change-feed apply.

The reference engine transports by full reload or append
(``/root/reference/src/DBT.php:85-112`` — ``doTransport`` writes whole
map outputs); rows that changed at the source after their first transport
are only picked up by a full re-run.  These operators close that gap the
Spark-native way: compute the merged table as one declarative plan and
swap it in (``Catalog.write_staged``), which is how MERGE works on plain
parquet/JDBC sinks without a transactional table format.

Scale notes
-----------
- :func:`merge_upsert` is ONE shuffle: both sides union into a single
  ``groupBy(keys)`` with ``max_by`` over a priority tuple — partial
  aggregation runs map-side, nothing sorts, no window over the full
  table, no join.  At 100 TB the cost is the same hash shuffle a
  ``groupBy`` costs, and AQE handles skewed keys.
- :func:`cdc_apply` shuffles the (usually tiny) change feed once to pick
  each key's latest image, then removes touched keys from the target via
  a broadcast LEFT-ANTI join and unions the upsert images back — the
  target is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pins import pin

__all__ = ["merge_upsert", "cdc_apply", "diff_tables", "align_schemas", "cdc_merge"]


def diff_tables(
    left: DataFrame,
    right: DataFrame,
    keys: str | list[str],
) -> DataFrame:
    """Key-based table diff — the migration-parity check a transport
    engine owes its users: which rows were ``added`` (right only),
    ``removed`` (left only), or ``changed`` (both sides, different
    payload), with the exact changed column names.

    Returns ``(keys..., change_type, changed_cols array<string>)`` —
    unchanged rows are omitted (at 100 TB the interesting output is the
    delta, not a copy of the table).  Comparison is null-safe per column;
    both sides must share the schema and be key-unique.

    Shape: one full-outer equi-join on the keys; the per-column
    comparison is a pure projection on the joined row.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    payload = [c for c in left.columns if c not in keys]
    missing = [c for c in left.columns if c not in right.columns]
    if missing:
        raise ValueError(f"diff_tables: right lacks columns {missing}")
    extra = [c for c in right.columns if c not in left.columns]
    if extra:
        # a one-directional check would silently skip right-only columns
        # and report rows differing only there as unchanged
        raise ValueError(f"diff_tables: left lacks columns {extra}")

    l = left.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__l"),
        *[F.col(c).alias(f"__l_{c}") for c in payload],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__r"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    )
    j = l.join(r, keys, "full_outer")
    changed_cols = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}")), F.lit(c)
                )
                for c in payload
            ]
        ),
        lambda x: x.isNotNull(),
    )
    change = (
        F.when(F.col("__l").isNull(), F.lit("added"))
        .when(F.col("__r").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[F.col(k) for k in keys],
            "change_type",
            F.when(
                F.col("change_type") == "changed", changed_cols
            ).otherwise(F.array().cast("array<string>")).alias("changed_cols"),
        )
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: str | list[str],
    seq_col: str | None = None,
) -> DataFrame:
    """MERGE semantics on DataFrames: source rows REPLACE same-key target
    rows ("when matched then update"), unmatched source rows are inserted
    ("when not matched then insert"), untouched target rows pass through.

    ``source`` must carry the same columns as ``target`` (full row
    images).  ``seq_col``: optional monotone column resolving duplicate
    keys WITHIN the two sides (highest wins); without it each side must
    be key-unique (the usual MERGE precondition — violations resolve
    arbitrarily, like SQL MERGE's "multiple matched rows" error would).

    Shape: union + one ``max_by`` aggregation keyed on ``keys`` — a
    single hash shuffle with map-side combine; no sort, no join.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    missing = [c for c in target.columns if c not in source.columns]
    if missing:
        raise ValueError(f"merge_upsert: source lacks target columns {missing}")
    cols = list(target.columns)
    payload = [c for c in cols if c not in keys]
    if seq_col is not None and seq_col not in source.columns and seq_col not in target.columns:
        raise ValueError(f"merge_upsert: seq column {seq_col!r} on neither side")

    if seq_col is None:
        tseq = sseq = F.lit(0)
    else:
        # seq may exist on one side only (e.g. a feed-side LSN); the absent
        # side gets a typed NULL (sorts lowest), so priority still decides
        # cross-side and seq only breaks within-side ties.  The native type
        # is kept — timestamp cursors order correctly without a lossy cast.
        holder = source if seq_col in source.columns else target
        dt = holder.schema[seq_col].dataType
        tseq = F.col(seq_col) if seq_col in target.columns else F.lit(None).cast(dt)
        sseq = F.col(seq_col) if seq_col in source.columns else F.lit(None).cast(dt)

    tagged = target.select(
        *cols, F.lit(0).alias("__pri"), tseq.alias("__seq")
    ).unionByName(
        source.select(*cols, F.lit(1).alias("__pri"), sseq.alias("__seq"))
    )
    picked = tagged.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(F.col("__pri"), F.col("__seq")),
        ).alias("__row")
    )
    return picked.select(
        *[F.col(k) for k in keys],
        *[F.col(f"__row.{c}").alias(c) for c in payload],
    ).select(*cols)


def cdc_apply(
    target: DataFrame,
    changes: DataFrame,
    keys: str | list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    upsert_ops: tuple[str, ...] = ("I", "U"),
    delete_op: str = "D",
    broadcast_feed: bool = True,
    persist_feed: bool = True,
) -> DataFrame:
    """Apply a CDC change feed (full row images + op + sequence) to a
    snapshot: for each key, the change with the highest ``seq_col`` wins —
    an upsert op replaces/inserts the row, the delete op removes it; keys
    absent from the feed pass through untouched.

    ``changes`` must carry every ``target`` column (image may be NULL on
    deletes) plus ``op_col`` and ``seq_col``.  ``seq_col`` must be unique
    per key (LSN / binlog position semantics); ties resolve arbitrarily.

    Shape: one aggregation over the FEED (small side) to pick each key's
    latest image, then a LEFT-ANTI join removing touched keys from the
    target and a union adding the upsert images back.  A full-outer join
    would force both sides to sort-merge-shuffle (Spark cannot broadcast
    full-outer); the anti join broadcasts the feed's keys
    (``broadcast_feed=True``, the CDC contract that the feed is small), so
    the 100 TB snapshot is never shuffled.  Set ``broadcast_feed=False``
    for a pathological feed larger than executor memory.

    Unknown ops raise: the op check is the anti-branch CaseWhen of the
    upsert filter itself, evaluated for every latest-change row before any
    row is dropped — it cannot be pruned away with the projection.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    payload = [c for c in target.columns if c not in keys]
    missing = [c for c in target.columns if c not in changes.columns]
    if missing:
        raise ValueError(f"cdc_apply: changes lack target columns {missing}")
    for c in (op_col, seq_col):
        if c not in changes.columns:
            raise ValueError(f"cdc_apply: changes lack required column {c!r}")

    # persisted by default: both the upsert branch and the anti-join's key
    # projection read this — without it the feed scan + aggregation runs
    # twice per action (feed-sized, so the cache is bounded by the CDC
    # contract).  Long-lived repeated callers (e.g. the streaming merge
    # sink applying one batch per trigger, forever) pass
    # ``persist_feed=False``: a never-unpersisted cache per micro-batch
    # accumulates in executor storage without bound, and recomputing a
    # tiny feed twice is cheaper than leaking it.
    latest = changes.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload], F.col(op_col).alias("__op")),
            F.col(seq_col),
        ).alias("__c")
    )
    if persist_feed:
        latest = pin(latest)
    op = F.col("__c.__op")
    # every `latest` row has a non-null op (it came from the feed), so the
    # CaseWhen's otherwise-branch fires exactly on unknown ops — no
    # short-circuit reliance, guaranteed branch-order semantics
    is_upsert = (
        F.when(op.isin(*upsert_ops), F.lit(True))
        .when(op == F.lit(delete_op), F.lit(False))
        .otherwise(
            F.raise_error(F.concat(F.lit("cdc_apply: unknown op "), op))
        )
    )
    upserts = latest.filter(is_upsert).select(
        *[F.col(k) for k in keys],
        *[F.col(f"__c.{c}").alias(c) for c in payload],
    )
    feed_keys = latest.select(*[F.col(k) for k in keys])
    if broadcast_feed:
        feed_keys = F.broadcast(feed_keys)
    kept = target.join(feed_keys, keys, "left_anti")
    return kept.select(*target.columns).unionByName(
        upserts.select(*target.columns)
    )


def align_schemas(
    target: DataFrame,
    source: DataFrame,
    strict_types: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Schema evolution for merges: return (target', source') sharing the
    UNION of both column sets — columns absent on one side are added as
    typed NULLs (type taken from the side that has them).  The standard
    additive-evolution contract (Delta's ``mergeSchema``): new columns
    appear, old rows read NULL for them; nothing is ever dropped or
    silently retyped.

    ``strict_types=True`` raises when a shared column's type differs
    between the sides — silent cross-type unions are how corrupt merges
    are born; pass ``False`` to let Spark's ``unionByName`` coercion
    handle it when you know the widening is safe.

    Zero-cost projection on both sides; pair with :func:`merge_upsert`::

        t, s = align_schemas(live, feed)
        merged = merge_upsert(t, s, keys, seq_col)
    """
    t_types = {f.name: f.dataType for f in target.schema.fields}
    s_types = {f.name: f.dataType for f in source.schema.fields}
    if strict_types:
        clash = {
            c: (t_types[c], s_types[c])
            for c in set(t_types) & set(s_types)
            if t_types[c] != s_types[c]
        }
        if clash:
            raise ValueError(
                f"align_schemas: type mismatch on shared columns {clash}; "
                "resolve explicitly or pass strict_types=False"
            )
    ordered = list(target.columns) + [
        c for c in source.columns if c not in t_types
    ]
    def project(df, have):
        return df.select(
            *[
                F.col(c) if c in have
                else F.lit(None).cast(
                    t_types.get(c) or s_types[c]
                ).alias(c)
                for c in ordered
            ]
        )
    return project(target, t_types), project(source, s_types)


def cdc_merge(
    live: DataFrame,
    changes: DataFrame,
    keys: str | list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    upsert_ops: tuple[str, ...] = ("I", "U"),
    delete_op: str = "D",
) -> DataFrame:
    """Sequence-durable CDC apply: like :func:`cdc_apply`, but the
    OUTPUT RETAINS ``seq_col`` and the live side's stored sequence
    competes against the feed's — so a change only lands if its sequence
    beats what the table already holds.  This is the variant a
    long-running / out-of-order feed needs: with :func:`cdc_apply` the
    target forgets sequences, and a stale change arriving in a LATER
    micro-batch would overwrite or delete newer data.

    ``live`` may lack ``seq_col`` (first contact): it joins the race
    with a typed-NULL sequence, which loses to any real change.

    Known limitation (standard without tombstone retention): once a
    delete wins, the key's sequence is forgotten — a stale upsert in an
    even later batch can resurrect it.  Feeds needing delete-then-stale
    protection must retain tombstones upstream.

    Shape: union + ONE max_by aggregation keyed on ``keys`` (map-side
    combine) — the live table shuffles once, the price of consulting its
    stored sequence; when the feed is totally ordered across batches
    prefer :func:`cdc_apply`'s broadcast-anti shape, which never
    shuffles the snapshot.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    data_cols = [c for c in changes.columns if c != op_col]
    if seq_col not in data_cols:
        raise ValueError(f"cdc_merge: changes lack required column {seq_col!r}")
    if op_col not in changes.columns:
        raise ValueError(f"cdc_merge: changes lack required column {op_col!r}")
    if seq_col not in live.columns:
        dt = changes.schema[seq_col].dataType
        live = live.withColumn(seq_col, F.lit(None).cast(dt))
    missing = [c for c in data_cols if c not in live.columns]
    if missing:
        raise ValueError(f"cdc_merge: live lacks feed columns {missing}")
    extra = [
        c for c in live.columns
        if c not in data_cols and c not in (seq_col, op_col)
    ]
    if extra:
        # the merged output is feed-shaped; writing it back (the staged
        # swap in stream_merge_sink) would silently DELETE these columns
        raise ValueError(
            f"cdc_merge: live has columns absent from the feed {extra}; "
            "align schemas first (align_schemas / evolve_merge) — merging "
            "would silently drop that data"
        )

    baseline = live.select(*data_cols).withColumn(
        op_col, F.lit(upsert_ops[0])
    )
    allc = baseline.unionByName(changes.select(*data_cols, op_col))
    payload = [c for c in data_cols if c not in keys]
    # NULL-safe ordering: max_by IGNORES rows whose ordering key is NULL,
    # which would silently DROP live-only keys carrying the typed-NULL
    # first-contact sequence; wrapping seq in (isNotNull, seq) keeps them
    # in the race while still losing to any real sequence
    ord_ = F.struct(
        F.col(seq_col).isNotNull().alias("p"), F.col(seq_col).alias("s")
    )
    picked = allc.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload], F.col(op_col).alias("__op")),
            ord_,
        ).alias("__c")
    )
    op = F.col("__c.__op")
    is_upsert = (
        F.when(op.isin(*upsert_ops), F.lit(True))
        .when(op == F.lit(delete_op), F.lit(False))
        .otherwise(
            F.raise_error(F.concat(F.lit("cdc_merge: unknown op "), op))
        )
    )
    return picked.filter(is_upsert).select(
        *[F.col(k) for k in keys],
        *[F.col(f"__c.{c}").alias(c) for c in payload],
    ).select(*data_cols)
