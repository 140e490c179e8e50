"""Lookup-join operators (J1/J2/J3, SURVEY §2.4) — the heart of the engine.

The reference implements enrichment lookups as driver-side hash maps fed by
``WHERE IN`` queries (J1, DBT.php:277-319), per-row point queries (J2,
DBT.php:320-343) and grouped queries reduced by a user ``processor`` (J3,
DBT.php:227-268).  All of them are left-outer enrichment: the driving table
never gains or loses rows.

Spark-first re-expression: each lookup is a left join against a
**key-deduplicated** build side, so the driving cardinality provably never
fans out — mirroring the reference's dict-overwrite (``pluck`` builds an
associative array: duplicate keys collapse) without its per-row round trips.

Pinned deviations (documented; the reference's behavior depends on arbitrary
DB return order, which no distributed engine can reproduce):

- duplicate build keys reduce via ``max(wanted)`` — deterministic
  "single-winner" instead of "whichever row the DB returned last"
  (DBT.php:302).
- J2's per-row ``first([wanted])`` (DBT.php:331) likewise becomes
  ``max(wanted)`` per key tuple.

Semantics preserved exactly:

- J1 single-key: probe = ``rtrim(pre_format(according))``, build =
  ``rtrim(search_column)`` — rtrim only when the side is string-typed (PHP
  ``rtrim`` operates on the strings PDO returns, DBT.php:306-312).  Miss ⇒
  ``default``.  ``format_wanted`` post-processes the looked-up value and is
  applied **even on a miss** (to NULL), with ``?? default`` after
  (DBT.php:314-318).
- J2 multi-key: parallel key lists, ``pre_format`` per probe key, **no
  rtrim**, and a miss yields **NULL regardless of default** (DBT.php:339-341).
  ``format_wanted`` runs only on hits (DBT.php:333-338).
- J3 refers: lookup rows grouped by ``search_column``, reduced by
  ``processor``; single keys rtrim-normalized like J1 (DBT.php:254-260);
  miss ⇒ ``default``.
- Lookup-side ``conditions`` (F4, DBT.php:346-355) filter the dimension
  before the join, so they push into its scan.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..functions.hooks import value_hook_column
from ..predicates import apply_conditions
from ..spec import ColumnSpec, ReferSpec, RefersSpec
from ..functions.hooks import processor_agg_column

__all__ = ["apply_refer", "apply_refers", "apply_refers_batch", "apply_asof_refer", "refers_merge_key"]

#: resolve(side, table) -> DataFrame; provided by the engine so target-side
#: lookups see in-flight outputs of already-planned maps (J4/X1 — the
#: reference's recursive dependency trigger, DBT.php:184-186, becomes a
#: planner-level topological order).
Resolver = Callable[[str, str], DataFrame]


def _is_string(df: DataFrame, col: str) -> bool:
    return isinstance(df.schema[col].dataType, StringType)


def _rtrim_if_string(c: Column, is_string: bool) -> Column:
    return F.rtrim(c) if is_string else c


def _maybe_broadcast(df: DataFrame, flag: Optional[bool]) -> DataFrame:
    if flag is True:
        return F.broadcast(df)
    if flag is False:
        return df.hint("shuffle_hash")
    return df  # let Catalyst/AQE pick from statistics


def _probe_column(fact: DataFrame, according: str, spec: ReferSpec, rtrim: bool) -> Column:
    c: Column = F.col(according)
    if spec.pre_format is not None:
        # pre_format runs before key matching (DBT.php:295-299,324-328).
        tmp = f"__pf_{according}"
        fact_with = fact.withColumn(tmp, value_hook_column(spec.pre_format, according))
        c = value_hook_column(spec.pre_format, according)
        is_str = isinstance(fact_with.schema[tmp].dataType, StringType)
    else:
        is_str = _is_string(fact, according)
    if rtrim:
        c = _rtrim_if_string(c, is_str)
    return c


def apply_refer(fact: DataFrame, cspec: ColumnSpec, resolve: Resolver) -> DataFrame:
    """Apply a J1/J2 ``refer`` lookup, adding column ``cspec.target``."""
    spec = cspec.refer
    dim = resolve(spec.search_source, spec.search_table)
    dim = apply_conditions(dim, spec.conditions)

    tag = f"__ref_{cspec.target}"
    wanted = f"{tag}_w"
    marker = f"{tag}_m"

    if not spec.is_multi:
        # ---- J1: single-key, rtrim-normalized, miss ⇒ default ----
        search, according = spec.search_column[0], spec.according_column[0]
        key = f"{tag}_k"
        build = dim.select(
            _rtrim_if_string(F.col(search), _is_string(dim, search)).alias(key),
            F.col(spec.wanted_column).alias(wanted),
        )
        # Key-dedup: driving table must not fan out (pluck() dict semantics,
        # DBT.php:302); max() is our pinned deterministic winner.
        build = build.groupBy(key).agg(F.max(wanted).alias(wanted))
        build = _maybe_broadcast(build, spec.broadcast)
        probe = _probe_column(fact, according, spec, rtrim=True)
        if spec.salt is not None:
            # Skew lane: hot probe keys spread over `salts` reducers, long
            # tail joins plain (operators/skew.py).  Results are identical
            # to the unsalted join — the harness `refer_salted` oracle
            # checks exactly that.  The salt source is a hash of the whole
            # fact row: per-row variation, deterministic across retries.
            from .skew import hot_key_sample, salted_left_join

            salt_src = F.xxhash64(*[F.col(c) for c in fact.columns])
            keyed = fact.withColumn(key, probe).withColumn("__salt_src", salt_src)
            hot = list(spec.salt.hot_keys) or hot_key_sample(
                keyed, key, threshold=spec.salt.threshold
            )
            joined = salted_left_join(
                keyed, build, key=key, salt_on="__salt_src",
                hot_keys=hot, salts=spec.salt.salts,
            ).drop("__salt_src")
        else:
            joined = fact.join(build, probe == F.col(key), "left")
        value = F.col(wanted)
        if spec.format_wanted is not None:
            # Applied even on miss, then ?? default (DBT.php:314-318).
            value = value_hook_column(spec.format_wanted, wanted)
        if cspec.has_default and cspec.default is not None:
            value = F.coalesce(value, F.lit(cspec.default))
        return joined.withColumn(cspec.target, value).drop(key, wanted)

    # ---- J2: multi-key, no rtrim, miss ⇒ NULL (not default) ----
    keys = [f"{tag}_k{i}" for i in range(len(spec.search_column))]
    build = dim.select(
        *[F.col(s).alias(k) for s, k in zip(spec.search_column, keys)],
        F.col(spec.wanted_column).alias(wanted),
    )
    build = (
        build.groupBy(*keys)
        .agg(F.max(wanted).alias(wanted))
        .withColumn(marker, F.lit(True))
    )
    build = _maybe_broadcast(build, spec.broadcast)
    probes = []
    for according in spec.according_column:
        if spec.pre_format is not None:
            probes.append(value_hook_column(spec.pre_format, according))
        else:
            probes.append(F.col(according))
    cond = None
    for p, k in zip(probes, keys):
        c = p == F.col(k)
        cond = c if cond is None else (cond & c)
    joined = fact.join(build, cond, "left")
    if spec.format_wanted is not None:
        # format_wanted only on hits; misses stay NULL (DBT.php:333-341).
        value = F.when(F.col(marker), value_hook_column(spec.format_wanted, wanted))
    else:
        value = F.col(wanted)
    return joined.withColumn(cspec.target, value).drop(*keys, wanted, marker)


def apply_refers(fact: DataFrame, cspec: ColumnSpec, resolve: Resolver) -> DataFrame:
    """Apply a single J3 ``refers`` grouped-aggregation lookup."""
    return apply_refers_batch(fact, [cspec], resolve)


def refers_merge_key(cspec: ColumnSpec) -> tuple:
    """Refers lookups sharing this key can be served by ONE aggregation and
    ONE join.  ``repr`` of conditions because values may be lists."""
    s = cspec.refers
    return (
        s.search_source,
        s.search_table,
        s.search_column,
        s.according_column,
        repr(s.conditions),
    )


def apply_refers_batch(
    fact: DataFrame, cspecs: list[ColumnSpec], resolve: Resolver
) -> DataFrame:
    """Apply one or more J3 ``refers`` lookups that share the same
    (source, table, key, conditions) — see :func:`refers_merge_key`.

    ``dim.groupBy(search_column).agg(p1, p2, ...)`` then a single left
    join — the aggregation is partial (map-side combine) and the joined
    side is one row per key by construction, so no fan-out and no dedup
    needed.  Merging matters at scale: N refers columns over the same fact
    table become one scan + one shuffle instead of N of each.
    """
    spec = cspecs[0].refers
    dim = resolve(spec.search_source, spec.search_table)
    dim = apply_conditions(dim, spec.conditions)

    key = f"__refs_{cspecs[0].target}_k"
    wanteds = [f"__refs_{c.target}_w" for c in cspecs]
    aggs = [
        processor_agg_column(c.refers.processor, dim).alias(w)
        for c, w in zip(cspecs, wanteds)
    ]
    build = dim.groupBy(
        _rtrim_if_string(
            F.col(spec.search_column), _is_string(dim, spec.search_column)
        ).alias(key)
    ).agg(*aggs)
    flags = {c.refers.broadcast for c in cspecs if c.refers.broadcast is not None}
    build = _maybe_broadcast(build, flags.pop() if len(flags) == 1 else None)
    probe = _rtrim_if_string(
        F.col(spec.according_column), _is_string(fact, spec.according_column)
    )
    joined = fact.join(build, probe == F.col(key), "left")
    for c, w in zip(cspecs, wanteds):
        value = F.col(w)
        if c.has_default and c.default is not None:
            value = F.coalesce(value, F.lit(c.default))
        joined = joined.withColumn(c.target, value)
    return joined.drop(key, *wanteds)


def apply_asof_refer(fact: DataFrame, cspec, resolve: Resolver) -> DataFrame:
    """Apply an ``asof_refer`` lookup (extension; no reference analogue):
    ``cspec.target`` takes the lookup table's ``wanted_column`` from the
    latest row with ``search_ts <= according_ts`` per key.  Miss ⇒
    ``default`` (J1-style coalesce).  Lookup rows sharing (key, search_ts)
    reduce to ``max(wanted)`` pre-join — deterministic like the other
    lookups' pinned dedup.  One shuffle on the key (union + window
    carry-forward, see ``operators/temporal.py``)."""
    from ..predicates import apply_conditions
    from .temporal import asof_join

    spec = cspec.asof_refer
    keys = list(spec.on)
    if cspec.target in fact.columns:
        # Match refer/refers overwrite semantics: the lookup result REPLACES
        # any same-named fact column.  Without this, asof_join would rename
        # the looked-up payload to '<target>_right' and the stale fact
        # column would silently win (ADVICE r1).  Overwrite by dropping the
        # fact column first — unless it feeds the join itself, which is an
        # unsatisfiable spec.
        if cspec.target in keys or cspec.target == spec.according_ts:
            from ..spec import SpecError

            raise SpecError(
                f"asof_refer target {cspec.target!r} collides with its own"
                f" join input (on/according_ts); rename the target"
            )
        fact = fact.drop(cspec.target)
    dim = resolve(spec.search_source, spec.search_table)
    dim = apply_conditions(dim, spec.conditions)
    dim = (
        dim.groupBy(*keys, spec.search_ts)
        .agg(F.max(spec.wanted_column).alias(cspec.target))
    )
    out = asof_join(
        fact, dim, keys,
        left_ts=spec.according_ts, right_ts=spec.search_ts,
        tolerance=spec.tolerance, bucket=spec.bucket,
    )
    if cspec.has_default and cspec.default is not None:
        out = out.withColumn(
            cspec.target, F.coalesce(F.col(cspec.target), F.lit(cspec.default))
        )
    return out
