"""Projection / scalar-transform operators (P1-P6, SURVEY §2.2).

The reference assembles its insert buffer column-at-a-time per chunk
(DBT.php:172-207,390-421); here the whole per-map pipeline is one declarative
projection over the source DataFrame — Catalyst prunes the scan to exactly the
referenced source columns (strictly better than the reference's ``SELECT *``
main scan, DBT.php:171).

Semantics implemented:

- P1 rename (DBT.php:176-177): ``"new" => "old"``.
- P2 constant injection (DBT.php:179-180,416-421): define that is only
  ``{"default": v}``.
- P3 null-coalescing default (DBT.php:391,405,407,410): with ``original``
  present, ``default`` substitutes when the source value — or the transform
  result — is NULL.
- P4 row transform (DBT.php:395-408): ``function`` sees the whole source row.
- P5 multi-output transform (DBT.php:396-405): a ``function`` returning a
  dict additionally fills other target columns through ``affection`` entries;
  the main column takes ``result[original] ?? default``.
- P6 skip (DBT.php:173-175): empty defines are ignored (middle maps fill them).

Lookup columns (refer/refers/asof_refer) are deliberately NOT handled here — they join
against target columns this projection produces (e.g. staging columns,
README.md:206-210) and are applied afterwards by ``operators/refer.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StructType

from ..functions.hooks import row_hook_column
from ..spec import ColumnSpec, MapSpec

__all__ = ["apply_projection", "output_columns"]


def _with_default(col: Column, cspec: ColumnSpec) -> Column:
    if cspec.has_default and cspec.default is not None:
        return F.coalesce(col, F.lit(cspec.default))
    return col


def _result_key(df: DataFrame, tmp: str, key: str) -> Column:
    """Pull ``key`` out of a P5 function result (struct or map)."""
    dtype = df.schema[tmp].dataType
    if isinstance(dtype, StructType):
        return F.col(tmp).getField(key)
    if isinstance(dtype, MapType):
        return F.col(tmp).getItem(key)
    raise TypeError(
        f"function with affection must return a struct or map, got {dtype.simpleString()}"
    )


def apply_projection(df: DataFrame, mspec: MapSpec) -> DataFrame:
    """Add every non-lookup target column of ``mspec`` to ``df``.

    Source columns are kept (dropped by the engine's final select) so that
    later lookup joins and ``function`` hooks of other columns can still see
    them.  Returns the augmented DataFrame.
    """
    # Stage 1 — materialize P4/P5 function results once each, so affections
    # and the main column share a single computation (important for UDFs).
    fn_cols: dict[str, str] = {}
    stage1: list[Column] = []
    for c in mspec.columns:
        if c.skip or c.refer or c.refers or c.asof_refer:
            continue
        if c.function is not None:
            tmp = f"__fn_{c.target}"
            fn_cols[c.target] = tmp
            stage1.append(row_hook_column(c.function, df).alias(tmp))
    if stage1:
        df = df.select("*", *stage1)

    # Stage 2 — assemble target columns.
    out: list[tuple[str, Column]] = []
    for c in mspec.columns:
        if c.skip or c.refer or c.refers or c.asof_refer:
            continue
        if c.function is not None:
            tmp = fn_cols[c.target]
            if c.affection:
                # P5: main column = result[original] ?? default; affections
                # copy result[source_key] into their target columns.
                if c.original is None:
                    raise ValueError(
                        f"column {c.target!r}: affection requires 'original' as the "
                        "main result key (DBT.php:405)"
                    )
                out.append((c.target, _with_default(_result_key(df, tmp, c.original), c)))
                for aff in c.affection:
                    out.append((aff.target_column, _result_key(df, tmp, aff.source_key)))
            else:
                out.append((c.target, _with_default(F.col(tmp), c)))
        elif c.original is not None:
            out.append((c.target, _with_default(F.col(c.original), c)))
        else:
            # P2: constant injection.
            out.append((c.target, F.lit(c.default)))

    existing = set(df.columns)
    result = df
    for name, col in out:
        result = result.withColumn(name, col)
        existing.add(name)
    if fn_cols:
        result = result.drop(*fn_cols.values())
    return result


def output_columns(mspec: MapSpec, available) -> list[str]:
    """Final sink column list: define order, minus staging columns (X5 —
    dropped before the write) and skips that nothing filled; columns a
    ``post_ops`` stage added (quality scores, language tags, ...) follow in
    DataFrame order when ``available`` is ordered."""
    avail = list(available)
    avail_set = set(avail)
    cols = []
    for c in mspec.columns:
        if c.delete_after_transport:
            continue
        if c.skip and c.target not in avail_set:
            continue
        if c.target in avail_set:
            cols.append(c.target)
    declared = {c.target for c in mspec.columns}
    cols += [c for c in avail if c not in declared]
    return cols
