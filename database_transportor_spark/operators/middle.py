"""Many-to-many middle operator (M1/M2, SURVEY §2.5; DBT.php:448-505).

The reference builds a junction table from a denormalized CSV column by
scanning the "one" side in chunks and issuing **one query per row** against
the "many" side (DBT.php:490-491).  Spark-first re-expression: explode the
split CSV and do a single distributed inner join — identical output, no
per-row round trips, scales with partitions.

Semantics preserved:

- M2 skip-empty: one-side rows whose according value is NULL/empty produce no
  junction rows (DBT.php:484-486).
- ``pre_format`` turns the according value into a list (README.md:349 splits
  on ","); our default when absent is ``split(trim(value), ',')``.  An
  expression hook must return an array; a callable gets the raw value and
  returns a list of strings.
- ``search_method`` generalizes the reference's ``queryComposer`` call
  (DBT.php:491): ``"in"`` (the documented usage) ⇒ explode + equi-join;
  scalar comparison ops ⇒ non-equi join on the un-exploded value.
- Exploded string keys are cast to the many-side search column's type before
  the join (PDO compares stringly; Spark needs the cast to keep the join an
  equi-join instead of a double-cast comparison).
- v0 bug not reproduced: the reference scans the one side on the **target**
  link even when ``refer_source == "original"`` (DBT.php:463-464); we honor
  the declared source per side, as the README documents.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..functions.hooks import split_hook, value_hook_column
from ..predicates import apply_conditions
from ..spec import MapSpec, SpecError

__all__ = ["build_middle"]

Resolver = Callable[[str, str], DataFrame]


def build_middle(mspec: MapSpec, resolve: Resolver) -> DataFrame:
    mid = mspec.middle
    one, many = mid.one, mid.many

    one_df = apply_conditions(resolve(one.refer_source, one.refer_table), one.conditions)
    many_df = apply_conditions(resolve(many.refer_source, many.refer_table), many.conditions)

    acc = one.according_column
    # M2: drop empty/NULL according values (no junction rows).
    acc_str = F.col(acc).cast("string")
    one_df = one_df.filter(F.col(acc).isNotNull() & (F.trim(acc_str) != ""))

    method = many.search_method
    if one.pre_format is not None:
        fn, rtype = split_hook(one.pre_format)
        if isinstance(fn, str):
            values = value_hook_column(one.pre_format, acc)
        else:
            values = F.udf(fn, rtype or ArrayType(StringType()))(F.col(acc))
    elif method in ("in", "between", "notbetween"):
        # list-valued probe: the documented CSV-split default (README.md:349)
        values = F.split(F.trim(acc_str), ",")
    else:
        # scalar comparison: probe with the raw according value
        values = F.col(acc)
    one_fill = F.col(one.wanted_column).alias(one.fill_column)

    if method == "in":
        exploded = one_df.select(one_fill, F.explode(values).alias("__mk"))
        # Drop empty fragments a trailing comma would produce.
        exploded = exploded.filter(F.trim("__mk") != "")
        search_type = many_df.schema[many.search_column].dataType
        probe = F.trim(F.col("__mk")).cast(search_type)
        joined = exploded.join(many_df, probe == many_df[many.search_column], "inner")
    elif method in ("=", ">", "<", "<>", "!=", "like", "between", "notbetween"):
        probed = one_df.select(one_fill, values.alias("__mv"))
        col = many_df[many.search_column]
        p = F.col("__mv")
        if method == "=":
            cond = col == p
        elif method == ">":
            cond = col > p
        elif method == "<":
            cond = col < p
        elif method in ("<>", "!="):
            cond = col != p
        elif method == "like":
            cond = F.like(col, p)  # pattern comes from data, so Column form
        else:
            lo, hi = p.getItem(0), p.getItem(1)
            cond = col.between(lo, hi)
            if method == "notbetween":
                cond = ~cond
        joined = probed.join(many_df, cond, "inner")
    else:
        raise SpecError(f"middle search_method {method!r} not supported")

    return joined.select(
        F.col(one.fill_column),
        F.col(many.wanted_column).alias(many.fill_column),
    )
