"""Scalar/aggregate hook compilation.

The reference exposes four arbitrary-PHP-closure hook points
(DBT.php:395-407 ``function``; :295-299 ``pre_format``; :314-318
``format_wanted``; :265 ``processor``).  Closures are driver-side and
row-at-a-time — the slowest possible path on Spark.  Our spec therefore
accepts each hook in two forms:

1. **Spark SQL expression string** (preferred): stays JVM-side inside
   whole-stage codegen, fully Catalyst-optimizable.

   - ``function`` (P4): references source-row columns directly, e.g.
     ``"concat(name, '-', id)"``.
   - ``pre_format`` / ``format_wanted``: single-value transforms; the string
     uses the ``{value}`` placeholder, e.g. ``"trim({value})"`` or
     ``"split({value}, ',')"``.
   - ``processor`` (J3): an aggregate expression over the lookup table's
     columns, e.g. ``"sum(amount)"``.

2. **Python callable** (escape hatch, compiled to a UDF — row-at-a-time, keep
   out of hot paths).  Pass ``(callable, "return_type")`` to control the UDF
   return type; a bare callable defaults to string (matching the reference's
   stringly-typed temp columns, DBT.php:436-438).

   - ``function``: receives the source ``Row``.
   - ``pre_format`` / ``format_wanted``: receives the single value.
   - ``processor``: receives a list of ``Row`` (the group), like the
     reference's Collection argument.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..spec import Hook, SpecError

__all__ = [
    "split_hook",
    "value_hook_column",
    "row_hook_column",
    "processor_agg_column",
]

VALUE_PLACEHOLDER = "{value}"


def split_hook(hook: Any) -> tuple[Union[str, Callable], Optional[str]]:
    """Normalize ``hook`` or ``(hook, return_type)`` to a pair."""
    if isinstance(hook, tuple):
        if len(hook) != 2:
            raise SpecError(f"hook tuple must be (callable|str, return_type), got {hook!r}")
        return hook[0], hook[1]
    return hook, None


def _quote_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def value_hook_column(hook: Hook, input_sql_name: str) -> Column:
    """Compile a single-value hook (``pre_format``/``format_wanted``) applied
    to column ``input_sql_name`` of the enclosing DataFrame."""
    fn, rtype = split_hook(hook)
    if isinstance(fn, str):
        if VALUE_PLACEHOLDER not in fn:
            raise SpecError(
                f"value-hook expression must contain '{{value}}': {fn!r}"
            )
        return F.expr(fn.replace(VALUE_PLACEHOLDER, _quote_ident(input_sql_name)))
    if callable(fn):
        udf = F.udf(fn, rtype or StringType())
        return udf(F.col(input_sql_name))
    raise SpecError(f"hook must be an expression string or callable, got {fn!r}")


def row_hook_column(hook: Hook, df: DataFrame) -> Column:
    """Compile a row-wise ``function`` hook (P4/P5) against ``df``'s source
    columns.  Expression strings see the columns directly; callables get the
    whole ``Row`` (the reference passes the stdClass row, DBT.php:395-408)."""
    fn, rtype = split_hook(hook)
    if isinstance(fn, str):
        return F.expr(fn)
    if callable(fn):
        udf = F.udf(fn, rtype or StringType())
        return udf(F.struct(*[F.col(c) for c in df.columns]))
    raise SpecError(f"function hook must be an expression string or callable, got {fn!r}")


def processor_agg_column(hook: Hook, dim: DataFrame) -> Column:
    """Compile a J3 ``processor`` to an aggregate Column usable in
    ``dim.groupBy(key).agg(...)``.

    Expression strings (e.g. ``"sum(amount)"``) stay JVM-side — the fast path.
    Callables receive the group's rows as a list (mirroring the reference's
    Collection, DBT.php:265) via ``collect_list(struct(*))`` + UDF — correct
    but memory-bound per group; prefer expressions at scale.
    """
    fn, rtype = split_hook(hook)
    if isinstance(fn, str):
        return F.expr(fn)
    if callable(fn):
        udf = F.udf(fn, rtype or StringType())
        return udf(F.collect_list(F.struct(*[F.col(c) for c in dim.columns])))
    raise SpecError(f"processor must be an expression string or callable, got {fn!r}")
