"""Condition → Spark Column compiler.

Re-implements the reference's structured condition compiler
(``queryComposer``, DBT.php:357-388) as a pure function producing Spark
``Column`` expressions, so Catalyst can push the predicates into the scan
(parquet/JDBC) — the Spark-native version of the reference's genuine
predicate pushdown (F1, DBT.php:145-153).

Semantics preserved exactly:

- NULL-aware equality (F3b, DBT.php:366-374): ``["c", "=", None]`` compiles to
  ``c IS NULL``; ``<>``/``!=`` with None to ``c IS NOT NULL``; ``>``/``<``
  with None raises.  (A naive ``col == lit(None)`` would yield no rows under
  three-valued SQL logic — this must be explicit.)
- op tokens are case-insensitive with spaces stripped (DBT.php:358).
- ``between``/``notbetween`` take a two-element list, inclusive bounds.
- Raw string conditions (F2, DBT.php:147-148) go through ``F.expr`` verbatim.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .spec import Condition, SpecError

__all__ = ["compile_condition", "compile_conditions", "apply_conditions"]


def _binary(col: Column, op: str, value: Any) -> Column:
    if value is None:
        # F3b — NULL-aware comparison (DBT.php:366-374).
        if op == "=":
            return col.isNull()
        if op in ("<>", "!="):
            return col.isNotNull()
        raise SpecError(f"cannot compare with NULL using {op!r} (reference throws too)")
    if op == "=":
        return col == F.lit(value)
    if op == ">":
        return col > F.lit(value)
    if op == "<":
        return col < F.lit(value)
    if op in ("<>", "!="):
        return col != F.lit(value)
    raise AssertionError(op)


def _range_pair(value: Any, op: str) -> tuple[Any, Any]:
    if not isinstance(value, (list, tuple)) or len(value) != 2:
        raise SpecError(f"{op} needs a two-element [lo, hi] list, got {value!r}")
    return value[0], value[1]


def compile_condition(cond: Condition, column_resolver=F.col) -> Column:
    """Compile one :class:`Condition` to a Spark boolean Column.

    ``column_resolver`` maps a column name to a ``Column`` (defaults to
    ``F.col``; lookup operators pass a resolver bound to their dimension
    DataFrame so conditions hit the right side of a join).
    """
    if cond.is_raw:
        return F.expr(cond.raw)
    col = column_resolver(cond.column)
    op = cond.op
    if op in ("=", ">", "<", "<>", "!="):
        return _binary(col, op, cond.value)
    if op == "like":
        return col.like(cond.value)
    if op == "notlike":
        # Reference interpolates into raw SQL (DBT.php:380) — an injection
        # hazard we do not reproduce; a parameterized NOT LIKE is equivalent.
        return ~col.like(cond.value)
    if op == "in":
        return col.isin(list(cond.value))
    if op == "notin":
        # SQL NOT IN semantics: NULL probe values drop out — `~isin` matches.
        return ~col.isin(list(cond.value))
    if op == "between":
        lo, hi = _range_pair(cond.value, op)
        return col.between(F.lit(lo), F.lit(hi))
    if op == "notbetween":
        lo, hi = _range_pair(cond.value, op)
        return ~col.between(F.lit(lo), F.lit(hi))
    raise SpecError(f"unsupported condition op {op!r}")


def compile_conditions(conds: Iterable[Condition], column_resolver=F.col) -> Column | None:
    """AND-fold a condition list (reference chains ``where`` calls, which
    Laravel ANDs — DBT.php:145-153). Returns None for an empty list."""
    acc: Column | None = None
    for cond in conds:
        c = compile_condition(cond, column_resolver)
        acc = c if acc is None else (acc & c)
    return acc


def apply_conditions(df: DataFrame, conds: Iterable[Condition]) -> DataFrame:
    pred = compile_conditions(conds, df.__getitem__)
    return df if pred is None else df.filter(pred)
