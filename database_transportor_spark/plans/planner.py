"""Execution planner: dependency DAG over map specs (X1-X4, SURVEY §2.9).

The reference resolves dependencies at runtime by *recursing* into
``transporter`` whenever a lookup needs a not-yet-migrated target table
(DBT.php:184-186,456-459), guarded by a ``safety`` depth cap (X3,
DBT.php:56,114-118).  We resolve the same graph **before execution** with a
topological sort — cycles become errors up front, each map is planned exactly
once (the reference's ``finished`` memoization, DBT.php:122,221), and
seed-first ordering (X4, DBT.php:571-599) falls out naturally: maps with no
in-edges sort first.

Dependency edges:

- ``transport_after`` (X2, DBT.php:125-127): explicit edge.
- a ``refer``/``refers`` with ``search_source == "target"`` whose
  ``search_table`` is produced by another map (J4).
- a ``middle`` side with ``refer_source == "target"`` whose ``refer_table``
  is produced by another map.

Target-side tables *not* produced by any map are **seed tables** — assumed
pre-populated, validated non-empty before execution (S6, DBT.php:512-518).
"""

from __future__ import annotations

from graphlib import CycleError, TopologicalSorter

from ..spec import MapSpec, SpecError, SIDE_TARGET

__all__ = ["produced_tables", "dependency_edges", "seed_tables", "topo_order"]


def produced_tables(specs: dict[str, MapSpec]) -> dict[str, str]:
    """Map of produced table name → producing map key.  Both the logical map
    key and the physical ``target_table`` name resolve (S4)."""
    produced: dict[str, str] = {}
    for key, m in specs.items():
        produced[key] = key
        produced[m.target_table] = key
    return produced


def _target_lookups(m: MapSpec):
    """Yield (side, table) pairs the map reads from the target side."""
    for c in m.columns:
        for spec in (c.refer, c.refers, c.asof_refer):
            if spec is not None and spec.search_source == SIDE_TARGET:
                yield spec.search_table
    if m.middle is not None:
        for side in (m.middle.one, m.middle.many):
            if side.refer_source == SIDE_TARGET:
                yield side.refer_table


def dependency_edges(specs: dict[str, MapSpec]) -> dict[str, set[str]]:
    """``{map_key: set of map_keys that must run first}``."""
    produced = produced_tables(specs)
    deps: dict[str, set[str]] = {k: set() for k in specs}
    for key, m in specs.items():
        for after in m.transport_after:
            if after not in specs:
                raise SpecError(
                    f"map {key!r}: transport_after {after!r} is not a map"
                )
            deps[key].add(after)
        for table in _target_lookups(m):
            dep_key = produced.get(table)
            if dep_key is not None and dep_key != key:
                deps[key].add(dep_key)
    return deps


def seed_tables(specs: dict[str, MapSpec]) -> set[str]:
    """Target-side lookup tables produced by no map — must pre-exist."""
    produced = produced_tables(specs)
    seeds: set[str] = set()
    for m in specs.values():
        for table in _target_lookups(m):
            if table not in produced:
                seeds.add(table)
    return seeds


def topo_order(specs: dict[str, MapSpec]) -> list[str]:
    """Map keys in execution order; cycles raise :class:`SpecError` (X3 —
    the reference only catches runaway recursion at depth ``safety``)."""
    deps = dependency_edges(specs)
    try:
        order = list(TopologicalSorter(deps).static_order())
    except CycleError as e:
        raise SpecError(f"dependency cycle between maps: {e.args[1]}") from None
    # static_order yields dependencies first — exactly execution order.
    return order
