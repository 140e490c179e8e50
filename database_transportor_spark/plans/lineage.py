"""Column-level lineage from the declarative spec — pure metadata.

A migration tool's spec already IS the lineage graph; this module walks
``MapSpec``/``ColumnSpec`` and emits one record per output column saying
where its value comes from (rename, constant, expression, lookup,
aggregate, as-of, affection, middle side) and which upstream
``side.table.column`` feeds it.  No SparkSession involved — lineage is
available before anything runs, which is exactly when a reviewer wants
it.

Record shape::

    {"map": key, "table": target_table, "column": out_col,
     "kind": rename|constant|expression|refer|refers|asof_refer|
             affection|middle|skip,
     "sources": ["side.table.column", ...],   # upstream feeds
     "detail": human-readable one-liner,
     "staging": bool}                          # dropped before write
"""

from __future__ import annotations

from typing import Any

from ..spec import MapSpec, SIDE_ORIGINAL

__all__ = ["column_lineage", "format_lineage"]


def _src(side: str, table: str, column: str | None = None) -> str:
    return f"{side}.{table}" + (f".{column}" if column else "")


def column_lineage(specs: dict[str, MapSpec]) -> list[dict[str, Any]]:
    """Lineage records for every output column of every map, in spec
    order.  ``specs`` is ``DBT.specs`` (or ``parse_maps(...)``)."""
    out: list[dict[str, Any]] = []
    for key, m in specs.items():
        if m.middle is not None:
            for side_name, side in (("one", m.middle.one), ("many", m.middle.many)):
                detail = (
                    f"{side_name}-side fill from "
                    f"{_src(side.refer_source, side.refer_table, side.wanted_column)}"
                )
                if side.according_column:
                    detail += f" exploded from CSV column {side.according_column!r}"
                out.append({
                    "map": key, "table": m.target_table,
                    "column": side.fill_column, "kind": "middle",
                    "sources": [
                        _src(side.refer_source, side.refer_table, side.wanted_column)
                    ] + (
                        [_src(SIDE_ORIGINAL, m.original_table, side.according_column)]
                        if side.according_column and m.original_table else []
                    ),
                    "detail": detail, "staging": False,
                })
            continue

        src_table = m.original_table or "?"
        for c in m.columns:
            rec: dict[str, Any] = {
                "map": key, "table": m.target_table, "column": c.target,
                "staging": c.delete_after_transport,
            }
            if c.skip:
                rec.update(kind="skip", sources=[],
                           detail="declared empty (filled by a middle map "
                                  "or intentionally absent)")
            elif c.refer is not None:
                r = c.refer
                rec.update(
                    kind="refer",
                    sources=[
                        _src(r.search_source, r.search_table, r.wanted_column),
                        *[
                            _src(SIDE_ORIGINAL, src_table, a)
                            for a in r.according_column
                        ],
                    ],
                    detail=(
                        f"lookup {r.wanted_column} from "
                        f"{_src(r.search_source, r.search_table)} where "
                        f"{list(r.search_column)} = {list(r.according_column)}"
                        + (f"; miss => {c.default!r}" if c.has_default else
                           ("; miss => NULL" if r.is_multi else ""))
                    ),
                )
            elif c.refers is not None:
                r = c.refers
                rec.update(
                    kind="refers",
                    sources=[
                        _src(r.search_source, r.search_table),
                        _src(SIDE_ORIGINAL, src_table, r.according_column),
                    ],
                    detail=(
                        f"aggregate {r.processor!r} over "
                        f"{_src(r.search_source, r.search_table)} grouped by "
                        f"{r.search_column}"
                        + (f"; miss => {c.default!r}" if c.has_default else "")
                    ),
                )
            elif c.asof_refer is not None:
                r = c.asof_refer
                rec.update(
                    kind="asof_refer",
                    sources=[
                        _src(r.search_source, r.search_table, r.wanted_column),
                        _src(SIDE_ORIGINAL, src_table, r.according_ts),
                        *[_src(SIDE_ORIGINAL, src_table, k) for k in r.on],
                    ],
                    detail=(
                        f"latest {r.wanted_column} from "
                        f"{_src(r.search_source, r.search_table)} with "
                        f"{r.search_ts} <= {r.according_ts} on {list(r.on)}"
                        + (f" within {r.tolerance}" if r.tolerance else "")
                    ),
                )
            elif c.function is not None:
                fn = (
                    c.function if isinstance(c.function, str)
                    else getattr(c.function, "__name__", "<callable>")
                )
                rec.update(
                    kind="expression",
                    sources=(
                        [_src(SIDE_ORIGINAL, src_table, c.original)]
                        if c.original else []
                    ),
                    detail=f"computed by {fn!r}"
                    + (f" over {c.original!r}" if c.original else ""),
                )
            elif c.original is not None:
                rec.update(
                    kind="rename",
                    sources=[_src(SIDE_ORIGINAL, src_table, c.original)],
                    detail=f"renamed from {c.original!r}"
                    + (f"; NULL => {c.default!r}" if c.has_default else ""),
                )
            else:
                rec.update(
                    kind="constant", sources=[],
                    detail=f"constant {c.default!r}",
                )
            out.append(rec)
            for a in c.affection:
                out.append({
                    "map": key, "table": m.target_table,
                    "column": a.target_column, "kind": "affection",
                    "sources": rec["sources"],
                    "detail": (
                        f"secondary output {a.source_key!r} of the "
                        f"multi-output transform feeding {c.target!r}"
                    ),
                    "staging": False,
                })
    return out


def format_lineage(records: list[dict[str, Any]]) -> str:
    """Human-readable text block, one line per column, grouped by map."""
    lines: list[str] = []
    current = None
    for r in records:
        head = (r["map"], r["table"])
        if head != current:
            current = head
            lines.append(f"{r['map']} -> {r['table']}")
        flag = " [staging]" if r["staging"] else ""
        srcs = ", ".join(r["sources"]) or "-"
        lines.append(
            f"  {r['column']:<24} {r['kind']:<10} {srcs}{flag}"
        )
        lines.append(f"  {'':<24} {'':<10} {r['detail']}")
    return "\n".join(lines)
