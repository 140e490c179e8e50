"""CLI — the Spark-native equivalent of the reference's artisan commands.

X8 (``php artisan transport {--class=}``, TransportCommand.php:17,31-45):
``python -m database_transportor_spark transport --spec FILE [--mode ...]``
loads a Python spec module and runs :meth:`DBT.do_transport`.

X9 (``php artisan make:transportor Name``, CreateCommand.php:17,35-59 and
the two ``*.temp`` templates): ``python -m database_transportor_spark make
Name [--dir d]`` renders a spec-file template — the same scaffold-first
workflow, emitting a Python module instead of a PHP class.

Spec-module contract (the rendered template documents it inline)::

    MAPS = {...}                    # the declarative map (= reference $maps)
    ORIGINAL = {"kind": "parquet", "root": "/data/original"}
    TARGET = {"kind": "jdbc", "url": "jdbc:...", "properties": {...}}
    MODE = "append"                 # optional; write mode
    SEEDS = []                      # optional; extra seed tables (S6)
    PRELOAD = {}                    # optional; {"original": [tables]} (S5)
    INCREMENTAL = {}                # optional; {"map_key": "cursor_col"} —
                                    #   watermark-based incremental appends
    MERGE_KEYS = {}                 # optional; {"map_key": "key_col"} —
                                    #   with INCREMENTAL: fresh rows UPSERT
                                    #   into the live target (updates
                                    #   propagate) instead of appending
    STAGED = False                  # optional; all-tables staging swap (X7)
    VALIDATE = {}                   # optional; {"map_key": [rules]} — data-
                                    #   quality gate (operators/validate.py
                                    #   vocabulary) checked before writes;
                                    #   violations abort the run
    SPARK = {"spark.sql.shuffle.partitions": "200"}   # optional conf

Multiple ``--spec`` files run in order — the equivalent of the reference's
main ``Transportor`` fanning out over registered transportor classes
(TransportorTemp.temp:9-32).

Beyond reference parity: ``explain --spec FILE [--map NAME] [--audit-only]
[--strict]`` prints each map's formatted physical plan WITHOUT writing,
plus a one-line audit (shuffle count, broadcast vs sort-merge joins,
codegen spans, pushed filters, cartesian products).  Exit code is nonzero
when a plan contains a cartesian/nested-loop join (always) or a scan with
no pushed filters (``--strict``) — wire it into CI to catch plan
regressions before they reach a 1000-executor cluster.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import re
import sys
from typing import Any

__all__ = ["main"]

_TEMPLATE = '''"""Transportor spec: {name}.

Run with::

    python -m database_transportor_spark transport --spec {path}
"""

# Declarative map — identical vocabulary to the reference package:
# columns (rename / default / function / affection), extra_conditions,
# refer / refers lookups, middle junction maps, transport_after, order.
MAPS = {{
    "{snake}": {{
        "original_table": "{snake}",
        # "target_table": "{snake}",        # optional physical-name override
        # "extra_conditions": [["col", "=", 1], "raw_sql > 0"],
        "columns": {{
            "id": "id",
            # "renamed": "source_col",
            # "constant": {{"default": "value"}},
            # "computed": {{"original": "col", "function": "upper(col)"}},
            # "looked_up": {{
            #     "refer": {{
            #         "search_source": "original",
            #         "search_table": "dim",
            #         "search_column": "key",
            #         "according_column": "fk",
            #         "wanted_column": "name",
            #     }},
            #     "default": "unknown",
            # }},
        }},
    }},
}}

# One catalog per side: {{"kind": "parquet", "root": dir}} or
# {{"kind": "jdbc", "url": ..., "properties": {{...}},
#   "partition_options": {{"table": {{"partitionColumn": ..., ...}}}}}}
ORIGINAL = {{"kind": "parquet", "root": "/path/to/original"}}
TARGET = {{"kind": "parquet", "root": "/path/to/target"}}

MODE = "append"
'''


def _load_module(path: str):
    spec = importlib.util.spec_from_file_location(
        os.path.splitext(os.path.basename(path))[0], path
    )
    if spec is None or spec.loader is None:
        raise SystemExit(f"cannot load spec file: {path}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_catalog(spark, conf: dict[str, Any]):
    from .sources.catalog import JDBCCatalog, ParquetCatalog

    kind = conf.get("kind", "parquet")
    if kind == "parquet":
        return ParquetCatalog(spark, conf["root"], suffix=conf.get("suffix", ".parquet"))
    if kind == "versioned":
        from .sources.versioned import VersionedCatalog

        return VersionedCatalog(
            spark, conf["root"], format=conf.get("format", "parquet")
        )
    if kind in ("csv", "json", "orc", "file"):
        from .sources.catalog import FileCatalog

        return FileCatalog(
            spark,
            conf["root"],
            format=conf.get("format", kind if kind != "file" else "parquet"),
            suffix=conf.get("suffix"),
            read_options=conf.get("read_options"),
            write_options=conf.get("write_options"),
        )
    if kind == "jdbc":
        return JDBCCatalog(
            spark,
            conf["url"],
            properties=conf.get("properties"),
            fetchsize=conf.get("fetchsize", 10_000),
            batchsize=conf.get("batchsize", 10_000),
            partition_options=conf.get("partition_options"),
        )
    raise SystemExit(f"unknown catalog kind: {kind!r}")


def _cmd_transport(args: argparse.Namespace) -> int:
    from .engine import DBT
    from .session import build_session

    mods = [_load_module(p) for p in args.spec]
    extra: dict[str, str] = {}
    for mod in mods:
        extra.update(getattr(mod, "SPARK", {}))
    spark = build_session(master=args.master, extra_conf=extra)

    for mod, path in zip(mods, args.spec):
        eng = DBT(
            mod.MAPS,
            target=_build_catalog(spark, mod.TARGET),
            original=_build_catalog(spark, mod.ORIGINAL),
            preload=getattr(mod, "PRELOAD", None),
        )
        seeds = getattr(mod, "SEEDS", None)
        if seeds:
            eng.set_seed(seeds)
        incremental = getattr(mod, "INCREMENTAL", None)
        merge_keys = getattr(mod, "MERGE_KEYS", None)
        staged = bool(getattr(mod, "STAGED", False)) or args.staged
        validate = getattr(mod, "VALIDATE", None)
        if incremental and merge_keys:
            outputs = eng.do_merge_transport(
                incremental, merge_keys, validate=validate,
                parallelism=args.parallel,
            )
        elif incremental:
            outputs = eng.do_incremental_transport(
                incremental, staged=staged, validate=validate,
                parallelism=args.parallel,
            )
        else:
            mode = args.mode or getattr(mod, "MODE", "append")
            outputs = eng.do_transport(
                mode=mode, staged=staged, validate=validate,
                parallelism=args.parallel,
            )
        print(f"{path}: transported {len(outputs)} table(s): {sorted(outputs)}")
    return 0


def _explain_string(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _audit_plan(text: str) -> dict[str, Any]:
    """Compact plan audit over the formatted explain output — the checks
    ``tests/test_plan_audit.py`` applies to the harness queries, surfaced
    as an operator-facing command: is the filter at the scan, is the small
    side broadcast, how many shuffles will this cost, did anything
    degenerate into a cross join."""
    # formatted explain prints every node twice (tree + detail section);
    # count the detail headers "(<id>) <NodeName>" so each node counts once
    nodes = re.findall(r"^\(\d+\) ([A-Za-z]+)", text, re.M)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    return {
        "shuffles": sum(1 for n in nodes if n == "Exchange"),
        "broadcast_joins": sum(1 for n in nodes if n == "BroadcastHashJoin"),
        "sortmerge_joins": sum(1 for n in nodes if n == "SortMergeJoin"),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", text))),
        "pushed_filters": sum(1 for p in pushed if p.strip()),
        "scans_without_pushdown": sum(1 for p in pushed if not p.strip()),
        "cartesian": sum(
            1
            for n in nodes
            if n in ("CartesianProduct", "BroadcastNestedLoopJoin")
        ),
    }


def _cmd_explain(args: argparse.Namespace) -> int:
    from .engine import DBT
    from .session import build_session

    mods = [_load_module(p) for p in args.spec]
    extra: dict[str, str] = {}
    for mod in mods:
        extra.update(getattr(mod, "SPARK", {}))
    spark = build_session(master=args.master, extra_conf=extra)

    bad = 0
    for mod, path in zip(mods, args.spec):
        eng = DBT(
            mod.MAPS,
            target=_build_catalog(spark, mod.TARGET),
            original=_build_catalog(spark, mod.ORIGINAL),
            preload=getattr(mod, "PRELOAD", None),
        )
        outputs = eng.transform()
        for name in sorted(outputs):
            if args.map and name not in args.map:
                continue
            text = _explain_string(outputs[name])
            audit = _audit_plan(text)
            print(f"== {path} :: {name} ==")
            if not args.audit_only:
                print(text)
            print(
                "audit: "
                + "  ".join(f"{k}={v}" for k, v in audit.items())
            )
            if audit["cartesian"]:
                print("audit: FAIL — cartesian/nested-loop join in plan")
                bad += 1
            if audit["scans_without_pushdown"] and args.strict:
                print("audit: FAIL — scan without pushed filters (--strict)")
                bad += 1
    return 1 if bad else 0


def _cmd_validate(args: argparse.Namespace) -> int:
    """Run a spec module's VALIDATE rules against the LIVE target tables
    (no transport) — the "test my warehouse" entry point.  Exit nonzero
    when any rule has violations."""
    from .session import build_session

    mods = [_load_module(p) for p in args.spec]
    extra: dict[str, str] = {}
    for mod in mods:
        extra.update(getattr(mod, "SPARK", {}))
    spark = build_session(master=args.master, extra_conf=extra)

    from .engine import DBT
    from .operators.validate import validate as run_rules

    bad = 0
    for mod, path in zip(mods, args.spec):
        rules_by_map = getattr(mod, "VALIDATE", None) or {}
        if not rules_by_map:
            print(f"{path}: no VALIDATE rules declared")
            continue
        eng = DBT(
            mod.MAPS,
            target=_build_catalog(spark, mod.TARGET),
            original=_build_catalog(spark, mod.ORIGINAL),
        )
        for key, rules in rules_by_map.items():
            table = eng.specs[key].target_table
            df = eng.target.read(table)
            for r in run_rules(df, eng._resolve_rules(rules)).collect():
                status = "FAIL" if r["n_violations"] else "ok"
                print(
                    f"{path} :: {table} :: {r['rule']}({r['target']})"
                    f" = {r['n_violations']}  {status}"
                )
                if r["n_violations"]:
                    bad += 1
    return 1 if bad else 0


def _cmd_diff(args: argparse.Namespace) -> int:
    """Post-transport parity report — the migration-validation question a
    reference user asks first: does the LIVE target still equal what the
    spec produces from the ORIGINAL side?  Recomputes each map's frame
    (no writes) and key-diffs it against the live table
    (``operators/mutations.diff_tables``).  Exit nonzero on any drift.

    Key columns come from the spec module's ``DIFF_KEYS = {map: [cols]}``,
    or ``--map NAME --keys col1,col2`` for a one-off.
    """
    from .engine import DBT
    from .operators.mutations import diff_tables
    from .session import build_session

    mods = [_load_module(p) for p in args.spec]
    extra: dict[str, str] = {}
    for mod in mods:
        extra.update(getattr(mod, "SPARK", {}))
    spark = build_session(master=args.master, extra_conf=extra)

    from pyspark.sql import functions as F

    drift = 0
    for mod, path in zip(mods, args.spec):
        keys_by_map = dict(getattr(mod, "DIFF_KEYS", None) or {})
        if args.map:
            if args.keys:
                override = {args.map: args.keys.split(",")}
            elif args.map in keys_by_map:
                override = {args.map: keys_by_map[args.map]}
            else:
                # scoped restriction, not an error: with several --spec
                # modules the named map may live in another one
                print(f"{path}: map {args.map!r} not in DIFF_KEYS — skipped")
                continue
            keys_by_map = override
        if not keys_by_map:
            print(f"{path}: no DIFF_KEYS declared (or pass --map/--keys)")
            continue
        eng = DBT(
            mod.MAPS,
            target=_build_catalog(spark, mod.TARGET),
            original=_build_catalog(spark, mod.ORIGINAL),
        )
        if args.map and args.map not in eng.specs:
            print(f"{path}: map {args.map!r} not in this spec — skipped")
            continue
        outputs = eng.transform()
        for key, ks in keys_by_map.items():
            if key not in eng.specs:
                raise SystemExit(f"{path}: DIFF_KEYS names unknown map {key!r}")
            ks = [ks] if isinstance(ks, str) else list(ks)
            table = eng.specs[key].target_table
            expected = outputs[key].select(*eng.write_columns(key))
            live = eng.target.read(table).select(*expected.columns)
            d = diff_tables(live, expected, ks)
            counts = {
                r["change_type"]: r["n"]
                for r in d.groupBy("change_type")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            missing = counts.get("added", 0)      # expected but absent
            extra_rows = counts.get("removed", 0)  # in target only
            changed = counts.get("changed", 0)
            total = missing + extra_rows + changed
            status = "DRIFT" if total else "ok"
            print(
                f"{path} :: {table}: missing={missing} extra={extra_rows} "
                f"changed={changed}  {status}"
            )
            if total:
                drift += 1
                if args.show:
                    d.show(args.show, truncate=False)
    return 1 if drift else 0


def _cmd_lineage(args: argparse.Namespace) -> int:
    """Column-level lineage straight from the spec — NO SparkSession, no
    reads: the declarative map already is the lineage graph, so the
    report is available before anything runs (code review, docs,
    impact analysis)."""
    import json as _json

    from .plans.lineage import column_lineage, format_lineage
    from .spec import parse_maps

    for path in args.spec:
        mod = _load_module(path)
        records = column_lineage(parse_maps(mod.MAPS))
        if args.json:
            for r in records:
                print(_json.dumps(r))
        else:
            print(f"# {path}")
            print(format_lineage(records))
    return 0


def _cmd_history(args: argparse.Namespace) -> int:
    # pure pointer/directory metadata — no SparkSession needed (or built)
    from .sources.versioned import VersionedCatalog

    cat = VersionedCatalog(None, args.root)
    hist = cat.history(args.table)
    if not hist:
        print(f"no versions for {args.root}/{args.table}")
        return 1
    import datetime as _dt

    for h in hist:
        mark = "  <- HEAD" if h["is_head"] else ""
        when = _dt.datetime.fromtimestamp(h["committed_at"]).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        note = f"  [{h['note']}]" if h["note"] else ""
        print(f"v{h['version']:08d}  {when}{note}{mark}")
    return 0


def _cmd_rollback(args: argparse.Namespace) -> int:
    # pure pointer move — no SparkSession needed (or built)
    from .sources.versioned import VersionedCatalog

    cat = VersionedCatalog(None, args.root)
    cat.rollback(args.table, args.version)
    print(f"{args.root}/{args.table} -> v{args.version:08d}")
    return 0


def _cmd_vacuum(args: argparse.Namespace) -> int:
    # directory removals only — no SparkSession needed (or built)
    from .sources.versioned import VersionedCatalog

    cat = VersionedCatalog(None, args.root)
    removed = cat.vacuum(args.table, keep=args.keep,
                         orphan_grace=args.orphan_grace)
    kept = cat.versions(args.table)
    print(
        f"{args.root}/{args.table}: removed "
        f"{len(removed)} version(s) {removed or ''}, kept {kept}"
    )
    return 0


def _cmd_pin(args: argparse.Namespace) -> int:
    # marker-file move only — no SparkSession needed (or built)
    from .sources.versioned import VersionedCatalog

    cat = VersionedCatalog(None, args.root)
    if args.unpin:
        cat.unpin_version(args.table, args.version)
    else:
        cat.pin_version(args.table, args.version)
    verb = "unpinned" if args.unpin else "pinned"
    print(f"{args.root}/{args.table}: {verb} v{args.version:08d} "
          f"(pinned now: {cat.pinned_versions(args.table)})")
    return 0


def _cmd_sql(args: argparse.Namespace) -> int:
    """Ad-hoc SQL over a catalog root: every table in the directory is
    registered as a temp view named after its file stem, then the query
    runs through ordinary Catalyst planning (pushdown, pruning, AQE).
    ``--explain`` prints the physical plan instead of rows; ``--limit``
    caps the rows fetched to the driver (0 = no cap — use for counts)."""
    import os as _os

    from .session import build_session

    spark = build_session(master=args.master)
    cat = _build_catalog(spark, _file_catalog_conf(args))
    suffix = ".versions" if args.format == "versioned" else (
        getattr(cat, "suffix", ".parquet") or ""
    )
    for entry in sorted(_os.listdir(args.root)):
        name = entry[: -len(suffix)] if suffix and entry.endswith(suffix) else None
        if not name or name.startswith(("_", ".")):
            continue
        cat.read(name).createOrReplaceTempView(name)
    df = spark.sql(args.query)
    if args.explain:
        print(_explain_string(df))
        return 0
    cols = df.columns
    # default path is bounded (--limit 1000); the explicit full-output
    # opt-out (--limit 0) streams partition-by-partition through
    # toLocalIterator so the driver holds ONE partition at a time, never
    # the whole result — a full collect() of an unbounded query is the
    # one driver-OOM the CLI could otherwise manufacture
    rows = df.limit(args.limit).collect() if args.limit else df.toLocalIterator()
    print("\t".join(cols))
    for r in rows:
        print("\t".join("" if r[c] is None else str(r[c]) for c in cols))
    return 0


def _file_catalog_conf(args: argparse.Namespace) -> dict:
    """CLI --format names the catalog KIND; "versioned" is a layout over
    parquet, not a Spark data-source format — never pass it as one."""
    fmt = "parquet" if args.format == "versioned" else args.format
    return {"kind": args.format, "root": args.root, "format": fmt}


def _cmd_compact(args: argparse.Namespace) -> int:
    from .operators.maintenance import compact_table
    from .session import build_session

    spark = build_session(master=args.master)
    cat = _build_catalog(spark, _file_catalog_conf(args))
    zcols = [c.strip() for c in args.zorder.split(",")] if args.zorder else None
    n = compact_table(
        cat, args.table, target_file_bytes=args.target_mb << 20,
        zorder_cols=zcols,
    )
    layout = f" (z-ordered by {','.join(zcols)})" if zcols else ""
    print(f"compacted {args.root}/{args.table} into {n} file(s){layout}")
    return 0


def _cmd_bm25_layout(args: argparse.Namespace) -> int:
    from .operators.text import bm25_index_layout
    from .session import build_session

    spark = build_session(master=args.master)
    cat = _build_catalog(spark, _file_catalog_conf(args))
    n = bm25_index_layout(cat, args.table, files=args.files)
    print(
        f"laid out {args.root}/{args.table} into {n} token-range-sorted "
        "file(s); stats= serves now skip files per query term"
    )
    return 0


def _cmd_export_shards(args: argparse.Namespace) -> int:
    from .operators.corpus import export_shards
    from .session import build_session

    spark = build_session(master=args.master)
    cat = _build_catalog(spark, _file_catalog_conf(args))
    man = export_shards(
        cat.read(args.table), args.dest, args.id_col, args.shards,
        seed=args.seed, hash_fn=args.hash_fn, token_col=args.token_col,
        mode="overwrite" if args.overwrite else "error",
    )
    rows = man.collect()  # one row per shard — bounded, CLI display
    total = sum(r["n_rows"] for r in rows)
    files = sum(r["n_files"] for r in rows)
    empties = args.shards - len(rows)
    note = f" ({empties} of {args.shards} shards empty)" if empties else ""
    print(
        f"exported {total} row(s) from {args.root}/{args.table} into "
        f"{len(rows)} non-empty shard(s) / {files} file(s) at "
        f"{args.dest} (seed={args.seed}, {args.hash_fn}){note}"
    )
    for r in rows:
        toks = "" if r["n_tokens"] is None else f"  tokens={r['n_tokens']}"
        print(
            f"  shard={r['shard']}  rows={r['n_rows']}  "
            f"bytes={r['bytes']}  files={r['n_files']}{toks}  "
            f"checksum={r['id_checksum']}"
        )
    return 0


def _cmd_gate_maintain(args: argparse.Namespace) -> int:
    from .session import build_session
    from .streaming.dedup_gate import gate_maintain

    spark = build_session(master=args.master)
    cat = _build_catalog(spark, _file_catalog_conf(args))
    r = gate_maintain(
        spark, cat, args.index_table,
        centroid_table=args.centroid_table,
        clean_table=args.clean_table,
        compact_files=args.compact_files,
        retrain_at=args.retrain_at,
        force_retrain=args.force_retrain,
        retrain_target_rows=args.retrain_target_rows,
        retrain_sample=args.retrain_sample,
        reshard=args.reshard,
    )
    if r["retrained"]:
        print(f"retrained: {r['index_rows']} index rows, "
              f"k {r['k_before']} -> {r['k_after']}")
    elif args.retrain_at is not None or args.force_retrain:
        print(f"retrain not due ({r['index_rows']} index rows)")
    if r["resharded"]:
        print(f"resharded {args.index_table} to {args.reshard} shards")
    if r["files_before"] is not None:
        verb = "compacted" if r["compacted"] else "left"
        print(f"{verb} {args.index_table}: {r['files_before']} -> "
              f"{r['files_after']} data file(s)")
    return 0


def _cmd_profile(args: argparse.Namespace) -> int:
    from .operators.maintenance import profile_table
    from .session import build_session

    spark = build_session(master=args.master)
    cat = _build_catalog(spark, _file_catalog_conf(args))
    rows = profile_table(
        cat.read(args.table), exact_distinct=args.exact
    ).collect()
    w = max(len(r["column"]) for r in rows)
    print(f"{'column':{w}}  {'dtype':10}  {'rows':>10}  {'nulls':>8}  "
          f"{'distinct':>10}  min..max")
    for r in rows:
        print(
            f"{r['column']:{w}}  {r['dtype']:10}  {r['n_rows']:>10}  "
            f"{r['n_nulls']:>8}  {r['n_distinct']:>10}  "
            f"{r['min_value']}..{r['max_value']}"
        )
    return 0


def _cmd_make(args: argparse.Namespace) -> int:
    snake = re.sub(r"(?<!^)(?=[A-Z])", "_", args.name).lower()
    os.makedirs(args.dir, exist_ok=True)
    path = os.path.join(args.dir, f"{snake}.py")
    if os.path.exists(path) and not args.force:
        raise SystemExit(f"{path} already exists (use --force to overwrite)")
    with open(path, "w") as f:
        f.write(_TEMPLATE.format(name=args.name, snake=snake, path=path))
    print(f"created {path}")
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="database_transportor_spark")
    sub = parser.add_subparsers(dest="command", required=True)

    t = sub.add_parser("transport", help="run one or more spec modules")
    t.add_argument("--spec", action="append", required=True,
                   help="path to a spec .py file (repeatable, runs in order)")
    t.add_argument("--mode", default=None,
                   help="write mode override (append/overwrite)")
    t.add_argument("--master", default=None, help="Spark master override")
    t.add_argument("--staged", action="store_true",
                   help="stage every table and swap only after all writes")
    t.add_argument("--parallel", type=int, default=1,
                   help="write independent maps (same dependency level) "
                        "concurrently with this many threads")
    t.set_defaults(fn=_cmd_transport)

    e = sub.add_parser(
        "explain",
        help="print + audit the physical plan of each map without writing",
    )
    e.add_argument("--spec", action="append", required=True,
                   help="path to a spec .py file (repeatable)")
    e.add_argument("--map", action="append", default=None,
                   help="only explain these map names (repeatable)")
    e.add_argument("--audit-only", action="store_true",
                   help="suppress the full plan, print the audit line only")
    e.add_argument("--strict", action="store_true",
                   help="exit nonzero when a scan has no pushed filters")
    e.add_argument("--master", default=None, help="Spark master override")
    e.set_defaults(fn=_cmd_explain)

    v = sub.add_parser(
        "validate",
        help="run a spec's VALIDATE rules against the live target (no writes)",
    )
    v.add_argument("--spec", action="append", required=True)
    v.add_argument("--master", default=None)
    v.set_defaults(fn=_cmd_validate)

    d = sub.add_parser(
        "diff",
        help="post-transport parity diff: live target vs recomputed spec",
    )
    d.add_argument("--spec", action="append", required=True)
    d.add_argument("--map", default=None, help="diff only this map")
    d.add_argument("--keys", default=None,
                   help="comma-separated key columns (with --map)")
    d.add_argument("--show", type=int, default=0,
                   help="print up to N drifted rows per table")
    d.add_argument("--master", default=None)
    d.set_defaults(fn=_cmd_diff)

    ln = sub.add_parser(
        "lineage",
        help="column-level lineage from the spec (no Spark, no reads)",
    )
    ln.add_argument("--spec", action="append", required=True)
    ln.add_argument("--json", action="store_true",
                    help="one JSON record per column instead of text")
    ln.set_defaults(fn=_cmd_lineage)

    h = sub.add_parser("history", help="list a versioned table's versions")
    h.add_argument("--root", required=True)
    h.add_argument("--table", required=True)
    h.add_argument("--master", default=None)
    h.set_defaults(fn=_cmd_history)

    rb = sub.add_parser("rollback", help="point a versioned table at an older version")
    rb.add_argument("--root", required=True)
    rb.add_argument("--table", required=True)
    rb.add_argument("--version", type=int, required=True)
    rb.add_argument("--master", default=None)
    rb.set_defaults(fn=_cmd_rollback)

    vc = sub.add_parser(
        "vacuum",
        help="delete all but the newest N versions of a versioned table "
             "(HEAD and pinned versions always kept; crash-orphaned "
             "staging dirs swept after --orphan-grace; serializes with "
             "live writers via the cross-process writer lock)",
    )
    vc.add_argument("--root", required=True, help="versioned catalog root")
    vc.add_argument("--table", required=True)
    vc.add_argument("--keep", type=int, default=3,
                    help="committed versions to retain (default 3)")
    vc.add_argument("--orphan-grace", type=float, default=3600.0,
                    help="seconds an uncommitted staging dir must be "
                         "idle before it is reaped (default 3600)")
    vc.set_defaults(fn=_cmd_vacuum)

    pn = sub.add_parser(
        "pin",
        help="pin (or with --unpin release) a committed version so "
             "vacuum never reaps it — a guaranteed rollback point",
    )
    pn.add_argument("--root", required=True, help="versioned catalog root")
    pn.add_argument("--table", required=True)
    pn.add_argument("--version", type=int, required=True)
    pn.add_argument("--unpin", action="store_true")
    pn.set_defaults(fn=_cmd_pin)

    q = sub.add_parser("sql", help="run ad-hoc SQL over a catalog root")
    q.add_argument("--root", required=True, help="catalog root directory")
    q.add_argument("--format", default="parquet")
    q.add_argument("--query", required=True, help="SQL text; tables = file stems")
    q.add_argument("--limit", type=int, default=1000,
                   help="max rows fetched to the driver (default 1000; 0 = all)")
    q.add_argument("--explain", action="store_true",
                   help="print the physical plan instead of rows")
    q.add_argument("--master", default=None)
    q.set_defaults(fn=_cmd_sql)

    c = sub.add_parser("compact", help="rewrite a table into size-targeted files")
    c.add_argument("--root", required=True, help="catalog root directory")
    c.add_argument("--table", required=True)
    c.add_argument("--format", default="parquet")
    c.add_argument("--target-mb", type=int, default=128,
                   help="target file size in MB (default 128)")
    c.add_argument("--zorder", default=None,
                   help="comma-separated numeric columns: cluster the "
                        "rewrite along their Z-order curve so file-level "
                        "min/max stats prune scans on any of them")
    c.add_argument("--master", default=None)
    c.set_defaults(fn=_cmd_compact)

    bl = sub.add_parser(
        "bm25-layout",
        help="rewrite a BM25 posting table into the token-range-sorted "
             "layout (staged swap) so stats= serving skips files per "
             "query term",
    )
    bl.add_argument("--root", required=True, help="catalog root directory")
    bl.add_argument("--table", required=True, help="posting index table")
    bl.add_argument("--format", default="parquet")
    bl.add_argument("--files", type=int, default=16,
                    help="token range partitions / files (default 16)")
    bl.add_argument("--master", default=None)
    bl.set_defaults(fn=_cmd_bm25_layout)

    ex = sub.add_parser(
        "export-shards",
        help="materialize a table as one-file-per-shard training shards "
             "in deterministic epoch-shuffle order and print the "
             "per-shard manifest (rows/bytes/tokens/checksum)",
    )
    ex.add_argument("--root", required=True, help="catalog root directory")
    ex.add_argument("--table", required=True)
    ex.add_argument("--format", default="parquet")
    ex.add_argument("--dest", required=True,
                    help="output directory (written as dest/shard=K/)")
    ex.add_argument("--id-col", required=True,
                    help="stable document id column (shuffle key)")
    ex.add_argument("--shards", type=int, required=True,
                    help="shard count; size so one shard fits a "
                         "training reader's input budget")
    ex.add_argument("--seed", type=int, default=0,
                    help="epoch seed — change per epoch for an "
                         "independent read order (default 0)")
    ex.add_argument("--hash-fn", default="xxhash64",
                    choices=["xxhash64", "multiplicative"])
    ex.add_argument("--token-col", default=None,
                    help="numeric column summed into the manifest's "
                         "n_tokens (default: none)")
    ex.add_argument("--overwrite", action="store_true",
                    help="replace an existing destination (default: "
                         "refuse)")
    ex.add_argument("--master", default=None)
    ex.set_defaults(fn=_cmd_export_shards)

    g = sub.add_parser(
        "gate-maintain",
        help="out-of-band gate-index maintenance (codebook retrain + "
             "compaction) so ingest batches never pay the milestone stall",
    )
    g.add_argument("--root", required=True, help="catalog root directory")
    g.add_argument("--index-table", required=True)
    g.add_argument("--centroid-table", default=None,
                   help="semantic-gate codebook table (required to retrain)")
    g.add_argument("--clean-table", default=None,
                   help="gate output table (in-process lock scope)")
    g.add_argument("--format", default="parquet")
    g.add_argument("--compact-files", type=int, default=None,
                   help="compact the index when it holds more data files")
    g.add_argument("--retrain-at", type=float, default=None,
                   help="retrain when the index grew this factor since "
                        "the last (re)train")
    g.add_argument("--reshard", type=int, default=None,
                   help="rewrite a lexical shingle index to this shard "
                        "count (one staged pass, decisions unchanged)")
    g.add_argument("--force-retrain", action="store_true",
                   help="retrain regardless of growth (e.g. after deletes)")
    g.add_argument("--retrain-target-rows", type=int, default=128)
    g.add_argument("--retrain-sample", type=int, default=100_000)
    g.add_argument("--master", default=None)
    g.set_defaults(fn=_cmd_gate_maintain)

    p = sub.add_parser("profile", help="per-column stats (one scan)")
    p.add_argument("--root", required=True, help="catalog root directory")
    p.add_argument("--table", required=True)
    p.add_argument("--format", default="parquet")
    p.add_argument("--exact", action="store_true",
                   help="exact distinct counts (audit mode)")
    p.add_argument("--master", default=None)
    p.set_defaults(fn=_cmd_profile)

    m = sub.add_parser("make", help="scaffold a new transportor spec file")
    m.add_argument("name", help="transportor name (CamelCase or snake_case)")
    m.add_argument("--dir", default="transportors", help="output directory")
    m.add_argument("--force", action="store_true")
    m.set_defaults(fn=_cmd_make)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
