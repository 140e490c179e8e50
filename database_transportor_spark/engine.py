"""The engine: spec → lazy DataFrame pipelines → ordered writes.

Public API mirrors the reference's ``DBT`` class (DBT.php:58-66,523-569) so a
user of the reference can map their mental model 1:1, but execution is
Spark-native: each map compiles to one declarative DataFrame (read → filter →
project → lookups → explode), Catalyst optimizes it, and the only driver-side
work is planning.

Lifecycle (vs. reference ``doTransport``, DBT.php:85-112):

1. validate specs (``parse_maps``), topo-sort (planner) — replaces
   ``initDefinition`` + runtime recursion + ``finished`` memoization.
2. seed check (S6): every target-side lookup table produced by no map must be
   non-empty.
3. per map in topo order: build the pipeline **lazily**; register the result
   (staging columns included) so downstream target-side lookups read the
   in-flight DataFrame instead of re-reading the sink — the reference needed
   physical temp columns on the target (X5, DBT.php:423-446) precisely
   because its lookups probed already-written rows; we never write them.
4. ``do_transport`` writes each output minus staging columns, honoring
   ``order`` (O1), then runs ``run_after_transport`` hooks (X6).

Transactions (X7): the reference wraps the run in a single-connection DB
transaction (CreateTemp.temp:26-38).  Spark JDBC has no cross-table
transaction; ``do_transport(mode="overwrite")`` gives idempotent re-runs and
a staging-suffix swap can be layered on the catalog — a documented, weaker
guarantee.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.middle import build_middle
from .operators.post_ops import apply_post_ops
from .operators.projection import apply_projection, output_columns
from .operators.refer import (
    apply_asof_refer,
    apply_refer,
    apply_refers_batch,
    refers_merge_key,
)
from .plans.planner import seed_tables, topo_order
from .predicates import apply_conditions
from .sources.catalog import Catalog
from .spec import MapSpec, SpecError, parse_maps, SIDE_ORIGINAL

__all__ = ["DBT"]


class DBT:
    """Declarative map-driven transport engine (Spark-native rebuild of
    ``/root/reference/src/DBT.php``)."""

    def __init__(
        self,
        maps: dict[str, Any],
        target: Catalog,
        original: Catalog,
        preload: Optional[dict[str, list[str]]] = None,
    ):
        self.specs: dict[str, MapSpec] = parse_maps(maps)
        self.target = target
        self.original = original
        # S5: the reference declares preload but never consumes it
        # (DBT.php:71-78 TODO); we honor it as cache() on first read.
        self.preload = {k: set(v) for k, v in (preload or {}).items()}
        self.extra_seeds: set[str] = set()
        self._outputs: dict[str, DataFrame] = {}        # map key → full df
        self._outputs_by_table: dict[str, DataFrame] = {}  # produced table → df
        self._read_cache: dict[tuple[str, str], DataFrame] = {}
        self._incremental_filters: dict[str, tuple[str, Any]] = {}

    # -- reference-API-parity setters (DBT.php:523-569) ---------------------
    def set_maps(self, maps: dict[str, Any]) -> "DBT":
        self.specs = parse_maps(maps)
        self._outputs.clear()
        self._outputs_by_table.clear()
        return self

    def set_seed(self, seeds: list[str]) -> "DBT":
        self.extra_seeds = set(seeds)
        return self

    def set_chunk(self, chunk: int) -> "DBT":
        # S2: pagination chunk — subsumed by partitioned reads; kept for API
        # parity, forwarded to JDBC fetch/batch size when the catalog has one.
        for cat in (self.target, self.original):
            if hasattr(cat, "fetchsize"):
                cat.fetchsize = chunk
            if hasattr(cat, "batchsize"):
                cat.batchsize = chunk
        return self

    def set_safety(self, safety: int) -> "DBT":
        # X3: recursion cap — moot under topological planning; cycles are
        # detected exactly, not at depth `safety`.  Kept for API parity.
        return self

    def set_preload(self, preload: dict[str, list[str]]) -> "DBT":
        # S5 runtime setter (DBT.php:546-548).  Declaring a table preloaded
        # means "it fits in memory" (the reference loads it whole into PHP
        # arrays), so besides cache() we attach a broadcast hint — a
        # preloaded dimension then joins without shuffling the fact side.
        self.preload = {k: set(v) for k, v in (preload or {}).items()}
        self._read_cache.clear()
        return self

    # -- resolution ---------------------------------------------------------
    def _resolve(self, side: str, table: str) -> DataFrame:
        if side != SIDE_ORIGINAL and table in self._outputs_by_table:
            return self._outputs_by_table[table]
        key = (side, table)
        if key not in self._read_cache:
            cat = self.original if side == SIDE_ORIGINAL else self.target
            df = cat.read(table)
            if table in self.preload.get(side, ()):
                # Preload (S5) implies dimension-sized: cache for reuse and
                # hint broadcast so lookups against it never shuffle facts.
                df = F.broadcast(df.cache())
            self._read_cache[key] = df
        return self._read_cache[key]

    # -- planning / execution ----------------------------------------------
    def check_seed(self) -> None:
        """S6 (DBT.php:512-518): every seed table must be non-empty."""
        for table in sorted(seed_tables(self.specs) | self.extra_seeds):
            if not self.target.is_nonempty(table):
                raise SpecError(f"seed table {table!r} is missing or empty in target")

    def build_map(self, key: str) -> DataFrame:
        """Compile one map into its final (pre-write) DataFrame, staging
        columns included."""
        m = self.specs[key]
        if m.middle is not None:
            df = build_middle(m, self._resolve)
            return apply_post_ops(df, m.post_ops, f"map {key!r}", resolve=self._resolve)

        df = self._resolve(SIDE_ORIGINAL, m.original_table)
        if key in self._incremental_filters:
            # cursor > watermark lands BEFORE projection, so Catalyst pushes
            # it into the scan (PushedFilters on parquet; WHERE on JDBC)
            col, wm = self._incremental_filters[key]
            df = df.filter(F.col(col) > F.lit(wm))
        df = apply_conditions(df, m.extra_conditions)  # F1-F3 → pushdown
        df = apply_projection(df, m)                   # P1-P6
        # Reference resolves refers (J3) before refer (J1/J2) per chunk
        # (DBT.php:197-207); preserved in case a refer probes a refers output.
        # Refers sharing (source, table, key, conditions) merge into one
        # aggregation + one join — N columns over the same lookup table
        # cost one scan and one shuffle instead of N of each.
        groups: dict[tuple, list] = {}
        for c in m.columns:
            if c.refers is not None:
                groups.setdefault(refers_merge_key(c), []).append(c)
        for cs in groups.values():
            df = apply_refers_batch(df, cs, self._resolve)
        for c in m.columns:
            if c.refer is not None:
                df = apply_refer(df, c, self._resolve)
        for c in m.columns:
            if c.asof_refer is not None:
                df = apply_asof_refer(df, c, self._resolve)

        available = set(df.columns)
        ordered = [c.target for c in m.columns if c.target in available]
        missing = [
            c.target for c in m.columns if not c.skip and c.target not in available
        ]
        if missing:
            raise SpecError(f"map {key!r}: columns never produced: {missing}")
        # Extension stages (dedup, scoring, tagging, filters) run on the
        # projected result — same lazy plan, one Catalyst optimization pass.
        return apply_post_ops(
            df.select(*ordered), m.post_ops, f"map {key!r}", resolve=self._resolve
        )

    def transform(self) -> dict[str, DataFrame]:
        """Plan every map in topo order; no writes.  Returns the final
        DataFrames (staging columns still present — ``write_columns`` says
        what a sink should keep)."""
        for key in topo_order(self.specs):
            if key in self._outputs:
                continue
            df = self.build_map(key)
            m = self.specs[key]
            self._outputs[key] = df
            self._outputs_by_table[key] = df
            self._outputs_by_table[m.target_table] = df
        return dict(self._outputs)

    def write_columns(self, key: str) -> list[str]:
        m = self.specs[key]
        df = self._outputs[key]
        return output_columns(m, df.columns)

    def _resolve_cursor(self, key: str, cursor_col: str) -> str:
        """Map the target-side cursor column back to its source column.
        Only a plain rename/pass-through qualifies: a computed or looked-up
        cursor has no source predicate Spark could push down, and silently
        filtering on a derived value would re-read the whole table anyway.
        """
        m = self.specs[key]
        if m.middle is not None:
            raise SpecError(
                f"map {key!r}: incremental transport is not defined for "
                "middle (junction) maps"
            )
        for c in m.columns:
            if c.target == cursor_col:
                if (
                    c.original is None
                    or c.function is not None
                    or c.refer is not None
                    or c.refers is not None
                    or c.asof_refer is not None
                ):
                    raise SpecError(
                        f"map {key!r}: cursor column {cursor_col!r} must be "
                        "a plain renamed source column (no function/lookup)"
                    )
                return c.original
        raise SpecError(
            f"map {key!r}: cursor column {cursor_col!r} is not produced by "
            "this map"
        )

    def do_incremental_transport(
        self,
        cursors: dict[str, str],
        staged: bool = False,
        validate: Optional[dict[str, list]] = None,
        parallelism: int = 1,
    ) -> dict[str, DataFrame]:
        """Watermark-based incremental run: for every map in ``cursors``
        (map key → monotonically increasing target column, e.g. an id or
        ingest timestamp), read the live target's ``max(cursor)`` and
        transport only source rows with ``cursor > watermark``; the delta
        is APPENDED.  Maps not named in ``cursors`` (and cursor maps with
        no usable watermark — empty target or all-NULL cursor) run in
        full and are OVERWRITTEN: appending a full recompute would
        duplicate their rows on every rerun.

        Scale shape: the watermark probe is one ``max()`` over the target
        (cheap on parquet statistics or an indexed RDBMS column), and the
        source-side predicate is injected BEFORE projection, so it reaches
        the scan — at 100 TB an incremental run reads only the new
        partitions/rows (``explain`` shows the cursor in PushedFilters),
        instead of re-scanning the corpus.

        Exactness contract: rows whose cursor equals the current watermark
        are NOT re-read (strict ``>``), so reruns never duplicate; a source
        row arriving LATE with a cursor at-or-below the watermark is
        missed — the standard incremental-ingest caveat.  Use a cursor that
        is monotone at the source (auto-increment id, ingest time), never
        an event time that can arrive out of order.

        ``staged=True`` keeps the same atomic swap as a full staged run:
        because a staging swap REPLACES the live table, each cursor-filtered
        map's staged frame is ``live ∪ delta`` (union by name), not the
        delta alone — appending just the delta to a staging table and
        swapping would silently drop every pre-watermark row.  The live
        read is lazy and the live table stays untouched until the final
        commit, so the union never reads its own output.

        ``validate`` checks the rows being INGESTED this run (the delta
        for cursor-filtered maps — in both staged and append mode — and
        the full frame for full-run maps): re-validating the whole live
        table every run would cost O(live) per increment and would
        permanently block ingestion on one bad historical row.  FK
        references still resolve against the table's post-commit state.
        """
        self._incremental_filters = {}
        # fresh plan + fresh reads: the previous run's cached outputs were
        # built without cursor filters (and the target has since changed)
        self._outputs.clear()
        self._outputs_by_table.clear()
        self._read_cache.clear()
        for key, cursor_col in cursors.items():
            if key not in self.specs:
                raise SpecError(f"incremental cursor for unknown map {key!r}")
            src_col = self._resolve_cursor(key, cursor_col)
            m = self.specs[key]
            if not self.target.is_nonempty(m.target_table):
                continue  # first run: full load
            wm = (
                self.target.read(m.target_table)
                .agg(F.max(F.col(cursor_col)))
                .first()[0]
            )
            if wm is not None:
                self._incremental_filters[key] = (src_col, wm)
        try:
            self.check_seed()
            outputs = self.transform()
            if not staged:
                # cursor-filtered maps append their delta; everything else
                # is a full recompute and must OVERWRITE (appending it
                # would duplicate those tables' rows on every rerun)
                self._write_all(
                    outputs, mode="append", staged=False, validate=validate,
                    mode_for=lambda k: (
                        "append" if k in self._incremental_filters
                        else "overwrite"
                    ),
                    parallelism=parallelism,
                )
                return outputs

            # Staged swap replaces the live table wholesale, so the staged
            # frame for a cursor-filtered map must be live ∪ delta — the
            # delta alone would delete every pre-watermark row on commit.
            def _union_live(key: str, out: DataFrame) -> DataFrame:
                if key not in self._incremental_filters:
                    return out
                live = self.target.read(self.specs[key].target_table)
                return live.unionByName(out)

            self._write_all(
                outputs, mode="overwrite", staged=True, mutate=_union_live,
                validate=validate, validate_pre_mutate=True,
                parallelism=parallelism,
            )
            return outputs
        finally:
            self._incremental_filters = {}
            self._outputs.clear()
            self._outputs_by_table.clear()

    def do_merge_transport(
        self,
        cursors: dict[str, str],
        keys: dict[str, Any],
        validate: Optional[dict[str, list]] = None,
        parallelism: int = 1,
    ) -> dict[str, DataFrame]:
        """Incremental UPSERT run: like ``do_incremental_transport``, new
        source rows are found by ``cursor > max(cursor in target)`` with
        the predicate pushed into the scan — but instead of appending, the
        fresh rows MERGE into the live target by ``keys[map]`` (same-key
        rows replaced, new keys inserted; ``operators/mutations.py``).
        With an update-bumped cursor (``updated_at``, LSN) this transports
        row UPDATES, which append-style incremental cannot.

        Writes are always staged (``<table>__staging`` + swap): the merged
        plan lazily READS the live table it replaces, so an in-place
        overwrite would clobber its own input mid-scan.  Maps not named in
        ``cursors`` run in full, atomically alongside.

        The cursor doubles as the merge's ``seq_col``: when one key occurs
        several times among the fresh rows, the highest cursor (latest
        update) wins.
        """
        from .operators.mutations import merge_upsert

        self._incremental_filters = {}
        self._outputs.clear()
        self._outputs_by_table.clear()
        self._read_cache.clear()
        merge_maps: dict[str, tuple[list[str], str]] = {}
        for key, cursor_col in cursors.items():
            if key not in self.specs:
                raise SpecError(f"merge cursor for unknown map {key!r}")
            if key not in keys:
                raise SpecError(f"merge keys missing for map {key!r}")
            src_col = self._resolve_cursor(key, cursor_col)
            ks = [keys[key]] if isinstance(keys[key], str) else list(keys[key])
            m = self.specs[key]
            if not self.target.is_nonempty(m.target_table):
                continue  # first run: full load, nothing to merge into
            wm = (
                self.target.read(m.target_table)
                .agg(F.max(F.col(cursor_col)))
                .first()[0]
            )
            if wm is not None:
                self._incremental_filters[key] = (src_col, wm)
            merge_maps[key] = (ks, cursor_col)

        def _merge(key: str, out: DataFrame) -> DataFrame:
            if key not in merge_maps:
                return out
            ks, cur = merge_maps[key]
            live = self.target.read(self.specs[key].target_table)
            return merge_upsert(live, out, ks, seq_col=cur)

        try:
            self.check_seed()
            outputs = self.transform()
            self._write_all(
                outputs, mode="overwrite", staged=True, mutate=_merge,
                validate=validate, parallelism=parallelism,
            )
            return outputs
        finally:
            self._incremental_filters = {}
            self._outputs.clear()
            self._outputs_by_table.clear()

    def do_transport(
        self,
        mode: str = "append",
        staged: bool = False,
        validate: Optional[dict[str, list]] = None,
        parallelism: int = 1,
    ) -> dict[str, DataFrame]:
        """Execute: seed check, plan, write each table in dependency order
        (X1), drop staging columns pre-write (X5), run post hooks (X6).

        ``staged=True`` is the X7 transaction-gap strategy (the reference
        wraps the run in one DB transaction, CreateTemp.temp:26-38): every
        table lands in ``<table>__staging`` first; only after ALL heavy
        writes succeed are the staging tables swapped in (cheap renames).
        A failure during the write phase aborts every staging table and
        leaves the live target untouched.  Hooks (X6) run post-swap, like
        the reference's post-commit destructor hooks.

        ``validate``: ``{map_key: [rules]}`` (``operators/validate.py``
        vocabulary) checked against each map's final frame BEFORE its
        write — any violation raises ``ValidationError``, aborting the
        run (and, staged, every staging table), so the live target never
        sees a batch that breaks a constraint.  ``foreign_key`` rules may
        name ``ref_table``/``ref_source`` instead of passing a DataFrame;
        target-side references resolve against this run's in-flight
        outputs, so a fact map can be checked against the dimension map
        produced moments earlier in the same run."""
        # writes are the consuming action for any multi-consumer
        # intermediates operators pinned (operators/pins.py); the scope
        # frees exactly the pins THIS transport's plan-building created —
        # a concurrent pipeline on another thread, or a frame the caller
        # pinned and is still consuming, is never touched
        from .operators.pins import pin_scope

        with pin_scope():
            self.check_seed()
            outputs = self.transform()
            self._write_all(
                outputs, mode=mode, staged=staged, validate=validate,
                parallelism=parallelism,
            )
        return outputs

    def _producing_key(self, table: str) -> Optional[str]:
        for key, m in self.specs.items():
            if key == table or m.target_table == table:
                return key
        return None

    def _ref_frame(
        self, side: str, table: str, final_frames: Optional[dict[str, DataFrame]]
    ) -> DataFrame:
        """Resolve a foreign_key rule's reference table to the frame the
        target will hold AFTER this run commits.

        During incremental/merge runs the in-flight output of a
        cursor-filtered map is the DELTA only — checking a fact row's FK
        against it would flag every reference to an unchanged dimension key
        as a violation.  Preference order: the exact final frame recorded by
        ``_write_all`` (topo order guarantees declared dependencies are
        there), else committed-live ∪ delta for cursor-filtered maps (FK is
        an existence check, so the union is valid under merge too — a key
        present twice still exists), else the plain in-flight/catalog read.
        """
        if side != SIDE_ORIGINAL:
            if final_frames and table in final_frames:
                return final_frames[table]
            pk = self._producing_key(table)
            if pk is not None and pk in self._incremental_filters:
                live = self.target.read(self.specs[pk].target_table)
                if pk in self._outputs:
                    delta = self._outputs[pk].select(*self.write_columns(pk))
                    return live.unionByName(delta)
                return live
        return self._resolve(side, table)

    def _resolve_rules(
        self,
        rules: list,
        final_frames: Optional[dict[str, DataFrame]] = None,
    ) -> list:
        out = []
        for r in rules:
            if (
                r.get("rule") == "foreign_key"
                and "ref" not in r
                and "ref_table" in r
            ):
                r = {
                    **r,
                    "ref": self._ref_frame(
                        r.get("ref_source", "target"), r["ref_table"], final_frames
                    ),
                }
            out.append(r)
        return out

    def _write_all(
        self,
        outputs: dict[str, DataFrame],
        mode: str,
        staged: bool,
        mutate: Any = None,
        validate: Optional[dict[str, list]] = None,
        mode_for: Any = None,
        validate_pre_mutate: bool = False,
        parallelism: int = 1,
    ) -> None:
        """Write every map output in topo order; ``mutate(key, df)`` lets a
        caller rewrite a table's final frame (e.g. merge with the live
        target) after staging-column drop but before ordering/write.
        ``mode_for(key)`` overrides the write mode per map (incremental
        runs append cursor-filtered deltas but OVERWRITE full-run maps —
        appending a full recompute would duplicate).  ``validate_pre_mutate``
        checks rules against the pre-mutate frame (the rows ingested this
        run) instead of the mutated full table — O(delta), and one bad
        historical row can't block every future increment.

        ``parallelism > 1`` writes INDEPENDENT maps (same dependency
        level) concurrently from a thread pool — Spark's scheduler
        interleaves the jobs, so a wide spec keeps the cluster busy
        instead of draining between sequential table writes.  Dependency
        order is still honored level-by-level; a failure in any thread
        aborts all staged tables exactly as in sequential mode.  Post
        hooks preserve level order (order WITHIN a level is unspecified,
        as is the dependency graph's own intent)."""
        from .operators.validate import check as check_rules

        hooks = []
        written: list[str] = []
        final_frames: dict[str, DataFrame] = {}

        def write_one(key: str) -> None:
            m = self.specs[key]
            df = outputs[key]
            base = df.select(*self.write_columns(key))
            out = mutate(key, base) if mutate is not None else base
            # post-mutate frame IS the table's committed state (merge /
            # live∪delta applied); record it so later maps' FK rules
            # check against what the target will actually hold.  An
            # append-mode cursor-filtered map (no mutate) commits
            # live ∪ delta, not the delta being written.
            fin = out
            if mutate is None and key in self._incremental_filters:
                fin = self.target.read(m.target_table).unionByName(out)
            final_frames[key] = fin
            final_frames[m.target_table] = fin
            if validate and key in validate:
                check_rules(
                    base if validate_pre_mutate else out,
                    self._resolve_rules(validate[key], final_frames),
                )
            if m.order is not None:
                c = F.col(m.order.order_by)
                out = out.orderBy(
                    c.asc() if m.order.direction == "asc" else c.desc()
                )
            if staged:
                # append first so a mid-write failure (partial staging
                # output) is aborted along with the completed ones
                written.append(m.target_table)
                self.target.write_staged(out, m.target_table)
            else:
                self.target.write(
                    out, m.target_table,
                    mode=mode_for(key) if mode_for is not None else mode,
                )
            if m.run_after_transport is not None:
                hooks.append(m.run_after_transport)

        order = topo_order(self.specs)
        try:
            if parallelism <= 1:
                for key in order:
                    write_one(key)
            else:
                from concurrent.futures import ThreadPoolExecutor

                from .plans.planner import dependency_edges

                deps = dependency_edges(self.specs)
                level: dict[str, int] = {}
                for key in order:
                    level[key] = 1 + max(
                        (level[d] for d in deps[key] if d in level), default=-1
                    )
                by_level: dict[int, list[str]] = {}
                for key in order:
                    by_level.setdefault(level[key], []).append(key)
                if validate:
                    # an FK rule referencing a table produced by a SAME-level
                    # map is an undeclared dependency: sequentially it read
                    # committed-or-earlier data, in parallel it would race a
                    # concurrent overwrite of that very table — demand the
                    # dependency be declared instead of corrupting quietly
                    produced = {}
                    for k2, m2 in self.specs.items():
                        produced[k2] = k2
                        produced[m2.target_table] = k2
                    for group in by_level.values():
                        gset = set(group)
                        for key in group:
                            for r in validate.get(key, []):
                                rt = r.get("ref_table")
                                pk = produced.get(rt) if rt else None
                                if pk and pk != key and pk in gset:
                                    raise SpecError(
                                        f"map {key!r}: foreign_key rule "
                                        f"references {rt!r}, produced by "
                                        f"same-level map {pk!r} — declare "
                                        f"transport_after: [{pk!r}] to run "
                                        "it under parallelism"
                                    )
                for lv in sorted(by_level):
                    group = by_level[lv]
                    if len(group) == 1:
                        for key in group:
                            write_one(key)
                        continue
                    with ThreadPoolExecutor(
                        max_workers=min(parallelism, len(group))
                    ) as pool:
                        futures = [pool.submit(write_one, k) for k in group]
                        errs = [f.exception() for f in futures]
                    for e in errs:
                        if e is not None:
                            raise e
        except Exception:
            for table in written:
                self.target.abort_staged(table)
            raise
        for table in written:
            self.target.commit_staged(table)
        for hook in hooks:
            hook()
