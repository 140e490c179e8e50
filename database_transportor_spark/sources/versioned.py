"""Versioned file catalog: time travel and O(1) rollback for transports.

Every write creates a NEW immutable version directory; a tiny ``_HEAD``
pointer file names the current one.  Readers resolve the pointer, then
read an immutable directory — so concurrent readers never observe a
half-written table, a failed write leaves the pointer untouched, and
undoing a bad transport is a pointer move, not a data copy:

    root/<table>.versions/
        v00000001/    (immutable parquet dir)
        v00000002/
        _HEAD         ("2")

This is the single-table core of what table formats (Delta/Iceberg/Hudi)
do with manifest logs, built on the same atomic-rename primitive as the
engine's staged swap — giving the reference's transaction-gap story a
third leg: staged swap (no half-written tables), validation gate (no bad
data), versioning (bad data that slipped through is one ``rollback``
away).

Scale shape: the data path is identical to :class:`FileCatalog` (Spark
writes a directory); versioning adds only the pointer read/replace —
O(1) metadata, no extra data movement.  ``append`` is copy-on-write
(old ∪ new into a fresh version) so history stays immutable; prefer
overwrite/merge transports for large tables or ``vacuum`` aggressively.
"""

from __future__ import annotations

import os
import shutil
import threading
import time

from pyspark.sql import DataFrame, SparkSession

from .catalog import FileCatalog
from .locks import ProcessLock, is_remote_path

__all__ = ["VersionedCatalog"]


class _TableWriterLock:
    """Per-table writer lock: an in-process reentrant lock composed with
    a cross-process lock (``flock`` on ``<table>.versions/_LOCK`` by
    default; a lease lock from ``lock_factory=`` on mounts that cannot
    flock) — only the OUTERMOST in-process holder touches the file
    lock, so the existing nesting pattern (``commit_staged`` inside
    ``writer_lock``) keeps working while two PROCESSES (a live ingest
    gate and an external ``gate_maintain``) genuinely serialize.
    ``depth`` is mutated only while the RLock is held, so it needs no
    extra synchronization.
    """

    def __init__(self, rlock: threading.RLock, flock) -> None:
        self._rlock = rlock
        self._flock = flock
        self._depth = 0

    def acquire(self) -> None:
        self._rlock.acquire()
        if self._depth == 0:
            try:
                self._flock.acquire()
            except BaseException:
                self._rlock.release()
                raise
        self._depth += 1

    def release(self) -> None:
        self._depth -= 1
        try:
            if self._depth == 0:
                self._flock.release()
        finally:
            # a failed flock release must not wedge the in-process lock
            self._rlock.release()

    def __enter__(self) -> "_TableWriterLock":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()


class VersionedCatalog(FileCatalog):
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        format: str | None = None,
        lock_timeout: float = 600.0,
        lock_factory=None,
        **kwargs,
    ):
        if is_remote_path(root):
            # The pointer/marker protocol (open/os.replace/os.listdir)
            # and the flock writer lock both need a locally-openable
            # path.  On an object store this catalog would silently
            # read nothing and lock nothing — refuse loudly instead.
            raise ValueError(
                f"VersionedCatalog: root {root!r} is not a locally-"
                "mounted path.  The versioned catalog's _HEAD pointer, "
                "commit markers, and flock writer lock live on a real "
                "filesystem; on S3/GCS/ABFS use a lakehouse table "
                "format or mount the store (s3fs/gcsfuse give NO lock "
                "semantics — pass lock_factory=LeaseLock from "
                "sources.locks there).  See TUNING.md: cross-process "
                "writers."
            )
        super().__init__(spark, root, format=format, **kwargs)
        # staged-version bookkeeping must survive concurrent use (the
        # engine's parallel transport stages several tables at once)
        self._pending: dict[str, int] = {}
        # version numbers handed out but not yet visible on disk — holds
        # plain write()s in flight, so a racing write_staged can't reuse
        # the number between reservation and the directory appearing
        self._reserved: dict[str, set[int]] = {}
        self._plock = threading.Lock()
        # per-table writer locks: append = read-union-save-commit, and two
        # appenders interleaving those steps would both base their union on
        # the same parent version — the later commit silently dropping the
        # earlier writer's rows.  The STAGED path has the same shape
        # (caller reads head → merges → write_staged → commit_staged), so
        # commit_staged takes the lock around its head move, and callers
        # whose merge depends on the head they read (the stream-merge
        # sink) hold :meth:`writer_lock` across the whole sequence.
        # Reentrant so commit_staged nests inside writer_lock.  Round 10:
        # the lock is now in-process RLock + cross-process flock (see
        # _TableWriterLock / locks.py) — the external-maintenance +
        # live-ingest single-writer discipline is ENFORCED between
        # processes sharing the catalog mount, not just documented.
        # (_pending/_reserved bookkeeping stays per-instance; staged
        # sequences from two processes are serialized by holding
        # writer_lock across the whole read→stage→commit sequence, which
        # every in-repo caller already does.)
        self._wlocks: dict[str, _TableWriterLock] = {}
        self._lock_timeout = float(lock_timeout)
        # lock_factory(path, timeout) -> acquire/release lock object: the
        # escape hatch for mounts where flock(2) is unsupported (some NFS
        # configurations; FUSE object-store mounts) — plug a lease-based
        # lock here and every writer_lock composes it instead of flock
        self._lock_factory = lock_factory

    def _writer_lock(self, table: str) -> _TableWriterLock:
        with self._plock:
            got = self._wlocks.get(table)
            if got is None:
                path = f"{self._table_root(table)}/_LOCK"
                flock = (
                    self._lock_factory(path, self._lock_timeout)
                    if self._lock_factory is not None
                    else ProcessLock(path, timeout=self._lock_timeout)
                )
                got = _TableWriterLock(threading.RLock(), flock)
                self._wlocks[table] = got
            return got

    def writer_lock(self, table: str) -> _TableWriterLock:
        """Public per-table writer lock (reentrant, context-manager,
        cross-process via ``flock`` on ``<table>.versions/_LOCK``).
        Hold it across any read-head → transform → stage → commit
        sequence whose result depends on the head it read; plain
        :meth:`write` and :meth:`commit_staged` acquire it internally, so
        holders serialize against both — including holders in OTHER
        processes on the same mount (object stores need a lease table
        instead; see TUNING.md).  Acquisition times out after
        ``lock_timeout`` seconds (default 600) with ``TimeoutError``."""
        return self._writer_lock(table)

    # ---------------------------------------------------------- layout

    def _table_root(self, table: str) -> str:
        return f"{self.root}/{table}.versions"

    def _version_dir(self, table: str, version: int) -> str:
        return f"{self._table_root(table)}/v{version:08d}"

    def _head_file(self, table: str) -> str:
        return f"{self._table_root(table)}/_HEAD"

    def current_version(self, table: str) -> int | None:
        try:
            with open(self._head_file(table)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _marker(self, table: str, version: int) -> str:
        return self._version_dir(table, version) + ".__committed"

    def _staging_sidecar(self, table: str, version: int) -> str:
        # cross-process "staged, not yet committed" marker: written by
        # write_staged BEFORE the data lands, removed by commit/abort.
        # vacuum's orphan sweep must not reap a dir whose sidecar is
        # fresh — another PROCESS may be between stage and commit
        # (_pending only covers this instance's threads)
        return self._version_dir(table, version) + ".__staging"

    def _pin_marker(self, table: str, version: int) -> str:
        return self._version_dir(table, version) + ".__pinned"

    def versions(self, table: str) -> list[int]:
        """All COMMITTED version numbers, ascending.  Staged-but-never-
        committed or crash-orphaned version directories are excluded —
        `history` must not list them and `rollback` must never point HEAD
        at possibly-partial data."""
        try:
            entries = os.listdir(self._table_root(table))
        except FileNotFoundError:
            return []
        return sorted(
            int(e[1:])
            for e in entries
            if e.startswith("v") and e[1:].isdigit()
            and os.path.exists(self._marker(table, int(e[1:])))
        )

    def _all_version_dirs(self, table: str) -> list[int]:
        try:
            entries = os.listdir(self._table_root(table))
        except FileNotFoundError:
            return []
        return sorted(
            int(e[1:]) for e in entries
            if e.startswith("v") and e[1:].isdigit()
        )

    def _staged_versions(self, table: str) -> set[int]:
        """Version numbers with a staging sidecar on disk — stagings in
        flight from ANY process, plus crash leftovers (distinguished by
        sidecar age in :meth:`vacuum`)."""
        suffix = ".__staging"
        try:
            entries = os.listdir(self._table_root(table))
        except FileNotFoundError:
            return set()
        out = set()
        for e in entries:
            if e.startswith("v") and e.endswith(suffix):
                core = e[1:-len(suffix)]
                if core.isdigit():
                    out.add(int(core))
        return out

    def _set_head(self, table: str, version: int) -> None:
        head = self._head_file(table)
        tmp = head + ".__tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, head)  # atomic pointer move

    # ------------------------------------------------------------ I/O

    def path(self, table: str) -> str:
        v = self.current_version(table)
        if v is None:
            raise FileNotFoundError(
                f"VersionedCatalog: no committed version for table {table!r}"
            )
        return self._version_dir(table, v)

    def read(self, table: str, version: int | None = None) -> DataFrame:
        if version is not None:
            # explicit time travel must honor the same commit-marker gate
            # as versions()/rollback(): a staged or crash-orphaned version
            # directory may hold partial data and must never be readable
            if not os.path.exists(self._marker(table, version)):
                raise ValueError(
                    f"read: version {version} of {table!r} is not committed "
                    f"(committed versions: {self.versions(table)})"
                )
            p = self._version_dir(table, version)
        else:
            p = self.path(table)
        return (
            self.spark.read.options(**self.read_options)
            .format(self.format)
            .load(p)
        )

    def _next_version(self, table: str) -> int:
        # max over ALL retained dirs (committed or orphaned), NOT HEAD+1:
        # after a rollback HEAD points at an older version, and HEAD+1
        # would destroy a committed historical directory.  A staged-but-
        # unwritten version exists only in _pending (no dir on disk yet),
        # so it must be consulted too or a racing write() would reuse it.
        pending = self._pending.get(table, 0)
        reserved = max(self._reserved.get(table, ()), default=0)
        staged = max(self._staged_versions(table), default=0)
        return max(max(self._all_version_dirs(table), default=0),
                   pending, reserved, staged) + 1

    def write(self, df: DataFrame, table: str, mode: str = "append") -> None:
        # the writer lock spans read-union-save-commit: append bases the
        # new version on the live head, and that read must stay valid
        # until this writer's commit moves the pointer
        with self._writer_lock(table):
            cur = self.current_version(table)
            if mode == "append" and cur is not None:
                # copy-on-write: history versions stay immutable
                df = self.read(table).unionByName(df)
            os.makedirs(self._table_root(table), exist_ok=True)
            with self._plock:
                nxt = self._next_version(table)
                self._reserved.setdefault(table, set()).add(nxt)
            target = self._version_dir(table, nxt)
            try:
                self._save(df, target, "overwrite")
                open(self._marker(table, nxt), "w").close()
                self._set_head(table, nxt)
            finally:
                with self._plock:
                    self._reserved.get(table, set()).discard(nxt)

    # staged writes: the version directory IS the staging area — commit
    # is the pointer move, abort deletes the never-pointed-at directory
    def write_staged(self, df: DataFrame, table: str) -> None:
        # the writer lock makes the number reservation cross-process:
        # without it two PROCESSES staging the same table could both
        # compute the same next version (each instance's _pending is
        # private) and overwrite each other's staging dir.  Reentrant,
        # so callers already holding writer_lock across their whole
        # read→stage→commit sequence are unchanged.
        with self._writer_lock(table):
            os.makedirs(self._table_root(table), exist_ok=True)
            with self._plock:
                nxt = self._next_version(table)
                # reserve the number under the lock so concurrent
                # stagings of DIFFERENT tables (or a racing re-stage)
                # never collide
                self._pending[table] = nxt
            # sidecar BEFORE data: from this point any process's vacuum
            # sees the staging as in-flight, not crash garbage
            with open(self._staging_sidecar(table, nxt), "w") as f:
                f.write(f"pid={os.getpid()} staged_at={time.time()}\n")
            target = self._version_dir(table, nxt)
            self._save(df, target, "overwrite")

    def commit_staged(self, table: str, note: str | None = None) -> None:
        """Commit the pending staged version — the pointer move.  ``note``
        (e.g. a streaming sink's batch id) is recorded in the commit
        marker and surfaces in :meth:`history` — the lineage hook that
        ties a CDC micro-batch to the version it produced."""
        # the head move serializes against plain write()s (and any holder
        # of writer_lock) — without this an append racing the commit could
        # move HEAD to a version based on the pre-commit head, silently
        # dropping this staged batch's rows
        with self._writer_lock(table):
            with self._plock:
                nxt = self._pending.pop(table, None)
            if nxt is None:
                raise RuntimeError(f"no staged write pending for {table!r}")
            with open(self._marker(table, nxt), "w") as f:
                if note:
                    f.write(note)
            self._set_head(table, nxt)
            try:
                os.remove(self._staging_sidecar(table, nxt))
            except FileNotFoundError:
                pass

    def history(self, table: str) -> list[dict]:
        """Committed versions, ascending, with commit time, marker note,
        and HEAD flag — the audit view `cli history` renders."""
        head = self.current_version(table)
        out = []
        for v in self.versions(table):
            marker = self._marker(table, v)
            try:
                with open(marker) as f:
                    note = f.read().strip() or None
                committed_at = os.path.getmtime(marker)
            except FileNotFoundError:  # racing vacuum
                continue
            out.append({
                "version": v,
                "committed_at": committed_at,
                "note": note,
                "is_head": v == head,
            })
        return out

    def abort_staged(self, table: str) -> None:
        with self._plock:
            nxt = self._pending.pop(table, None)
        if nxt is not None:
            shutil.rmtree(self._version_dir(table, nxt), ignore_errors=True)
            try:
                os.remove(self._staging_sidecar(table, nxt))
            except FileNotFoundError:
                pass

    # ------------------------------------------------------- management

    def rollback(self, table: str, version: int) -> None:
        """Point the table back at ``version`` — O(1), no data movement.
        The rolled-back-over versions stay on disk until :meth:`vacuum`
        — and note the converse: vacuum retains only HEAD, pins, and
        the newest ``keep`` versions, so an OLDER rollback target can
        be vacuumed away (rollback then fails loudly here, it never
        points at missing data).  :meth:`pin_version` exempts a version
        from vacuum when you need a guaranteed rollback point.  Takes
        the writer lock so a concurrent vacuum cannot reap the target
        between this validation and the pointer move."""
        with self._writer_lock(table):
            if version not in self.versions(table):
                raise ValueError(
                    f"rollback: version {version} not retained for "
                    f"{table!r} (have {self.versions(table)})"
                )
            self._set_head(table, version)

    def pin_version(self, table: str, version: int) -> None:
        """Exempt a committed ``version`` from :meth:`vacuum` — the
        retention hook for guaranteed rollback points (an audited
        release, a pre-migration snapshot).  O(1) marker file."""
        if version not in self.versions(table):
            raise ValueError(
                f"pin_version: version {version} not committed for "
                f"{table!r} (have {self.versions(table)})"
            )
        open(self._pin_marker(table, version), "w").close()

    def unpin_version(self, table: str, version: int) -> None:
        try:
            os.remove(self._pin_marker(table, version))
        except FileNotFoundError:
            pass

    def pinned_versions(self, table: str) -> list[int]:
        return sorted(
            v for v in self._all_version_dirs(table)
            if os.path.exists(self._pin_marker(table, v))
        )

    def vacuum(self, table: str, keep: int = 3,
               orphan_grace: float = 3600.0) -> list[int]:
        """Delete all but the newest ``keep`` committed versions (HEAD
        and :meth:`pin_version`-pinned versions are always kept).
        Returns the versions removed.

        Runs under the cross-process writer lock, so it serializes with
        every write/stage/commit sequence — including the ``vacuum``
        CLI, which is always a separate process from a live writer.
        Uncommitted version dirs are reaped only when their staging
        sidecar is ABSENT or older than ``orphan_grace`` seconds
        (default 1 h): a fresh sidecar means another process is between
        ``write_staged`` and ``commit_staged`` right now and its dir
        must survive; a stale one is a crashed run's garbage.
        """
        if keep < 1:
            raise ValueError("vacuum: keep must be >= 1")
        removed = []
        with self._writer_lock(table):
            head = self.current_version(table)
            vs = self.versions(table)
            to_keep = set(vs[-keep:])
            if head is not None:
                to_keep.add(head)
            to_keep.update(self.pinned_versions(table))
            for v in vs:
                if v not in to_keep:
                    shutil.rmtree(self._version_dir(table, v),
                                  ignore_errors=True)
                    try:
                        os.remove(self._marker(table, v))
                    except FileNotFoundError:
                        pass
                    removed.append(v)
            # orphaned staged dirs (crashed runs) are garbage too —
            # but an in-flight staging (this instance's _pending, or a
            # fresh sidecar from ANY process) is not
            now = time.time()
            committed = set(self.versions(table))
            pending = set(self._pending.values())
            for v in self._all_version_dirs(table):
                if v in committed or v in pending:
                    continue
                sidecar = self._staging_sidecar(table, v)
                try:
                    age = now - os.path.getmtime(sidecar)
                except OSError:
                    age = None  # no sidecar: pre-round-11 orphan
                if age is not None and age < orphan_grace:
                    continue
                shutil.rmtree(self._version_dir(table, v),
                              ignore_errors=True)
                try:
                    os.remove(sidecar)
                except FileNotFoundError:
                    pass
                removed.append(v)
        return removed

    def is_nonempty(self, table: str) -> bool:
        if self.current_version(table) is None:
            return False
        return super().is_nonempty(table)

    def exists(self, table: str) -> bool:
        # metadata-level: any committed version means the table exists
        return self.current_version(table) is not None
