"""Cross-process writer coordination for file-backed catalogs.

The versioned catalog's per-table ``writer_lock`` was in-process only
(a ``threading.RLock``): the single-writer discipline that out-of-band
maintenance (``gate_maintain(maintenance="external")``) plus a live
ingest gate need in production was documented but unenforced across
processes.  :class:`ProcessLock` closes that gap for any
locally-mounted filesystem: an exclusive ``flock(2)`` on a lock file
next to the table.

Why ``flock`` and not a lease file: the kernel owns the lock, so a
crashed holder releases it IMMEDIATELY — no staleness heuristic, no
takeover race, no clock skew between contenders.  The trade is scope:
``flock`` coordinates processes sharing a local (or properly-configured
NFS) mount.  On object stores (S3/GCS) there is no byte-range locking
at all — there the production contract is a lease-based lock (plug one
in via the catalog's ``lock_factory=``) or an external scheduler
serializing ingest and maintenance windows (TUNING.md), the same
discipline every lakehouse table format documents.  Round 11: that
contract is LOUD, not documented-only — a URI-schemed path raises at
construction, and an flock-unsupported mount (EINVAL/ENOTSUP) raises
immediately instead of spinning the timeout and blaming a phantom
holder.

``acquire`` blocks up to ``timeout`` seconds (poll + non-blocking
flock, so a holder's crash is observed at poll granularity) and raises
``TimeoutError`` after — a stuck maintenance job surfaces as a loud
ingest failure instead of a silent indefinite stall.
"""

from __future__ import annotations

import errno
import os
import re
import time

try:  # POSIX; the import-try keeps non-POSIX platforms importable
    import fcntl
except ImportError:  # pragma: no cover
    fcntl = None

__all__ = ["ProcessLock", "is_remote_path"]

#: URI schemes that name a locally-openable path anyway
_LOCAL_SCHEMES = ("file",)

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://")

#: flock errnos that mean "held by someone else" (retry); anything else
#: means the filesystem cannot lock at all (fail fast, don't spin)
_CONTENTION_ERRNOS = frozenset(
    e for e in (
        getattr(errno, "EAGAIN", None),
        getattr(errno, "EWOULDBLOCK", None),
        getattr(errno, "EACCES", None),
    ) if e is not None
)


def is_remote_path(path: str) -> bool:
    """True when ``path`` carries a non-local URI scheme (``s3a://``,
    ``gs://``, ``hdfs://``, ...) — a location ``os.open``/``flock``
    cannot reach.  ``file://`` and plain paths are local."""
    m = _SCHEME_RE.match(path)
    return bool(m) and m.group(1).lower() not in _LOCAL_SCHEMES


class ProcessLock:
    """Exclusive cross-process file lock (``flock``), context-managed.

    NOT reentrant and not thread-aware on its own — compose it behind an
    in-process ``RLock`` (as ``VersionedCatalog.writer_lock`` does) so
    one process's threads serialize locally and only the outermost
    holder touches the file lock.
    """

    def __init__(self, path: str, timeout: float = 600.0,
                 poll: float = 0.05):
        if is_remote_path(path):
            # loud, at construction: a flock on an object-store URI is
            # not "best effort", it is NO coordination — the open()
            # would land on some local path-shaped string (or fail) and
            # two writers would both believe they hold the table
            raise ValueError(
                f"ProcessLock: {path!r} is not a locally-mounted path — "
                "flock(2) cannot coordinate writers on an object store. "
                "Use a lease-based lock via the catalog's lock_factory= "
                "or serialize ingest and maintenance windows with an "
                "external scheduler (TUNING.md: cross-process writers)."
            )
        self.path = path
        self.timeout = timeout
        self.poll = poll
        self._fd: int | None = None

    def acquire(self) -> None:
        if self._fd is not None:
            raise RuntimeError(
                f"ProcessLock({self.path!r}) is not reentrant — already "
                "held by this object"
            )
        if fcntl is None:  # pragma: no cover
            return  # documented no-op off-POSIX; in-process lock remains
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd = os.open(self.path, os.O_CREAT | os.O_RDWR, 0o644)
        deadline = time.monotonic() + self.timeout
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except OSError as e:
                    if e.errno not in _CONTENTION_ERRNOS:
                        # EINVAL/ENOTSUP/...: the mount cannot flock at
                        # all — spinning the full timeout and blaming a
                        # phantom holder would be a lie; fail fast
                        raise OSError(
                            e.errno,
                            f"ProcessLock: flock on {self.path!r} failed "
                            f"with {errno.errorcode.get(e.errno, e.errno)}"
                            " — this filesystem does not support "
                            "flock(2); use a lease-based lock via the "
                            "catalog's lock_factory= or an external "
                            "scheduler (TUNING.md: cross-process "
                            "writers)",
                        ) from e
                    if time.monotonic() >= deadline:
                        raise TimeoutError(
                            f"ProcessLock: could not acquire {self.path!r} "
                            f"within {self.timeout}s — another process "
                            "holds the table's writer lock (a wedged "
                            "maintenance job?)"
                        ) from None
                    time.sleep(self.poll)
            # observability, not correctness: the kernel lock is
            # authoritative; the content names the current holder
            os.ftruncate(fd, 0)
            os.write(fd, f"pid={os.getpid()}\n".encode())
        except BaseException:
            os.close(fd)
            raise
        self._fd = fd

    def release(self) -> None:
        fd, self._fd = self._fd, None
        if fd is not None:
            # closing drops the flock atomically; the lock FILE stays (a
            # reusable rendezvous point — deleting it would race a
            # contender that already opened it)
            os.close(fd)

    def __enter__(self) -> "ProcessLock":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()
