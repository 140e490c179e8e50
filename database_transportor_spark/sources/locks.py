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

__all__ = ["ProcessLock", "LeaseLock", "is_remote_path"]

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


class LeaseLock:
    """Lease-file writer lock for mounts that cannot ``flock`` — the
    built-in ``lock_factory=`` for NFS-without-locking and FUSE
    object-store gateways (s3fs/gcsfuse), whose one dependable
    primitive is atomic exclusive CREATE (``O_CREAT|O_EXCL``).

    Protocol (the standard lease + fencing-token recipe):

    - **acquire**: atomically create ``<path>.lease`` holding
      ``(owner uuid, fencing token, expiry = now + ttl)``.  While it
      exists, contenders poll.
    - **TTL takeover**: a contender that reads an EXPIRED lease renames
      it aside (``os.rename`` to a unique tombstone — atomic, so of N
      racing takers exactly one wins the rename; the rest retry) and
      then competes on the normal create path.  A crashed holder is
      therefore survivable within ``ttl`` seconds — the trade vs
      ``flock``'s instant kernel release, and why ``flock`` stays the
      default on mounts that support it.
    - **auto-refresh**: a daemon thread re-writes the expiry every
      ``ttl/3`` seconds (via ``os.replace``, atomic) so a LIVE holder
      is never taken over mid-write however long the hold — Spark
      saves can exceed any fixed ttl.
    - **fencing token**: each successful acquire increments a
      monotonic counter persisted in ``<path>.token`` and exposes it
      as ``.fencing_token`` — downstream writers that talk to an
      external store can attach it so a zombie holder (paused past
      its lease, then resumed) is rejected by token comparison, the
      classic lease-safety completion.

    Caveats, stated honestly: takeover correctness needs contender
    clocks to agree within ``ttl`` slack (standard lease assumption),
    and the mount's create/rename must be atomic — true for NFS and
    the mainstream FUSE gateways, NOT for raw eventual-consistency
    listings; on a bare object store use a real coordination service
    instead.  Like :class:`ProcessLock`, not reentrant and not
    thread-aware — the catalog composes it behind an RLock.
    """

    def __init__(self, path: str, timeout: float = 600.0,
                 ttl: float = 60.0, poll: float = 0.05):
        self.path = path
        self.timeout = timeout
        self.ttl = ttl
        self.poll = poll
        self.fencing_token: int | None = None
        self._owner: str | None = None
        self._stop = None  # refresher thread kill switch
        self._refresher = None

    def _lease_file(self) -> str:
        return self.path + ".lease"

    def _token_file(self) -> str:
        return self.path + ".token"

    def _read_lease(self) -> tuple[str, int, float] | None:
        try:
            with open(self._lease_file()) as f:
                owner, token, expiry = f.read().split()
            return owner, int(token), float(expiry)
        except (FileNotFoundError, ValueError):
            return None  # mid-replace torn read or gone: caller retries

    def _write_lease(self, fd_path: str, owner: str, token: int) -> None:
        tmp = f"{self.path}.tmp.{owner}"
        with open(tmp, "w") as f:
            f.write(f"{owner} {token} {time.time() + self.ttl}\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, fd_path)

    def _next_token(self) -> int:
        # read-increment-persist while we exclusively hold the lease
        # create — single-writer by construction
        try:
            with open(self._token_file()) as f:
                prev = int(f.read().strip() or 0)
        except (FileNotFoundError, ValueError):
            prev = 0
        tmp = self._token_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(prev + 1))
        os.replace(tmp, self._token_file())
        return prev + 1

    def acquire(self) -> None:
        import threading
        import uuid

        if self._owner is not None:
            raise RuntimeError(
                f"LeaseLock({self.path!r}) is not reentrant — already "
                "held by this object"
            )
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        me = uuid.uuid4().hex
        lease = self._lease_file()
        deadline = time.monotonic() + self.timeout
        while True:
            try:
                fd = os.open(lease, os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                             0o644)
            except FileExistsError:
                cur = self._read_lease()
                if cur is not None and cur[2] < time.time():
                    # expired: exactly one contender wins this rename
                    # and the create race restarts clean
                    try:
                        os.rename(lease, f"{lease}.stale.{me}")
                        os.remove(f"{lease}.stale.{me}")
                    except FileNotFoundError:
                        pass
                    continue
                if time.monotonic() >= deadline:
                    raise TimeoutError(
                        f"LeaseLock: could not acquire {lease!r} within "
                        f"{self.timeout}s — another process holds the "
                        "table's writer lease"
                    ) from None
                time.sleep(self.poll)
                continue
            os.close(fd)
            break
        token = self._next_token()
        self._write_lease(lease, me, token)
        self._owner = me
        self.fencing_token = token
        stop = threading.Event()
        self._stop = stop

        def refresh():
            while not stop.wait(self.ttl / 3.0):
                cur = self._read_lease()
                if cur is None or cur[0] != me:
                    return  # lost the lease (paused past ttl): stop
                self._write_lease(lease, me, token)

        t = threading.Thread(target=refresh, daemon=True,
                             name=f"lease-refresh:{self.path}")
        t.start()
        self._refresher = t

    def release(self) -> None:
        owner, self._owner = self._owner, None
        if owner is None:
            return
        if self._stop is not None:
            self._stop.set()
            self._stop = None
            # join so a mid-refresh thread cannot resurrect the lease
            # AFTER the remove below (it would linger until ttl expiry)
            t, self._refresher = self._refresher, None
            if t is not None:
                t.join(timeout=10)
        self.fencing_token = None
        cur = self._read_lease()
        if cur is not None and cur[0] == owner:
            try:
                os.remove(self._lease_file())
            except FileNotFoundError:
                pass

    def __enter__(self) -> "LeaseLock":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()
