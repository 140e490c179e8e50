"""Cross-process writer coordination (round 10): ProcessLock mutual
exclusion and timeout, the composite VersionedCatalog writer lock, and
the two-process ingest-gate + gate_maintain integration the external
maintenance mode's production contract requires."""

import os
import subprocess
import sys
import threading
import time

import pytest

from database_transportor_spark.sources.locks import ProcessLock

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(code: str, *args: str) -> subprocess.Popen:
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.Popen(
        [sys.executable, "-c", code, *args],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )


_CRITICAL = """
import sys, time
from database_transportor_spark.sources.locks import ProcessLock
lock_path, log_path, tag = sys.argv[1], sys.argv[2], sys.argv[3]
with ProcessLock(lock_path, timeout=30):
    with open(log_path, "a") as f:
        f.write(f"{tag} enter {time.monotonic()}\\n")
        f.flush()
        time.sleep(0.4)
        f.write(f"{tag} exit {time.monotonic()}\\n")
"""


def test_process_lock_excludes_across_processes(tmp_path):
    lock = str(tmp_path / "L")
    log = str(tmp_path / "log")
    procs = [_spawn(_CRITICAL, lock, log, t) for t in ("a", "b", "c")]
    for p in procs:
        _out, err = p.communicate(timeout=60)
        assert p.returncode == 0, err.decode()
    spans = {}
    for line in open(log):
        tag, kind, t = line.split()
        spans.setdefault(tag, {})[kind] = float(t)
    assert len(spans) == 3
    ordered = sorted(spans.values(), key=lambda s: s["enter"])
    for prev, nxt in zip(ordered, ordered[1:]):
        assert prev["exit"] <= nxt["enter"]  # critical sections disjoint


def test_process_lock_times_out_loudly(tmp_path):
    lock = str(tmp_path / "L")
    held = ProcessLock(lock, timeout=5)
    held.acquire()
    try:
        # flock conflicts are per open-file-description, so a second
        # object contends even in the same process — and surfaces the
        # wedged-holder case as TimeoutError, not a silent stall
        with pytest.raises(TimeoutError, match="writer lock"):
            ProcessLock(lock, timeout=0.3).acquire()
    finally:
        held.release()
    ProcessLock(lock, timeout=1).acquire()  # released → acquirable


def test_process_lock_is_not_reentrant_by_itself(tmp_path):
    lock = ProcessLock(str(tmp_path / "L"))
    lock.acquire()
    try:
        with pytest.raises(RuntimeError, match="not reentrant"):
            lock.acquire()
    finally:
        lock.release()


def test_writer_lock_serializes_two_instances_same_process(spark, tmp_path):
    """Two catalog INSTANCES over one root (the in-process analogue of
    two processes) now serialize through the file lock — previously the
    per-instance RLock silently did not cover this."""
    from database_transportor_spark.sources.versioned import (
        VersionedCatalog,
    )

    root = str(tmp_path / "cat")
    a = VersionedCatalog(spark, root)
    b = VersionedCatalog(spark, root)
    a.write(spark.range(3).toDF("v"), "t", mode="overwrite")
    order = []
    with a.writer_lock("t"):
        th = threading.Thread(
            target=lambda: (b.writer_lock("t").acquire(),
                            order.append("b"),
                            b.writer_lock("t").release()))
        th.start()
        time.sleep(0.3)
        assert order == []  # b blocked while a holds the file lock
        order.append("a")
    th.join(timeout=10)
    assert order == ["a", "b"]
    # reentrancy survives composition: nested holds + internal write
    with a.writer_lock("t"):
        with a.writer_lock("t"):
            a.write(spark.range(2).toDF("v"), "t", mode="append")
    assert a.read("t").count() == 5


_INGEST = """
import sys
from pyspark.sql import SparkSession
from database_transportor_spark.sources.versioned import VersionedCatalog
from database_transportor_spark.streaming.dedup_gate import stream_dedup_gate

root, feed, ckpt, rounds = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "1g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
cat = VersionedCatalog(spark, root)
schema = spark.read.parquet(feed + "/seed").schema
import shutil, glob, os
for i in range(rounds):
    for f in glob.glob(f"{feed}/round{i}/*.parquet"):
        shutil.copy(f, feed + "/seed/")
    stream_dedup_gate(spark, feed + "/seed", cat, "aaa_clean", "zzz_idx",
                      id_col="doc_id", text_col="text", threshold=0.8,
                      schema=schema, checkpoint=ckpt,
                      maintenance="external")
print("INGEST_DONE", flush=True)
spark.stop()
"""


def test_two_process_ingest_and_maintenance(spark, tmp_path):
    """VERDICT r9 task 3: an availableNow ingest gate in one process and
    gate_maintain in another, coordinated only by the catalog's
    cross-process writer lock — final decisions identical to a
    serialized run, index compacted, nothing torn."""
    from database_transportor_spark.sources.versioned import (
        VersionedCatalog,
    )
    from database_transportor_spark.streaming.dedup_gate import (
        gate_maintain, stream_dedup_gate,
    )

    rounds = 3
    docs = [(i, f"unique text number {i} alpha beta gamma delta") for i
            in range(24)]
    # two exact-style near-dups that must be REJECTED by the gate
    docs += [(100, "unique text number 3 alpha beta gamma delta"),
             (101, "unique text number 7 alpha beta gamma delta")]

    def _feed(base):
        per = len(docs) // rounds
        for i in range(rounds):
            chunk = docs[i * per:(i + 1) * per] if i < rounds - 1 \
                else docs[(rounds - 1) * per:]
            spark.createDataFrame(chunk, ["doc_id", "text"]) \
                .coalesce(1).write.mode("overwrite") \
                .parquet(f"{base}/round{i}")
        # seed dir needs one file for schema inference pattern above
        spark.createDataFrame([], "doc_id long, text string") \
            .coalesce(1).write.mode("overwrite").parquet(f"{base}/seed")

    # ---- serialized reference run (one process, no maintenance race)
    ref_root = str(tmp_path / "ref_cat")
    ref_feed = str(tmp_path / "ref_feed")
    _feed(ref_feed)
    ref_cat = VersionedCatalog(spark, ref_root)
    import glob
    import shutil

    schema = spark.read.parquet(ref_feed + "/seed").schema
    for i in range(rounds):
        for f in glob.glob(f"{ref_feed}/round{i}/*.parquet"):
            shutil.copy(f, ref_feed + "/seed/")
        stream_dedup_gate(
            spark, ref_feed + "/seed", ref_cat, "aaa_clean", "zzz_idx",
            id_col="doc_id", text_col="text", threshold=0.8,
            schema=schema, checkpoint=str(tmp_path / "ref_ckpt"),
            maintenance="external")
    want_ids = sorted(r["doc_id"] for r in
                      ref_cat.read("aaa_clean").collect())

    # ---- concurrent run: child process ingests, parent maintains
    root = str(tmp_path / "cat")
    feed = str(tmp_path / "feed")
    _feed(feed)
    cat = VersionedCatalog(spark, root)
    child = _spawn(_INGEST, root, feed, str(tmp_path / "ckpt"),
                   str(rounds))
    reports = []
    try:
        while child.poll() is None:
            reports.append(gate_maintain(
                spark, cat, "zzz_idx", clean_table="aaa_clean",
                compact_files=1))
            time.sleep(0.5)
        _out, err = child.communicate(timeout=30)
        assert child.returncode == 0, err.decode()[-3000:]
    finally:
        if child.poll() is None:
            child.kill()
    # one final maintenance after ingest finished
    reports.append(gate_maintain(spark, cat, "zzz_idx",
                                 clean_table="aaa_clean",
                                 compact_files=1))
    got_ids = sorted(r["doc_id"] for r in
                     cat.read("aaa_clean").collect())
    assert got_ids == want_ids  # decisions identical to serialized run
    # index rows survived every concurrent rewrite (markers aside)
    want_idx = sorted(map(tuple, ref_cat.read("zzz_idx")
                          .select("__id", "__h", "__n").collect()))
    got_idx = sorted(map(tuple, cat.read("zzz_idx")
                         .select("__id", "__h", "__n").collect()))
    assert got_idx == want_idx
    # the final post-ingest maintenance ran compaction for real: it saw
    # the index's actual file count and, with compact_files=1, must have
    # compacted whenever more than one data file existed
    final = reports[-1]
    assert final["files_before"] is not None and final["files_before"] >= 1
    assert final["compacted"] == (final["files_before"] > 1)
    if final["compacted"]:
        assert final["files_after"] == 1


_STAGE_COMMIT = """
import os, sys, time
from database_transportor_spark.sources.versioned import VersionedCatalog

class Cat(VersionedCatalog):
    def _save(self, df, target, mode):
        # Spark-free stand-in: the staging/commit/vacuum PROTOCOL is
        # under test, not parquet writing
        os.makedirs(target, exist_ok=True)
        time.sleep(float(sys.argv[4]))
        with open(os.path.join(target, "part-000.txt"), "w") as f:
            f.write(str(df))

root, payload, gap = sys.argv[1], sys.argv[2], float(sys.argv[3])
cat = Cat(None, root)
cat.write_staged(payload, "t")
time.sleep(gap)  # the stage->commit window a racing vacuum must respect
cat.commit_staged("t", note="two-proc " + payload)
print("COMMITTED", cat.current_version("t"), flush=True)
"""


class _FakeSaveCat:
    """Lazy import wrapper so module import stays Spark-free."""

    def __new__(cls, root, **kw):
        from database_transportor_spark.sources.versioned import (
            VersionedCatalog,
        )

        class Cat(VersionedCatalog):
            def _save(self, df, target, mode):
                os.makedirs(target, exist_ok=True)
                with open(os.path.join(target, "part-000.txt"), "w") as f:
                    f.write(str(df))

        return Cat(None, root, **kw)


def _wait_for(pred, timeout=20.0, poll=0.05):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(poll)
    return False


def test_vacuum_skips_in_flight_staged_write_across_processes(tmp_path):
    """VERDICT r10 #1: a CLI-style vacuum (separate process, no shared
    _pending) fired between another process's write_staged and
    commit_staged must NOT reap the staged dir — the fresh staging
    sidecar marks it in-flight — and the commit must land intact."""
    root = str(tmp_path / "cat")
    cat = _FakeSaveCat(root)
    cat.write("v1 rows", "t", mode="overwrite")
    assert cat.current_version("t") == 1

    child = _spawn(_STAGE_COMMIT, root, "staged rows", "3.0", "0")
    troot = f"{root}/t.versions"
    try:
        assert _wait_for(lambda: any(
            e.endswith(".__staging") for e in os.listdir(troot)
        )), "child never staged"
        # vacuum from THIS process (its _pending is empty — the exact
        # blind spot): must keep v1 (head) and skip the staged v2
        removed = cat.vacuum("t", keep=1)
        assert removed == []
        assert os.path.isdir(f"{troot}/v00000002")
        out, err = child.communicate(timeout=30)
        assert child.returncode == 0, err.decode()[-3000:]
        assert b"COMMITTED 2" in out
    finally:
        if child.poll() is None:
            child.kill()
    # the commit landed on intact data and cleaned its sidecar
    assert cat.current_version("t") == 2
    with open(f"{troot}/v00000002/part-000.txt") as f:
        assert f.read() == "staged rows"
    assert not any(e.endswith(".__staging") for e in os.listdir(troot))
    # and a later vacuum retires v1 normally
    assert cat.vacuum("t", keep=1) == [1]


def test_two_process_staging_never_collides_on_version(tmp_path):
    """VERDICT r10 #1 (second half): write_staged now reserves the
    version number under the cross-process writer lock, so two
    processes staging the same table concurrently get DISTINCT
    versions — neither overwrites the other's staging dir."""
    root = str(tmp_path / "cat")
    cat = _FakeSaveCat(root)
    cat.write("seed", "t", mode="overwrite")
    # 1s inside _save while holding the lock forces real overlap
    kids = [_spawn(_STAGE_COMMIT, root, tag, "0", "1.0")
            for tag in ("A", "B")]
    for p in kids:
        _out, err = p.communicate(timeout=60)
        assert p.returncode == 0, err.decode()[-3000:]
    assert cat.versions("t") == [1, 2, 3]
    payloads = set()
    for v in (2, 3):
        with open(f"{root}/t.versions/v{v:08d}/part-000.txt") as f:
            payloads.add(f.read())
    assert payloads == {"A", "B"}


def test_vacuum_reaps_stale_orphans_but_not_fresh_ones(tmp_path):
    root = str(tmp_path / "cat")
    cat = _FakeSaveCat(root)
    cat.write("v1", "t", mode="overwrite")
    troot = f"{root}/t.versions"
    # a crashed run from yesterday: dir + stale sidecar
    os.makedirs(f"{troot}/v00000007")
    stale = f"{troot}/v00000007.__staging"
    open(stale, "w").close()
    old = time.time() - 86_400
    os.utime(stale, (old, old))
    # an in-flight staging from another process: dir + fresh sidecar
    os.makedirs(f"{troot}/v00000008")
    open(f"{troot}/v00000008.__staging", "w").close()
    removed = cat.vacuum("t", keep=3, orphan_grace=3600.0)
    assert removed == [7]
    assert not os.path.exists(f"{troot}/v00000007")
    assert os.path.isdir(f"{troot}/v00000008")
    # grace=0 treats every sidecar as stale — the force knob
    assert cat.vacuum("t", keep=3, orphan_grace=0.0) == [8]


def test_vacuum_respects_pinned_versions(tmp_path):
    root = str(tmp_path / "cat")
    cat = _FakeSaveCat(root)
    for i in range(1, 5):
        cat.write(f"v{i}", "t", mode="overwrite")
    with pytest.raises(ValueError, match="not committed"):
        cat.pin_version("t", 99)
    cat.pin_version("t", 1)
    assert cat.pinned_versions("t") == [1]
    assert cat.vacuum("t", keep=1) == [2, 3]  # head 4 kept, pin 1 kept
    assert cat.versions("t") == [1, 4]
    cat.unpin_version("t", 1)
    assert cat.vacuum("t", keep=1) == [1]


def test_remote_roots_are_refused_loudly():
    from database_transportor_spark.sources.versioned import (
        VersionedCatalog,
    )

    for root in ("s3a://bucket/warehouse", "gs://b/x", "abfss://c@a/x",
                 "hdfs://nn:8020/w"):
        with pytest.raises(ValueError, match="locally-mounted"):
            VersionedCatalog(None, root)
    with pytest.raises(ValueError, match="object store"):
        ProcessLock("s3a://bucket/t.versions/_LOCK")
    # plain and file:// paths stay constructible
    ProcessLock("/tmp/some/_LOCK")
    ProcessLock("file:///tmp/some/_LOCK")


def test_lock_factory_replaces_flock(tmp_path):
    """The documented object-store escape hatch: a user-supplied lease
    lock is composed into writer_lock instead of flock."""
    events = []

    class Lease:
        def __init__(self, path, timeout):
            self.path = path
            events.append(("new", path))

        def acquire(self):
            events.append(("acquire", self.path))

        def release(self):
            events.append(("release", self.path))

    root = str(tmp_path / "cat")
    cat = _FakeSaveCat(root, lock_factory=Lease)
    cat.write("rows", "t", mode="overwrite")
    kinds = [k for k, _ in events]
    assert kinds == ["new", "acquire", "release"]
    assert events[0][1].endswith("t.versions/_LOCK")
    # no flock file was ever created — the factory fully replaced it
    assert not os.path.exists(f"{root}/t.versions/_LOCK")


def test_unsupported_filesystem_fails_fast(tmp_path, monkeypatch):
    """ADVICE r10: EINVAL/ENOTSUP from flock means the mount cannot
    lock at all — raise immediately with the real cause instead of
    spinning the timeout and blaming a phantom holder."""
    import errno

    from database_transportor_spark.sources import locks as locks_mod

    def no_flock(fd, op):
        raise OSError(errno.EINVAL, "Invalid argument")

    monkeypatch.setattr(locks_mod.fcntl, "flock", no_flock)
    t0 = time.monotonic()
    with pytest.raises(OSError, match="does not support flock"):
        ProcessLock(str(tmp_path / "L"), timeout=30).acquire()
    assert time.monotonic() - t0 < 5  # no 30s contention spin


_CRITICAL_LEASE = """
import sys, time
from database_transportor_spark.sources.locks import LeaseLock
lock_path, log_path, tag = sys.argv[1], sys.argv[2], sys.argv[3]
with LeaseLock(lock_path, timeout=30, ttl=10):
    with open(log_path, "a") as f:
        f.write(f"{tag} enter {time.monotonic()}\\n")
        f.flush()
        time.sleep(0.4)
        f.write(f"{tag} exit {time.monotonic()}\\n")
"""


def test_lease_lock_excludes_across_processes(tmp_path):
    from database_transportor_spark.sources.locks import LeaseLock

    lock = str(tmp_path / "L")
    log = str(tmp_path / "log")
    procs = [_spawn(_CRITICAL_LEASE, lock, log, t) for t in ("a", "b", "c")]
    for p in procs:
        _out, err = p.communicate(timeout=60)
        assert p.returncode == 0, err.decode()
    spans = {}
    for line in open(log):
        tag, kind, t = line.split()
        spans.setdefault(tag, {})[kind] = float(t)
    assert len(spans) == 3
    ordered = sorted(spans.values(), key=lambda s: s["enter"])
    for prev, nxt in zip(ordered, ordered[1:]):
        assert prev["exit"] <= nxt["enter"]  # critical sections disjoint
    # a clean final release leaves no lease behind
    assert not os.path.exists(lock + ".lease")
    # fencing tokens were handed out monotonically across processes
    with open(lock + ".token") as f:
        assert int(f.read()) == 3


def test_lease_lock_takes_over_expired_lease(tmp_path):
    """A crashed holder (lease on disk, expiry in the past, nobody
    refreshing) is survivable: the next contender takes over within
    its timeout and gets a HIGHER fencing token."""
    from database_transportor_spark.sources.locks import LeaseLock

    lock = str(tmp_path / "L")
    with open(lock + ".lease", "w") as f:
        f.write(f"deadbeef 7 {time.time() - 5}\n")
    with open(lock + ".token", "w") as f:
        f.write("7")
    ll = LeaseLock(lock, timeout=5, ttl=10)
    t0 = time.monotonic()
    ll.acquire()
    try:
        assert time.monotonic() - t0 < 2  # takeover, not timeout-wait
        assert ll.fencing_token == 8  # zombie's 7 is fenced off
    finally:
        ll.release()


def test_lease_lock_refresh_protects_live_holder(tmp_path):
    """Auto-refresh: a LIVE holder with a short ttl is never taken
    over, however long the hold — the contender times out instead."""
    from database_transportor_spark.sources.locks import LeaseLock

    lock = str(tmp_path / "L")
    holder = LeaseLock(lock, timeout=5, ttl=0.6)
    holder.acquire()
    try:
        # 2s >> ttl: without refresh the contender would take over
        with pytest.raises(TimeoutError, match="writer lease"):
            LeaseLock(lock, timeout=2, ttl=0.6).acquire()
    finally:
        holder.release()
    assert holder.fencing_token is None  # cleared on release
    nxt = LeaseLock(lock, timeout=2, ttl=0.6)
    nxt.acquire()  # released -> acquirable immediately
    try:
        assert nxt.fencing_token == 2  # monotonic across holders
    finally:
        nxt.release()


def test_lease_lock_is_not_reentrant_and_composes_with_catalog(tmp_path):
    from database_transportor_spark.sources.locks import LeaseLock

    ll = LeaseLock(str(tmp_path / "L"))
    ll.acquire()
    try:
        with pytest.raises(RuntimeError, match="not reentrant"):
            ll.acquire()
    finally:
        ll.release()
    # the catalog composes it exactly like ProcessLock (reentrancy
    # comes from the RLock wrapper): full write/stage/commit/vacuum
    # cycle under lease coordination
    root = str(tmp_path / "cat")
    cat = _FakeSaveCat(root, lock_factory=LeaseLock)
    cat.write("v1", "t", mode="overwrite")
    cat.write_staged("v2", "t")
    assert cat.vacuum("t", keep=1) == []  # staged v2 sidecar is fresh
    cat.commit_staged("t")
    assert cat.current_version("t") == 2
    assert cat.vacuum("t", keep=1) == [1]
    assert not os.path.exists(f"{root}/t.versions/_LOCK.lease")
