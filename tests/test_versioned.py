"""Tests for VersionedCatalog: time travel, rollback, staged commits,
vacuum, and use as a transport target."""

import pytest

from database_transportor_spark import DBT, MemoryCatalog
from database_transportor_spark.sources.versioned import VersionedCatalog


def _cat(spark, tmp_path):
    return VersionedCatalog(spark, str(tmp_path), format="parquet")


def test_write_read_versions_and_time_travel(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.write(spark.range(3), "t", mode="overwrite")
    cat.write(spark.range(5), "t", mode="overwrite")
    assert cat.versions("t") == [1, 2]
    assert cat.current_version("t") == 2
    assert cat.read("t").count() == 5
    assert cat.read("t", version=1).count() == 3  # time travel


def test_append_is_copy_on_write(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.write(spark.range(3), "t", mode="overwrite")
    cat.write(spark.range(3, 5), "t", mode="append")
    assert cat.read("t").count() == 5
    assert cat.read("t", version=1).count() == 3  # history immutable


def test_rollback_is_pointer_move(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.write(spark.range(3), "t", mode="overwrite")
    cat.write(spark.range(99), "t", mode="overwrite")  # the "bad" transport
    cat.rollback("t", 1)
    assert cat.read("t").count() == 3
    assert cat.versions("t") == [1, 2]  # data retained until vacuum
    with pytest.raises(ValueError):
        cat.rollback("t", 7)


def test_staged_commit_and_abort(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.write(spark.range(3), "t", mode="overwrite")
    cat.write_staged(spark.range(10), "t")
    assert cat.read("t").count() == 3  # not visible before commit
    cat.commit_staged("t")
    assert cat.read("t").count() == 10
    cat.write_staged(spark.range(1), "t")
    cat.abort_staged("t")
    assert cat.read("t").count() == 10
    assert cat.versions("t") == [1, 2]  # aborted version dir removed
    with pytest.raises(RuntimeError):
        cat.commit_staged("t")


def test_vacuum_keeps_head_and_newest(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    for i in range(1, 6):
        cat.write(spark.range(i), "t", mode="overwrite")
    cat.rollback("t", 2)
    removed = cat.vacuum("t", keep=2)
    assert removed == [1, 3]  # head (2) kept despite not being newest
    assert sorted(cat.versions("t")) == [2, 4, 5]
    assert cat.read("t").count() == 2


def test_transport_into_versioned_target(spark, tmp_path):
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    cat = _cat(spark, tmp_path)
    maps = {"users": {"original_table": "src",
                      "columns": {"user_id": "id", "username": "name"}}}
    eng = DBT(maps, target=cat, original=MemoryCatalog({"src": src}))
    eng.do_transport(mode="overwrite")
    eng.do_transport(mode="overwrite")
    assert cat.versions("users") == [1, 2]
    got = cat.read("users")
    assert sorted(r["user_id"] for r in got.collect()) == [1, 2]
    assert set(got.columns) == {"user_id", "username"}


def test_history_and_rollback_cli(spark, tmp_path):
    from test_cli import _run

    cat = _cat(spark, tmp_path)
    cat.write(spark.range(3), "t", mode="overwrite")
    cat.write(spark.range(7), "t", mode="overwrite")

    r = _run(["history", "--root", str(tmp_path), "--table", "t",
              "--master", "local[2]"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    # history now prints "vNNNNNNNN  <time>  [<note>]  <- HEAD"
    assert "v00000002" in r.stdout
    head_line = [ln for ln in r.stdout.splitlines() if "<- HEAD" in ln]
    assert len(head_line) == 1 and head_line[0].startswith("v00000002")

    r = _run(["rollback", "--root", str(tmp_path), "--table", "t",
              "--version", "1", "--master", "local[2]"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert cat.read("t").count() == 3


def test_write_after_rollback_never_destroys_history(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    for n in (3, 5, 7):
        cat.write(spark.range(n), "t", mode="overwrite")
    cat.rollback("t", 1)
    cat.write(spark.range(9), "t", mode="overwrite")  # must become v4
    assert cat.versions("t") == [1, 2, 3, 4]
    assert cat.read("t", version=2).count() == 5  # history intact
    assert cat.read("t", version=3).count() == 7
    assert cat.read("t").count() == 9


def test_uncommitted_staged_version_is_invisible(spark, tmp_path):
    cat = _cat(spark, tmp_path)
    cat.write(spark.range(3), "t", mode="overwrite")
    cat.write_staged(spark.range(50), "t")  # simulate a crashed run: never
    # committed, never aborted
    cat2 = _cat(spark, tmp_path)  # fresh process view
    assert cat2.versions("t") == [1]  # phantom v2 not listed
    with pytest.raises(ValueError):
        cat2.rollback("t", 2)  # and not a rollback target
    cat2.write(spark.range(4), "t", mode="overwrite")
    assert cat2.read("t").count() == 4  # next write skips the orphan slot


def test_time_travel_refuses_uncommitted_version(spark, tmp_path):
    # explicit read(version=N) must honor the same commit-marker gate as
    # versions()/rollback(): a staged/orphaned dir may hold partial data
    cat = _cat(spark, tmp_path)
    cat.write(spark.range(3), "t", mode="overwrite")
    cat.write_staged(spark.range(50), "t")  # v2 staged, never committed
    with pytest.raises(ValueError, match="not committed"):
        cat.read("t", version=2)
    cat.commit_staged("t")
    assert cat.read("t", version=2).count() == 50  # committed → readable


def test_staged_then_plain_write_never_collide(spark, tmp_path):
    # a plain write() racing a pending staged write must not reuse the
    # staged version number: _next_version consults _pending/_reserved
    cat = _cat(spark, tmp_path)
    cat.write(spark.range(3), "t", mode="overwrite")          # v1
    cat.write_staged(spark.range(10), "t")                    # reserves v2
    cat.write(spark.range(7), "t", mode="overwrite")          # must take v3
    cat.commit_staged("t")                                    # commits v2
    assert cat.versions("t") == [1, 2, 3]
    assert cat.read("t", version=2).count() == 10
    assert cat.read("t", version=3).count() == 7


def test_sql_cli_over_versioned_root(spark, tmp_path):
    from test_cli import _run

    cat = _cat(spark, tmp_path)
    cat.write(spark.range(6).withColumnRenamed("id", "k"), "t",
              mode="overwrite")
    r = _run(["sql", "--root", str(tmp_path), "--format", "versioned",
              "--query", "SELECT count(*) AS n FROM t",
              "--master", "local[2]"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "6" in r.stdout


def test_commit_staged_serializes_with_writer_lock(spark, tmp_path):
    """commit_staged's head move must wait for any writer_lock holder —
    the serialization that stops an append from basing its union on a
    pre-commit head and silently dropping the staged batch's rows."""
    import threading
    import time

    cat = _cat(spark, tmp_path)
    cat.write(spark.range(3), "t", mode="overwrite")
    cat.write_staged(spark.range(10), "t")
    order = []
    with cat.writer_lock("t"):
        th = threading.Thread(
            target=lambda: (cat.commit_staged("t"), order.append("commit"))
        )
        th.start()
        time.sleep(0.4)
        order.append("holder-done")
    th.join(30)
    assert order == ["holder-done", "commit"]
    assert cat.read("t").count() == 10


def test_append_vs_staged_merge_no_lost_update(spark, tmp_path):
    """A read→merge→stage→commit sequence under writer_lock (the
    stream-merge sink's shape) racing a plain append loses neither
    side's rows, whichever order the lock grants."""
    import threading

    cat = _cat(spark, tmp_path)
    cat.write(
        spark.range(5).withColumnRenamed("id", "k"), "t", mode="overwrite"
    )
    started = threading.Event()

    def staged_merge():
        with cat.writer_lock("t"):
            started.set()
            live = cat.read("t")
            merged = live.unionByName(
                spark.range(100, 103).withColumnRenamed("id", "k")
            )
            cat.write_staged(merged, "t")
            cat.commit_staged("t")

    th = threading.Thread(target=staged_merge)
    th.start()
    started.wait(30)
    # append races the in-flight staged merge; the lock serializes them
    cat.write(spark.range(200, 202).withColumnRenamed("id", "k"), "t")
    th.join(60)
    ks = sorted(r["k"] for r in cat.read("t").collect())
    assert ks == [0, 1, 2, 3, 4, 100, 101, 102, 200, 201]
