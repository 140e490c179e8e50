"""Watermark-based incremental transport (do_incremental_transport)."""

import pytest
from pyspark.sql import functions as F

from database_transportor_spark import DBT, ParquetCatalog
from database_transportor_spark.spec import SpecError


def _maps():
    return {
        "evts": {
            "original_table": "src",
            "columns": {"event_id": "id", "val": "v"},
        }
    }


def _eng(spark, src_root, tgt_root):
    return DBT(
        _maps(),
        target=ParquetCatalog(spark, str(tgt_root)),
        original=ParquetCatalog(spark, str(src_root)),
    )


def _write_src(spark, root, rows):
    spark.createDataFrame(rows, ["id", "v"]).write.mode("overwrite").parquet(
        f"{root}/src.parquet"
    )


def test_incremental_appends_only_new_rows(spark, tmp_path):
    src, tgt = tmp_path / "src", tmp_path / "tgt"
    _write_src(spark, src, [(1, "a"), (2, "b")])
    # first run: empty target -> full load
    _eng(spark, src, tgt).do_incremental_transport({"evts": "event_id"})
    out = spark.read.parquet(f"{tgt}/evts.parquet")
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2]

    # new source rows arrive; rerun ingests strictly-greater cursors only
    _write_src(spark, src, [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    _eng(spark, src, tgt).do_incremental_transport({"evts": "event_id"})
    out = spark.read.parquet(f"{tgt}/evts.parquet")
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2, 3, 4]

    # no new rows: rerun is a no-op, nothing duplicated
    _eng(spark, src, tgt).do_incremental_transport({"evts": "event_id"})
    out = spark.read.parquet(f"{tgt}/evts.parquet")
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2, 3, 4]


def test_incremental_pushes_cursor_to_scan(spark, tmp_path):
    src, tgt = tmp_path / "src", tmp_path / "tgt"
    _write_src(spark, src, [(i, "x") for i in range(10)])
    eng = _eng(spark, src, tgt)
    eng.do_incremental_transport({"evts": "event_id"})
    eng2 = _eng(spark, src, tgt)
    eng2._incremental_filters = {"evts": ("id", 9)}
    plan = eng2.build_map("evts")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(id,9)" in plan


def test_incremental_rejects_computed_cursor(spark, tmp_path):
    src, tgt = tmp_path / "src", tmp_path / "tgt"
    _write_src(spark, src, [(1, "a")])
    maps = {
        "evts": {
            "original_table": "src",
            "columns": {
                "event_id": {"original": "id", "function": "id + 1"},
                "val": "v",
            },
        }
    }
    eng = DBT(maps, target=ParquetCatalog(spark, str(tgt)),
              original=ParquetCatalog(spark, str(src)))
    with pytest.raises(SpecError, match="plain renamed"):
        eng.do_incremental_transport({"evts": "event_id"})


def test_incremental_rejects_unknown_map_and_column(spark, tmp_path):
    src, tgt = tmp_path / "src", tmp_path / "tgt"
    _write_src(spark, src, [(1, "a")])
    eng = _eng(spark, src, tgt)
    with pytest.raises(SpecError, match="unknown map"):
        eng.do_incremental_transport({"nope": "event_id"})
    with pytest.raises(SpecError, match="not produced"):
        eng.do_incremental_transport({"evts": "missing_col"})


def test_incremental_jdbc_roundtrip_derby(spark, tmp_path):
    """Incremental transport against a live RDBMS target (embedded Derby):
    watermark probe + append, idempotent reruns."""
    from database_transportor_spark.sources.catalog import JDBCCatalog

    url = f"jdbc:derby:{tmp_path}/incdb;create=true"
    src = tmp_path / "src"
    _write_src(spark, src, [(1, "a"), (2, "b")])
    tgt = JDBCCatalog(spark, url)

    def eng():
        return DBT(_maps(), target=tgt,
                   original=ParquetCatalog(spark, str(src)))

    eng().do_incremental_transport({"evts": "event_id"})
    assert tgt.read("evts").count() == 2

    _write_src(spark, src, [(1, "a"), (2, "b"), (3, "c")])
    eng().do_incremental_transport({"evts": "event_id"})
    rows = sorted(r[0] for r in tgt.read("evts").select("event_id").collect())
    assert rows == [1, 2, 3]

    # no new rows -> no-op
    eng().do_incremental_transport({"evts": "event_id"})
    assert tgt.read("evts").count() == 3


# --- do_merge_transport: incremental UPSERT by cursor ----------------------

def _merge_maps():
    return {
        "evts": {
            "original_table": "src",
            "columns": {"event_id": "id", "val": "v", "mod": "m"},
        }
    }


def _write_src3(spark, root, rows):
    spark.createDataFrame(rows, ["id", "v", "m"]).write.mode("overwrite").parquet(
        f"{root}/src.parquet"
    )


def test_merge_transport_applies_updates_and_inserts(spark, tmp_path):
    src, tgt = tmp_path / "src", tmp_path / "tgt"
    _write_src3(spark, src, [(1, "a", 1), (2, "b", 1)])

    def eng():
        return DBT(_merge_maps(), target=ParquetCatalog(spark, str(tgt)),
                   original=ParquetCatalog(spark, str(src)))

    # first run: empty target -> full load
    eng().do_merge_transport({"evts": "mod"}, {"evts": "event_id"})
    out = spark.read.parquet(f"{tgt}/evts.parquet")
    assert sorted((r["event_id"], r["val"]) for r in out.collect()) == [
        (1, "a"), (2, "b")
    ]

    # row 1 UPDATED (cursor bumped), row 3 inserted; row 2 untouched
    _write_src3(spark, src, [(1, "A", 2), (2, "b", 1), (3, "c", 2)])
    eng().do_merge_transport({"evts": "mod"}, {"evts": "event_id"})
    out = spark.read.parquet(f"{tgt}/evts.parquet")
    assert sorted((r["event_id"], r["val"]) for r in out.collect()) == [
        (1, "A"), (2, "b"), (3, "c")
    ], "update must replace, insert must add, untouched row must survive"

    # idempotent rerun: nothing past the watermark -> same table
    eng().do_merge_transport({"evts": "mod"}, {"evts": "event_id"})
    out = spark.read.parquet(f"{tgt}/evts.parquet")
    assert out.count() == 3


def test_merge_transport_same_key_twice_latest_cursor_wins(spark, tmp_path):
    src, tgt = tmp_path / "src", tmp_path / "tgt"
    _write_src3(spark, src, [(1, "a", 1)])

    def eng():
        return DBT(_merge_maps(), target=ParquetCatalog(spark, str(tgt)),
                   original=ParquetCatalog(spark, str(src)))

    eng().do_merge_transport({"evts": "mod"}, {"evts": "event_id"})
    # two fresh versions of key 1 in one batch: highest cursor must win
    _write_src3(spark, src, [(1, "mid", 2), (1, "new", 3)])
    eng().do_merge_transport({"evts": "mod"}, {"evts": "event_id"})
    out = spark.read.parquet(f"{tgt}/evts.parquet")
    assert [(r["event_id"], r["val"]) for r in out.collect()] == [(1, "new")]


def test_merge_transport_requires_keys(spark, tmp_path):
    src, tgt = tmp_path / "src", tmp_path / "tgt"
    _write_src3(spark, src, [(1, "a", 1)])
    eng = DBT(_merge_maps(), target=ParquetCatalog(spark, str(tgt)),
              original=ParquetCatalog(spark, str(src)))
    with pytest.raises(SpecError, match="merge keys missing"):
        eng.do_merge_transport({"evts": "mod"}, {})


def test_merge_transport_jdbc_derby(spark, tmp_path):
    """Merge transport against a live RDBMS target: the merged plan reads
    the very table the staged swap replaces — must stay consistent."""
    from database_transportor_spark.sources.catalog import JDBCCatalog

    url = f"jdbc:derby:{tmp_path}/mergedb;create=true"
    src = tmp_path / "src"
    _write_src3(spark, src, [(1, "a", 1), (2, "b", 1)])
    tgt = JDBCCatalog(spark, url)

    def eng():
        return DBT(_merge_maps(), target=tgt,
                   original=ParquetCatalog(spark, str(src)))

    eng().do_merge_transport({"evts": "mod"}, {"evts": "event_id"})
    assert tgt.read("evts").count() == 2

    _write_src3(spark, src, [(1, "A", 2), (2, "b", 1), (3, "c", 2)])
    eng().do_merge_transport({"evts": "mod"}, {"evts": "event_id"})
    rows = sorted(
        (r["event_id"], r["val"]) for r in tgt.read("evts").collect()
    )
    assert rows == [(1, "A"), (2, "b"), (3, "c")]


# --- staged incremental: atomic swap must not lose pre-watermark rows ------

def test_staged_incremental_preserves_prewatermark_rows(spark, tmp_path):
    """staged=True swaps the staging table over the live one — the staged
    frame must therefore be live ∪ delta, never the delta alone (which
    would silently delete every already-transported row on commit)."""
    src, tgt = tmp_path / "src", tmp_path / "tgt"
    _write_src(spark, src, [(1, "a"), (2, "b")])
    _eng(spark, src, tgt).do_incremental_transport(
        {"evts": "event_id"}, staged=True
    )
    out = spark.read.parquet(f"{tgt}/evts.parquet")
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2]

    _write_src(spark, src, [(1, "a"), (2, "b"), (3, "c")])
    _eng(spark, src, tgt).do_incremental_transport(
        {"evts": "event_id"}, staged=True
    )
    out = spark.read.parquet(f"{tgt}/evts.parquet")
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2, 3], (
        "pre-watermark rows must survive a staged incremental swap"
    )

    # idempotent rerun
    _eng(spark, src, tgt).do_incremental_transport(
        {"evts": "event_id"}, staged=True
    )
    out = spark.read.parquet(f"{tgt}/evts.parquet")
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2, 3]


def _dim_fact_maps():
    return {
        "dim": {
            "original_table": "dsrc",
            "columns": {"dkey": "k", "dname": "n"},
        },
        "fact": {
            "original_table": "fsrc",
            "transport_after": "dim",
            "columns": {"fid": "id", "dfk": "dk"},
        },
    }


def test_incremental_fk_validates_against_final_not_delta(spark, tmp_path):
    """During an incremental run the in-flight dim output is the DELTA
    only; an FK rule on the fact map must still accept references to
    UNCHANGED dim keys (they live in the committed target), so the ref
    resolves against live ∪ delta, not the delta."""
    src, tgt = tmp_path / "src", tmp_path / "tgt"
    spark.createDataFrame([(1, "x"), (2, "y")], ["k", "n"]).write.parquet(
        f"{src}/dsrc.parquet"
    )
    spark.createDataFrame([(10, 1)], ["id", "dk"]).write.parquet(
        f"{src}/fsrc.parquet"
    )

    def eng():
        return DBT(_dim_fact_maps(), target=ParquetCatalog(spark, str(tgt)),
                   original=ParquetCatalog(spark, str(src)))

    fk = {"fact": [{"rule": "foreign_key", "column": "dfk",
                    "ref_table": "dim", "ref_column": "dkey"}]}
    eng().do_incremental_transport(
        {"dim": "dkey", "fact": "fid"}, validate=fk
    )

    # second run: NO new dim rows (delta dim is empty), one new fact row
    # referencing the OLD dim key 2 — must validate green
    spark.createDataFrame([(10, 1), (11, 2)], ["id", "dk"]).write.mode(
        "overwrite"
    ).parquet(f"{src}/fsrc.parquet")
    eng().do_incremental_transport(
        {"dim": "dkey", "fact": "fid"}, validate=fk
    )
    out = spark.read.parquet(f"{tgt}/fact.parquet")
    assert sorted(r["fid"] for r in out.collect()) == [10, 11]

    # a fact row referencing a key in NEITHER live nor delta still aborts
    from database_transportor_spark.operators.validate import ValidationError

    spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99)], ["id", "dk"]
    ).write.mode("overwrite").parquet(f"{src}/fsrc.parquet")
    with pytest.raises(ValidationError, match="foreign_key"):
        eng().do_incremental_transport(
            {"dim": "dkey", "fact": "fid"}, validate=fk
        )


def test_incremental_full_run_maps_not_duplicated(spark, tmp_path):
    """Maps NOT named in cursors are full recomputes: a rerun must
    OVERWRITE them, never append a second copy of every row."""
    src, tgt = tmp_path / "src", tmp_path / "tgt"
    spark.createDataFrame([(1, "x"), (2, "y")], ["k", "n"]).write.parquet(
        f"{src}/dsrc.parquet"
    )
    spark.createDataFrame([(10, 1)], ["id", "dk"]).write.parquet(
        f"{src}/fsrc.parquet"
    )

    def eng():
        return DBT(_dim_fact_maps(), target=ParquetCatalog(spark, str(tgt)),
                   original=ParquetCatalog(spark, str(src)))

    # only the FACT has a cursor; dim is a full-run map
    eng().do_incremental_transport({"fact": "fid"})
    eng().do_incremental_transport({"fact": "fid"})
    dim = spark.read.parquet(f"{tgt}/dim.parquet")
    assert dim.count() == 2, "full-run map duplicated by incremental rerun"
    fact = spark.read.parquet(f"{tgt}/fact.parquet")
    assert fact.count() == 1


def test_staged_incremental_validates_delta_only(spark, tmp_path):
    """A pre-existing live row violating a rule must NOT block future
    staged incremental runs — validation covers the ingested delta."""
    from database_transportor_spark.operators.validate import ValidationError

    src, tgt = tmp_path / "src", tmp_path / "tgt"
    # first load contains a NULL v (historically tolerated)
    spark.createDataFrame([(1, None), (2, "b")], ["id", "v"]).write.parquet(
        f"{src}/src.parquet"
    )
    _eng(spark, src, tgt).do_incremental_transport(
        {"evts": "event_id"}, staged=True
    )
    rules = {"evts": [{"rule": "not_null", "column": "val"}]}
    # new clean row: must pass even though live row 1 violates not_null
    spark.createDataFrame(
        [(1, None), (2, "b"), (3, "c")], ["id", "v"]
    ).write.mode("overwrite").parquet(f"{src}/src.parquet")
    _eng(spark, src, tgt).do_incremental_transport(
        {"evts": "event_id"}, staged=True, validate=rules
    )
    out = spark.read.parquet(f"{tgt}/evts.parquet")
    assert out.count() == 3
    # a dirty DELTA row still aborts
    spark.createDataFrame(
        [(1, None), (2, "b"), (3, "c"), (4, None)], ["id", "v"]
    ).write.mode("overwrite").parquet(f"{src}/src.parquet")
    with pytest.raises(ValidationError):
        _eng(spark, src, tgt).do_incremental_transport(
            {"evts": "event_id"}, staged=True, validate=rules
        )


def test_incremental_parallelism_matches_sequential(spark, tmp_path):
    """--parallel plumbed into incremental transports (ADVICE r3): two
    independent maps run concurrently and produce the same tables as a
    sequential run — including correct append-vs-overwrite modes."""
    maps = {
        "evts": {"original_table": "src",
                 "columns": {"event_id": "id", "val": "v"}},
        "full": {"original_table": "src2",
                 "columns": {"fid": "id2", "w": "w"}},
    }

    def eng(src, tgt):
        return DBT(maps, target=ParquetCatalog(spark, str(tgt)),
                   original=ParquetCatalog(spark, str(src)))

    src = tmp_path / "src"
    _write_src(spark, src, [(1, "a"), (2, "b")])
    spark.createDataFrame([(10, "x")], ["id2", "w"]).write.mode(
        "overwrite").parquet(f"{src}/src2.parquet")
    for name, par in (("seq", 1), ("par", 3)):
        tgt = tmp_path / name
        eng(src, tgt).do_incremental_transport(
            {"evts": "event_id"}, parallelism=par
        )
    _write_src(spark, src, [(1, "a"), (2, "b"), (3, "c")])
    for name, par in (("seq", 1), ("par", 3)):
        tgt = tmp_path / name
        eng(src, tgt).do_incremental_transport(
            {"evts": "event_id"}, parallelism=par
        )
    seq_e = sorted(r["event_id"] for r in
                   spark.read.parquet(f"{tmp_path}/seq/evts.parquet").collect())
    par_e = sorted(r["event_id"] for r in
                   spark.read.parquet(f"{tmp_path}/par/evts.parquet").collect())
    assert seq_e == par_e == [1, 2, 3]
    # the full-run map overwrote (not duplicated) in both
    for name in ("seq", "par"):
        assert spark.read.parquet(f"{tmp_path}/{name}/full.parquet").count() == 1


def test_merge_transport_parallelism(spark, tmp_path):
    src, tgt = tmp_path / "src", tmp_path / "tgt"
    _write_src(spark, src, [(1, "a"), (2, "b")])
    _eng(spark, src, tgt).do_merge_transport(
        {"evts": "event_id"}, {"evts": "event_id"}, parallelism=2
    )
    _write_src(spark, src, [(1, "a"), (2, "B2"), (3, "c")])
    # bump row 2's cursor is not possible with id cursor; just append 3
    _eng(spark, src, tgt).do_merge_transport(
        {"evts": "event_id"}, {"evts": "event_id"}, parallelism=2
    )
    out = spark.read.parquet(f"{tgt}/evts.parquet")
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2, 3]


def test_jdbc_partitioned_parallel_read_derby(spark, tmp_path):
    """Partitioned JDBC read (sources/catalog.py partition_options): the
    production knob for parallel fact-table reads off an RDBMS.  Asserts
    (a) value parity with the unpartitioned read and (b) the scan really
    splits into numPartitions input tasks (one bound-range query each)."""
    from database_transportor_spark.sources.catalog import JDBCCatalog

    url = f"jdbc:derby:{tmp_path}/pardb;create=true"
    plain = JDBCCatalog(spark, url)
    n = 1000
    plain.write(
        spark.range(1, n + 1).select(
            F.col("id").alias("event_id"),
            F.concat(F.lit("v"), F.col("id")).alias("val"),
        ),
        "evts", mode="overwrite",
    )

    part = JDBCCatalog(
        spark, url,
        partition_options={"evts": {
            "partitionColumn": "event_id",
            "lowerBound": 1, "upperBound": n + 1, "numPartitions": 4,
        }},
    )
    pdf = part.read("evts")
    # (b) genuinely parallel: 4 JDBC input partitions, each non-empty
    assert pdf.rdd.getNumPartitions() == 4
    sizes = pdf.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    assert len(sizes) == 4 and all(s > 0 for s in sizes) and sum(sizes) == n
    # (a) parity with the single-task read — no dropped/duplicated bound rows
    a = sorted((r["event_id"], r["val"]) for r in pdf.collect())
    b = sorted((r["event_id"], r["val"]) for r in plain.read("evts").collect())
    assert a == b and len(a) == n

    # the partitioned catalog drives a real transport identically
    maps = {"out": {"original_table": "evts",
                    "columns": {"eid": "event_id", "v": "val"}}}
    out_root = tmp_path / "out"
    DBT(maps, target=ParquetCatalog(spark, str(out_root)),
        original=part).do_transport(mode="overwrite")
    assert spark.read.parquet(f"{out_root}/out.parquet").count() == n
