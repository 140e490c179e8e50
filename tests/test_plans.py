"""Physical-plan assertions: the plans the engine must keep producing.

Correctness tests can all pass while the plan silently degrades (lost
pushdown, fan-out joins, dropped broadcast, duplicate scans); these tests
pin the plan shape that makes the engine scale.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _entry():
    import __spark_entry__ as e

    return e


def _plan(df, mode="formatted"):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_refer_single_broadcasts_and_prunes(spark):
    df = _entry().queries()["refer_single"](spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    # driving scan reads only the referenced columns
    assert "o_totalprice" not in plan
    assert "o_comment" not in plan


def test_filter_pushdown_reaches_scan(spark):
    df = _entry().queries()["filter_conditions"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters:" in plan
    # the between bounds actually pushed, not just IsNotNull
    assert "GreaterThanOrEqual(l_quantity,10" in plan, plan


def test_refers_merge_single_join(spark):
    # two refers over the same (table, key) must plan exactly ONE join
    df = _entry().queries()["refers_group"](spark, SF)
    plan = _plan(df, "simple")
    assert plan.count("Join") == 1, plan


def test_refer_join_never_inner(spark):
    # enrichment must stay left-outer: an inner join would drop miss rows
    df = _entry().queries()["refer_single"](spark, SF)
    plan = _plan(df, "simple")
    assert "LeftOuter" in plan


def test_text_stats_no_shuffle(spark):
    df = _entry().queries()["text_stats"](spark, SF)
    plan = _plan(df, "simple")
    assert "Exchange" not in plan, plan


def test_scan_project_prunes_unused_columns(spark):
    df = _entry().queries()["scan_project"](spark, SF)
    plan = _plan(df)
    # customer has 8 columns; the query uses 4 — address/comment must not scan
    assert "c_address" not in plan
    assert "c_comment" not in plan


def test_split_assign_zero_shuffle(spark):
    # split assignment is a pure projection — any Exchange would mean the
    # hash-cut stopped being partition-stable
    df = _entry().queries()["split_assign"](spark, SF)
    plan = _plan(df, "simple")
    assert "Exchange" not in plan, plan


def test_decontaminate_broadcasts_benchmark(spark):
    # the benchmark shingle set must broadcast; a shuffle join here would
    # move the whole corpus posting list at 100 TB
    df = _entry().queries()["decontaminate"](spark, SF)
    plan = _plan(df, "simple")
    assert "BroadcastHashJoin" in plan, plan


def test_pack_sequences_single_window_pass(spark):
    # one hash-partitioned exchange for the per-group window, nothing more
    df = _entry().queries()["pack_sequences"](spark, SF)
    plan = _plan(df, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" in plan


def test_preloaded_lookup_broadcasts(spark):
    """set_preload (S5 setter parity, DBT.php:546-548): a preloaded lookup
    table joins via BroadcastHashJoin — no shuffle of the fact side."""
    from database_transportor_spark import DBT, ParquetCatalog

    maps = {
        "out": {
            "original_table": "orders",
            "columns": {
                "id": "o_orderkey",
                "segment": {
                    "refer": {
                        "search_source": "original",
                        "search_table": "customer",
                        "search_column": "c_custkey",
                        "according_column": "id",
                        "wanted_column": "c_mktsegment",
                    },
                },
            },
        }
    }
    cat = ParquetCatalog(spark, SF)
    eng = DBT(maps, target=cat, original=cat).set_preload({"original": ["customer"]})
    df = eng.transform()["out"]
    plan = _plan(df, "simple")
    assert "BroadcastHashJoin" in plan, plan


def test_parallel_transport_matches_sequential(spark, tmp_path):
    from database_transportor_spark import DBT, MemoryCatalog, ParquetCatalog

    src = MemoryCatalog({
        "a": spark.range(100).withColumnRenamed("id", "k"),
        "b": spark.range(50).withColumnRenamed("id", "k"),
        "c": spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string"),
    })
    maps = {
        "ta": {"original_table": "a", "columns": {"k": "k"}},
        "tb": {"original_table": "b", "columns": {"k": "k"}},
        # dependent map: must still run AFTER ta despite parallelism
        "tc": {"original_table": "c", "columns": {"k": "k", "v": "v"},
               "transport_after": ["ta", "tb"]},
    }
    seq = ParquetCatalog(spark, str(tmp_path / "seq"))
    par = ParquetCatalog(spark, str(tmp_path / "par"))
    DBT(maps, target=seq, original=src).do_transport(mode="overwrite")
    DBT(maps, target=par, original=src).do_transport(
        mode="overwrite", parallelism=4
    )
    for t in ("ta", "tb", "tc"):
        a = sorted(map(tuple, seq.read(t).collect()))
        b = sorted(map(tuple, par.read(t).collect()))
        assert a == b, t


def test_parallel_staged_failure_aborts_all(spark, tmp_path):
    import pytest as _pytest

    from database_transportor_spark import DBT, MemoryCatalog, ParquetCatalog
    from database_transportor_spark.operators.validate import ValidationError

    src = MemoryCatalog({
        "a": spark.range(10).withColumnRenamed("id", "k"),
        "b": spark.createDataFrame([(None,)], "k long"),  # violates not_null
    })
    maps = {
        "ta": {"original_table": "a", "columns": {"k": "k"}},
        "tb": {"original_table": "b", "columns": {"k": "k"}},
    }
    tgt = ParquetCatalog(spark, str(tmp_path))
    eng = DBT(maps, target=tgt, original=src)
    with _pytest.raises(ValidationError):
        eng.do_transport(
            mode="overwrite", staged=True, parallelism=2,
            validate={"tb": [{"rule": "not_null", "column": "k"}]},
        )
    import glob as _glob

    # nothing committed, no staging leftovers
    assert _glob.glob(str(tmp_path / "*")) == []


def test_parallel_rejects_undeclared_same_level_fk(spark, tmp_path):
    import pytest as _pytest

    from database_transportor_spark import DBT, MemoryCatalog, ParquetCatalog
    from database_transportor_spark.spec import SpecError

    src = MemoryCatalog({
        "a": spark.range(5).withColumnRenamed("id", "k"),
        "b": spark.range(5).withColumnRenamed("id", "k"),
    })
    maps = {
        "ta": {"original_table": "a", "columns": {"k": "k"}},
        "tb": {"original_table": "b", "columns": {"k": "k"}},
    }
    eng = DBT(maps, target=ParquetCatalog(spark, str(tmp_path)), original=src)
    with _pytest.raises(SpecError, match="transport_after"):
        eng.do_transport(
            mode="overwrite", parallelism=2,
            validate={"tb": [{"rule": "foreign_key", "column": "k",
                              "ref_table": "ta", "ref_column": "k"}]},
        )
