"""X7 staged-swap writes: overwrite lands in __staging then swaps, so a
failed job never clobbers the previous table state."""

import os

import pytest

from database_transportor_spark.sources.catalog import ParquetCatalog


def test_staged_overwrite_swaps(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path), staged=True)
    df1 = spark.range(5).toDF("id")
    cat.write(df1, "t", mode="overwrite")
    assert cat.read("t").count() == 5
    assert not os.path.exists(f"{tmp_path}/t.parquet.__staging")

    df2 = spark.range(9).toDF("id")
    cat.write(df2, "t", mode="overwrite")
    assert cat.read("t").count() == 9
    assert not os.path.exists(f"{tmp_path}/t.parquet.__staging")


def test_staged_failure_preserves_previous(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path), staged=True)
    cat.write(spark.range(5).toDF("id"), "t", mode="overwrite")

    # a job that fails at execution time: ANSI division by zero
    bad = spark.range(3).selectExpr("id / (id - id) AS id")
    with pytest.raises(Exception):
        cat.write(bad, "t", mode="overwrite")
    # previous data intact
    assert cat.read("t").count() == 5


# ---------------------------------------------------------------------------
# Engine-level staged transport (X7): all tables land in __staging, then
# swap — across ParquetCatalog, JDBCCatalog (embedded Derby), TableCatalog.
# ---------------------------------------------------------------------------

from database_transportor_spark import DBT, MemoryCatalog
from database_transportor_spark.sources.catalog import JDBCCatalog, TableCatalog

MAPS = {
    "dim": {"original_table": "src", "columns": {"id": "id", "name": "name"}},
    "fact": {
        "original_table": "src",
        "transport_after": "dim",
        "columns": {"id": "id", "tag": {"default": "x"}},
    },
}


def _source(spark):
    return MemoryCatalog(
        {"src": spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")}
    )


def test_engine_staged_parquet_all_or_nothing(spark, tmp_path):
    target = ParquetCatalog(spark, str(tmp_path))
    eng = DBT(MAPS, target=target, original=_source(spark))
    eng.do_transport(staged=True)
    assert target.read("dim").count() == 2
    assert target.read("fact").count() == 2
    assert not os.path.exists(f"{tmp_path}/dim__staging.parquet")

    # second run whose SECOND write fails: neither table may change
    bad_maps = dict(MAPS)
    bad_maps["fact"] = {
        "original_table": "src",
        "transport_after": "dim",
        "columns": {"id": {"original": "id", "function": "id / (id - id)"}},
    }
    before = target.read("dim").columns
    eng2 = DBT(bad_maps, target=target, original=_source(spark))
    import pytest as _pytest

    with _pytest.raises(Exception):
        eng2.do_transport(staged=True)
    # live tables intact, no staging leftovers
    assert target.read("dim").columns == before
    assert target.read("fact").count() == 2
    assert not os.path.exists(f"{tmp_path}/dim__staging.parquet")
    assert not os.path.exists(f"{tmp_path}/fact__staging.parquet")


def test_engine_staged_jdbc_derby_swap(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    target = JDBCCatalog(spark, url)
    eng = DBT(MAPS, target=target, original=_source(spark))
    eng.do_transport(staged=True)
    assert target.read("dim").count() == 2
    assert sorted(c.lower() for c in target.read("fact").columns) == ["id", "tag"]
    assert not target._table_exists("dim__staging")

    # re-run overwrites via a fresh swap (previous tables get dropped)
    eng2 = DBT(MAPS, target=target, original=_source(spark))
    eng2.do_transport(staged=True)
    assert target.read("dim").count() == 2
    assert not target._table_exists("fact__staging")


def test_engine_staged_jdbc_derby_failure_keeps_previous(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb2;create=true"
    target = JDBCCatalog(spark, url)
    DBT(MAPS, target=target, original=_source(spark)).do_transport(staged=True)

    bad_maps = dict(MAPS)
    bad_maps["fact"] = {
        "original_table": "src",
        "transport_after": "dim",
        "columns": {"id": {"original": "id", "function": "id / (id - id)"}},
    }
    import pytest as _pytest

    with _pytest.raises(Exception):
        DBT(bad_maps, target=target, original=_source(spark)).do_transport(staged=True)
    assert target.read("dim").count() == 2
    assert target.read("fact").count() == 2
    assert not target._table_exists("dim__staging")
    assert not target._table_exists("fact__staging")


def test_engine_staged_table_catalog_swap(spark):
    target = TableCatalog(spark)
    try:
        eng = DBT(MAPS, target=target, original=_source(spark))
        eng.do_transport(staged=True)
        assert target.read("dim").count() == 2
        assert target.read("fact").count() == 2
        assert not spark.catalog.tableExists("dim__staging")
        # swap again on top of the existing tables
        DBT(MAPS, target=target, original=_source(spark)).do_transport(staged=True)
        assert target.read("dim").count() == 2
    finally:
        for t in ("dim", "fact", "dim__staging", "fact__staging"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


# --- dialect-templated swap DDL (no live server needed: pure SQL gen) ------

def _jdbc(url):
    from database_transportor_spark.sources.catalog import JDBCCatalog

    return JDBCCatalog(spark=None, url=url)


def test_swap_ddl_mysql_atomic_multirename():
    """MySQL DDL is non-transactional; the swap must ride the one atomic
    primitive it has — RENAME TABLE's multi-rename."""
    cat = _jdbc("jdbc:mysql://host/db")
    stmts, txn = cat.swap_ddl("t", exists=True)
    assert stmts == [
        "DROP TABLE IF EXISTS t__dbt_swap_old",
        "RENAME TABLE t TO t__dbt_swap_old, t__staging TO t",
        "DROP TABLE t__dbt_swap_old",
    ]
    assert txn is False
    stmts, txn = cat.swap_ddl("t", exists=False)
    assert stmts == ["RENAME TABLE t__staging TO t"] and txn is False
    assert _jdbc("jdbc:mariadb://host/db").swap_ddl("t", True)[0][1].startswith(
        "RENAME TABLE"
    )


def test_swap_ddl_postgres_transactional():
    cat = _jdbc("jdbc:postgresql://host/db")
    stmts, txn = cat.swap_ddl("t", exists=True)
    assert stmts == ["DROP TABLE t", "ALTER TABLE t__staging RENAME TO t"]
    assert txn is True, "postgres DDL is transactional — swap must use it"
    stmts, txn = cat.swap_ddl("t", exists=False)
    assert stmts == ["ALTER TABLE t__staging RENAME TO t"] and txn is True


def test_swap_ddl_derby_and_ansi_fallback():
    stmts, txn = _jdbc("jdbc:derby:/tmp/db").swap_ddl("t", exists=True)
    assert stmts == ["DROP TABLE t", "RENAME TABLE t__staging TO t"]
    assert txn is True
    stmts, txn = _jdbc("jdbc:oracle:thin:@h").swap_ddl("t", exists=True)
    assert stmts == ["DROP TABLE t", "ALTER TABLE t__staging RENAME TO t"]
    assert txn is False


def test_jdbc_string_type_enables_runtime_filter_pushdown(spark, tmp_path):
    """Derby maps Spark strings to CLOB by default, where even a pushed
    `col = 'x'` comparison is a RUNTIME SQLSyntaxErrorException (the plan
    builds fine — the failure only surfaces at execution).  string_type
    forces VARCHAR on created tables so pushed string filters execute;
    this is the permanent gate behind tools/jdbc_bench.py."""
    from pyspark.sql import functions as F

    url = f"jdbc:derby:{tmp_path}/derbypd;create=true"
    cat = JDBCCatalog(spark, url, string_type="VARCHAR(64)")
    src = spark.createDataFrame(
        [(1, "BUILDING", 10.0), (2, "MACHINERY", -3.0), (3, "BUILDING", 7.5)],
        "id long, seg string, bal double",
    )
    cat.write(src, "cust", mode="overwrite")
    got = cat.read("cust").filter(
        (F.col("seg") == "BUILDING") & (F.col("bal") > 0)
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan and "seg" in plan and "bal" in plan
    rows = sorted(r["id"] for r in got.collect())  # executes the pushdown
    assert rows == [1, 3]

    # without string_type, the same pushed string filter fails at runtime
    # on the CLOB column — pinning WHY the option exists
    import pytest

    cat2 = JDBCCatalog(spark, url)
    cat2.write(src, "cust_clob", mode="overwrite")
    bad = cat2.read("cust_clob").filter(F.col("seg") == "BUILDING")
    with pytest.raises(Exception, match="CLOB|collation"):
        bad.collect()
