"""Driver-contract smoke: every queries() entry runs and matches its DuckDB
oracle at sf0.001 (fast); the full sf0.01 check lives in tools/check_oracle.py."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from tools.check_oracle import TABLES, df_hash

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver fixtures not present"
)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, oracle, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(s_rows) >= 0  # rows-only contract
        return
    res = oracle.execute(sql)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    assert len(s_rows) == len(o_rows)
    assert sorted(s_cols) == sorted(o_cols)
    assert df_hash(s_cols, s_rows) == df_hash(o_cols, o_rows)


def test_stream_reader_restores_nanos_conf(spark):
    """The TIMESTAMP(NANOS) legacy flag is scoped to the streaming call —
    it must not leak into later batch reads on the shared session."""
    import __spark_entry__ as e

    key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    e.queries()["events_stream_dedup"](spark, "/root/testdata/sf0.001").collect()
    assert spark.conf.get(key, None) is None


def test_stateful_totals_standalone_session(spark):
    """stream_stateful_totals must run in a session where the nanos flag
    was never set: its schema-probe batch read happens before any reader
    helper, so the decorator (not the caller) owns setting the flag."""
    import __spark_entry__ as e

    key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    rows = e.queries()["events_stateful"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert spark.conf.get(key, None) is None
