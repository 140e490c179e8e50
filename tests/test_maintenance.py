"""Compaction and profiling."""

import glob

from database_transportor_spark.operators.maintenance import (
    compact_table,
    profile_table,
)
from database_transportor_spark.sources.catalog import ParquetCatalog


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.range(10_000).withColumnRenamed("id", "k")
    cat.write(df.repartition(24), "t", mode="overwrite")
    before = len(glob.glob(f"{tmp_path}/t.parquet/part-*"))
    assert before >= 24

    rows_before = sorted(r["k"] for r in cat.read("t").collect())
    n = compact_table(cat, "t")
    after = len(glob.glob(f"{tmp_path}/t.parquet/part-*"))
    assert n == 1 and after < before
    assert sorted(r["k"] for r in cat.read("t").collect()) == rows_before


def test_profile_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, None, 7.0)],
        "k long, s string, v double",
    )
    got = {
        r["column"]: r
        for r in profile_table(df, exact_distinct=True).collect()
    }
    assert got["k"]["n_rows"] == 3
    assert got["k"]["n_distinct"] == 2 and got["k"]["n_nulls"] == 0
    assert got["s"]["n_nulls"] == 1 and got["s"]["min_value"] == "a"
    assert got["v"]["min_value"] == "5.0" and got["v"]["max_value"] == "7.0"
    assert got["k"]["dtype"] == "bigint"


def test_profile_single_scan(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    plan = (
        profile_table(df)  # approx mode: everything in one agg, one scan
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan") == 1, plan
