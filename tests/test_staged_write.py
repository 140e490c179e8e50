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
