"""Bucketed TableCatalog: co-located joins must plan without a shuffle
exchange on either side — the scale property bucketing exists for."""

import pytest

from pyspark.sql import functions as F

from database_transportor_spark.sources.catalog import TableCatalog


@pytest.fixture()
def cat(spark):
    # warehouse dir is static config; tables land in the session default
    # (gitignored spark-warehouse/) and are dropped on teardown
    c = TableCatalog(spark, bucket_specs={
        "orders_b": (4, ["custkey"]),
        "customer_b": (4, ["custkey"]),
    })
    yield c
    for t in ("orders_b", "customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, cat):
    orders = spark.range(1000).select(
        F.col("id").alias("okey"), (F.col("id") % 100).alias("custkey")
    )
    customer = spark.range(100).select(
        F.col("id").alias("custkey"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    cat.write(orders, "orders_b", mode="overwrite")
    cat.write(customer, "customer_b", mode="overwrite")

    # disable broadcast so the join would otherwise shuffle both sides
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cat.read("orders_b").join(cat.read("customer_b"), "custkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_same_join_shuffles(spark, cat):
    # control: identical data without bucketing DOES exchange
    orders = spark.range(1000).select(
        F.col("id").alias("okey"), (F.col("id") % 100).alias("custkey")
    )
    customer = spark.range(100).select(
        F.col("id").alias("custkey"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(customer, "custkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
