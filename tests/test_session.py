"""build_session defaults: runtime bloom-filter join pruning is on and
actually injects into a selective join's plan."""

from pyspark.sql import functions as F


def test_session_defaults_include_bloom_runtime_filter(spark):
    # the shared test session is built plain; assert the builder's
    # DEFAULTS dict independently so this stays cheap (no new JVM)
    from database_transportor_spark import session as s

    src = open(s.__file__).read()
    assert "spark.sql.optimizer.runtime.bloomFilter.enabled" in src


def test_bloom_filter_injects_on_selective_join(spark):
    """With the runtime-filter confs on (thresholds lowered to fixture
    scale), a selective dim join plans a might_contain pre-filter on the
    fact side — the scan-pruning shape that matters at 100 TB."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # session-scoped only; NEVER a builder default — see session.py
        "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        orders = spark.read.parquet(
            "/root/testdata/sf0.001/orders.parquet"
        ).filter(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "o_orderpriority"
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        for k, p in prev.items():
            if p is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, p)
