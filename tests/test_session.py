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


def test_stream_hist_equals_batch_histogram(spark, tmp_path):
    """The streamed leaf histograms, merged across windows, must equal
    the batch histogram over the same events — sketch-in-streaming-state
    round trip."""
    import uuid

    from pyspark.sql import functions as F

    from database_transportor_spark.operators.sketches import hist_measure
    from database_transportor_spark.streaming.events import stream_hist_agg

    rows = [
        (i, f"2024-01-01 {i % 4:02d}:15:00", "t" + str(i % 2), float(i % 50))
        for i in range(200)
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type", "value",
    ).write.parquet(src)

    hm = hist_measure(0.0, 50.0, bins=10)
    snap = stream_hist_agg(
        spark, src, lo=0.0, hi=50.0, bins=10,
        sink_table=f"shx_{uuid.uuid4().hex[:8]}",
    )
    merged = {
        r["event_type"]: list(r["h"])
        for r in snap.groupBy("event_type")
        .agg(hm[1]("hist").alias("h")).collect()
    }
    batch = {
        r["event_type"]: list(r["h"])
        for r in spark.read.parquet(src)
        .groupBy("event_type").agg(hm[0]("value").alias("h")).collect()
    }
    assert merged == batch
    assert sum(sum(v) for v in merged.values()) == 200
