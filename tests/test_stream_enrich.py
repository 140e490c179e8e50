"""Stream-static enrichment join: streamed result equals the batch
join+rollup, and the static side never needs a watermark."""

import datetime as dt
import uuid


def test_stream_enrich_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from database_transportor_spark.streaming.events import stream_enrich_agg

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    events = spark.createDataFrame(
        [
            (1, t0, 10, "view", 1.5, "{}"),
            (2, t0 + dt.timedelta(hours=3), 11, "view", 2.0, "{}"),
            (3, t0 + dt.timedelta(days=1), 10, "buy", 4.25, "{}"),
            (4, t0 + dt.timedelta(days=1, hours=2), 12, "view", 0.5, "{}"),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    dim = spark.createDataFrame(
        [(10, "AUTO"), (11, "AUTO"), (12, "STEEL"), (99, "UNUSED")],
        ["c_custkey", "c_mktsegment"],
    )
    got = stream_enrich_agg(
        spark, src, dim, sink_table=f"se_t_{uuid.uuid4().hex[:8]}"
    )
    batch = (
        events.join(
            dim, events.user_id == dim.c_custkey
        )
        .groupBy(
            F.window("ts", "1 day").alias("__w"), "c_mktsegment"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("__w.start").alias("window_start"), "c_mktsegment",
            "n_events", "sum_value", "min_value", "max_value",
        )
    )
    key = lambda r: (r["window_start"], r["c_mktsegment"])
    assert sorted(map(tuple, got.collect()), key=lambda t: (t[0], t[1])) == \
        sorted(map(tuple, batch.collect()), key=lambda t: (t[0], t[1]))
    # the unused dim row must not invent output groups
    assert got.filter(F.col("c_mktsegment") == "UNUSED").count() == 0
