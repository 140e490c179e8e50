"""Planted-skew stress: measure what the skew machinery actually buys.

`salted_left_join` and asof `bucket` are result-transparency-tested
(tests/test_skew.py) but until round 7 were never measured against a
genuinely skewed fixture (round-6 verdict, next-round #6).  This harness
plants a Zipf-shaped hot key — ONE key owning 30% of the probe rows at
x10 the sf0.1 row scale — and times each strategy, reporting wall AND
the max single-task time (via the Spark UI REST API's taskSummary, the
number that decides whether a 1000-executor cluster waits on one
straggler)::

    PYTHONPATH=/root/repo python tools/skew_stress.py

Join variants (broadcast disabled so the shuffle strategies are what's
measured; broadcast is always the first choice when the build side
fits — that row is included as the reference point):

- plain sort-merge, AQE skew-join OFF  (the naive plan)
- plain sort-merge, AQE skew-join ON   (Spark's built-in mitigation)
- salted_left_join, 16 salts           (the spec-level `salt` option)
- broadcast join                       (when the build side fits: no
  shuffle on the probe side, skew is moot)

As-of variants on an events table whose hot user owns 30% of both
sides: plain `asof_join` (per-key sort) vs `bucket="6 hours"` (aligned
time-bucket split + carry-forward, the hot-key path).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_ROWS = 6_000_000   # x10 of the sf0.1 lineitem row scale
KEYS = 100_000
HOT_SHARE = 0.30
BUILD_PER_KEY = 2


def task_max_since(spark, t0_ms: float) -> float:
    """Max single-task duration (s) across stages completed since t0."""
    app = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app}"
    try:
        stages = json.load(urllib.request.urlopen(f"{base}/stages?status=COMPLETE"))
    except Exception:
        return float("nan")
    mx = 0.0
    for st in stages:
        sub = st.get("submissionTime")
        if not sub:
            continue
        # submissionTime is ISO "2026-08-15T17:00:00.000GMT"
        import datetime

        ts = datetime.datetime.strptime(
            sub.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
        ).timestamp() * 1000
        if ts < t0_ms:
            continue
        sid, att = st["stageId"], st["attemptId"]
        try:
            summ = json.load(urllib.request.urlopen(
                f"{base}/stages/{sid}/{att}/taskSummary?quantiles=1.0"))
            mx = max(mx, summ["duration"][-1] / 1000.0)
        except Exception:
            continue
    return round(mx, 2)


def timed(spark, label: str, fn) -> None:
    t0_ms = time.time() * 1000
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    time.sleep(0.5)  # let the UI ingest the final stage
    print(f"{label:44s} wall={wall:7.2f}s  task_max={task_max_since(spark, t0_ms)}s",
          flush=True)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("skew-stress")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")  # REST taskSummary source
        .config("spark.driver.extraJavaOptions",
                "-Djava.io.tmpdir=/dev/shm/sparktmp")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from database_transportor_spark.operators.skew import (
        hot_key_sample,
        salted_left_join,
    )
    from database_transportor_spark.operators.temporal import asof_join

    work = "/dev/shm/sparktmp/skew_fixture"
    # --- planted join fixture: key 0 owns HOT_SHARE of the probe -------
    hot_n = int(PROBE_ROWS * HOT_SHARE)
    probe = spark.range(PROBE_ROWS).select(
        F.col("id"),
        F.when(F.col("id") < hot_n, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(KEYS - 1)) + 1)
        .alias("key"),
        (F.col("id") % 97).alias("v"),
    )
    build = spark.range(KEYS * BUILD_PER_KEY).select(
        (F.col("id") % KEYS).alias("key"),
        (F.col("id") % 13).alias("attr"),
    )
    probe.write.mode("overwrite").parquet(f"{work}/probe")
    build.write.mode("overwrite").parquet(f"{work}/build")
    probe = spark.read.parquet(f"{work}/probe")
    build = spark.read.parquet(f"{work}/build")
    print(f"fixture: probe={PROBE_ROWS:,} rows, hot key 0 = {HOT_SHARE:.0%}, "
          f"build={KEYS * BUILD_PER_KEY:,} rows", flush=True)

    def agg(j):
        # reduce the 2x fan-out join output to a scalar so output-write
        # cost never masks the join-stage imbalance
        return j.groupBy().agg(F.sum("attr").alias("s"),
                               F.count("*").alias("n"))

    conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timed(spark, "join: plain SMJ, AQE skewJoin OFF",
          lambda: agg(probe.join(build, "key", "left")))
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timed(spark, "join: plain SMJ, AQE skewJoin ON",
          lambda: agg(probe.join(build, "key", "left")))
    hot = hot_key_sample(probe, "key", threshold=100_000, fraction=0.01)
    print(f"hot_key_sample found: {hot}", flush=True)
    timed(spark, "join: salted_left_join (16 salts)",
          lambda: agg(salted_left_join(probe, build, "key", "id", hot)))
    conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
    timed(spark, "join: broadcast (build fits: reference)",
          lambda: agg(probe.join(build, "key", "left")))

    # --- planted asof fixtures: hot user owns `share` of both sides ----
    def mk(n, tag, share):
        return spark.range(n).select(
            F.col("id"),
            F.when(F.col("id") < int(n * share), F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(tag)), F.lit(9999)) + 1)
            .alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + F.pmod(F.xxhash64("id", F.lit(tag + 7)),
                                              F.lit(30 * 86400))
            ).alias("ts"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )

    for n_l, n_r, share in ((1_000_000, 2_000_000, HOT_SHARE),
                            (2_000_000, 6_000_000, 0.5)):
        mk(n_l, 1, share).write.mode("overwrite").parquet(f"{work}/purch")
        mk(n_r, 2, share).write.mode("overwrite").parquet(f"{work}/views")
        purch = spark.read.parquet(f"{work}/purch")
        views = spark.read.parquet(f"{work}/views")
        print(f"asof fixture: left={n_l:,}, right={n_r:,}, "
              f"hot user = {share:.0%}", flush=True)

        def asof_agg(bucket):
            j = asof_join(purch, views.select("user_id", "ts", "value"),
                          "user_id", "ts", bucket=bucket)
            return j.groupBy().agg(F.sum("value_right").alias("s"),
                                   F.count("*").alias("n"))

        timed(spark, "asof: plain (per-key sort)", lambda: asof_agg(None))
        timed(spark, "asof: bucket='6 hours' (hot-key path)",
              lambda: asof_agg("6 hours"))
    spark.stop()


if __name__ == "__main__":
    main()
