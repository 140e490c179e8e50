"""Per-JOB time attribution for one harness query.

The stage-byte census (`metrics_report.py`) says what a query MOVES;
this tool says where its WALL time goes when a query runs many jobs
(streaming gates, iterative graph ops, engine pipelines): it runs the
named query once (noop sink, bench session shape), then reads the Spark
UI REST API and prints every job with its duration, description and
stage count — the census that decides which per-batch / per-iteration
job to fold next.

Usage::

    PYTHONPATH=/root/repo python tools/job_profile.py <query> [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4052"))


def main(name: str, sf_dir: str, runs: int) -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from database_transportor_spark.operators.pins import release_pins

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("job-profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedJobs", "5000")
        .config("spark.ui.retainedStages", "5000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = e.queries()
    fn = registry[name]
    # warmup run (JVM/codegen) is NOT attributed
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    release_pins()
    first_job = None
    walls = []
    for _ in range(runs):
        tracker = spark.sparkContext.statusTracker()
        ids = tracker.getJobIdsForGroup(None) or []
        mark = max(ids) if ids else -1
        if first_job is None:
            first_job = mark + 1
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
        release_pins()
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/jobs?status=succeeded"
    jobs = json.loads(urllib.request.urlopen(url).read())
    rows = []
    for j in jobs:
        if j["jobId"] < first_job:
            continue
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        t0 = datetime.strptime(j["submissionTime"], fmt)
        t1 = datetime.strptime(j["completionTime"], fmt)
        rows.append(
            (
                j["jobId"],
                (t1 - t0).total_seconds(),
                len(j.get("stageIds", [])),
                j.get("numTasks", 0),
                (j.get("description") or j.get("name") or "")[:110],
            )
        )
    rows.sort()
    total = sum(r[1] for r in rows)
    print(f"# {name}: walls={walls} (timed runs={runs}); "
          f"{len(rows)} jobs, job-time sum {total:.2f}s")
    for jid, dur, nstages, ntasks, desc in rows:
        print(f"{jid:5d} {dur:7.3f}s stages={nstages:<3d} tasks={ntasks:<5d} {desc}")
    spark.stop()
    return 0


if __name__ == "__main__":
    q = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    sys.exit(main(q, sf, runs))
