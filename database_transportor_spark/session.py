"""Tuned SparkSession builder — the engine's recommended execution config.

Every setting here exists for a reason at scale; callers can override any
of them via ``extra_conf``:

- **AQE on** (+ coalesce + skew join): runtime re-planning fixes shuffle
  partition counts and splits skewed join partitions from actual stats —
  the single highest-leverage config for mixed workloads.
- **shuffle partitions ~2-3× total cores** as a *starting* point; AQE
  coalesces down per stage.  At 100 TB raise the ceiling (AQE only merges,
  never splits pre-shuffle partitions beyond the initial number).
- **Arrow enabled** for Pandas UDF / ``mapInPandas`` stages (vectorized
  batch transfer instead of pickled rows).
- **128 MB max parquet split** keeps scan tasks sized for steady
  whole-stage-codegen throughput without tiny-task overhead.
- **Runtime bloom-filter join pruning on**: for a selective join, Spark
  builds a bloom filter from the small side's join keys at runtime and
  pushes it into the big side's SCAN — at 100 TB a fact-table scan joined
  to a filtered dimension reads a fraction of its row groups.  (Off by
  default upstream; the creation threshold caps build-side size, so it
  never fires for non-selective joins.  Its sibling conf
  ``runtimeFilter.semiJoinReduction`` is deliberately left off — set at
  builder time it hangs Spark 4.1's planner on trivial jobs.)
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

__all__ = ["build_session"]


def build_session(
    app_name: str = "database-transportor",
    master: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[dict[str, str]] = None,
) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    defaults = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.files.maxPartitionBytes": "134217728",
        # NOTE: runtimeFilter.semiJoinReduction is deliberately NOT set —
        # enabling it at builder time hangs Spark 4.1's planner on even
        # trivial jobs (reproduced on local[2] range(10).count()).
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # The ContextCleaner reclaims dead shuffle files / broadcast
        # blocks only when a driver GC runs; the 30-minute default lets
        # a busy long-lived session accumulate debris — measured 2-3x
        # slowdown on queries late in a 600-run suite (SCALE.md).
        "spark.cleaner.periodicGC.interval": "2min",
    }
    if shuffle_partitions is not None:
        defaults["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    for k, v in {**defaults, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if shuffle_partitions is None:
        # post-hoc default: 2× the cluster's core count (runtime-known only
        # after session start); AQE coalesces per stage from there.
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
    return spark
