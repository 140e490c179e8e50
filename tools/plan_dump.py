"""Dump ``.explain("formatted")`` for named queries to files.

Round-11 optimization evidence: captures the physical plan of each named
query into ``plans/<tag>/<query>_<suffix>.txt`` so before/after plan
claims in OPTIMIZATION_r11.md are checkable without running Spark.

Usage::

    PYTHONPATH=/root/repo python tools/plan_dump.py <tag> <suffix> q1 q2 ...
    # e.g. python tools/plan_dump.py r11 before triangle_count key_discovery
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR_PLANS", "/root/testdata/sf0.001")


def main(tag: str, suffix: str, names: list[str]) -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan-dump")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    registry = e.queries()
    rc = 0
    for name in names:
        if name not in registry:
            print(f"unknown query: {name}")
            rc = 2
            continue
        try:
            df = registry[name](spark, SF)
            jqe = df._jdf.queryExecution()
            fmt = df._sc._jvm.PythonSQLUtils.explainString(jqe, "formatted")
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: plan error: {ex}")
            rc = 1
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(fmt)
        print(f"wrote {path} ({fmt.count(chr(10))} lines)")
    spark.stop()
    return rc


if __name__ == "__main__":
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
