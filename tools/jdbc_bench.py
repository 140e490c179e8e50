"""JDBC end-to-end bench: the production connector path, measured.

Every BENCH/SCALE number in the repo is parquet, but the migration user's
production source per BASELINE.json is a live RDBMS over JDBC
(reference `src/DBT.php:64-65` is live-DB only).  This harness closes
that evidence gap (round-6 verdict, next-round #3): it loads the sf0.1
fixture tables into an EMBEDDED DERBY database (a real JDBC dialect in
the same JVM — no network, so the numbers isolate the JDBC read/write
machinery itself), then runs the reference-parity flagship +
refer_single + refers_group maps with ``original=JDBCCatalog`` exactly
as a production migration would::

    PYTHONPATH=/root/repo python tools/jdbc_bench.py

Reported per query: median of 3 walls through JDBC vs the same maps
through the parquet catalog in the same session, plus a result-parity
check (sorted row hash must be identical).  Also measured: bulk-load
throughput (Spark JDBC writer, batchsize 10k, one connection per
partition), the fetchsize cliff (100 vs 10 000 on a full orders scan),
and single-task vs partitioned lineitem reads (numPartitions 1 vs 8) —
the two knobs TUNING.md documents.  Assertions: the flagship customer
scan must show its filters PUSHED into the JDBC source, and the
partitioned lineitem read must actually produce numPartitions tasks.
"""

from __future__ import annotations

import hashlib
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = {
    # full reference-shaped tables; lineitem trimmed to the columns the
    # refers_group family touches (600k-row full-width Derby inserts add
    # minutes of LOAD time without changing the read-path measurement)
    "customer": None,
    "orders": None,
    "nation": None,
    "lineitem": ["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount"],
}


def df_hash(df) -> str:
    cols = sorted(df.columns)
    lines = sorted(
        "|".join(repr(r[c]) for c in cols) for r in df.collect()
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("jdbc-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions",
                "-Djava.io.tmpdir=/dev/shm/sparktmp")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from database_transportor_spark import (
        DBT,
        JDBCCatalog,
        MemoryCatalog,
        ParquetCatalog,
    )

    work = tempfile.mkdtemp(prefix="jdbc_bench_", dir="/dev/shm/sparktmp")
    url = f"jdbc:derby:{work}/db;create=true"

    # --- bulk load: Spark JDBC writer, one connection per partition ----
    bounds: dict[str, tuple[int, int]] = {}
    for t, cols in TABLES.items():
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        if cols:
            df = df.select(*cols)
        n = df.count()
        parts = 8 if n > 50_000 else 1
        t0 = time.perf_counter()
        JDBCCatalog(spark, url, string_type="VARCHAR(255)").write(
            df.repartition(parts), t, mode="overwrite"
        )
        dt = time.perf_counter() - t0
        print(f"load {t:10s} {n:7d} rows, {parts} writers: "
              f"{dt:6.2f}s  ({n / dt:,.0f} rows/s)", flush=True)
        key = {"customer": "c_custkey", "orders": "o_orderkey",
               "lineitem": "l_orderkey"}.get(t)
        if key:
            mm = df.agg(F.min(key), F.max(key)).first()
            bounds[t] = (int(mm[0]), int(mm[1]))

    part_opts = {
        t: {
            "partitionColumn": k,
            "lowerBound": bounds[t][0],
            "upperBound": bounds[t][1] + 1,
            "numPartitions": 8,
        }
        for t, k in (("orders", "o_orderkey"), ("lineitem", "l_orderkey"),
                     ("customer", "c_custkey"))
    }
    jdbc = JDBCCatalog(spark, url, fetchsize=10_000,
                       partition_options=part_opts)
    pq = ParquetCatalog(spark, SF_DIR)

    # --- assertions: pushdown + real partitioned reads -----------------
    flag_maps = e._flagship_maps()
    eng = DBT(flag_maps, target=MemoryCatalog({}), original=jdbc)
    out = eng.transform()["new_customers"].select(
        *eng.write_columns("new_customers"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan and "c_acctbal" in plan, (
        "flagship JDBC scan lost its filter pushdown:\n" + plan[:2000])
    li = jdbc.read("lineitem")
    assert li.rdd.getNumPartitions() == 8, li.rdd.getNumPartitions()
    print("assertions: flagship filters pushed into JDBC scan; "
          "lineitem read = 8 partitions", flush=True)

    # --- the three reference-parity queries, JDBC vs parquet -----------
    def run_maps(maps, out_key, original):
        eng = DBT(maps, target=MemoryCatalog({}), original=original)
        res = eng.transform()[out_key]
        if out_key == "new_customers":
            res = res.select(*eng.write_columns(out_key))
        return res

    # same specs as the harness's q_refer_single / q_refers_group; the
    # parity check below pins JDBC output == parquet output for each
    refer_single_maps = {
        "enriched_orders": {
            "original_table": "orders",
            "columns": {
                "orderkey": "o_orderkey",
                "custkey": "o_custkey",
                "customer_name": {
                    "refer": {
                        "search_source": "original",
                        "search_table": "customer",
                        "search_column": "c_custkey",
                        "according_column": "custkey",
                        "wanted_column": "c_name",
                    },
                    "default": "unknown",
                },
                "status": "o_orderstatus",
            },
        }
    }
    refers_group_maps = {
        "orders_agg": {
            "original_table": "orders",
            "columns": {
                "orderkey": "o_orderkey",
                "total_qty": {
                    "refers": {
                        "search_source": "original",
                        "search_table": "lineitem",
                        "search_column": "l_orderkey",
                        "according_column": "orderkey",
                        "processor": "sum(l_quantity)",
                    },
                    "default": 0.0,
                },
                "n_items": {
                    "refers": {
                        "search_source": "original",
                        "search_table": "lineitem",
                        "search_column": "l_orderkey",
                        "according_column": "orderkey",
                        "processor": "count(*)",
                    },
                    "default": 0,
                },
            },
        }
    }
    cases = {
        "flagship": (flag_maps, "new_customers"),
        "refer_single": (refer_single_maps, "enriched_orders"),
        "refers_group": (refers_group_maps, "orders_agg"),
    }

    results = {}
    for name, (maps, out_key) in cases.items():
        walls = {}
        for label, cat in (("jdbc", jdbc), ("parquet", pq)):
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                run_maps(maps, out_key, cat).write.format("noop").mode(
                    "overwrite").save()
                samples.append(round(time.perf_counter() - t0, 3))
            walls[label] = (round(statistics.median(samples), 3), samples)
        hj = df_hash(run_maps(maps, out_key, jdbc))
        hp = df_hash(run_maps(maps, out_key, pq))
        parity = "OK" if hj == hp else "MISMATCH"
        results[name] = (walls, parity)
        print(f"{name:14s} jdbc={walls['jdbc'][0]:6.3f}s "
              f"{walls['jdbc'][1]} | parquet={walls['parquet'][0]:6.3f}s "
              f"{walls['parquet'][1]} | parity {parity}", flush=True)
        assert parity == "OK", f"{name}: JDBC result != parquet result"

    # --- tuning knobs ---------------------------------------------------
    for fs in (100, 10_000):
        c = JDBCCatalog(spark, url, fetchsize=fs,
                        partition_options=part_opts)
        t0 = time.perf_counter()
        c.read("orders").write.format("noop").mode("overwrite").save()
        print(f"fetchsize={fs:6d}: full orders scan "
              f"{time.perf_counter() - t0:6.2f}s", flush=True)
    for np_ in (1, 8):
        opts = {"lineitem": {**part_opts["lineitem"],
                             "numPartitions": np_}} if np_ > 1 else {}
        c = JDBCCatalog(spark, url, fetchsize=10_000,
                        partition_options=opts)
        t0 = time.perf_counter()
        c.read("lineitem").groupBy("l_orderkey").agg(
            F.sum("l_quantity")).write.format("noop").mode(
            "overwrite").save()
        print(f"numPartitions={np_}: lineitem agg "
              f"{time.perf_counter() - t0:6.2f}s", flush=True)

    # --- write-side knobs (round 8): batchsize x writer-count sweep ----
    # The read side is measured above; the write side has two symmetric
    # levers: JDBC batchsize (rows per executeBatch round trip) and the
    # writer count (one JDBC connection per partition).  orders (150k
    # rows at sf0.1) is the sweep table; each cell is a fresh overwrite.
    orders_df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_orders = orders_df.count()
    for bs in (100, 1_000, 10_000):
        for writers in (1, 8):
            c = JDBCCatalog(spark, url, batchsize=bs,
                            string_type="VARCHAR(255)")
            t0 = time.perf_counter()
            c.write(orders_df.repartition(writers), "orders_w",
                    mode="overwrite")
            dt = time.perf_counter() - t0
            print(f"write batchsize={bs:6d} writers={writers}: "
                  f"{dt:6.2f}s ({n_orders / dt:,.0f} rows/s)", flush=True)

    # --- refresh strategies: plain overwrite vs truncate vs staged swap
    # (the X7 story, measured): plain overwrite drops + recreates the
    # table (readers see a missing table mid-run); truncate=true reuses
    # it (readers see it empty mid-run); the staged swap writes next to
    # it and renames (readers always see a complete table — and the
    # RENAME cost is what this measures).
    wcat = JDBCCatalog(spark, url, batchsize=10_000,
                       string_type="VARCHAR(255)",
                       properties={"truncate": "false"})
    wcat.write(orders_df.repartition(8), "orders_r", mode="overwrite")
    strategies = {
        "plain_overwrite": lambda: wcat.write(
            orders_df.repartition(8), "orders_r", mode="overwrite"),
        "truncate_overwrite": lambda: JDBCCatalog(
            spark, url, batchsize=10_000, string_type="VARCHAR(255)",
            properties={"truncate": "true"},
        ).write(orders_df.repartition(8), "orders_r", mode="overwrite"),
    }

    def staged():
        wcat.write_staged(orders_df.repartition(8), "orders_r")
        wcat.commit_staged("orders_r")

    strategies["staged_swap"] = staged
    for label, fn in strategies.items():
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        got = wcat.read("orders_r").count()
        assert got == n_orders, (label, got, n_orders)
        print(f"refresh {label:18s}: {dt:6.2f}s "
              f"({n_orders / dt:,.0f} rows/s)", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
