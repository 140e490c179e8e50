"""Local stand-in for the driver's DuckDB oracle harness.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet fixtures, comparing row count, column names, and an
order-insensitive value hash.  Usage::

    PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir] [names...]
    PYTHONPATH=/root/repo python tools/check_oracle.py --smoke [sf_dir]

``--smoke`` (round 10, VERDICT r9 task 5 — driver blind-spot
insurance): runs the CURRENT round's newest queries TWICE, each in a
FRESH process, so a query that only passes because an earlier
same-session query warmed some state (session-order dependence) fails
here before the driver ever samples it.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: this round's additions — keep current each round; ``--smoke`` runs
#: exactly these, twice, in fresh processes
NEWEST = [
    "hybrid_declarative",
    "hybrid_weighted",
    "shard_manifest",
    "export_audit",
    "video_dups",
]


def smoke(sf_dir: str) -> int:
    import os
    import subprocess

    here = os.path.abspath(__file__)
    env = dict(os.environ)
    # prepend, never overwrite — the caller's PYTHONPATH may carry
    # dependencies the child imports need
    repo = os.path.dirname(os.path.dirname(here))
    prev = env.get("PYTHONPATH")
    env["PYTHONPATH"] = repo + (os.pathsep + prev if prev else "")
    for attempt in (1, 2):
        print(f"--- smoke run {attempt}/2 (fresh process) ---", flush=True)
        r = subprocess.run(
            [sys.executable, here, sf_dir, *NEWEST], env=env)
        if r.returncode != 0:
            print(f"smoke run {attempt} FAILED")
            return r.returncode
    print("smoke: both fresh-process runs green")
    return 0


def canon_value(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # FULL precision — the driver's hash is strict, so the local harness
        # must be at least as strict (r1 lesson: local rounding hid two
        # driver-level hash mismatches).  Queries must emit integer-exact or
        # bit-identical values; never rely on rounding here.
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return repr(v)


def df_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir: str, only: list[str] | None = None) -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        # drain shuffle/broadcast debris across the ~200-query sweep
        .config("spark.cleaner.periodicGC.interval", "2min")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    if only:
        unknown = set(only) - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 2
        qs = {k: v for k, v in qs.items() if k in only}
    from database_transportor_spark.operators.pins import release_pins

    failed = []
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        # the collect above is the terminal action: free any multi-consumer
        # intermediates the operator pinned so MEMORY_AND_DISK blocks don't
        # accumulate across the 160+-query session (mirrors scale_check)
        release_pins()
        if name not in oracles:
            print(f"{name:24s} rows={len(s_rows):7d}  (rows-only, no oracle)")
            continue
        o = con.execute(oracles[name])
        o_cols = [d[0] for d in o.description]
        o_rows = o.fetchall()
        problems = []
        if len(s_rows) != len(o_rows):
            problems.append(f"rows {len(s_rows)} != {len(o_rows)}")
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"cols {sorted(s_cols)} != {sorted(o_cols)}")
        if not problems:
            sh, oh = df_hash(s_cols, s_rows), df_hash(o_cols, o_rows)
            if sh != oh:
                problems.append("value-hash mismatch")
                # show a sample diff
                so = sorted(
                    "|".join(canon_value(r[i]) for i in sorted(range(len(s_cols)), key=lambda i: s_cols[i]))
                    for r in s_rows
                )
                oo = sorted(
                    "|".join(canon_value(r[i]) for i in sorted(range(len(o_cols)), key=lambda i: o_cols[i]))
                    for r in o_rows
                )
                for a, b in zip(so, oo):
                    if a != b:
                        print(f"  spark:  {a}\n  duckdb: {b}")
                        break
        status = "OK" if not problems else "FAIL " + "; ".join(problems)
        print(f"{name:24s} rows={len(s_rows):7d}  {status}")
        if problems:
            failed.append(name)
    print()
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print(f"all {len(qs)} queries match their oracles")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--smoke":
        sys.exit(smoke(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"))
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            sys.argv[2:] or None,
        )
    )
