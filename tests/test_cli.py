"""X8/X9 CLI: scaffold a spec file, point it at fixtures, run transport.

Reference parity: TransportCommand.php:31-45 (resolve class, call
transport()) and CreateCommand.php:35-59 (render template).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(args, **kw):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "database_transportor_spark", *args],
        capture_output=True, text=True, env=env, **kw,
    )


def test_make_scaffold(tmp_path):
    r = _run(["make", "UserMigration", "--dir", str(tmp_path)])
    assert r.returncode == 0, r.stderr
    path = tmp_path / "user_migration.py"
    assert path.exists()
    body = path.read_text()
    assert "MAPS" in body and "ORIGINAL" in body and "TARGET" in body
    # refuses to clobber without --force
    r2 = _run(["make", "UserMigration", "--dir", str(tmp_path)])
    assert r2.returncode != 0


def test_transport_end_to_end(tmp_path):
    out = tmp_path / "out"
    spec = tmp_path / "spec.py"
    spec.write_text(
        f'''
MAPS = {{
    "new_nations": {{
        "original_table": "nation",
        "extra_conditions": [["n_regionkey", "in", [0, 1]]],
        "columns": {{
            "id": "n_nationkey",
            "name": "n_name",
            "source": {{"default": "legacy"}},
        }},
    }},
}}
ORIGINAL = {{"kind": "parquet", "root": "{SF}"}}
TARGET = {{"kind": "parquet", "root": "{out}"}}
MODE = "overwrite"
SPARK = {{"spark.sql.shuffle.partitions": "4", "spark.ui.enabled": "false"}}
'''
    )
    r = _run(["transport", "--spec", str(spec), "--master", "local[2]"],
             timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "new_nations" in r.stdout
    import duckdb

    rows = duckdb.sql(
        f"SELECT count(*), count(DISTINCT source) FROM '{out}/new_nations.parquet/*.parquet'"
    ).fetchall()
    assert rows[0][0] == 10 and rows[0][1] == 1


def test_explain_audit(tmp_path):
    spec = tmp_path / "spec.py"
    spec.write_text(
        f'''
MAPS = {{
    "filtered": {{
        "original_table": "nation",
        "extra_conditions": [["n_regionkey", "in", [0, 1]]],
        "columns": {{"id": "n_nationkey", "name": "n_name"}},
    }},
    "joined": {{
        "original_table": "customer",
        "columns": {{
            "cust_id": "c_custkey",
            "nation_name": {{
                "original": "c_nationkey",
                "refer": {{
                    "search_source": "original",
                    "search_table": "nation",
                    "search_column": "n_nationkey",
                    "according_column": "c_nationkey",
                    "wanted_column": "n_name",
                }},
                "default": "unknown",
            }},
        }},
    }},
}}
ORIGINAL = {{"kind": "parquet", "root": "{SF}"}}
TARGET = {{"kind": "parquet", "root": "{tmp_path}/out"}}
SPARK = {{"spark.sql.shuffle.partitions": "4", "spark.ui.enabled": "false"}}
'''
    )
    r = _run(["explain", "--spec", str(spec), "--master", "local[2]"],
             timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert ":: filtered ==" in r.stdout and ":: joined ==" in r.stdout
    assert "PushedFilters" in r.stdout        # full plan printed
    assert "audit:" in r.stdout
    # the refer map's audit line reports a broadcast join, no cartesian
    joined_audit = [
        ln for ln in r.stdout.splitlines()
        if ln.startswith("audit:") and "cartesian=0" in ln
    ]
    assert joined_audit, r.stdout[-2000:]
    assert any("broadcast_joins=1" in ln for ln in joined_audit)

    # audit-only mode suppresses the plan body, map filter selects one map
    r2 = _run(["explain", "--spec", str(spec), "--map", "filtered",
               "--audit-only", "--master", "local[2]"], timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert ":: joined ==" not in r2.stdout
    assert "PushedFilters" not in r2.stdout
    assert "audit:" in r2.stdout


def test_transport_merge_mode(tmp_path):
    """INCREMENTAL + MERGE_KEYS in the spec module drives
    do_merge_transport: an update-bumped cursor propagates row updates."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    spec = tmp_path / "spec.py"
    spec.write_text(
        f'''
MAPS = {{
    "items": {{
        "original_table": "src",
        "columns": {{"item_id": "id", "val": "v", "mod": "m"}},
    }},
}}
ORIGINAL = {{"kind": "parquet", "root": "{src}"}}
TARGET = {{"kind": "parquet", "root": "{out}"}}
INCREMENTAL = {{"items": "mod"}}
MERGE_KEYS = {{"items": "item_id"}}
SPARK = {{"spark.sql.shuffle.partitions": "4", "spark.ui.enabled": "false"}}
'''
    )
    import duckdb

    os.makedirs(src, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM (VALUES (1, 'a', 1), (2, 'b', 1)) t(id, v, m))"
        f" TO '{src}/src.parquet' (FORMAT PARQUET)"
    )
    r = _run(["transport", "--spec", str(spec), "--master", "local[2]"],
             timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    con.execute(
        f"COPY (SELECT * FROM (VALUES (1, 'A', 2), (2, 'b', 1), (3, 'c', 2))"
        f" t(id, v, m)) TO '{src}/src.parquet' (FORMAT PARQUET)"
    )
    r = _run(["transport", "--spec", str(spec), "--master", "local[2]"],
             timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    got = sorted(
        con.execute(
            f"SELECT item_id, val FROM '{out}/items.parquet/*.parquet'"
        ).fetchall()
    )
    assert got == [(1, "A"), (2, "b"), (3, "c")], got


def test_compact_and_profile_cli(tmp_path):
    """compact + profile subcommands against a real parquet table."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT range AS k, range % 7 AS g FROM range(5000))"
        f" TO '{tmp_path}/t.parquet' (FORMAT PARQUET)"
    )
    # split into many files first via a transport-free rewrite
    r = _run(["compact", "--root", str(tmp_path), "--table", "t",
              "--master", "local[2]"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "compacted" in r.stdout

    r = _run(["profile", "--root", str(tmp_path), "--table", "t",
              "--exact", "--master", "local[2]"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "k" in r.stdout and "5000" in r.stdout


def test_validate_cli_reports_and_exits(tmp_path):
    """`validate` runs VALIDATE rules against live target tables: exit 0
    when clean, nonzero with a FAIL line when a rule is violated."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    spec = tmp_path / "spec.py"
    spec.write_text(
        f'''
MAPS = {{
    "items": {{
        "original_table": "src",
        "columns": {{"item_id": "id", "val": "v"}},
    }},
}}
ORIGINAL = {{"kind": "parquet", "root": "{src}"}}
TARGET = {{"kind": "parquet", "root": "{out}"}}
MODE = "overwrite"
VALIDATE = {{"items": [
    {{"rule": "not_null", "column": "item_id"}},
    {{"rule": "range", "column": "val", "min": 0}},
]}}
SPARK = {{"spark.sql.shuffle.partitions": "4", "spark.ui.enabled": "false"}}
'''
    )
    import duckdb

    os.makedirs(src, exist_ok=True)
    duckdb.connect().execute(
        f"COPY (SELECT * FROM (VALUES (1, 5), (2, -3)) t(id, v))"
        f" TO '{src}/src.parquet' (FORMAT PARQUET)"
    )
    # transport WITHOUT the gate (VALIDATE is consumed by `validate`, but
    # transport also honors it — so run transport with rules stripped)
    plain = spec.read_text().replace('VALIDATE = {"items": [', 'VALIDATE_OFF = {"items": [')
    plain_spec = tmp_path / "plain.py"
    plain_spec.write_text(plain)
    r = _run(["transport", "--spec", str(plain_spec), "--master", "local[2]"],
             timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run(["validate", "--spec", str(spec), "--master", "local[2]"],
             timeout=900)
    assert r.returncode == 1, (r.stdout, r.stderr[-1500:])
    assert "range(val) = 1  FAIL" in r.stdout
    assert "not_null(item_id) = 0  ok" in r.stdout


def test_diff_cli_parity_and_drift(tmp_path):
    """`diff` recomputes the spec and key-diffs the live target: green
    right after a transport, nonzero exit once the target drifts."""
    out = tmp_path / "out"
    spec = tmp_path / "spec.py"
    spec.write_text(
        f'''
MAPS = {{
    "nat": {{
        "original_table": "nation",
        "columns": {{"id": "n_nationkey", "name": "n_name"}},
    }},
}}
ORIGINAL = {{"kind": "parquet", "root": "{SF}"}}
TARGET = {{"kind": "parquet", "root": "{out}"}}
MODE = "overwrite"
DIFF_KEYS = {{"nat": ["id"]}}
SPARK = {{"spark.sql.shuffle.partitions": "4", "spark.ui.enabled": "false"}}
'''
    )
    r = _run(["transport", "--spec", str(spec), "--master", "local[2]"],
             timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    r = _run(["diff", "--spec", str(spec), "--master", "local[2]"], timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr[-2000:]
    assert "ok" in r.stdout

    # corrupt the live target: drop a row and rewrite
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE TABLE t AS SELECT * FROM '{out}/nat.parquet/*.parquet' WHERE id <> 3"
    )
    import shutil

    shutil.rmtree(f"{out}/nat.parquet")
    con.sql(f"COPY t TO '{out}/nat.parquet' (FORMAT PARQUET)")

    r = _run(["diff", "--spec", str(spec), "--master", "local[2]", "--show", "5"],
             timeout=900)
    assert r.returncode == 1, "drift must exit nonzero\n" + r.stdout
    assert "missing=1" in r.stdout and "DRIFT" in r.stdout


def test_lineage_cli_no_spark(tmp_path):
    """lineage is pure metadata: runs without a SparkSession and maps
    every output column to its upstream source."""
    spec = tmp_path / "spec.py"
    spec.write_text(
        f'''
MAPS = {{
    "dim": {{"original_table": "nation",
             "columns": {{"nk": "n_nationkey", "nname": "n_name"}}}},
    "fact": {{
        "original_table": "customer",
        "transport_after": "dim",
        "columns": {{
            "id": "c_custkey",
            "uname": {{"original": "c_name", "function": "upper(c_name)"}},
            "bal": {{"original": "c_acctbal", "default": 0.0}},
            "tmp_nk": {{"original": "c_nationkey", "delete_after_transport": True}},
            "nation": {{"refer": {{"search_source": "target",
                                   "search_table": "dim",
                                   "search_column": "nk",
                                   "according_column": "tmp_nk",
                                   "wanted_column": "nname"}},
                        "default": "?"}},
            "n_orders": {{"refers": {{"search_source": "original",
                                      "search_table": "orders",
                                      "search_column": "o_custkey",
                                      "according_column": "id",
                                      "processor": "count(*)"}},
                          "default": 0}},
        }},
    }},
}}
ORIGINAL = {{"kind": "parquet", "root": "{SF}"}}
TARGET = {{"kind": "parquet", "root": "/tmp/never-used"}}
'''
    )
    import time

    t0 = time.monotonic()
    r = _run(["lineage", "--spec", str(spec)])
    assert r.returncode == 0, r.stderr[-1500:]
    assert time.monotonic() - t0 < 30, "lineage must not start Spark"
    assert "renamed from 'c_custkey'" in r.stdout
    assert "upper(c_name)" in r.stdout
    assert "lookup nname from target.dim" in r.stdout
    assert "aggregate 'count(*)' over original.orders" in r.stdout
    assert "[staging]" in r.stdout

    rj = _run(["lineage", "--spec", str(spec), "--json"])
    import json

    recs = [json.loads(l) for l in rj.stdout.splitlines() if l.strip()]
    by_col = {(x["map"], x["column"]): x for x in recs}
    assert by_col[("fact", "nation")]["kind"] == "refer"
    assert "target.dim.nname" in by_col[("fact", "nation")]["sources"]
    assert by_col[("fact", "tmp_nk")]["staging"] is True
    assert by_col[("dim", "nk")]["sources"] == ["original.nation.n_nationkey"]


def test_compact_zorder_cli(tmp_path):
    """compact --zorder clusters the rewrite along the given columns."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT range AS k, range % 97 AS x, (range * 13) % 89 AS y"
        f" FROM range(4000)) TO '{tmp_path}/t.parquet' (FORMAT PARQUET)"
    )
    r = _run(["compact", "--root", str(tmp_path), "--table", "t",
              "--zorder", "x,y", "--master", "local[2]"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "z-ordered by x,y" in r.stdout
    n = duckdb.sql(f"SELECT count(*) FROM '{tmp_path}/t.parquet/*.parquet'"
                   if (tmp_path / "t.parquet").is_dir()
                   else f"SELECT count(*) FROM '{tmp_path}/t.parquet'").fetchone()[0]
    assert n == 4000


def test_sql_cli_queries_and_explains(tmp_path):
    """`sql` runs ad-hoc Catalyst-planned SQL over a catalog root."""
    import duckdb

    duckdb.sql(
        f"COPY (SELECT range AS k, range % 3 AS g FROM range(100))"
        f" TO '{tmp_path}/t.parquet' (FORMAT PARQUET)"
    )
    r = _run(["sql", "--root", str(tmp_path),
              "--query", "SELECT g, count(*) AS n FROM t GROUP BY g ORDER BY g",
              "--master", "local[2]"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l and "\t" in l]
    assert lines[0].split("\t") == ["g", "n"]
    assert [l.split("\t") for l in lines[1:]] == [
        ["0", "34"], ["1", "33"], ["2", "33"]]

    r = _run(["sql", "--root", str(tmp_path),
              "--query", "SELECT k FROM t WHERE k = 5",
              "--explain", "--master", "local[2]"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PushedFilters" in r.stdout  # the filter reached the scan


def test_sql_default_limit_never_full_collects(tmp_path, monkeypatch, capsys):
    """The default `sql` path must collect through an explicit LIMIT (a
    bounded driver fetch); `--limit 0` — the explicit full-output opt-out
    — must stream via toLocalIterator and never call collect() at all."""
    import argparse

    import duckdb

    # patch the CONCRETE class: pyspark 4 routes df.collect() through
    # pyspark.sql.classic.dataframe.DataFrame, which overrides the
    # abstract pyspark.sql.DataFrame methods — patching the parent would
    # spy on nothing
    from pyspark.sql.classic.dataframe import DataFrame

    from database_transportor_spark.cli import _cmd_sql

    duckdb.sql(
        f"COPY (SELECT range AS k FROM range(500))"
        f" TO '{tmp_path}/t.parquet' (FORMAT PARQUET)"
    )
    calls = {"collect": [], "iter": 0}
    orig_collect, orig_iter = DataFrame.collect, DataFrame.toLocalIterator

    def spying_collect(self):
        plan = self._jdf.queryExecution().optimizedPlan().toString()
        calls["collect"].append("GlobalLimit" in plan or "Limit" in plan)
        return orig_collect(self)

    def spying_iter(self, *a, **kw):
        calls["iter"] += 1
        return orig_iter(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "collect", spying_collect)
    monkeypatch.setattr(DataFrame, "toLocalIterator", spying_iter)

    def args(limit):
        return argparse.Namespace(
            root=str(tmp_path), format="parquet", master="local[2]",
            query="SELECT k FROM t ORDER BY k", limit=limit, explain=False,
        )

    assert _cmd_sql(args(3)) == 0
    out = capsys.readouterr().out
    assert len([l for l in out.splitlines() if l.strip()]) == 1 + 3  # header+3
    assert calls["iter"] == 0
    assert calls["collect"] and all(calls["collect"]), (
        "default path collected an un-limited plan"
    )

    calls["collect"].clear()
    assert _cmd_sql(args(0)) == 0
    out = capsys.readouterr().out
    assert len([l for l in out.splitlines() if l.strip()]) == 1 + 500
    assert calls["collect"] == []  # full output never drives a collect()
    assert calls["iter"] == 1


def test_transport_relational_spec_end_to_end(tmp_path):
    """A spec FILE whose map is a full relational report (derive/join/agg/
    window_rank) runs through the CLI and lands correct parquet — the
    analytics tier is first-class on every entry point, not just the
    Python API."""
    out = tmp_path / "out"
    spec = tmp_path / "spec.py"
    spec.write_text(
        f'''
MAPS = {{
    "nation_order_stats": {{
        "original_table": "customer",
        "columns": {{"c_custkey": "c_custkey", "c_nationkey": "c_nationkey"}},
        "post_ops": [
            {{"op": "join", "table": "orders",
              "select": ["o_custkey", "o_totalprice"],
              "on": "c_custkey = o_custkey"}},
            {{"op": "derive",
              "columns": {{"cents": "CAST(round(o_totalprice * 100) AS BIGINT)"}}}},
            {{"op": "agg", "group_by": ["c_nationkey"],
              "aggs": ["sum(cents) / 100.0D AS revenue",
                       "count(*) AS n_orders"]}},
            {{"op": "window_rank", "order_by": ["revenue desc", "c_nationkey asc"],
              "rank_col": "rank", "top": 5}},
        ],
    }},
}}
ORIGINAL = {{"kind": "parquet", "root": "{SF}"}}
TARGET = {{"kind": "parquet", "root": "{out}"}}
MODE = "overwrite"
SPARK = {{"spark.sql.shuffle.partitions": "4", "spark.ui.enabled": "false"}}
'''
    )
    r = _run(["transport", "--spec", str(spec), "--master", "local[2]"],
             timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    import duckdb

    got = duckdb.sql(
        f"SELECT rank, c_nationkey, revenue, n_orders "
        f"FROM '{out}/nation_order_stats.parquet/*.parquet' ORDER BY rank"
    ).fetchall()
    want = duckdb.sql(
        f"""
        WITH agg AS (
          SELECT c_nationkey,
                 sum(CAST(round(o_totalprice*100) AS BIGINT))/100.0 AS revenue,
                 count(*) AS n_orders
          FROM '{SF}/customer.parquet' c
          JOIN '{SF}/orders.parquet' o ON c.c_custkey = o.o_custkey
          GROUP BY 1
        )
        SELECT CAST(row_number() OVER (ORDER BY revenue DESC, c_nationkey) AS INT),
               c_nationkey, revenue, CAST(n_orders AS BIGINT)
        FROM agg ORDER BY 1 LIMIT 5
        """
    ).fetchall()
    assert got == want and len(got) == 5


def test_gate_maintain_cli(tmp_path):
    """gate-maintain subcommand: out-of-band compaction + retrain over a
    real semantic-gate index written by an external-mode ingest."""
    import duckdb

    root = tmp_path / "gatecat"
    (root / "idx.parquet").mkdir(parents=True)
    con = duckdb.connect()
    # a hand-laid index (5 vectors, one bucket) + 1-centroid codebook,
    # in several files so compaction has something to do
    for i in range(5):
        con.execute(
            f"COPY (SELECT {i}::BIGINT AS __id,"
            f" [1.0*{i}+1, 1.0, 0.0, 0.0]::DOUBLE[] AS __v,"
            f" 0::BIGINT AS __bucket, 'm{i}' AS __commit)"
            f" TO '{root}/idx.parquet/part{i}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        f"COPY (SELECT 0::BIGINT AS cid, [1.0,0.0,0.0,0.0]::DOUBLE[] AS ce)"
        f" TO '{root}/cent.parquet' (FORMAT PARQUET)"
    )
    r = _run(["gate-maintain", "--root", str(root), "--index-table", "idx",
              "--centroid-table", "cent", "--force-retrain",
              "--retrain-target-rows", "1", "--compact-files", "2",
              "--master", "local[2]"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "retrained: 5 index rows" in r.stdout
    assert ", k 1 -> 5" in r.stdout
    # retrain runs FIRST and its staged rewrite already consolidated the
    # 5 hand-laid files below the threshold — compaction correctly no-ops
    assert "left idx: 2 -> 2 data file(s)" in r.stdout


def test_bm25_layout_cli(tmp_path):
    """bm25-layout subcommand: staged token-range rewrite of a stored
    posting table; rows unchanged, file count as requested."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"""COPY (
            SELECT 'tok' || CAST(range % 50 AS VARCHAR) AS token,
                   range AS doc_id, 1 + range % 3 AS tf,
                   10 + range % 7 AS dl
            FROM range(2000)
        ) TO '{tmp_path}/idx.parquet' (FORMAT PARQUET)"""
    )
    before = sorted(con.execute(
        f"SELECT * FROM '{tmp_path}/idx.parquet'").fetchall())
    r = _run(["bm25-layout", "--root", str(tmp_path), "--table", "idx",
              "--files", "4", "--master", "local[2]"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "4 token-range-sorted" in r.stdout
    after = sorted(con.execute(
        f"SELECT * FROM '{tmp_path}/idx.parquet/*.parquet'").fetchall())
    assert after == before


def test_vacuum_cli(tmp_path, spark):
    """vacuum subcommand: retention over a versioned table without a
    Spark session — HEAD survives, old versions go."""
    from database_transportor_spark.sources.versioned import (
        VersionedCatalog,
    )

    cat = VersionedCatalog(spark, str(tmp_path))
    for i in range(4):
        cat.write(spark.range(i + 1).toDF("v"), "t", mode="overwrite")
    assert len(cat.versions("t")) == 4
    r = _run(["vacuum", "--root", str(tmp_path), "--table", "t",
              "--keep", "2"], timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "removed 2" in r.stdout
    assert cat.versions("t") == [3, 4]
    assert cat.read("t").count() == 4  # HEAD intact


def test_export_shards_cli(tmp_path):
    """export-shards subcommand: one-file-per-shard epoch export with a
    printed manifest; shard contents reproduce the multiplicative
    assignment exactly."""
    import glob

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"""COPY (
            SELECT range AS doc_id,
                   'doc ' || CAST(range AS VARCHAR) AS text
            FROM range(300)
        ) TO '{tmp_path}/docs.parquet' (FORMAT PARQUET)"""
    )
    dest = str(tmp_path / "shards")
    r = _run(["export-shards", "--root", str(tmp_path), "--table", "docs",
              "--dest", dest, "--id-col", "doc_id", "--shards", "4",
              "--seed", "7", "--hash-fn", "multiplicative",
              "--master", "local[2]"], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "300 row(s)" in r.stdout
    assert "4 non-empty shard(s) / 4 file(s)" in r.stdout
    assert len(glob.glob(f"{dest}/shard=*/*.parquet")) == 4
    # every doc in its multiplicative-hash shard, exactly once
    got = con.execute(
        f"""SELECT shard, doc_id
            FROM read_parquet('{dest}/shard=*/*.parquet',
                              hive_partitioning=true)"""
    ).fetchall()
    assert len(got) == 300
    for shard, doc_id in got:
        assert int(shard) == (doc_id * 2654435761 + 7) % 4294967296 % 4
    # refuses to clobber without --overwrite
    r2 = _run(["export-shards", "--root", str(tmp_path), "--table", "docs",
               "--dest", dest, "--id-col", "doc_id", "--shards", "4",
               "--master", "local[2]"], timeout=900)
    assert r2.returncode != 0
