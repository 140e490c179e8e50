"""Compaction and profiling."""

import glob

import pytest

from database_transportor_spark.operators.maintenance import (
    compact_table,
    profile_table,
)
from database_transportor_spark.sources.catalog import ParquetCatalog


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.range(10_000).withColumnRenamed("id", "k")
    cat.write(df.repartition(24), "t", mode="overwrite")
    before = len(glob.glob(f"{tmp_path}/t.parquet/part-*"))
    assert before >= 24

    rows_before = sorted(r["k"] for r in cat.read("t").collect())
    n = compact_table(cat, "t")
    after = len(glob.glob(f"{tmp_path}/t.parquet/part-*"))
    assert n == 1 and after < before
    assert sorted(r["k"] for r in cat.read("t").collect()) == rows_before


def test_profile_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, None, 7.0)],
        "k long, s string, v double",
    )
    got = {
        r["column"]: r
        for r in profile_table(df, exact_distinct=True).collect()
    }
    assert got["k"]["n_rows"] == 3
    assert got["k"]["n_distinct"] == 2 and got["k"]["n_nulls"] == 0
    assert got["s"]["n_nulls"] == 1 and got["s"]["min_value"] == "a"
    assert got["v"]["min_value"] == "5.0" and got["v"]["max_value"] == "7.0"
    assert got["k"]["dtype"] == "bigint"


def test_profile_single_scan(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    plan = (
        profile_table(df)  # approx mode: everything in one agg, one scan
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan") == 1, plan


def test_compact_sizes_single_file_table(spark, tmp_path):
    """A live table that is ONE file (external DuckDB COPY layout) must be
    sized by getsize, not os.walk (which yields nothing for a file)."""
    import os
    import shutil

    from database_transportor_spark.operators.maintenance import compact_table
    from database_transportor_spark.sources.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.range(0, 50_000).selectExpr("id", "repeat('x', 64) AS pad")
    df.coalesce(1).write.parquet(f"{tmp_path}/single.parquet.dir")
    part = next(
        f for f in os.listdir(f"{tmp_path}/single.parquet.dir")
        if f.endswith(".parquet")
    )
    shutil.move(
        f"{tmp_path}/single.parquet.dir/{part}", f"{tmp_path}/single.parquet"
    )
    shutil.rmtree(f"{tmp_path}/single.parquet.dir")
    size = os.path.getsize(f"{tmp_path}/single.parquet")
    assert size > 0
    # target ~half the file size -> must split into >= 2 files, proving the
    # sizing saw the real byte count rather than total=0 -> n=1
    n = compact_table(cat, "single", target_file_bytes=max(1, size // 2))
    assert n >= 2
    assert spark.read.parquet(f"{tmp_path}/single.parquet").count() == 50_000


def test_compact_rejects_remote_scheme(spark):
    from database_transportor_spark.operators.maintenance import compact_table
    from database_transportor_spark.sources.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, "s3://bucket/tables")
    with pytest.raises(ValueError, match="only local paths"):
        compact_table(cat, "t")


def test_column_histogram(spark):
    from database_transportor_spark.operators.maintenance import (
        column_histogram,
    )

    df = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,), (-5.0,), (1000.0,)],
        ["v"],
    )
    out = {r["bucket"]: r for r in
           column_histogram(df, "v", bins=4, lo=0.0, hi=100.0).collect()}
    # 0..99 in 4 buckets of 25; -5 underflows to 0; 1000 overflows to 5
    assert out[0]["n"] == 1 and out[5]["n"] == 1
    assert all(out[b]["n"] == 25 for b in (1, 2, 3, 4))
    assert out[1]["bucket_lo"] == 0.0 and out[1]["bucket_hi"] == 25.0
    assert 101 + 2 == sum(r["n"] for r in out.values()) + 1  # NULL excluded
    # inferred bounds path
    auto = column_histogram(df, "v", bins=2)
    assert sum(r["n"] for r in auto.collect()) == 102
    import pytest

    with pytest.raises(ValueError, match="hi > lo"):
        column_histogram(df, "v", bins=4, lo=5.0, hi=5.0)


def test_compact_zorder_preserves_rows_and_clusters_files(spark, tmp_path):
    import pyarrow.parquet as pq

    cat = ParquetCatalog(spark, str(tmp_path))
    df = (
        spark.range(8_000)
        .withColumnRenamed("id", "k")
        .selectExpr("k", "k % 97 AS x", "(k * 13) % 89 AS y")
    )
    cat.write(df.repartition(16), "t", mode="overwrite")
    rows_before = sorted(r["k"] for r in cat.read("t").collect())

    n = compact_table(cat, "t", target_file_bytes=16 << 10,
                      zorder_cols=["x", "y"], zorder_bits=8)
    assert n >= 2  # sized to multiple files so clustering is observable
    assert sorted(r["k"] for r in cat.read("t").collect()) == rows_before

    # files must cover narrow, mostly-disjoint x-ranges: with Z-order, the
    # sum of per-file x-spans is well below files x global span (a random
    # layout gives every file the full span)
    files = glob.glob(f"{tmp_path}/t.parquet/part-*.parquet")
    spans = []
    for f in files:
        t = pq.read_table(f, columns=["x"])
        xs = t.column("x").to_pylist()
        if xs:
            spans.append(max(xs) - min(xs))
    assert len(spans) >= 2
    assert sum(spans) < len(spans) * 96 * 0.9, spans


def test_expire_rows_removes_matching_keeps_null_condition(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None), (4, 5)], "k long, age int"
    )
    cat.write(df, "t", mode="overwrite")
    from database_transportor_spark.operators.maintenance import expire_rows

    n = expire_rows(cat, "t", "age > 50")
    assert n == 1
    kept = sorted(r["k"] for r in cat.read("t").collect())
    assert kept == [1, 3, 4]  # NULL-age row kept, not silently dropped


def test_expire_rows_noop_when_nothing_matches(spark, tmp_path):
    from database_transportor_spark.operators.maintenance import expire_rows

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(spark.range(10), "t", mode="overwrite")
    assert expire_rows(cat, "t", "id > 100") == 0
    assert cat.read("t").count() == 10


def test_corr_matrix_one_pass_matches_numpy(spark):
    import numpy as np

    from database_transportor_spark.operators.maintenance import corr_matrix

    rng = [(i, 2 * i + 3, -i + (i % 7), None if i % 10 == 0 else i * i)
           for i in range(100)]
    df = spark.createDataFrame(rng, "a long, b long, c long, d long")
    got = {(r["col_a"], r["col_b"]): (r["n"], r["r"])
           for r in corr_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert got[("a", "b")][1] == 1.0            # perfectly linear
    a = np.array([t[0] for t in rng]); c = np.array([t[2] for t in rng])
    assert abs(got[("a", "c")][1] - np.corrcoef(a, c)[0, 1]) < 1e-6
    assert got[("a", "d")][0] == 90             # pairwise NULL exclusion
    import pytest as _pytest

    with _pytest.raises(ValueError):
        corr_matrix(df, ["a"])


def test_null_patterns_counts_and_shares(spark):
    from database_transportor_spark.operators.maintenance import (
        null_patterns,
    )

    df = spark.createDataFrame(
        [(1, None, "x"), (None, None, "y"), (2, 3, None), (4, 5, "z")],
        "a int, b int, c string",
    )
    got = {r.pattern: (r.n_rows, r.share_ppm)
           for r in null_patterns(df).collect()}
    assert got == {
        "b": (1, 250_000), "a,b": (1, 250_000),
        "c": (1, 250_000), "": (1, 250_000),
    }
    # column order in `cols` pins the pattern string order
    got2 = {r.pattern for r in null_patterns(df, ["b", "a"]).collect()}
    assert got2 == {"b", "b,a", ""}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        null_patterns(df, cols=[])


# ---------------------------------------------------------------------------
# File-level zone maps + data-skipping report
# ---------------------------------------------------------------------------

class TestFileStats:
    def _layout(self, spark, tmp_path, clustered):
        from pyspark.sql import functions as F

        df = spark.range(0, 10_000).select(F.col("id").alias("k"))
        out = str(tmp_path / ("c" if clustered else "u"))
        if clustered:
            df.repartitionByRange(10, "k").write.parquet(out)
        else:
            df.repartition(10).write.parquet(out)  # round-robin: full overlap
        return spark.read.parquet(out)

    def test_file_stats_shape(self, spark, tmp_path):
        from database_transportor_spark.operators.maintenance import (
            file_stats,
        )

        d = self._layout(spark, tmp_path, clustered=True)
        rows = file_stats(d, ["k"]).collect()
        assert len(rows) == 10
        assert sum(r["n_rows"] for r in rows) == 10_000
        assert all(r["k_min"] <= r["k_max"] for r in rows)
        assert all(r["k_nulls"] == 0 for r in rows)

    def test_clustered_layout_prunes_unclustered_does_not(self, spark, tmp_path):
        from database_transportor_spark.operators.maintenance import (
            pruning_report,
        )

        clustered = self._layout(spark, tmp_path, clustered=True)
        r = pruning_report(clustered, "k", 100, 200).collect()[0]
        assert r["files_total"] == 10
        # range-partitioned: every file but the one covering [100, 200]
        # has a disjoint envelope
        assert r["files_skippable"] >= 8
        shuffled = self._layout(spark, tmp_path, clustered=False)
        r2 = pruning_report(shuffled, "k", 100, 200).collect()[0]
        assert r2["files_skippable"] == 0  # every file spans ~the full range

    def test_null_only_file_is_skippable(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from database_transportor_spark.operators.maintenance import (
            pruning_report,
        )

        out = str(tmp_path / "n")
        spark.range(0, 10).select(
            F.lit(None).cast("long").alias("k")
        ).coalesce(1).write.parquet(out)
        d = spark.read.parquet(out)
        r = pruning_report(d, "k", 0, 5).collect()[0]
        assert r["files_total"] == 1 and r["files_skippable"] == 1


# ---------------------------------------------------------------------------
# Plan-census diff gate (tools/plan_diff.py — pure parsing, no Spark)
# ---------------------------------------------------------------------------

class TestPlanDiff:
    OLD = """| query | exch | bhj | smj | cart | pushed | notes |
|---|---|---|---|---|---|---|
| q_ok | 2 | 1 | 0 | 0 | yes |  |
| q_cart | 1 | 0 | 0 | 0 | - |  |
| q_jump | 1 | 0 | 0 | 0 | - |  |
| q_pushed | 1 | 0 | 0 | 0 | yes |  |
| q_smj | 3 | 2 | 0 | 0 | - |  |
| q_gone | 1 | 0 | 0 | 0 | - |  |
| q_stream | - | - | - | - | - | streaming |
"""
    NEW = """| query | exch | bhj | smj | cart | pushed | notes |
|---|---|---|---|---|---|---|
| q_ok | 3 | 1 | 0 | 0 | yes |  |
| q_cart | 1 | 0 | 0 | 1 | - |  |
| q_jump | 5 | 0 | 0 | 0 | - |  |
| q_pushed | 1 | 0 | 0 | 0 | - |  |
| q_smj | 3 | 1 | 1 | 0 | - |  |
| q_new | 1 | 0 | 0 | 0 | - |  |
| q_stream | - | - | - | - | - | streaming |
"""

    def _run(self, tmp_path):
        import sys
        sys.path.insert(0, "/root/repo")
        from tools.plan_diff import diff, parse

        old_p, new_p = tmp_path / "old.md", tmp_path / "new.md"
        old_p.write_text(self.OLD)
        new_p.write_text(self.NEW)
        return diff(parse(str(old_p)), parse(str(new_p)))

    def test_flags_each_regression_class(self, tmp_path):
        regressions, infos = self._run(tmp_path)
        text = "\n".join(regressions)
        assert "q_cart: cartesian" in text
        assert "q_jump: hash exchanges 1 -> 5" in text
        assert "q_pushed: pushed filters LOST" in text
        assert "q_smj" in text and "fallback" in text
        # within-threshold exchange growth is NOT a regression
        assert "q_ok" not in text

    def test_registry_changes_informational(self, tmp_path):
        _, infos = self._run(tmp_path)
        assert "removed: q_gone" in infos
        assert "added:   q_new" in infos

    def test_streaming_rows_skipped(self, tmp_path):
        import sys
        sys.path.insert(0, "/root/repo")
        from tools.plan_diff import parse

        p = tmp_path / "s.md"
        p.write_text(self.OLD)
        assert "q_stream" not in parse(str(p))

    def test_real_census_parses(self):
        import sys
        sys.path.insert(0, "/root/repo")
        from tools.plan_diff import parse

        rows = parse("/root/repo/PLANS.md")
        assert len(rows) > 150
        assert rows["flagship"]["pushed"] is True


# ---------------------------------------------------------------------------
# Runtime byte-metrics census (tools/metrics_report.py — rendering is pure;
# the sweep itself is exercised by the recorded full-registry artifacts)
# ---------------------------------------------------------------------------

class TestMetricsReport:
    ROWS = {
        "q_shuffler": {"input": 1024, "shuffle_write": 4096,
                       "shuffle_read": 4096, "mem_spill": 0,
                       "disk_spill": 0, "stages": 3},
        "q_mapper": {"input": 2048, "shuffle_write": 0, "shuffle_read": 0,
                     "mem_spill": 0, "disk_spill": 0, "stages": 1},
    }

    def _tools(self):
        import sys
        sys.path.insert(0, "/root/repo")
        from tools import metrics_report
        return metrics_report

    def test_artifact_name_keys_on_sf(self):
        mr = self._tools()
        assert mr.artifact_name("/root/testdata/sf0.01") == "METRICS.json"
        assert mr.artifact_name("/root/testdata/sf0.1/") == "METRICS_sf0.1.json"

    def test_render_without_growth(self, tmp_path):
        import json
        mr = self._tools()
        (tmp_path / "METRICS.json").write_text(
            json.dumps({"sf_dir": "/x/sf0.01", "queries": self.ROWS}))
        mr.render(str(tmp_path))
        md = (tmp_path / "METRICS.md").read_text()
        # sorted by shuffle-write; no growth column without the sf0.1 sweep
        assert md.index("q_shuffler") < md.index("q_mapper")
        assert "| shw ×10sf" not in md  # no growth column without the sweep
        assert "| 4.00 " in md  # shw/in = 4096/1024

    def test_render_with_growth_column(self, tmp_path):
        import json
        mr = self._tools()
        (tmp_path / "METRICS.json").write_text(
            json.dumps({"sf_dir": "/x/sf0.01", "queries": self.ROWS}))
        big = {"q_shuffler": dict(self.ROWS["q_shuffler"],
                                  shuffle_write=4096 * 7)}
        (tmp_path / "METRICS_sf0.1.json").write_text(
            json.dumps({"sf_dir": "/x/sf0.1", "queries": big}))
        mr.render(str(tmp_path))
        md = (tmp_path / "METRICS.md").read_text()
        assert "| shw ×10sf" in md
        assert "| 7.0 " in md  # measured growth for q_shuffler
        # zero-shuffle / missing-in-big rows render a dash, not a crash
        assert "| - " in md

    def test_real_artifact_covers_registry_with_zero_spill(self):
        import json
        with open("/root/repo/METRICS.json") as f:
            rows = json.load(f)["queries"]
        assert len(rows) > 150
        assert all(m["mem_spill"] + m["disk_spill"] == 0 for m in rows.values())
        assert not any("err" in m for m in rows.values())
