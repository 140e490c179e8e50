"""Rollup re-aggregation exactness and sketch error bounds."""

from pyspark.sql import functions as F

from database_transportor_spark.operators.rollup import time_rollup
from database_transportor_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    grouped_percentiles,
)


def _events(spark):
    from database_transportor_spark.functions.timecols import normalize_event_time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    return normalize_event_time(df, "ts")


def test_rollup_levels_nest_exactly(spark):
    ev = _events(spark)
    levels = time_rollup(
        ev, "ts", ["event_type"],
        {"n_events": ("count", None), "min_value": ("min", "value"),
         "max_value": ("max", "value")},
        ["1 minute", "1 hour"],
    )
    # hour level from minutes == hour level from raw
    direct = ev.groupBy(
        F.window("ts", "1 hour").getField("start").alias("bucket_start"),
        "event_type",
    ).agg(F.count("*").alias("n_events"), F.min("value").alias("min_value"),
          F.max("value").alias("max_value"))
    merged = levels["1 hour"]
    key = ["bucket_start", "event_type"]
    diff = (
        merged.alias("m").join(direct.alias("d"), key)
        .filter(
            (F.col("m.n_events") != F.col("d.n_events"))
            | (F.col("m.min_value") != F.col("d.min_value"))
            | (F.col("m.max_value") != F.col("d.max_value"))
        )
        .count()
    )
    assert diff == 0
    assert merged.count() == direct.count()


def test_rollup_rejects_non_decomposable(spark):
    import pytest

    ev = _events(spark)
    with pytest.raises(ValueError):
        time_rollup(ev, "ts", [], {"m": ("avg", "value")}, ["1 hour"])


def test_approx_distinct_error_bound(spark):
    ev = _events(spark)
    exact = {r["event_type"]: r["n"] for r in
             ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()}
    approx = {r["event_type"]: r["approx_distinct"] for r in
              approx_distinct(ev, ["event_type"], "user_id", rsd=0.02).collect()}
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05, (k, n, approx[k])


def test_approx_quantiles_rank_error(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    probs = [0.25, 0.5, 0.75]
    exact = grouped_percentiles(li, ["l_returnflag"], "l_extendedprice", probs)
    approx = approx_quantiles(li, ["l_returnflag"], "l_extendedprice", probs,
                              accuracy=10_000)
    e = {r["l_returnflag"]: r["percentiles"] for r in exact.collect()}
    a = {r["l_returnflag"]: r["quantiles"] for r in approx.collect()}
    for k in e:
        for ev, av in zip(e[k], a[k]):
            assert abs(av - ev) / max(abs(ev), 1e-9) < 0.02, (k, ev, av)


def test_time_rollup_hll_merges_across_levels(spark):
    """Day-level distinct estimates merged FROM hour sketches must match
    estimates computed directly from the raw data: sketch union is exact
    (same final sketch), unlike re-aggregating approx counts."""
    import datetime

    from pyspark.sql import functions as F

    from database_transportor_spark.operators.rollup import (
        hll_estimates,
        time_rollup,
    )

    rows = []
    for h in range(6):
        for u in range(40):
            rows.append(
                (datetime.datetime(2026, 1, 1, h, u % 60), (u + h * 7) % 90)
            )
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    levels = time_rollup(
        df, "ts", [], {"users": ("hll", "user_id"), "n": ("count", None)},
        ["1 hour", "1 day"],
    )
    day = hll_estimates(levels["1 day"], ["users"]).collect()
    assert len(day) == 1
    exact = df.select("user_id").distinct().count()
    est = day[0]["users"]
    assert abs(est - exact) <= max(2, exact * 0.05), (est, exact)
    assert day[0]["n"] == len(rows)

    # direct one-level sketch over raw data must equal the merged estimate:
    # union of hour sketches is the same sketch as aggregating raw values
    direct = df.agg(
        F.round(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")))
        .cast("long")
        .alias("e")
    ).collect()[0]["e"]
    assert est == direct


def test_refresh_rollup_incremental_equals_full(spark, tmp_path):
    """Appending new events and refreshing must equal a full recompute;
    the refresh only re-reads the tail window."""
    import datetime

    from database_transportor_spark.operators.rollup import refresh_rollup
    from database_transportor_spark.sources.catalog import ParquetCatalog

    def ev(day, hour, n):
        base = datetime.datetime(2026, 1, day, hour)
        return [(base + datetime.timedelta(minutes=i), 1.0) for i in range(n)]

    cat = ParquetCatalog(spark, str(tmp_path))
    measures = {"n": ("count", None), "s": ("sum", "v")}

    batch1 = spark.createDataFrame(ev(1, 9, 5) + ev(2, 10, 3),
                                   "ts timestamp, v double")
    out1 = refresh_rollup(cat, "daily", batch1, "ts", [], measures, "1 day")
    assert {r["bucket_start"].day: r["n"] for r in out1.collect()} == {1: 5, 2: 3}

    # new events: more in the OPEN bucket (day 2) and a new day 3
    batch2 = batch1.unionByName(
        spark.createDataFrame(ev(2, 11, 4) + ev(3, 8, 2),
                              "ts timestamp, v double")
    )
    out2 = refresh_rollup(cat, "daily", batch2, "ts", [], measures, "1 day")
    got = {r["bucket_start"].day: (r["n"], r["s"]) for r in out2.collect()}
    assert got == {1: (5, 5.0), 2: (7, 7.0), 3: (2, 2.0)}

    # late event in day 1 is MISSED with lookback 1 (watermark contract)…
    batch3 = batch2.unionByName(
        spark.createDataFrame(ev(1, 23, 1), "ts timestamp, v double")
    )
    out3 = refresh_rollup(cat, "daily", batch3, "ts", [], measures, "1 day")
    assert {r["bucket_start"].day: r["n"] for r in out3.collect()}[1] == 5
    # …but a wider lookback absorbs it
    out4 = refresh_rollup(cat, "daily", batch3, "ts", [], measures,
                          "1 day", lookback_buckets=3)
    assert {r["bucket_start"].day: r["n"] for r in out4.collect()}[1] == 6


# ---------------------------------------------------------------------------
# KMV bottom-k sketches
# ---------------------------------------------------------------------------

class TestKMV:
    def test_unsaturated_is_exact(self, spark):
        from database_transportor_spark.operators.sketches import (
            kmv_distinct, kmv_sketch,
        )

        df = spark.range(0, 300).select(
            (F.col("id") % 3).alias("g"), (F.col("id") % 60).alias("v")
        )
        sk = kmv_sketch(df, ["g"], "v", k=512)
        got = {
            r["g"]: r["distinct_est"]
            for r in kmv_distinct(sk, k=512).collect()
        }
        # each g sees 20 distinct v values (id%60 stratified by id%3)
        assert got == {0: 20, 1: 20, 2: 20}

    def test_saturated_estimate_within_bound(self, spark):
        from database_transportor_spark.operators.sketches import (
            kmv_distinct, kmv_sketch,
        )

        k = 256
        df = spark.range(0, 20_000).select(
            F.lit("g").alias("g"), F.col("id").alias("v")
        )
        sk = kmv_sketch(df, ["g"], "v", k=k)
        row = kmv_distinct(sk, k=k).collect()[0]
        assert len(row["kmv"]) == k
        # deterministic hash -> deterministic estimate; 1/sqrt(k) ~ 6.3%,
        # assert a generous 4-sigma envelope
        assert abs(row["distinct_est"] - 20_000) < 20_000 * 0.25

    def test_pairwise_exact_when_unsaturated(self, spark):
        from database_transportor_spark.operators.sketches import (
            kmv_pairwise, kmv_sketch,
        )

        rows = [("a", i) for i in range(100)] + [("b", i) for i in range(50, 180)]
        df = spark.createDataFrame(rows, "g string, v long")
        sk = kmv_sketch(df, ["g"], "v", k=512)
        p = kmv_pairwise(sk, ["g"], k=512).collect()[0]
        assert (p["group_a"], p["group_b"]) == ("a", "b")
        assert p["inter_est"] == 50
        assert p["union_est"] == 180
        assert abs(p["jaccard_est"] - 50 / 180) < 1e-6

    def test_pairwise_saturated_within_bound(self, spark):
        from database_transportor_spark.operators.sketches import (
            kmv_pairwise, kmv_sketch,
        )

        k = 256
        rows = [("a", i) for i in range(10_000)] + [
            ("b", i) for i in range(5_000, 15_000)
        ]
        df = spark.createDataFrame(rows, "g string, v long")
        sk = kmv_sketch(df, ["g"], "v", k=k)
        p = kmv_pairwise(sk, ["g"], k=k).collect()[0]
        assert abs(p["union_est"] - 15_000) < 15_000 * 0.25
        assert abs(p["inter_est"] - 5_000) < 15_000 * 0.25
        assert abs(p["jaccard_est"] - 5_000 / 15_000) < 0.15

    def test_nulls_ignored_and_guards(self, spark):
        import pytest

        from database_transportor_spark.operators.sketches import (
            kmv_pairwise, kmv_sketch,
        )

        df = spark.createDataFrame(
            [("a", 1), ("a", None), ("a", 2)], "g string, v long"
        )
        sk = kmv_sketch(df, ["g"], "v", k=16)
        assert len(sk.collect()[0]["kmv"]) == 2
        with pytest.raises(ValueError, match="k must be"):
            kmv_sketch(df, ["g"], "v", k=1)
        with pytest.raises(ValueError, match="one group column"):
            kmv_pairwise(sk, ["g", "h"], k=16)


# ---------------------------------------------------------------------------
# Mergeable fixed-bin histograms
# ---------------------------------------------------------------------------

class TestHist:
    def test_rollup_merge_is_exact(self, spark):
        """Day-level histogram merged from hours equals one built
        straight from raw data — the whole point of the measure."""
        from database_transportor_spark.operators.rollup import time_rollup
        from database_transportor_spark.operators.sketches import (
            hist_measure,
        )

        rows = [
            (f"2024-01-01 {h:02d}:{m:02d}:00", float(h * 60 + m))
            for h in range(4) for m in range(0, 60, 7)
        ]
        df = spark.createDataFrame(rows, "ts string, x double").select(
            F.col("ts").cast("timestamp").alias("ts"), "x"
        )
        hm = hist_measure(0.0, 240.0, bins=12)
        out = time_rollup(df, "ts", [], {"h": (hm, "x")},
                          ["1 hour", "1 day"])
        merged = out["1 day"].collect()[0]["h"]
        direct = (
            df.groupBy().agg(hm[0]("x").alias("h")).collect()[0]["h"]
        )
        assert list(merged) == list(direct)
        assert sum(merged) == len(rows)

    def test_quantiles_within_bin_width(self, spark):
        from database_transportor_spark.operators.sketches import (
            hist_measure, hist_quantiles,
        )

        df = spark.range(0, 10_000).select(
            F.lit("g").alias("g"), F.col("id").cast("double").alias("x")
        )
        hm = hist_measure(0.0, 10_000.0, bins=100)
        h = df.groupBy("g").agg(hm[0]("x").alias("h"))
        got = hist_quantiles(h, "h", [0.5, 0.95], 0.0, 10_000.0,
                             bins=100).collect()[0]
        bin_w = 100.0
        assert abs(got["p50"] - 5_000) <= bin_w
        assert abs(got["p95"] - 9_500) <= bin_w

    def test_under_over_flow_and_empty(self, spark):
        from database_transportor_spark.operators.sketches import (
            hist_measure, hist_quantiles,
        )

        df = spark.createDataFrame(
            [("g", -5.0), ("g", 500.0), ("g", 3.0), ("h", None)],
            "g string, x double",
        )
        hm = hist_measure(0.0, 10.0, bins=5)
        h = df.groupBy("g").agg(hm[0]("x").alias("h"))
        rows = {r["g"]: r for r in
                hist_quantiles(h, "h", [0.0, 1.0], 0.0, 10.0,
                               bins=5).collect()}
        g = rows["g"]
        assert g["h"][0] == 1 and g["h"][-1] == 1  # under/overflow slots
        assert g["p0"] == 0.0 and g["p100"] == 10.0  # clamped to range
        assert rows["h"]["p100"] is None  # NULL-only group: no estimate

    def test_log_bins_and_guards(self, spark):
        import pytest

        from database_transportor_spark.operators.sketches import (
            hist_bin, hist_measure,
        )

        df = spark.createDataFrame(
            [(1.0,), (10.0,), (100.0,), (999.0,)], "x double"
        )
        b = df.select(hist_bin("x", 1.0, 1000.0, 3, log=True).alias("b"))
        assert [r["b"] for r in b.collect()] == [1, 2, 3, 3]
        with pytest.raises(ValueError, match="lo > 0"):
            hist_measure(0.0, 10.0, bins=4, log=True)
        with pytest.raises(ValueError, match="hi > lo"):
            hist_measure(5.0, 5.0, bins=4)

    def test_custom_measure_rejects_non_callable(self, spark):
        import pytest

        from database_transportor_spark.operators.rollup import time_rollup

        df = spark.createDataFrame(
            [("2024-01-01 00:00:00", 1.0)], "ts string, x double"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "x")
        with pytest.raises(ValueError, match="pair of callables"):
            time_rollup(df, "ts", [], {"m": ((1, 2), "x")}, ["1 hour"])


# ---------------------------------------------------------------------------
# Approximate query processing (sampled aggregates with error bars)
# ---------------------------------------------------------------------------

class TestApproxAgg:
    def test_intervals_cover_truth(self, spark):
        from database_transportor_spark.operators.sketches import approx_agg

        df = spark.range(0, 50_000).select(
            (F.col("id") % 4).alias("g"),
            (F.col("id") % 100).cast("double").alias("x"),
        )
        out = approx_agg(
            df, ["g"],
            {"n": ("count", None), "sx": ("sum", "x")},
            fraction=0.1,
        ).collect()
        assert len(out) == 4
        for r in out:
            true_n, true_sx = 12_500, 12_500 * 49.5
            assert r["n_lo"] <= true_n <= r["n_hi"]
            assert r["sx_lo"] <= true_sx <= r["sx_hi"]
            # 4-sigma bars at this mass are tight-ish: within 10%
            assert abs(r["n"] - true_n) < true_n * 0.1

    def test_fraction_one_is_exact_with_zero_width(self, spark):
        from database_transportor_spark.operators.sketches import approx_agg

        df = spark.createDataFrame(
            [("a", 2.0), ("a", 3.0)], "g string, x double"
        )
        r = approx_agg(df, ["g"], {"sx": ("sum", "x")}, fraction=1.0).collect()[0]
        assert r["sx"] == r["sx_lo"] == r["sx_hi"] == 5.0

    def test_guards(self, spark):
        import pytest

        from database_transportor_spark.operators.sketches import approx_agg

        df = spark.createDataFrame([("a", 1.0)], "g string, x double")
        with pytest.raises(ValueError, match="fraction"):
            approx_agg(df, ["g"], {"n": ("count", None)}, fraction=0.0)
        with pytest.raises(ValueError, match="sum|count"):
            approx_agg(df, ["g"], {"m": ("avg", "x")}, fraction=0.5)
        with pytest.raises(ValueError, match="needs a column"):
            approx_agg(df, ["g"], {"m": ("sum", None)}, fraction=0.5)


class TestScalablePercentiles:
    def _check(self, spark, rows, probs, keys=["g"]):
        from database_transportor_spark.operators.sketches import (
            grouped_percentiles_scalable,
        )

        df = spark.createDataFrame(rows, "g string, x double")
        got = {
            tuple(r[k] for k in keys): r["percentiles"]
            for r in grouped_percentiles_scalable(
                df, keys, "x", probs, coarse_bins=8
            ).collect()
        }
        probs_arr = F.array(*[F.lit(p) for p in probs])
        want = {
            tuple(r[k] for k in keys): r["p"]
            for r in df.groupBy(*keys)
            .agg(F.percentile("x", probs_arr).alias("p"))
            .collect()
        }
        for k, w in want.items():
            g = got[k]
            if w is None:
                assert g is None or all(v is None for v in g)
                continue
            for a, b in zip(g, w):
                assert (a is None and b is None) or abs(a - b) < 1e-9, (k, g, w)

    def test_matches_spark_percentile_varied(self, spark):
        import random

        rnd = random.Random(7)
        rows = [("a", float(rnd.randint(0, 100))) for _ in range(500)]
        rows += [("b", rnd.uniform(-5, 5)) for _ in range(333)]
        rows += [("c", 42.0)] * 17                      # constant group
        rows += [("d", 1.0)]                            # single row
        rows += [("e", float(v)) for v in (1, 1, 1, 1, 2, 9, 9, 9)]  # dup-heavy
        self._check(spark, rows, [0.0, 0.25, 0.5, 0.9, 0.95, 1.0])

    def test_all_null_group(self, spark):
        from database_transportor_spark.operators.sketches import (
            grouped_percentiles_scalable,
        )

        df = spark.createDataFrame(
            [("a", 1.0), ("z", None)], "g string, x double"
        )
        got = {r["g"]: r["percentiles"] for r in
               grouped_percentiles_scalable(df, ["g"], "x", [0.5]).collect()}
        assert got["a"] == [1.0]
        # the all-NULL group keeps its row with NULL percentiles — the
        # docstring's contract (it used to vanish from the output)
        assert "z" in got and got["z"] is None

    def test_guards(self, spark):
        import pytest

        from database_transportor_spark.operators.sketches import (
            grouped_percentiles_scalable,
        )

        df = spark.createDataFrame([("a", 1.0)], "g string, x double")
        with pytest.raises(ValueError, match="probabilities"):
            grouped_percentiles_scalable(df, ["g"], "x", [])
        with pytest.raises(ValueError, match="outside"):
            grouped_percentiles_scalable(df, ["g"], "x", [1.5])


class TestKMVExactContract:
    def test_pairwise_matches_exact_selfjoin(self, spark):
        # The heavy verification the benched kmv_overlap query no longer
        # carries (round-7): estimates from 512-hash sketches vs the
        # EXACT distinct×distinct self-join on the real lineitem fixture.
        from database_transportor_spark.operators.sketches import (
            kmv_pairwise, kmv_sketch,
        )

        l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        k = 512
        sk = kmv_sketch(l, ["l_returnflag"], "l_orderkey", k=k)
        pw = {(r["group_a"], r["group_b"]): r
              for r in kmv_pairwise(sk, ["l_returnflag"], k=k).collect()}

        d = l.select("l_returnflag", "l_orderkey").distinct()
        counts = {r["l_returnflag"]: r["n"]
                  for r in d.groupBy("l_returnflag")
                  .agg(F.count("*").alias("n")).collect()}
        a, b = d.alias("a"), d.alias("b")
        exact = {
            (r["ga"], r["gb"]): r["i"]
            for r in a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_returnflag") < F.col("b.l_returnflag")),
            )
            .groupBy(F.col("a.l_returnflag").alias("ga"),
                     F.col("b.l_returnflag").alias("gb"))
            .agg(F.count("*").alias("i"))
            .collect()
        }
        assert len(pw) == 3  # C(3,2) return-flag pairs
        for (ga, gb), row in pw.items():
            ei = exact.get((ga, gb), 0)
            eu = counts[ga] + counts[gb] - ei
            tol = eu * 0.2 + 5  # the 4.5-sigma envelope the query asserted
            assert abs(row["inter_est"] - ei) <= tol, (ga, gb, row, ei)
            assert abs(row["union_est"] - eu) <= tol, (ga, gb, row, eu)
            assert abs(row["jaccard_est"] - ei / eu) <= 0.1

    def test_flagset_pair_explosion_equals_selfjoin(self, spark):
        # the linear exact-contract computation the reworked kmv_overlap
        # query uses must agree with the self-join it replaced
        import __spark_entry__ as e

        out = {
            (r["group_a"], r["group_b"]): (r["exact_inter"], r["exact_union"])
            for r in e.queries()["kmv_overlap"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        d = l.select("l_returnflag", "l_orderkey").distinct()
        counts = {r["l_returnflag"]: r["n"]
                  for r in d.groupBy("l_returnflag")
                  .agg(F.count("*").alias("n")).collect()}
        a, b = d.alias("a"), d.alias("b")
        exact = {
            (r["ga"], r["gb"]): r["i"]
            for r in a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_returnflag") < F.col("b.l_returnflag")),
            )
            .groupBy(F.col("a.l_returnflag").alias("ga"),
                     F.col("b.l_returnflag").alias("gb"))
            .agg(F.count("*").alias("i"))
            .collect()
        }
        assert len(out) == 3
        for pair, (ei, eu) in out.items():
            want_i = exact.get(pair, 0)
            want_u = counts[pair[0]] + counts[pair[1]] - want_i
            assert (ei, eu) == (want_i, want_u), (pair, ei, eu, want_i, want_u)


def test_global_percentiles_all_null(spark):
    # review r7: keys=[] with an all-NULL column must emit ONE row with
    # NULL percentiles (the left-join used to degrade to a crossJoin
    # that dropped the stats row against the empty kv side)
    from database_transportor_spark.operators.sketches import (
        grouped_percentiles_scalable,
    )

    df = spark.createDataFrame([(None,), (None,)], "x double")
    rows = grouped_percentiles_scalable(df, [], "x", [0.5, 0.9]).collect()
    assert len(rows) == 1 and rows[0]["percentiles"] is None
    # and the normal global path still works
    df2 = spark.createDataFrame([(1.0,), (3.0,), (None,)], "x double")
    got = grouped_percentiles_scalable(df2, [], "x", [0.5]).collect()
    assert len(got) == 1 and got[0]["percentiles"] == [2.0]


class TestHistTable:
    """hist_table — two-level leaf plan, bit-identical to the measure."""

    def test_matches_measure_leaf(self, spark):
        from database_transportor_spark.operators.sketches import (
            hist_measure, hist_table,
        )

        df = spark.createDataFrame(
            [("a", 5.0), ("a", 15.0), ("a", 15.0), ("a", None),
             ("b", -3.0), ("b", 999.0),       # under + overflow
             ("c", None)],                    # all-NULL group
            ["g", "x"],
        )
        hm = hist_measure(0.0, 20.0, bins=4)
        want = {
            r["g"]: r["h"]
            for r in df.groupBy("g").agg(hm[0]("x").alias("h")).collect()
        }
        got = {
            r["g"]: r["h"]
            for r in hist_table(df, ["g"], "x", 0.0, 20.0,
                                bins=4).collect()
        }
        assert got == want
        assert got["c"] == [0] * 6            # group kept, zero counts
        assert got["b"][0] == 1 and got["b"][5] == 1

    def test_merge_parity_with_measure(self, spark):
        from pyspark.sql import functions as F

        from database_transportor_spark.operators.sketches import (
            hist_measure, hist_quantiles, hist_table,
        )

        df = spark.createDataFrame(
            [(g, s, float(v)) for g in ("x", "y") for s in ("p", "q")
             for v in range(0, 100, 7)],
            ["g", "s", "v"],
        )
        hm = hist_measure(0.0, 100.0, bins=10)
        leaf = hist_table(df, ["g", "s"], "v", 0.0, 100.0, bins=10)
        merged = leaf.groupBy("g").agg(hm[1]("h").alias("h"))
        direct = hist_table(df, ["g"], "v", 0.0, 100.0, bins=10)
        a = {r["g"]: r["h"] for r in merged.collect()}
        b = {r["g"]: r["h"] for r in direct.collect()}
        assert a == b
        q = hist_quantiles(merged, "h", [0.5], 0.0, 100.0, bins=10)
        assert all(r["p50"] is not None for r in q.collect())

    def test_null_group_key_keeps_counts(self, spark):
        """Regression (round-9 ADVICE high): a NULL group key must keep
        its real bin counts — the old roster left-join was not
        null-safe (NULL never matches itself in a USING join) and
        silently returned an all-zero histogram for such groups."""
        from database_transportor_spark.operators.sketches import (
            hist_measure, hist_table,
        )

        df = spark.createDataFrame(
            [(None, 2.0), (None, 12.0), (None, None),
             ("a", 5.0)],
            "g string, x double",
        )
        hm = hist_measure(0.0, 20.0, bins=4)
        want = {
            r["g"]: r["h"]
            for r in df.groupBy("g").agg(hm[0]("x").alias("h")).collect()
        }
        got = {
            r["g"]: r["h"]
            for r in hist_table(df, ["g"], "x", 0.0, 20.0,
                                bins=4).collect()
        }
        assert got == want
        assert got[None] == [0, 1, 0, 1, 0, 0]

    def test_requires_group_cols(self, spark):
        import pytest as _pytest

        from database_transportor_spark.operators.sketches import hist_table

        df = spark.createDataFrame([("a", 1.0)], ["g", "x"])
        with _pytest.raises(ValueError, match="group column"):
            hist_table(df, [], "x", 0.0, 1.0)
