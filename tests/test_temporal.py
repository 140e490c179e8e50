"""asof_join / range_join semantics, including a pandas merge_asof
cross-check and bucketed-vs-theta equivalence."""

import pandas as pd
from pyspark.sql import functions as F

from database_transportor_spark.operators.temporal import asof_join, range_join


def _quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            ("A", 1, 100.0), ("A", 5, 101.0), ("A", 9, 102.0),
            ("B", 3, 50.0),
        ],
        ["sym", "ts", "px"],
    )
    trades = spark.createDataFrame(
        [
            ("A", 0, 7), ("A", 5, 8), ("A", 6, 9), ("A", 20, 10),
            ("B", 2, 11), ("B", 4, 12),
            ("C", 1, 13),
        ],
        ["sym", "ts", "qty"],
    )
    return quotes, trades


def test_asof_join_basic(spark):
    quotes, trades = _quotes_trades(spark)
    out = {(r["sym"], r["ts"]): r["px"] for r in
           asof_join(trades, quotes, "sym", "ts").collect()}
    assert out[("A", 0)] is None        # nothing at or before
    assert out[("A", 5)] == 101.0       # equal ts: right at same ts wins (<=)
    assert out[("A", 6)] == 101.0
    assert out[("A", 20)] == 102.0      # latest carried far forward
    assert out[("B", 2)] is None
    assert out[("B", 4)] == 50.0
    assert out[("C", 1)] is None        # key missing from right entirely


def test_asof_join_matches_pandas(spark):
    quotes, trades = _quotes_trades(spark)
    got = asof_join(trades, quotes, "sym", "ts").orderBy("sym", "ts").toPandas()
    want = pd.merge_asof(
        trades.orderBy("ts").toPandas().sort_values("ts"),
        quotes.orderBy("ts").toPandas().sort_values("ts"),
        on="ts", by="sym",
    ).sort_values(["sym", "ts"]).reset_index(drop=True)
    assert list(got["px"].fillna(-1)) == list(want["px"].fillna(-1))


def test_asof_join_tolerance(spark):
    quotes, trades = _quotes_trades(spark)
    out = {(r["sym"], r["ts"]): r["px"] for r in
           asof_join(trades, quotes, "sym", "ts", tolerance="2").collect()}
    assert out[("A", 5)] == 101.0   # staleness 0 ≤ 2
    assert out[("A", 20)] is None   # quote 11 ticks stale > 2
    assert out[("B", 4)] == 50.0    # staleness 1 ≤ 2


def test_asof_join_name_collision_suffix(spark):
    left = spark.createDataFrame([("A", 5, 1.0)], ["k", "ts", "v"])
    right = spark.createDataFrame([("A", 3, 2.0)], ["k", "ts", "v"])
    row = asof_join(left, right, "k", "ts").first()
    assert row["v"] == 1.0 and row["v_right"] == 2.0


def test_range_join_bucketed_equals_theta(spark):
    points = spark.createDataFrame(
        [(k, t) for k in ("u1", "u2") for t in range(0, 100, 4)], ["k", "t"]
    )
    intervals = spark.createDataFrame(
        [("u1", 0, 10, "a"), ("u1", 8, 30, "b"), ("u1", 90, 200, "c"),
         ("u2", 50, 55, "d")],
        ["k", "lo", "hi", "tag"],
    )
    theta = range_join(points, intervals, "k", "t", "lo", "hi")
    bucketed = range_join(points, intervals, "k", "t", "lo", "hi", bucket="16")
    t = sorted((r["k"], r["t"], r["tag"]) for r in theta.collect())
    b = sorted((r["k"], r["t"], r["tag"]) for r in bucketed.collect())
    assert t == b and len(t) > 0
    # overlapping intervals fan out
    assert ("u1", 8, "a") in t and ("u1", 8, "b") in t


def test_range_join_left_keeps_unmatched(spark):
    points = spark.createDataFrame([("u1", 5), ("u1", 999)], ["k", "t"])
    intervals = spark.createDataFrame([("u1", 0, 10, "a")], ["k", "lo", "hi", "tag"])
    out = range_join(points, intervals, "k", "t", "lo", "hi",
                     bucket="8", how="left")
    rows = {r["t"]: r["tag"] for r in out.collect()}
    assert rows == {5: "a", 999: None}


def test_range_join_no_nested_loop_when_bucketed(spark):
    points = spark.createDataFrame([("u1", i) for i in range(50)], ["k", "t"])
    intervals = spark.createDataFrame(
        [("u1", 10 * i, 10 * i + 9, i) for i in range(5)], ["k", "lo", "hi", "iv"]
    )
    df = range_join(points, intervals, "k", "t", "lo", "hi", bucket="10")
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_asof_refer_through_engine(spark):
    from database_transportor_spark import DBT, MemoryCatalog

    trades = spark.createDataFrame(
        [(1, "A", 5), (2, "A", 0), (3, "B", 9)], ["tid", "sym", "ts"]
    )
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 4, 11.0), ("A", 4, 12.0), ("B", 20, 13.0)],
        ["sym", "ts", "px"],
    )
    maps = {
        "out": {
            "original_table": "trades",
            "columns": {
                "tid": "tid",
                "px": {
                    "asof_refer": {
                        "search_table": "quotes",
                        "search_source": "original",
                        "on": "sym",
                        "according_ts": "ts",
                        "wanted_column": "px",
                    },
                    "default": 0.0,
                },
            },
        }
    }
    eng = DBT(maps, target=MemoryCatalog(),
              original=MemoryCatalog({"trades": trades, "quotes": quotes}))
    out = {r["tid"]: r["px"] for r in eng.transform()["out"].collect()}
    # tid 1 at ts 5: latest quote ts 4 — dup (A,4) reduces to max ⇒ 12.0
    assert out == {1: 12.0, 2: 0.0, 3: 0.0}


def test_asof_refer_target_side_orders_maps(spark):
    """asof_refer with search_source=target must add a topo edge."""
    from database_transportor_spark import DBT, MemoryCatalog
    from database_transportor_spark.plans.planner import topo_order
    from database_transportor_spark.spec import parse_maps

    maps = {
        "a_enrich": {
            "original_table": "trades",
            "columns": {
                "tid": "tid",
                "px": {
                    "asof_refer": {
                        "search_table": "b_quotes",
                        "search_source": "target",
                        "on": "sym",
                        "according_ts": "ts",
                        "wanted_column": "px",
                    },
                },
            },
        },
        "b_quotes": {
            "original_table": "raw_quotes",
            "columns": {"sym": "sym", "ts": "ts", "px": "px"},
        },
    }
    order = topo_order(parse_maps(maps))
    assert order.index("b_quotes") < order.index("a_enrich")
    trades = spark.createDataFrame([(1, "A", 5)], ["tid", "sym", "ts"])
    raw_quotes = spark.createDataFrame([("A", 2, 7.0)], ["sym", "ts", "px"])
    eng = DBT(maps, target=MemoryCatalog(),
              original=MemoryCatalog({"trades": trades, "raw_quotes": raw_quotes}))
    assert eng.transform()["a_enrich"].first()["px"] == 7.0


def test_asof_refer_spec_validation():
    import pytest

    from database_transportor_spark.spec import SpecError, parse_maps

    with pytest.raises(SpecError, match="missing key"):
        parse_maps({"m": {"original_table": "t", "columns": {
            "x": {"asof_refer": {"search_table": "q", "on": "k"}}}}})
    with pytest.raises(SpecError, match="mutually exclusive"):
        parse_maps({"m": {"original_table": "t", "columns": {
            "x": {"asof_refer": {"search_table": "q", "on": "k",
                                  "according_ts": "ts", "wanted_column": "v"},
                  "refer": {"search_table": "q", "search_column": "k",
                             "according_column": "k", "wanted_column": "v"}}}}})


def test_asof_join_reserved_names_rejected(spark):
    import pytest

    left = spark.createDataFrame([("A", 1, 2)], ["k", "ts", "__side"])
    right = spark.createDataFrame([("A", 1, 3.0)], ["k", "ts", "v"])
    with pytest.raises(ValueError, match="reserves"):
        asof_join(left, right, "k", "ts")


def test_asof_refer_overwrites_colliding_fact_column(spark):
    """A fact column named like the asof_refer target is REPLACED by the
    lookup result (refer/refers overwrite semantics), not silently kept."""
    from database_transportor_spark import DBT, MemoryCatalog

    trades = spark.createDataFrame(
        [(1, "A", 5, -1.0), (2, "B", 9, -1.0)], ["tid", "sym", "ts", "px"]
    )
    quotes = spark.createDataFrame(
        [("A", 1, 10.0)], ["sym", "ts", "px"]
    )
    maps = {
        "out": {
            "original_table": "trades",
            "columns": {
                "tid": "tid",
                "px": {
                    "asof_refer": {
                        "search_table": "quotes",
                        "search_source": "original",
                        "on": "sym",
                        "according_ts": "ts",
                        "wanted_column": "px",
                    },
                    "default": 0.0,
                },
            },
        }
    }
    eng = DBT(maps, target=MemoryCatalog(),
              original=MemoryCatalog({"trades": trades, "quotes": quotes}))
    out = {r["tid"]: r["px"] for r in eng.transform()["out"].collect()}
    # the stale -1.0 fact values must NOT survive
    assert out == {1: 10.0, 2: 0.0}


def test_asof_refer_target_colliding_with_join_input_raises(spark):
    import pytest

    from database_transportor_spark.operators.refer import apply_asof_refer
    from database_transportor_spark.spec import ColumnSpec, SpecError

    fact = spark.createDataFrame([(1, "A", 5)], ["tid", "sym", "ts"])
    cspec = ColumnSpec.parse("ts", {
        "asof_refer": {
            "search_table": "quotes",
            "search_source": "original",
            "on": "sym",
            "according_ts": "ts",
            "wanted_column": "px",
        },
    })
    with pytest.raises(SpecError, match="collides"):
        apply_asof_refer(fact, cspec, lambda s, t: fact)


def test_asof_join_bucketed_matches_plain(spark):
    """The time-bucketed hot-key path must be result-transparent."""
    import datetime
    import random

    from database_transportor_spark.operators.temporal import asof_join

    random.seed(11)
    base = datetime.datetime(2024, 1, 1)
    L = [(random.randint(0, 3), base + datetime.timedelta(minutes=random.randint(0, 5000)), i)
         for i in range(300)]
    seen, R = set(), []
    for _ in range(250):
        k, t = random.randint(0, 3), base + datetime.timedelta(minutes=random.randint(0, 5000))
        if (k, t) in seen:
            continue
        seen.add((k, t))
        R.append((k, t, float(len(R))))
    left = spark.createDataFrame(L, "k int, ts timestamp, lid long")
    right = spark.createDataFrame(R, "k int, ts timestamp, px double")
    plain = sorted(map(tuple, asof_join(left, right, "k", "ts").collect()))
    for b in ("45 minutes", "1 day"):
        bucketed = sorted(map(tuple, asof_join(left, right, "k", "ts", bucket=b).collect()))
        assert bucketed == plain, b
    # and with tolerance
    plain_t = sorted(map(tuple, asof_join(
        left, right, "k", "ts", tolerance="INTERVAL 90 MINUTES").collect()))
    buck_t = sorted(map(tuple, asof_join(
        left, right, "k", "ts", tolerance="INTERVAL 90 MINUTES", bucket="1 hour").collect()))
    assert buck_t == plain_t


# --- build_scd2 ------------------------------------------------------------

def test_scd2_intervals_and_collapse(spark):
    import datetime

    from database_transportor_spark.operators.temporal import build_scd2

    def t(d):
        return datetime.datetime(2024, 1, d)

    feed = spark.createDataFrame(
        [(1, t(1), "bronze"), (1, t(5), "bronze"),   # no-op ⇒ collapsed
         (1, t(10), "gold"), (2, t(3), "silver")],
        "k long, ts timestamp, tier string",
    )
    out = build_scd2(feed, "k", "ts", attr_cols=["tier"])
    rows = sorted(
        (r["k"], r["tier"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    )
    assert rows == [
        (1, "bronze", t(1), t(10)),      # t(5) no-op collapsed away
        (1, "gold", t(10), None),        # current row open-ended
        (2, "silver", t(3), None),
    ]


def test_scd2_no_collapse_keeps_arrivals(spark):
    import datetime

    from database_transportor_spark.operators.temporal import build_scd2

    def t(d):
        return datetime.datetime(2024, 1, d)

    feed = spark.createDataFrame(
        [(1, t(1), "a"), (1, t(5), "a")], "k long, ts timestamp, v string"
    )
    out = build_scd2(feed, "k", "ts", collapse=False)
    assert out.count() == 2


def test_scd2_asof_roundtrip(spark):
    """Probing the SCD2 output with asof_join answers point-in-time state."""
    import datetime

    from database_transportor_spark.operators.temporal import asof_join, build_scd2

    def t(d):
        return datetime.datetime(2024, 1, d)

    feed = spark.createDataFrame(
        [(1, t(1), "bronze"), (1, t(10), "gold")],
        "k long, ts timestamp, tier string",
    )
    dim = build_scd2(feed, "k", "ts", attr_cols=["tier"])
    probes = spark.createDataFrame(
        [(1, t(2)), (1, t(11))], "k long, at timestamp"
    )
    out = asof_join(
        probes, dim.select("k", "valid_from", "tier"),
        "k", left_ts="at", right_ts="valid_from",
    )
    got = {r["at"]: r["tier"] for r in out.collect()}
    assert got == {t(2): "bronze", t(11): "gold"}


def test_asof_join_bucketed_tie_matches_plain(spark):
    """Several right rows share a key's MAX timestamp inside one bucket:
    the bucketed carry summary and the plain window path must pick the
    SAME winner (deterministic payload-hash tiebreak in both)."""
    from datetime import datetime

    def ts(h, m=0):
        return datetime(2024, 1, 1 + h // 24, h % 24, m)

    # three right rows at the identical (key, ts); left probes land both in
    # the same bucket and in a LATER bucket (exercises the carried-in path)
    right = spark.createDataFrame(
        [("k", ts(1), "a"), ("k", ts(1), "b"), ("k", ts(1), "c"),
         ("k", ts(1), "d"), ("k", ts(1), "e")],
        ["key", "rts", "payload"],
    )
    left = spark.createDataFrame(
        [("k", ts(1, 30)), ("k", ts(5)), ("k", ts(26))], ["key", "lts"]
    )
    plain = asof_join(left, right, "key", "lts", "rts").orderBy("lts")
    bucketed = asof_join(
        left, right, "key", "lts", "rts", bucket="1 hour"
    ).orderBy("lts")
    p = [(r["lts"], r["payload"]) for r in plain.collect()]
    b = [(r["lts"], r["payload"]) for r in bucketed.collect()]
    assert p == b, f"tie winner diverged between paths: {p} vs {b}"
    # repeated runs stay deterministic
    p2 = [(r["lts"], r["payload"]) for r in plain.collect()]
    assert p == p2


def test_asof_join_map_typed_payload(spark):
    """Map-typed right payloads can't participate in the hash tiebreak
    (xxhash64 rejects MapType) but must still join fine."""
    left = spark.createDataFrame([("k", 10)], ["key", "lts"])
    right = spark.createDataFrame(
        [("k", 5, {"a": "1"}), ("k", 7, {"b": "2"})],
        ["key", "rts", "attrs"],
    )
    out = asof_join(left, right, "key", "lts", "rts").collect()
    assert len(out) == 1 and out[0]["attrs"] == {"b": "2"}


def test_ewma_matches_python_reference(spark):
    import datetime

    from database_transportor_spark.operators.temporal import ewma

    def t(m):
        return datetime.datetime(2026, 1, 1, 10, m)

    rows = [("u", t(0), 10.0, 1), ("u", t(1), 20.0, 2), ("u", t(2), 0.0, 3),
            ("v", t(0), 4.0, 4)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, x double, i long")
    out = ewma(df, ["k"], "ts", "x", alpha=0.25, tiebreak_col="i")
    got = {(r["k"], r["ts"].minute): r["ewma"] for r in out.collect()}
    # reference fold
    ref = {}
    for k in ("u", "v"):
        seq = [(ts, x) for kk, ts, x, _ in rows if kk == k]
        e = None
        for ts, x in seq:
            e = x if e is None else 0.25 * x + 0.75 * e
            ref[(k, ts.minute)] = e
    assert got == ref
    assert got[("v", 0)] == 4.0  # single-event key: ema = x


def test_ewma_tiebreak_and_validation(spark):
    import datetime

    import pytest as _pytest

    from database_transportor_spark.operators.temporal import ewma

    ts = datetime.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("k", ts, 100.0, 2), ("k", ts, 0.0, 1)],
        "k string, ts timestamp, x double, i long",
    )
    out = ewma(df, ["k"], "ts", "x", alpha=0.5, tiebreak_col="i").collect()
    emas = sorted(r["ewma"] for r in out)
    assert emas == [0.0, 50.0]  # i=1 first (ema=0), then i=2 (0.5*100+0.5*0)
    with _pytest.raises(ValueError):
        ewma(df, ["k"], "ts", "x", alpha=0.0)


def test_ewma_null_carries_state_instead_of_restarting(spark):
    import datetime

    from database_transportor_spark.operators.temporal import ewma

    def t(m):
        return datetime.datetime(2026, 1, 1, 10, m)

    df = spark.createDataFrame(
        [("k", t(0), 10.0, 1), ("k", t(1), None, 2), ("k", t(2), 30.0, 3),
         ("j", t(0), None, 4), ("j", t(1), 8.0, 5)],
        "k string, ts timestamp, x double, i long",
    )
    got = {(r["k"], r["ts"].minute): r["ewma"] for r in ewma(
        df, ["k"], "ts", "x", alpha=0.25, tiebreak_col="i"
    ).collect()}
    assert got[("k", 0)] == 10.0
    assert got[("k", 1)] == 10.0            # NULL carries the state
    assert got[("k", 2)] == 0.25 * 30.0 + 0.75 * 10.0  # resumes, no restart
    assert got[("j", 0)] is None            # NULL before any real value
    assert got[("j", 1)] == 8.0             # series starts at first real x


def test_ewma_max_points_per_key_prefix_unchanged(spark):
    import datetime

    from database_transportor_spark.operators.temporal import ewma

    base = datetime.datetime(2026, 1, 1)
    rows = [("k", base + datetime.timedelta(hours=h), float(h))
            for h in range(200)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    capped = ewma(df, ["k"], "ts", "v", alpha=0.5, max_points_per_key=10)
    full = ewma(df, ["k"], "ts", "v", alpha=0.5)
    # capped output = exactly the first 10 rows of the full recurrence
    a = sorted((r["ts"], r["ewma"]) for r in capped.collect())
    b = sorted((r["ts"], r["ewma"]) for r in full.collect())[:10]
    assert len(a) == 10 and a == b


def test_gap_fill_preserves_real_nulls_in_present_rows(spark):
    import datetime as dt

    from database_transportor_spark.operators.temporal import gap_fill

    d1 = dt.datetime(2024, 1, 1)
    d3 = dt.datetime(2024, 1, 3)
    df = spark.createDataFrame(
        [(1, d1, None), (1, d3, 5.0)],
        "k long, ts timestamp, v double",
    )
    out = {(r["k"], r["ts"]): r["v"]
           for r in gap_fill(df, ["k"], "ts", "1 day",
                             value_cols=["v"], fill=0.0).collect()}
    # the present-but-NULL measurement stays NULL; only the absent
    # Jan 2 bucket gets the fill constant
    assert out[(1, d1)] is None
    assert out[(1, dt.datetime(2024, 1, 2))] == 0.0
    assert out[(1, d3)] == 5.0


def test_range_join_shared_axis_column_name(spark):
    from database_transportor_spark.operators.temporal import range_join

    points = spark.createDataFrame(
        [(1, 5.0), (1, 50.0)], "k long, x double"
    )
    # interval side carries a column with the SAME name as the point axis
    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0, 99.0)], "k long, lo double, hi double, x double"
    )
    got = range_join(points, intervals.withColumnRenamed("x", "x2"),
                     on="k", point_col="x", lo_col="lo", hi_col="hi")
    assert got.count() == 1
    # and the genuinely-clashing case resolves instead of raising
    got2 = range_join(points, intervals, on="k",
                      point_col="x", lo_col="lo", hi_col="hi")
    assert got2.count() == 1


def test_asof_join_reserves_rts(spark):
    import datetime as dt

    import pytest as _pytest

    from database_transportor_spark.operators.temporal import asof_join

    t = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t)], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, t, 1.0)], "k long, ts timestamp, __rts double"
    )
    with _pytest.raises(ValueError, match="reserve"):
        asof_join(left, right, on="k", left_ts="ts")


# ---------------------------------------------------------------------------
# cusum
# ---------------------------------------------------------------------------


def test_cusum_recurrence_exact(spark):
    from database_transportor_spark.operators.temporal import cusum

    # key A: x = [10, 10, 16, 22, 10]; explicit target k=12, threshold 10
    # s: max(0,10-12)=0; max(0,0+10-12)=0; max(0,0+16-12)=4;
    #    max(0,4+22-12)=14 (flag); max(0,14+10-12)=12 (flag)
    df = spark.createDataFrame(
        [("A", t, x) for t, x in enumerate([10, 10, 16, 22, 10])],
        ["k", "ts", "x"],
    )
    out = cusum(df, ["k"], "ts", "x", threshold=10, target=12)
    got = [(r.ts, r.cusum, r.is_shift) for r in out.orderBy("ts").collect()]
    assert got == [(0, 0, 0), (1, 0, 0), (2, 4, 0), (3, 14, 1), (4, 12, 1)]


def test_cusum_default_target_is_integer_mean(spark):
    from database_transportor_spark.operators.temporal import cusum

    # x = [1, 2, 6]: sum=9, n=3, k=3; s = 0, 0, 3
    df = spark.createDataFrame(
        [("A", 1, 1), ("A", 2, 2), ("A", 3, 6)], ["k", "ts", "x"]
    )
    out = cusum(df, ["k"], "ts", "x", threshold=2)
    got = [(r.cusum, r.is_shift) for r in out.orderBy("ts").collect()]
    assert got == [(0, 0), (0, 0), (3, 1)]


def test_cusum_null_carries_state(spark):
    from database_transportor_spark.operators.temporal import cusum

    df = spark.createDataFrame(
        [("A", 1, 10), ("A", 2, None), ("A", 3, 10)], ["k", "ts", "x"]
    )
    out = cusum(df, ["k"], "ts", "x", threshold=100, target=4)
    got = [(r.ts, r.cusum) for r in out.orderBy("ts").collect()]
    # s1 = max(0, 10-4) = 6; NULL carries 6; s3 = max(0, 6+10-4) = 12
    assert got == [(1, 6), (2, 6), (3, 12)]


def test_cusum_hot_key_guard(spark):
    from database_transportor_spark.operators.temporal import cusum

    df = spark.createDataFrame(
        [("A", t, 5) for t in range(10)], ["k", "ts", "x"]
    )
    out = cusum(
        df, ["k"], "ts", "x", threshold=1, target=4, max_points_per_key=3
    )
    assert out.count() == 3  # later points dropped, prefix fold unchanged
    got = [r.cusum for r in out.orderBy("ts").collect()]
    assert got == [1, 2, 3]


# ---------------------------------------------------------------------------
# rolling_distinct
# ---------------------------------------------------------------------------


def test_rolling_distinct_matches_brute_force(spark):
    from datetime import datetime

    from database_transportor_spark.operators.temporal import (
        rolling_distinct,
    )

    rows = [
        ("u1", datetime(2024, 1, 1, 5)),
        ("u1", datetime(2024, 1, 1, 9)),   # same user+day collapses
        ("u2", datetime(2024, 1, 2, 1)),
        ("u1", datetime(2024, 1, 5, 1)),
        ("u3", datetime(2024, 1, 9, 1)),
    ]
    df = spark.createDataFrame(rows, ["u", "ts"])
    out = rolling_distinct(df, "ts", "u", window_buckets=3, out_col="act")
    got = {r.bucket.day: r.act for r in out.collect()}
    # brute force: day d counts users active in [d-2, d]
    days = {1: {"u1"}, 2: {"u2"}, 5: {"u1"}, 9: {"u3"}}
    for d in range(1, 12):
        want = set()
        for back in range(3):
            want |= days.get(d - back, set())
        if want:
            assert got[d] == len(want), d
        else:
            assert d not in got
    assert len(got) == len([d for d in range(1, 12)
                            if any(days.get(d - b) for b in range(3))])


def test_rolling_distinct_group_cols_and_window1(spark):
    from datetime import datetime

    from database_transportor_spark.operators.temporal import (
        rolling_distinct,
    )

    rows = [
        ("A", "u1", datetime(2024, 1, 1)),
        ("A", "u2", datetime(2024, 1, 1)),
        ("B", "u1", datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(rows, ["g", "u", "ts"])
    out = rolling_distinct(
        df, "ts", "u", window_buckets=1, group_cols=["g"], out_col="act"
    )
    got = {(r.g, r.bucket.day): r.act for r in out.collect()}
    assert got == {("A", 1): 2, ("B", 1): 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rolling_distinct(df, "ts", "u", window_buckets=0)


def test_rolling_distinct_null_ts_excluded_and_name_guard(spark):
    from datetime import datetime

    import pytest as _pytest

    from database_transportor_spark.operators.temporal import (
        rolling_distinct,
    )

    df = spark.createDataFrame(
        [("u1", datetime(2024, 1, 1)), ("u2", None)],
        "u string, ts timestamp",
    )
    out = rolling_distinct(df, "ts", "u", window_buckets=2, out_col="act")
    rows = out.collect()
    # u2's NULL ts contributes nothing; u1 covers 2 buckets
    assert len(rows) == 2 and all(r.act == 1 for r in rows)
    with _pytest.raises(ValueError):
        rolling_distinct(
            df, "ts", "u", group_cols=["bucket"], window_buckets=1
        )
    # renaming the output bucket resolves the collision
    out2 = rolling_distinct(
        df.withColumnRenamed("u", "bucket"), "ts", "bucket",
        window_buckets=1, bucket_col="b",
    )
    assert set(out2.columns) == {"b", "active"}


def test_cusum_nan_value_does_not_bias_default_target(spark):
    from database_transportor_spark.operators.temporal import cusum

    # x = [4.0, NaN, 8.0]: NaN fails the long cast -> mean = 12/2 = 6
    df = spark.createDataFrame(
        [("A", 1, 4.0), ("A", 2, float("nan")), ("A", 3, 8.0)],
        "k string, ts int, x double",
    )
    out = cusum(df, ["k"], "ts", "x", threshold=1)
    got = [r.cusum for r in out.orderBy("ts").collect()]
    # s1 = max(0, 4-6) = 0; NaN carries (cast->NULL); s3 = max(0, 0+8-6)=2
    assert got == [0, 0, 2]


# ---------------------------------------------------------------------------
# time_weighted_avg / interval_concurrency
# ---------------------------------------------------------------------------


def test_twap_exact_and_edge_cases(spark):
    from datetime import datetime

    from database_transportor_spark.operators.temporal import (
        time_weighted_avg,
    )

    df = spark.createDataFrame(
        [
            ("k", datetime(2024, 1, 1, 0, 0, 0), 10.0),
            ("k", datetime(2024, 1, 1, 0, 0, 2), 20.0),
            ("k", datetime(2024, 1, 1, 0, 0, 3), 99.0),  # last: no weight
            ("solo", datetime(2024, 1, 1), 5.0),
            ("nulls", datetime(2024, 1, 1), None),       # dropped
            ("nulls", None, 7.0),                         # dropped
        ],
        "k string, ts timestamp, v double",
    )
    got = {r.k: r for r in time_weighted_avg(df, ["k"], "ts", "v").collect()}
    # (10*2s + 20*1s) / 3s = 13.333333 -> 13333333 micro
    assert got["k"].twap_micro == 13_333_333
    assert got["k"].dt_total_micros == 3_000_000
    assert got["k"].n_points == 3
    assert got["solo"].twap_micro is None  # single point: no span
    assert "nulls" not in got  # all rows dropped


def test_twap_weights_by_duration_not_count(spark):
    from datetime import datetime

    from database_transportor_spark.operators.temporal import (
        time_weighted_avg,
    )

    # burst of 0s for 1s, then one 100 held for 9s: plain avg = 25,
    # twap = 900/10 = 90
    rows = [("k", datetime(2024, 1, 1, 0, 0, 0, i * 250_000), 0.0)
            for i in range(4)]
    rows += [("k", datetime(2024, 1, 1, 0, 0, 1), 100.0),
             ("k", datetime(2024, 1, 1, 0, 0, 10), 0.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    r = time_weighted_avg(df, ["k"], "ts", "v").collect()[0]
    assert r.twap_micro == 90_000_000


def test_interval_concurrency_half_open_and_open_ended(spark):
    from datetime import datetime

    from database_transportor_spark.operators.temporal import (
        interval_concurrency,
    )

    iv = spark.createDataFrame(
        [
            ("g", datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 2)),
            ("g", datetime(2024, 1, 1, 1), datetime(2024, 1, 1, 3)),
            # starts exactly when #1 ends: half-open -> no overlap bump
            ("g", datetime(2024, 1, 1, 2), datetime(2024, 1, 1, 4)),
            ("g", datetime(2024, 1, 1, 5), None),  # still open
        ],
        "g string, s timestamp, e timestamp",
    )
    got = {r.ts.hour: r.concurrent
           for r in interval_concurrency(iv, "s", "e", ["g"]).collect()}
    assert got == {0: 1, 1: 2, 2: 2, 3: 1, 4: 0, 5: 1}


def test_interval_concurrency_same_instant_settles(spark):
    from datetime import datetime

    from database_transportor_spark.operators.temporal import (
        interval_concurrency,
    )

    # 3 intervals all starting AND one ending at t1: one row per instant,
    # carrying the settled total
    t0, t1 = datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 1)
    t2 = datetime(2024, 1, 1, 2)
    iv = spark.createDataFrame(
        [("g", t0, t1), ("g", t1, t2), ("g", t1, t2), ("g", t1, t2)],
        "g string, s timestamp, e timestamp",
    )
    rows = interval_concurrency(iv, "s", "e", ["g"]).collect()
    got = {r.ts: r.concurrent for r in rows}
    assert len(rows) == len(got) == 3  # one row per instant
    assert got == {t0: 1, t1: 3, t2: 0}


# ---------------------------------------------------------------------------
# Seasonal decomposition
# ---------------------------------------------------------------------------

class TestSeasonalDecompose:
    def test_recovers_planted_seasonality(self, spark):
        from database_transportor_spark.operators.temporal import (
            seasonal_decompose,
        )

        # value = linear trend + planted period-4 pattern, no noise
        pattern = [3.0, -1.0, -2.0, 0.0]
        rows = [
            ("k", i, 10.0 + 0.5 * i + pattern[i % 4]) for i in range(24)
        ]
        df = spark.createDataFrame(rows, "k string, t long, v double")
        out = {r["t"]: r for r in
               seasonal_decompose(df, ["k"], "t", "v", period=4).collect()}
        # edges: first/last two rows have no full centered window
        assert out[0]["trend"] is None and out[23]["residual"] is None
        # interior: trend recovers the line, seasonal the pattern,
        # residual vanishes (exact arithmetic, only rounding at 1e-6)
        for t in range(2, 22):
            assert abs(out[t]["trend"] - (10.0 + 0.5 * t)) < 1e-6
            assert abs(out[t]["seasonal"] - pattern[t % 4]) < 1e-6
            assert abs(out[t]["residual"]) < 1e-6

    def test_odd_period_and_per_key_isolation(self, spark):
        from database_transportor_spark.operators.temporal import (
            seasonal_decompose,
        )

        rows = [("a", i, float(i % 3)) for i in range(12)] + [
            ("b", i, 100.0) for i in range(12)
        ]
        df = spark.createDataFrame(rows, "k string, t long, v double")
        out = seasonal_decompose(df, ["k"], "t", "v", period=3).collect()
        b = [r for r in out if r["k"] == "b" and r["trend"] is not None]
        # constant series: trend = the constant, seasonal/residual = 0
        assert all(abs(r["trend"] - 100.0) < 1e-6 for r in b)
        assert all(abs(r["seasonal"]) < 1e-6 for r in b)

    def test_guard(self, spark):
        import pytest

        from database_transportor_spark.operators.temporal import (
            seasonal_decompose,
        )

        df = spark.createDataFrame([("k", 1, 1.0)], "k string, t long, v double")
        with pytest.raises(ValueError, match="period"):
            seasonal_decompose(df, ["k"], "t", "v", period=1)


class TestAsofForward:
    def test_earliest_at_or_after_wins(self, spark):
        from database_transportor_spark.operators.temporal import (
            asof_join_forward,
        )

        left = spark.createDataFrame(
            [("k", 10), ("k", 25), ("k", 40)], "k string, ts long"
        )
        right = spark.createDataFrame(
            [("k", 10, "a"), ("k", 20, "b"), ("k", 30, "c")],
            "k string, ts long, v string",
        )
        got = {r["ts"]: r["v"] for r in
               asof_join_forward(left, right, "k", "ts").collect()}
        # ties are visible (>=): ts=10 matches the right row AT 10
        assert got == {10: "a", 25: "c", 40: None}

    def test_tolerance_numeric_axis(self, spark):
        from database_transportor_spark.operators.temporal import (
            asof_join_forward,
        )

        left = spark.createDataFrame([("k", 0)], "k string, ts long")
        right = spark.createDataFrame(
            [("k", 100, "far")], "k string, ts long, v string"
        )
        near = asof_join_forward(left, right, "k", "ts",
                                 tolerance=F.lit(50)).collect()[0]
        assert near["v"] is None
        far = asof_join_forward(left, right, "k", "ts",
                                tolerance=F.lit(200)).collect()[0]
        assert far["v"] == "far"

    def test_timestamp_axis_with_interval_tolerance(self, spark):
        from database_transportor_spark.operators.temporal import (
            asof_join_forward,
        )

        left = spark.createDataFrame(
            [("k", "2024-01-01 00:00:00")], "k string, ts string"
        ).select("k", F.col("ts").cast("timestamp").alias("ts"))
        right = spark.createDataFrame(
            [("k", "2024-01-01 02:00:00", 7.0)],
            "k string, ts string, v double",
        ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
        hit = asof_join_forward(left, right, "k", "ts",
                                tolerance="INTERVAL 3 HOUR").collect()[0]
        assert hit["v"] == 7.0
        miss = asof_join_forward(left, right, "k", "ts",
                                 tolerance="INTERVAL 1 HOUR").collect()[0]
        assert miss["v"] is None
