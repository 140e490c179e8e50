"""Tests for heavy_hitters, gap_fill, and sample_per_group."""

import datetime

import pytest
from pyspark.sql import functions as F

from database_transportor_spark.operators.corpus import sample_per_group
from database_transportor_spark.operators.sketches import heavy_hitters
from database_transportor_spark.operators.temporal import gap_fill


def _day(d):
    return datetime.datetime(2026, 1, d)


# ---------------------------------------------------------- heavy_hitters


def _vals(spark):
    data = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1
    return spark.createDataFrame(data, "v string")


def test_heavy_hitters_exact_global_with_tiebreak(spark):
    out = heavy_hitters(_vals(spark), "v", k=3)
    got = [(r["v"], r["n"], r["rank"]) for r in out.orderBy("rank").collect()]
    # b and c tie at 3; value asc breaks the tie deterministically
    assert got == [("a", 5, 1), ("b", 3, 2), ("c", 3, 3)]


def test_heavy_hitters_grouped(spark):
    df = spark.createDataFrame(
        [("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z")],
        "g string, v string",
    )
    out = heavy_hitters(df, "v", group_cols=["g"], k=1)
    got = {(r["g"], r["v"]) for r in out.collect()}
    assert got == {("g1", "x"), ("g2", "z")}


def test_heavy_hitters_sketch_mode_counts_are_exact(spark):
    out = heavy_hitters(_vals(spark), "v", k=2, exact=False, support=0.2)
    got = [(r["v"], r["n"]) for r in out.orderBy("rank").collect()]
    assert got[0] == ("a", 5)  # counts from the verify pass, not the sketch


def test_heavy_hitters_sketch_mode_rejects_groups(spark):
    with pytest.raises(ValueError):
        heavy_hitters(_vals(spark), "v", group_cols=["v"], exact=False)


# --------------------------------------------------------------- gap_fill


def test_gap_fill_fills_missing_days_per_key(spark):
    df = spark.createDataFrame(
        [("u1", _day(1), 5), ("u1", _day(4), 7), ("u2", _day(2), 1)],
        "k string, ts timestamp, n long",
    )
    out = gap_fill(df, ["k"], "ts", "1 day", value_cols=["n"])
    got = {(r["k"], r["ts"].day): r["n"] for r in out.collect()}
    # u1 spans days 1..4 with 2 and 3 filled; u2 is a single day
    assert got == {("u1", 1): 5, ("u1", 2): 0, ("u1", 3): 0,
                   ("u1", 4): 7, ("u2", 2): 1}


def test_gap_fill_fill_none_keeps_null(spark):
    df = spark.createDataFrame(
        [("u1", _day(1), 5), ("u1", _day(3), 7)],
        "k string, ts timestamp, n long",
    )
    out = gap_fill(df, ["k"], "ts", "1 day", value_cols=["n"], fill=None)
    got = {r["ts"].day: r["n"] for r in out.collect()}
    assert got == {1: 5, 2: None, 3: 7}


def test_gap_fill_all_null_ts_key_passes_through(spark):
    # a key whose timestamps are ALL NULL used to vanish (sequence(NULL,
    # NULL) explodes to nothing); now its rows pass through unfilled
    df = spark.createDataFrame(
        [("u1", _day(1), 5), ("u1", _day(3), 7),
         ("u2", None, 9), ("u3", None, 4), ("u1", None, 2)],
        "k string, ts timestamp, n long",
    )
    out = gap_fill(df, ["k"], "ts", "1 day", value_cols=["n"])
    rows = out.collect()
    got = {(r["k"], r["ts"].day if r["ts"] else None): r["n"] for r in rows}
    assert got == {("u1", 1): 5, ("u1", 2): 0, ("u1", 3): 7,
                   ("u2", None): 9, ("u3", None): 4, ("u1", None): 2}
    assert len(rows) == 6


def test_gap_fill_hourly_step(spark):
    df = spark.createDataFrame(
        [("u1", datetime.datetime(2026, 1, 1, 0), 1),
         ("u1", datetime.datetime(2026, 1, 1, 3), 2)],
        "k string, ts timestamp, n long",
    )
    out = gap_fill(df, ["k"], "ts", "1 hour", value_cols=["n"])
    assert out.count() == 4


# -------------------------------------------------------- sample_per_group


def test_sample_per_group_exact_k_and_small_groups_kept(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 50 else "small") for i in range(55)],
        "id long, g string",
    )
    out = sample_per_group(df, "id", ["g"], k=10)
    sizes = {r["g"]: r["n"] for r in
             out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"big": 10, "small": 5}


def test_sample_per_group_deterministic_across_partitioning(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(300)], "id long, g long")
    a = sorted(r["id"] for r in sample_per_group(df, "id", ["g"], 7).collect())
    b = sorted(
        r["id"]
        for r in sample_per_group(df.repartition(13), "id", ["g"], 7).collect()
    )
    assert a == b and len(a) == 21


def test_gap_fill_null_key_series_not_corrupted(spark):
    df = spark.createDataFrame(
        [(None, _day(1), 5), (None, _day(3), 7), ("u", _day(2), 1)],
        "k string, ts timestamp, n long",
    )
    out = gap_fill(df, ["k"], "ts", "1 day", value_cols=["n"])
    got = {(r["k"], r["ts"].day): r["n"] for r in out.collect()}
    # NULL-key group keeps its real values; only the genuine gap fills 0
    assert got == {(None, 1): 5, (None, 2): 0, (None, 3): 7, ("u", 2): 1}
