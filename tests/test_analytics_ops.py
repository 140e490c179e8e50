"""Tests for rolling_agg / transition_matrix / pivot_table / unpivot_table."""

import datetime

import pytest

from conftest import rows

from database_transportor_spark.operators.funnel import transition_matrix
from database_transportor_spark.operators.rollup import pivot_table, unpivot_table
from database_transportor_spark.operators.temporal import rolling_agg


def _ts(m, s=0):
    return datetime.datetime(2026, 1, 1, 10, 0, 0) + datetime.timedelta(
        minutes=m, seconds=s
    )


def _events(spark):
    return spark.createDataFrame(
        [
            (1, _ts(0), 10, "view", 1.0),
            (2, _ts(10), 10, "click", 2.0),
            (3, _ts(40), 10, "view", 4.0),
            (4, _ts(0), 20, "view", 8.0),
            (5, _ts(90), 10, "buy", 16.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_rolling_agg_trailing_window(spark):
    # 30-minute trailing window per user
    out = rolling_agg(
        _events(spark), "user_id", "ts", "value", window_sec=1800
    ).select("event_id", "rolling_count", "rolling_sum", "rolling_avg")
    got = {r["event_id"]: (r["rolling_count"], r["rolling_sum"], r["rolling_avg"])
           for r in out.collect()}
    assert got[1] == (1, 1.0, 1.0)
    assert got[2] == (2, 3.0, 1.5)          # includes t=0 within 30m
    assert got[3] == (2, 6.0, 3.0)          # t=10..40
    assert got[4] == (1, 8.0, 8.0)          # other user isolated
    assert got[5] == (1, 16.0, 16.0)        # 90m: nothing within 30m


def test_rolling_agg_includes_exact_boundary_and_peers(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1, "a", 1.0), (2, _ts(30), 1, "a", 2.0),
         (3, _ts(30), 1, "a", 4.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = rolling_agg(df, "user_id", "ts", "value", window_sec=1800)
    got = {r["event_id"]: r["rolling_sum"] for r in out.collect()}
    # boundary row (exactly window_sec old) included; ts peers are frame peers
    assert got[2] == 7.0 and got[3] == 7.0


def test_rolling_agg_rejects_unknown_agg(spark):
    with pytest.raises(ValueError):
        rolling_agg(_events(spark), "user_id", "ts", "value", 60, aggs=("median",))


def test_transition_matrix_counts_and_probs(spark):
    out = transition_matrix(
        _events(spark), "user_id", "event_type", "ts", tiebreak_col="event_id"
    )
    got = {(r["from_type"], r["to_type"]): (r["n_transitions"], r["prob"])
           for r in out.collect()}
    # user 10: view->click->view->buy; user 20: single event (no pair)
    assert got[("view", "click")] == (1, 0.5)
    assert got[("view", "buy")] == (1, 0.5)
    assert got[("click", "view")] == (1, 1.0)
    assert len(got) == 3


def test_transition_matrix_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1, "a", 0.0), (2, _ts(0), 1, "b", 0.0),
         (3, _ts(1), 1, "c", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = transition_matrix(df, "user_id", "event_type", "ts", tiebreak_col="event_id")
    got = {(r["from_type"], r["to_type"]) for r in out.collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_pivot_table_count_with_fill(spark):
    out = pivot_table(
        _events(spark), ["user_id"], "event_type", ["view", "click", "buy", "refund"]
    )
    got = {r["user_id"]: (r["view"], r["click"], r["buy"], r["refund"])
           for r in out.collect()}
    assert got[10] == (2, 1, 1, 0)
    assert got[20] == (1, 0, 0, 0)


def test_pivot_table_sum_keeps_null_when_fill_none(spark):
    out = pivot_table(
        _events(spark), ["user_id"], "event_type", ["view", "buy"],
        agg="sum", value_col="value", fill=None,
    )
    got = {r["user_id"]: (r["view"], r["buy"]) for r in out.collect()}
    assert got[10] == (5.0, 16.0)
    assert got[20] == (8.0, None)


def test_pivot_table_arg_validation(spark):
    with pytest.raises(ValueError):
        pivot_table(_events(spark), ["user_id"], "event_type", ["a"], agg="median")
    with pytest.raises(ValueError):
        pivot_table(_events(spark), ["user_id"], "event_type", ["a"], agg="sum")


def test_unpivot_roundtrip(spark):
    wide = pivot_table(
        _events(spark), ["user_id"], "event_type", ["view", "click"]
    )
    long = unpivot_table(wide, ["user_id"], ["view", "click"])
    got = rows(long.select("user_id", "metric", "value"), "user_id", "metric")
    assert got == [
        (10, "click", 1), (10, "view", 2),
        (20, "click", 0), (20, "view", 1),
    ]
