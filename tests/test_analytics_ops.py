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


def test_growth_accounting(spark):
    from database_transportor_spark.operators.funnel import growth_accounting

    df = spark.createDataFrame(
        [
            (1, datetime.datetime(2026, 1, 1, 9), 1, "a", 0.0),
            (2, datetime.datetime(2026, 1, 1, 10), 2, "a", 0.0),
            (3, datetime.datetime(2026, 1, 2, 9), 1, "a", 0.0),   # returning
            (4, datetime.datetime(2026, 1, 2, 10), 3, "a", 0.0),  # new
            (5, datetime.datetime(2026, 1, 3, 9), 1, "a", 0.0),   # no new
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r["period"].day: (r["n_active"], r["n_new"], r["n_returning"],
                             r["cum_entities"])
           for r in growth_accounting(df).collect()}
    assert out[1] == (2, 2, 0, 2)
    assert out[2] == (2, 1, 1, 3)
    assert out[3] == (1, 0, 1, 3)


def test_mad_filter_robust_to_outlier(spark):
    from database_transportor_spark.operators.corpus import mad_filter

    # values 10..14 plus a huge outlier; median=12, MAD=1 -> 1000 is out
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([10, 11, 12, 13, 14, 1000])],
        "id long, v double",
    )
    kept = sorted(r["id"] for r in mad_filter(df, "v").collect())
    assert kept == [0, 1, 2, 3, 4]


def test_mad_filter_zero_mad_group_passes(spark):
    from database_transportor_spark.operators.corpus import mad_filter

    df = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", 5.0), (3, "g", 5.0), (4, "g", 99.0)],
        "id long, grp string, v double",
    )
    # median=5, MAD=0 -> whole group passes (nothing to judge)
    kept = sorted(r["id"] for r in mad_filter(df, "v", ["grp"]).collect())
    assert kept == [1, 2, 3, 4]


def test_mad_filter_out_col_and_nulls(spark):
    from database_transportor_spark.operators.corpus import mad_filter

    df = spark.createDataFrame(
        [(1, 10.0), (2, 11.0), (3, 12.0), (4, 13.0), (5, 14.0), (6, None)],
        "id long, v double",
    )
    out = {r["id"]: r["dev"] for r in
           mad_filter(df, "v", out_col="dev").collect()}
    assert out[6] is None            # NULL passes with NULL score
    assert out[3] == 0.0             # the median itself
    assert len(out) == 6


def test_rank_normalize_grouped_and_ties(spark):
    from database_transportor_spark.operators.corpus import rank_normalize

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 2.0), (4, "a", 5.0),
         (5, "b", 7.0)],
        "id long, grp string, v double",
    )
    out = {r["id"]: r["pct_rank"] for r in
           rank_normalize(df, "v", ["grp"]).collect()}
    assert out[1] == 0.0
    assert out[2] == out[3] == 1 / 3          # ties share a rank
    assert out[4] == 1.0
    assert out[5] == 0.0                      # singleton group
