"""ab_test: entity-level conversion, exact counts, z-test edge cases."""

import math

from database_transportor_spark.operators.experiment import ab_test


def test_ab_test_counts_and_z(spark):
    # control: u0 converts, u2 doesn't (n=2, conv=1)
    # treatment: u1, u3, u5 all convert (n=3, conv=3)
    rows = [
        ("control", 0, "view"), ("control", 0, "purchase"),
        ("control", 2, "view"),
        ("treatment", 1, "purchase"), ("treatment", 3, "purchase"),
        ("treatment", 5, "purchase"), ("treatment", 5, "view"),
    ]
    df = spark.createDataFrame(rows, ["variant", "uid", "event_type"])
    out = ab_test(df, "variant", "uid", "event_type = 'purchase'").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.variant_a, r.variant_b) == ("control", "treatment")
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (2, 1, 3, 3)
    assert r.rate_a_ppm == 500_000 and r.rate_b_ppm == 1_000_000
    p, pa, pb = 4 / 5, 1 / 2, 1.0
    z = (pa - pb) / math.sqrt(p * (1 - p) * (1 / 2 + 1 / 3))
    assert abs(r.z_score - round(z, 6)) < 1e-9


def test_ab_test_degenerate_pairs_null_z(spark):
    # nobody converts anywhere -> pooled variance 0 -> z NULL, rates 0
    rows = [("a", 1, "view"), ("b", 2, "view")]
    df = spark.createDataFrame(rows, ["variant", "uid", "event_type"])
    r = ab_test(df, "variant", "uid", "event_type = 'purchase'").collect()[0]
    assert r.z_score is None and r.rate_a_ppm == 0 and r.rate_b_ppm == 0
    # everybody converts -> also NULL
    rows = [("a", 1, "purchase"), ("b", 2, "purchase")]
    df = spark.createDataFrame(rows, ["variant", "uid", "event_type"])
    r = ab_test(df, "variant", "uid", "event_type = 'purchase'").collect()[0]
    assert r.z_score is None and r.rate_a_ppm == 1_000_000


def test_ab_test_three_variants_pairwise(spark):
    rows = [(v, i, "view") for i, v in enumerate(["a", "b", "c"])]
    df = spark.createDataFrame(rows, ["variant", "uid", "event_type"])
    out = ab_test(df, "variant", "uid", "event_type = 'purchase'")
    pairs = {(r.variant_a, r.variant_b) for r in out.collect()}
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}


def test_ab_test_null_conversion_expr_is_false(spark):
    rows = [("a", 1, None), ("b", 2, "purchase")]
    df = spark.createDataFrame(rows, "variant string, uid int, event_type string")
    r = ab_test(df, "variant", "uid", "event_type = 'purchase'").collect()[0]
    assert r.conv_a == 0 and r.conv_b == 1


def test_linear_fit_matches_numpy_and_nulls(spark):
    import numpy as np

    from database_transportor_spark.operators.experiment import linear_fit

    rng = np.random.default_rng(3)
    xs = rng.uniform(0, 40, 300)
    ys = -1.5 * xs + 8.0 + rng.normal(0, 1.0, 300)
    rows = [(float(x), float(y)) for x, y in zip(xs, ys)]
    rows += [(None, 1.0), (2.0, None), (None, None)]  # excluded pairwise
    df = spark.createDataFrame(rows, ["x", "y"])
    r = linear_fit(df, "x", "y").collect()[0]
    assert r["n"] == 300
    xq, yq = np.round(xs * 100), np.round(ys * 100)
    sl, ic = np.polyfit(xq, yq, 1)
    assert abs(r["slope"] - sl) < 1e-6          # same units (both scaled 100)
    assert abs(r["intercept"] - ic / 100) < 1e-6
    ss = np.corrcoef(xq, yq)[0, 1] ** 2
    assert abs(r["r2"] - ss) < 1e-6


def test_linear_fit_degenerate_constant_x(spark):
    from database_transportor_spark.operators.experiment import linear_fit

    df = spark.createDataFrame([(1.0, 2.0), (1.0, 3.0), (1.0, 9.0)], ["x", "y"])
    r = linear_fit(df, "x", "y").collect()[0]
    assert r["slope"] is None and r["intercept"] is None and r["r2"] is None
    assert r["n"] == 3


def test_linear_fit_multi_matches_lstsq_per_group(spark):
    import numpy as np

    from database_transportor_spark.operators.experiment import linear_fit_multi

    rng = np.random.default_rng(11)
    rows = []
    truth = {"g0": (1.0, 2.0, -3.0), "g1": (-4.0, 0.5, 6.0)}
    for g, (b0, b1, b2) in truth.items():
        f1 = rng.uniform(-3, 3, 250)
        f2 = rng.uniform(0, 2, 250)
        y = b0 + b1 * f1 + b2 * f2 + rng.normal(0, 0.05, 250)
        rows += [(g, float(a), float(b), float(c)) for a, b, c in zip(f1, f2, y)]
    df = spark.createDataFrame(rows, ["g", "f1", "f2", "y"])
    got = {r["g"]: r for r in
           linear_fit_multi(df, ["f1", "f2"], "y", group_cols=["g"]).collect()}
    for g, (b0, b1, b2) in truth.items():
        r = got[g]
        assert r["n"] == 250
        assert abs(r["intercept"] - b0) < 0.05
        assert abs(r["coefficients"][0] - b1) < 0.05
        assert abs(r["coefficients"][1] - b2) < 0.05


def test_linear_fit_multi_ridge_and_empty_features(spark):
    import pytest as _pytest

    from database_transportor_spark.operators.experiment import linear_fit_multi

    df = spark.createDataFrame([(1.0, 2.0, 3.0)], ["a", "b", "y"])
    with _pytest.raises(ValueError, match="non-empty"):
        linear_fit_multi(df, [], "y")
    # perfectly collinear features: ridge regularizes instead of exploding
    df2 = spark.createDataFrame(
        [(float(i), float(2 * i), float(3 * i)) for i in range(1, 30)],
        ["a", "b", "y"],
    )
    r = linear_fit_multi(df2, ["a", "b"], "y", ridge=1e-6).collect()[0]
    # prediction quality is the contract (coefficients are non-unique)
    pred = r["intercept"] + r["coefficients"][0] * 10 + r["coefficients"][1] * 20
    assert abs(pred - 30.0) < 0.1


# ---------------------------------------------------------------------------
# Kaplan-Meier survival
# ---------------------------------------------------------------------------

class TestKaplanMeier:
    def test_textbook_curve(self, spark):
        from database_transportor_spark.operators.experiment import (
            kaplan_meier,
        )

        # classic toy: events at t=1 (1 of 5), t=3 (1 of 3); censored at
        # t=2 and t=3; survivor at t=4
        rows = [(1, True), (2, False), (3, True), (3, False), (4, False)]
        df = spark.createDataFrame(rows, "d long, e boolean")
        out = {r["t"]: r for r in kaplan_meier(df, "d", "e").collect()}
        assert set(out) == {1, 3}
        assert out[1]["n_risk"] == 5 and out[1]["n_events"] == 1
        assert abs(out[1]["survival"] - 0.8) < 1e-9
        # at t=3: risk set = 3 (t=2 censor gone), one event
        assert out[3]["n_risk"] == 3
        assert abs(out[3]["survival"] - 0.8 * (2 / 3)) < 1e-6

    def test_full_death_hits_zero_and_stays(self, spark):
        from database_transportor_spark.operators.experiment import (
            kaplan_meier,
        )

        rows = [(1, True), (2, True)]
        df = spark.createDataFrame(rows, "d long, e boolean")
        out = {r["t"]: r["survival"] for r in
               kaplan_meier(df, "d", "e").collect()}
        assert abs(out[1] - 0.5) < 1e-9 and out[2] == 0.0

    def test_groups_isolated(self, spark):
        from database_transportor_spark.operators.experiment import (
            kaplan_meier,
        )

        rows = [("a", 1, True), ("a", 2, False), ("b", 1, False)]
        df = spark.createDataFrame(rows, "g string, d long, e boolean")
        out = kaplan_meier(df, "d", "e", ["g"]).collect()
        assert len(out) == 1 and out[0]["g"] == "a"
        assert abs(out[0]["survival"] - 0.5) < 1e-9
