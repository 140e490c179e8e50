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
