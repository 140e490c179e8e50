"""Tests for winsorize and zorder_key/zorder_sort."""

import pytest
from pyspark.sql import functions as F

from database_transportor_spark.operators.corpus import winsorize
from database_transportor_spark.operators.layout import zorder_key, zorder_sort


# -------------------------------------------------------------- winsorize


def test_winsorize_clips_tails_per_group(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 11)] + [("a", 1000.0), ("b", 5.0)],
        "g string, v double",
    )
    out = winsorize(df, "v", ["g"], p_lo=0.0, p_hi=0.5)
    rows = [r for r in out.collect() if r["g"] == "a"]
    hi = max(r["v_wins"] for r in rows)
    # p_hi=0.5 median of a's values; 1000 must be clipped down to it
    assert hi < 1000.0
    assert min(r["v_wins"] for r in rows) == 1.0  # p_lo=0 keeps the min
    b = [r for r in out.collect() if r["g"] == "b"]
    assert b[0]["v_wins"] == 5.0  # single-value group is its own bounds


def test_winsorize_validation(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        winsorize(df, "v", ["g"], p_lo=0.9, p_hi=0.1)


def test_winsorize_global_no_groups(spark):
    df = spark.createDataFrame([(float(v),) for v in range(100)], "v double")
    out = winsorize(df, "v", p_lo=0.1, p_hi=0.9)
    vals = [r["v_wins"] for r in out.collect()]
    assert max(vals) < 99.0 and min(vals) > 0.0


# ----------------------------------------------------------------- zorder


def _z_ref(bu, bc, bits=8):
    key = 0
    for b in range(bits):
        key |= ((bu >> b) & 1) << (b * 2)
        key |= ((bc >> b) & 1) << (b * 2 + 1)
    return key


def test_zorder_key_matches_python_reference(spark):
    # values already spanning [0, 255] so buckets == values
    data = [(i, i % 256, (i * 7) % 256) for i in range(300)]
    df = spark.createDataFrame(data, "id long, a long, b long")
    # force exact bucket identity: min=0, max=255 present
    df = df.union(spark.createDataFrame([(9000, 0, 0), (9001, 255, 255)],
                                        "id long, a long, b long"))
    out = {r["id"]: r["zkey"] for r in
           zorder_key(df, ["a", "b"], bits=8).collect()}
    for (i, a, b) in data:
        assert out[i] == _z_ref(a, b), (i, a, b)


def test_zorder_key_constant_column_is_zero_plane(spark):
    df = spark.createDataFrame([(i, 7, i) for i in range(10)], "id long, a long, b long")
    out = zorder_key(df, ["a", "b"], bits=4)
    # constant column buckets to 0 everywhere -> its bit plane contributes 0
    assert all(r["zkey"] % 2 == 0 for r in out.collect())


def test_zorder_key_validation(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError):
        zorder_key(df, [], bits=8)
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=32)


def test_zorder_sort_clusters_key_ranges(spark):
    # after the range partition, partition key ranges must not overlap
    df = spark.createDataFrame(
        [(i, i % 97, (i * 13) % 89) for i in range(2000)],
        "id long, x long, y long",
    )
    keyed = zorder_key(df, ["x", "y"], bits=8)
    parts = (
        keyed.repartitionByRange(4, "zkey")
        .sortWithinPartitions("zkey")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
        .orderBy("pid")
        .collect()
    )
    for prev, cur in zip(parts, parts[1:]):
        assert prev["hi"] <= cur["lo"]
    # the public API drops the key again
    assert "zkey" not in zorder_sort(df, ["x", "y"], bits=8).columns


# ---------------------------------------------- review-fix regressions


def test_winsorize_keeps_null_group_and_null_value_rows(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 500.0), (3, None, 7.0), (4, "a", None)],
        "id long, g string, v double",
    )
    out = {r["id"]: r["v_wins"] for r in
           winsorize(df, "v", ["g"], p_lo=0.0, p_hi=0.5).collect()}
    assert set(out) == {1, 2, 3, 4}          # no row loss on NULL group
    assert out[3] == 7.0                      # NULL group passes unclipped
    assert out[4] is None                     # NULL value stays NULL


def test_zorder_key_refuses_to_overwrite_existing_column(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, zkey long")
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=4)
    # zorder_sort must work anyway (reserved internal name)
    out = zorder_sort(df, ["a", "b"], bits=4)
    assert set(out.columns) == {"a", "b", "zkey"}
    assert out.collect()[0]["zkey"] == 3      # user column untouched
