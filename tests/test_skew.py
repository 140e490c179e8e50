"""Salted skew join: result parity with a plain left join, and the salted
lane actually spreads a hot key over multiple partitions."""

from pyspark.sql import functions as F

from database_transportor_spark.operators.skew import (
    hot_key_sample,
    salted_left_join,
)


def _fixture(spark):
    # key "hot" dominates: 900 of 1000 probe rows
    probe = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") < 900, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k"),
    )
    build = probe.select("k").distinct().withColumn("payload", F.length("k"))
    return probe, build


def test_salted_matches_plain(spark):
    probe, build = _fixture(spark)
    plain = probe.join(build, on="k", how="left")
    salted = salted_left_join(probe, build, key="k", salt_on="id",
                              hot_keys=["hot"], salts=8)
    assert salted.count() == plain.count() == 1000
    a = sorted(tuple(r) for r in plain.select("id", "k", "payload").collect())
    b = sorted(tuple(r) for r in salted.select("id", "k", "payload").collect())
    assert a == b


def test_salted_spreads_hot_key(spark):
    probe, build = _fixture(spark)
    hot_probe = probe.filter(F.col("k") == "hot").withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("id")), F.lit(8))
    )
    n_salts = hot_probe.select("__salt").distinct().count()
    assert n_salts == 8  # 900 rows spread over all salt values


def test_hot_key_sample_finds_dominant_key(spark):
    probe, _ = _fixture(spark)
    hot = hot_key_sample(probe, "k", threshold=500, fraction=0.5)
    assert hot == ["hot"]


def test_no_hot_keys_degenerates_to_plain(spark):
    probe, build = _fixture(spark)
    out = salted_left_join(probe, build, key="k", salt_on="id",
                           hot_keys=[], salts=8)
    assert out.count() == 1000
