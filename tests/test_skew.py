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


def test_salted_refer_through_engine_matches_plain(spark):
    """Declarative salt on a J1 refer: result-identical to unsalted,
    both with pinned hot keys and with auto-sampled ones."""
    from database_transportor_spark import DBT, MemoryCatalog

    facts = spark.createDataFrame(
        [(i, i % 3 if i % 10 else 99) for i in range(200)], "id long, k long"
    )
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (99, "hot")], "k long, v string"
    )

    def run(salt):
        refer = {
            "search_source": "original",
            "search_table": "dim",
            "search_column": "k",
            "according_column": "k",
            "wanted_column": "v",
        }
        if salt is not None:
            refer["salt"] = salt
        maps = {"out": {"original_table": "facts",
                        "columns": {"id": "id", "k": "k",
                                    "v": {"refer": refer, "default": "?"}}}}
        eng = DBT(maps, target=MemoryCatalog(),
                  original=MemoryCatalog({"facts": facts, "dim": dim}))
        return sorted(map(tuple, eng.transform()["out"].collect()))

    plain = run(None)
    assert run({"salts": 4, "hot_keys": [0, 99]}) == plain
    # auto-sampling lane: low threshold so the sampled count trips it
    assert run({"salts": 4, "threshold": 10}) == plain
    assert run(4) == plain  # int shorthand


def test_salt_rejected_on_multi_key_refer():
    import pytest

    from database_transportor_spark.spec import ReferSpec, SpecError

    with pytest.raises(SpecError, match="single-key"):
        ReferSpec.parse({
            "search_table": "d", "wanted_column": "v",
            "search_column": ["a", "b"], "according_column": ["a", "b"],
            "salt": 8,
        }, "col 'x'")


def test_skew_report_identifies_hot_key(spark):
    from pyspark.sql import functions as F

    from database_transportor_spark.operators.skew import skew_report

    df = spark.createDataFrame(
        [("hot",)] * 90 + [("a",)] * 5 + [("b",)] * 5, "k string"
    )
    out = skew_report(df, ["k"], top_k=2).orderBy("rank").collect()
    assert out[0]["k"] == "hot" and out[0]["n"] == 90
    assert out[0]["share"] == 0.9
    assert out[0]["skew_x"] == 2.7  # 90 * 3 keys / 100 rows
    assert len(out) == 2 and out[1]["rank"] == 2


def test_join_size_report_exact_and_shapes(spark):
    from database_transportor_spark.operators.skew import join_size_report

    l = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (4, "e")], ["k", "v"]
    )
    r = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (3, "w")], ["kk", "u"]
    )
    rep = join_size_report(l, r, ["k"], ["kk"], top_k=10)
    rows = {row["k"]: row for row in rep.collect()}
    # key 1: 3*2=6, key 2: 1*1=1; keys 3/4 unmatched never appear
    assert set(rows) == {1, 2}
    assert rows[1]["out_rows"] == 6 and rows[2]["out_rows"] == 1
    assert rows[1]["total_out"] == 7 == rows[2]["total_out"]
    assert rows[1]["rank"] == 1 and rows[2]["rank"] == 2
    assert abs(rows[1]["share"] - 6 / 7) < 1e-6
    # exactness: predicted total equals the real join size
    real = l.join(r, l.k == r.kk).count()
    assert rows[1]["total_out"] == real


def test_join_size_report_arity_mismatch(spark):
    import pytest as _pytest
    from database_transportor_spark.operators.skew import join_size_report

    df = spark.createDataFrame([(1,)], ["k"])
    with _pytest.raises(ValueError, match="arity"):
        join_size_report(df, df, ["k"], ["k", "k2"])
