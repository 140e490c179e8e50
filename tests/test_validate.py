"""Data-quality rules: per-rule counts, single-scan plan, engine gate."""

import pytest
from pyspark.sql import functions as F

from database_transportor_spark.operators.validate import (
    ValidationError,
    check,
    validate,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "A", 10.0, 100),
            (2, "B", -5.0, 100),      # range violation
            (2, "Z", 50.0, 200),      # unique + accepted_values violations
            (None, "A", 20.0, 999),   # not_null violation; fk miss
        ],
        "id long, status string, qty double, fk long",
    )


def _ref(spark):
    return spark.createDataFrame([(100,), (200,)], "k long")


def test_validate_counts_per_rule(spark):
    rules = [
        {"rule": "not_null", "column": "id"},
        {"rule": "unique", "columns": ["id"]},
        {"rule": "accepted_values", "column": "status", "values": ["A", "B"]},
        {"rule": "range", "column": "qty", "min": 0.0, "max": 100.0},
        {"rule": "expression", "name": "qty_lt_fk", "sql": "qty < fk"},
        {"rule": "foreign_key", "column": "fk", "ref": _ref(spark),
         "ref_column": "k"},
    ]
    got = {
        (r["rule"], r["target"]): r["n_violations"]
        for r in validate(_df(spark), rules).collect()
    }
    assert got == {
        ("not_null", "id"): 1,
        ("unique", "id"): 1,            # one extra row beyond the first
        ("accepted_values", "status"): 1,
        ("range", "qty"): 1,
        ("expression", "qty_lt_fk"): 0,
        ("foreign_key", "fk"): 1,       # 999 not in ref (NULL fk exempt)
    }


def test_validate_null_expression_is_violation(spark):
    df = spark.createDataFrame([(None,)], "x double")
    got = validate(df, [{"rule": "expression", "sql": "x > 0"}]).collect()
    assert got[0]["n_violations"] == 1


def test_row_rules_single_scan(spark):
    """All row-level rules fold into one aggregation — no per-rule jobs."""
    rules = [
        {"rule": "not_null", "column": "id"},
        {"rule": "range", "column": "qty", "min": 0.0},
        {"rule": "accepted_values", "column": "status", "values": ["A"]},
    ]
    plan = (
        validate(_df(spark), rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan") == 1, plan


def test_check_raises_listing_all_failures(spark):
    rules = [
        {"rule": "not_null", "column": "id"},
        {"rule": "range", "column": "qty", "min": 0.0},
    ]
    with pytest.raises(ValidationError) as ei:
        check(_df(spark), rules)
    assert {f[0] for f in ei.value.failures} == {"not_null", "range"}


def test_transport_validation_gate_aborts_staged(spark, tmp_path):
    """A violating batch must abort the staged swap: live target untouched."""
    from database_transportor_spark import DBT, ParquetCatalog

    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    spark.createDataFrame([(1, "ok")], ["id", "v"]).write.parquet(f"{src}/t.parquet")
    maps = {"t": {"original_table": "t",
                  "columns": {"id": "id", "v": "v"}}}

    def eng():
        return DBT(maps, target=ParquetCatalog(spark, tgt),
                   original=ParquetCatalog(spark, src))

    eng().do_transport(mode="overwrite")
    before = spark.read.parquet(f"{tgt}/t.parquet").collect()

    # poison the source: NULL id now violates the rule
    spark.createDataFrame([(None, "bad")], "id long, v string").write.mode(
        "overwrite"
    ).parquet(f"{src}/t.parquet")
    with pytest.raises(ValidationError):
        eng().do_transport(
            staged=True,
            validate={"t": [{"rule": "not_null", "column": "id"}]},
        )
    after = spark.read.parquet(f"{tgt}/t.parquet").collect()
    assert after == before, "staged swap must not commit a violating batch"


def test_transport_fk_rule_resolves_in_flight_dim(spark, tmp_path):
    """foreign_key with ref_table validates a fact map against the
    dimension map produced in the SAME run."""
    from database_transportor_spark import DBT, ParquetCatalog

    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    spark.createDataFrame([(1, "d1")], ["dk", "dv"]).write.parquet(
        f"{src}/dim.parquet"
    )
    spark.createDataFrame([(10, 1), (11, 7)], ["fid", "dfk"]).write.parquet(
        f"{src}/fact.parquet"
    )
    maps = {
        "dim": {"original_table": "dim", "columns": {"dk": "dk", "dv": "dv"}},
        "fact": {"original_table": "fact",
                 "columns": {"fid": "fid", "dfk": "dfk"},
                 "transport_after": ["dim"]},
    }
    eng = DBT(maps, target=ParquetCatalog(spark, tgt),
              original=ParquetCatalog(spark, src))
    with pytest.raises(ValidationError, match="foreign_key"):
        eng.do_transport(
            mode="overwrite",
            validate={"fact": [{"rule": "foreign_key", "column": "dfk",
                                "ref_table": "dim", "ref_column": "dk"}]},
        )


def test_k_anonymity_reports_rare_combinations(spark):
    from database_transportor_spark.operators.validate import k_anonymity

    df = spark.createDataFrame(
        [("1980", "10001")] * 5 + [("1990", "10002")] * 2 + [("2000", "99999")],
        "birth_year string, zip string",
    )
    out = k_anonymity(df, ["birth_year", "zip"], k=3)
    got = {(r["birth_year"], r["zip"]): r["group_size"] for r in out.collect()}
    assert got == {("1990", "10002"): 2, ("2000", "99999"): 1}


def test_k_anonymity_empty_when_anonymous(spark):
    from database_transportor_spark.operators.validate import k_anonymity

    df = spark.createDataFrame([("a",)] * 4 + [("b",)] * 4, "g string")
    assert k_anonymity(df, ["g"], k=4).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        k_anonymity(df, ["g"], k=0)


def test_psi_drift_zero_for_identical_and_positive_for_shifted(spark):
    from database_transportor_spark.operators.validate import psi_drift

    a = spark.createDataFrame([(float(v % 100),) for v in range(500)], "v double")
    same = psi_drift(a, a, "v", bins=10, lo=0.0, hi=100.0).collect()
    assert sum(r["psi_term"] for r in same) == 0.0
    assert all(r["n_a"] == r["n_b"] for r in same)

    b = spark.createDataFrame([(float(v % 100) + 40,) for v in range(500)], "v double")
    shifted = psi_drift(a, b, "v", bins=10, lo=0.0, hi=100.0).collect()
    assert sum(r["psi_term"] for r in shifted) > 0.25  # major shift flagged
    # out-of-range mass lands in the overflow bucket, not dropped
    assert any(r["bucket"] == 11 and r["n_b"] > 0 for r in shifted)


def test_psi_drift_validation_and_null_excluded(spark):
    import pytest as _pytest

    from database_transportor_spark.operators.validate import psi_drift

    a = spark.createDataFrame([(1.0,), (None,)], "v double")
    out = psi_drift(a, a, "v", bins=2, lo=0.0, hi=2.0).collect()
    assert sum(r["n_a"] for r in out) == 1  # NULL excluded
    with _pytest.raises(ValueError):
        psi_drift(a, a, "v", lo=5.0, hi=1.0)


def test_discover_keys_chain_cascade(spark):
    """Chain-shaped candidates take the cascading-aggregation fast path
    (round 11); its report must be identical to the single-pass
    formulation — including NULL accounting and duplicate detection."""
    from database_transportor_spark.operators.validate import discover_keys

    df = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 20), (2, "b", 10), (None, "c", 30),
         (3, "c", 30), (3, "c", 30)],
        "id long, g string, v int",
    )
    chain = [["id"], ["id", "g"], ["g", "id", "v"]]
    got = {r["candidate"]: r for r in discover_keys(df, chain).collect()}
    # labels keep the caller's column order
    assert set(got) == {"id", "id,g", "g,id,v"}
    assert got["id"]["n_rows"] == 6
    assert got["id"]["n_distinct"] == 4  # 1, 2, NULL, 3
    assert got["id"]["n_with_nulls"] == 1
    assert not got["id"]["is_key"]
    assert got["id,g"]["n_distinct"] == 4
    assert got["g,id,v"]["n_distinct"] == 5  # (3,c,30) repeats
    assert not got["g,id,v"]["is_key"]
    # single candidate stays on the one-pass path but must agree
    one = discover_keys(df, [["id", "g", "v"]]).collect()[0]
    assert one["n_distinct"] == 5 and one["n_with_nulls"] == 1


def test_discover_keys_single_pass(spark):
    import pytest as _pytest

    from database_transportor_spark.operators.validate import discover_keys

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 10), (None, "c", 30)],
        "id long, g string, v int",
    )
    got = {r["candidate"]: r for r in discover_keys(
        df, [["id"], ["g"], ["g", "v"], ["id", "g"]]
    ).collect()}
    assert not got["id"]["is_key"]          # NULL disqualifies
    assert got["id"]["n_with_nulls"] == 1
    assert not got["g"]["is_key"]           # duplicates
    assert got["g,v"]["is_key"]
    assert not got["id,g"]["is_key"]        # NULL in combo
    with _pytest.raises(ValueError):
        discover_keys(df, [])


def test_split_valid_routes_and_labels_violations(spark):
    from database_transportor_spark.operators.validate import split_valid

    df = spark.createDataFrame(
        [(1, "A", 5), (2, None, 5), (3, "Z", 5), (4, "A", -1), (5, None, -9)],
        "id long, status string, qty int",
    )
    rules = [
        {"rule": "not_null", "column": "status"},
        {"rule": "accepted_values", "column": "status", "values": ["A", "B"]},
        {"rule": "range", "column": "qty", "min": 0},
    ]
    clean, quar = split_valid(df, rules)
    assert sorted(r["id"] for r in clean.collect()) == [1]
    got = {r["id"]: set(r["__violations"]) for r in quar.collect()}
    assert got[2] == {"not_null:status"}
    assert got[3] == {"accepted_values:status"}
    assert got[4] == {"range:qty"}
    assert got[5] == {"not_null:status", "range:qty"}


def test_split_valid_rejects_set_level_rules(spark):
    import pytest as _pytest

    from database_transportor_spark.operators.validate import split_valid

    df = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError):
        split_valid(df, [{"rule": "unique", "columns": ["id"]}])


# ---------------------------------------------------------------------------
# referential_audit
# ---------------------------------------------------------------------------


def _fk_frames(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None), (5, 99)],
        ["id", "fk"],
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], ["pk"])
    return child, parent


def test_referential_audit_counts(spark):
    from database_transportor_spark.operators.validate import (
        referential_audit,
    )

    child, parent = _fk_frames(spark)
    out = referential_audit([
        {"name": "c->p", "child": child, "child_keys": ["fk"],
         "parent": parent, "parent_keys": ["pk"]},
    ])
    r = out.collect()[0]
    assert r.relation == "c->p"
    assert r.child_rows == 5
    assert r.null_keys == 1        # the NULL fk is not an orphan
    assert r.orphan_rows == 2      # two rows point at 99
    assert r.distinct_missing == 1  # but 99 is one missing key


def test_referential_audit_composite_and_union(spark):
    from database_transportor_spark.operators.validate import (
        referential_audit,
    )

    child = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 2), (3, "b", 9)], ["id", "k1", "k2"]
    )
    parent = spark.createDataFrame(
        [("a", 1), ("a", 2)], ["p1", "p2"]
    )
    single_c, single_p = _fk_frames(spark)
    out = referential_audit([
        {"name": "comp", "child": child, "child_keys": ["k1", "k2"],
         "parent": parent, "parent_keys": ["p1", "p2"]},
        {"name": "single", "child": single_c, "child_keys": ["fk"],
         "parent": single_p, "parent_keys": ["pk"]},
    ])
    got = {r.relation: r for r in out.collect()}
    assert set(got) == {"comp", "single"}
    assert got["comp"].orphan_rows == 1          # ("b", 9)
    assert got["comp"].distinct_missing == 1
    assert got["single"].orphan_rows == 2


def test_referential_audit_validates_arity(spark):
    from database_transportor_spark.operators.validate import (
        referential_audit,
    )

    child, parent = _fk_frames(spark)
    with pytest.raises(ValueError):
        referential_audit([
            {"name": "bad", "child": child, "child_keys": ["fk", "id"],
             "parent": parent, "parent_keys": ["pk"]},
        ])
    with pytest.raises(ValueError):
        referential_audit([])


def test_referential_audit_empty_child_reports_zeros(spark):
    from database_transportor_spark.operators.validate import (
        referential_audit,
    )

    child = spark.createDataFrame([], "id int, fk int")
    parent = spark.createDataFrame([(1,)], ["pk"])
    r = referential_audit([
        {"name": "empty", "child": child, "child_keys": ["fk"],
         "parent": parent, "parent_keys": ["pk"]},
    ]).collect()[0]
    assert (r.child_rows, r.null_keys, r.orphan_rows, r.distinct_missing) \
        == (0, 0, 0, 0)
