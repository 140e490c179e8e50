"""F1-F4: condition compiler unit tests (DBT.php:357-388 semantics)."""

import pytest

from database_transportor_spark.predicates import apply_conditions
from database_transportor_spark.spec import Condition, SpecError


def _ids(df):
    return sorted(r["id"] for r in df.collect())


@pytest.fixture(scope="module")
def t(spark):
    return spark.createDataFrame(
        [
            (1, "alice", 10.0),
            (2, "bob", 20.0),
            (3, "carol", 30.0),
            (4, None, 40.0),
            (5, "dave", None),
        ],
        "id int, name string, score double",
    )


def conds(*raw):
    return [Condition.parse(c) for c in raw]


def test_eq_gt_lt_ne(t):
    assert _ids(apply_conditions(t, conds(["id", "=", 2]))) == [2]
    assert _ids(apply_conditions(t, conds(["id", ">", 3]))) == [4, 5]
    assert _ids(apply_conditions(t, conds(["id", "<", 2]))) == [1]
    assert _ids(apply_conditions(t, conds(["id", "<>", 2]))) == [1, 3, 4, 5]
    assert _ids(apply_conditions(t, conds(["id", "!=", 2]))) == [1, 3, 4, 5]


def test_null_aware_equality(t):
    # F3b (DBT.php:366-374): = NULL means IS NULL, <>/!= NULL means IS NOT NULL.
    assert _ids(apply_conditions(t, conds(["name", "=", None]))) == [4]
    assert _ids(apply_conditions(t, conds(["name", "<>", None]))) == [1, 2, 3, 5]
    assert _ids(apply_conditions(t, conds(["score", "!=", None]))) == [1, 2, 3, 4]
    with pytest.raises(SpecError):
        apply_conditions(t, conds(["score", ">", None])).collect()


def test_like_notlike(t):
    assert _ids(apply_conditions(t, conds(["name", "like", "%a%"]))) == [1, 3, 5]
    # NOT LIKE: NULL name drops out (SQL three-valued logic, as the raw SQL
    # the reference interpolates would behave).
    assert _ids(apply_conditions(t, conds(["name", "notlike", "%a%"]))) == [2]


def test_in_notin(t):
    assert _ids(apply_conditions(t, conds(["name", "in", ["alice", "bob"]]))) == [1, 2]
    assert _ids(apply_conditions(t, conds(["name", "notin", ["alice", "bob"]]))) == [3, 5]


def test_between(t):
    assert _ids(apply_conditions(t, conds(["score", "between", [15, 35]]))) == [2, 3]
    assert _ids(apply_conditions(t, conds(["score", "notbetween", [15, 35]]))) == [1, 4]


def test_op_case_and_space_insensitive(t):
    # queryComposer lowercases and strips spaces (DBT.php:358).
    assert _ids(apply_conditions(t, conds(["name", "NOT LIKE", "%a%"]))) == [2]
    assert _ids(apply_conditions(t, conds(["score", "Not Between", [15, 35]]))) == [1, 4]


def test_raw_sql(t):
    # F2 (DBT.php:147-148): raw string runs verbatim.
    assert _ids(apply_conditions(t, conds("id % 2 = 0"))) == [2, 4]


def test_and_fold(t):
    got = apply_conditions(t, conds(["id", ">", 1], ["score", "<", 35], "name is not null"))
    assert _ids(got) == [2, 3]


def test_parse_errors():
    with pytest.raises(SpecError):
        Condition.parse(["id", "~~", 1])
    with pytest.raises(SpecError):
        Condition.parse(["id", "="])  # not a triple
    with pytest.raises(SpecError):
        Condition.parse(42)
