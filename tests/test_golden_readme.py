"""Golden tests: the reference README's worked examples (its only
correctness artifacts — SURVEY §5 / FIXTURES.md §A), plus the semantics
edges pinned in SURVEY §5.3.
"""

import pytest
from pyspark.sql import functions as F

from database_transportor_spark import DBT, MemoryCatalog
from database_transportor_spark.spec import SpecError


def run(maps, spark, original=None, target=None, write=False):
    eng = DBT(
        maps,
        target=MemoryCatalog(target or {}),
        original=MemoryCatalog(original or {}),
    )
    if write:
        eng.do_transport()
        return eng
    return eng.transform()


# --- A1.1: 1:1 rename migration (README.md:49-81) -------------------------

def test_rename_migration(spark):
    old_users = spark.createDataFrame(
        [(1, "张三"), (2, "李四"), (3, "王五")], "id long, name string"
    )
    maps = {
        "new_users": {
            "original_table": "old_users",
            "columns": {"id": "id", "username": "name"},
        }
    }
    out = run(maps, spark, original={"old_users": old_users})["new_users"]
    assert out.columns == ["id", "username"]
    assert sorted(tuple(r) for r in out.collect()) == [
        (1, "张三"), (2, "李四"), (3, "王五"),
    ]


# --- A1.2: default fill when NULL (README.md:87-105) ----------------------

def test_default_fill(spark):
    old_users = spark.createDataFrame(
        [(1, "张三", "2020-01-01"), (2, "李四", None)],
        "id long, name string, created_at string",
    )
    maps = {
        "new_users": {
            "original_table": "old_users",
            "columns": {
                "id": "id",
                "username": "name",
                # P3: default substitutes on NULL (README.md:105)
                "created_at": {"original": "created_at", "default": "2024-06-01"},
                # P2: constant-only define fills every row (README.md:93-104)
                "source_system": {"default": "legacy"},
            },
        }
    }
    out = run(maps, spark, original={"old_users": old_users})["new_users"]
    got = {r["id"]: (r["created_at"], r["source_system"]) for r in out.collect()}
    assert got == {1: ("2020-01-01", "legacy"), 2: ("2024-06-01", "legacy")}


# --- A1.3: row transform (README.md:112-133) ------------------------------

def test_transform_expression(spark):
    old_users = spark.createDataFrame([(1, "张三"), (2, "李四")], "id long, name string")
    maps = {
        "new_users": {
            "original_table": "old_users",
            "columns": {
                "id": "id",
                "username": {"original": "name", "function": "concat(name, '-', id)"},
            },
        }
    }
    out = run(maps, spark, original={"old_users": old_users})["new_users"]
    assert {r["username"] for r in out.collect()} == {"张三-1", "李四-2"}


def test_transform_callable_and_null_falls_to_default(spark):
    old_users = spark.createDataFrame([(1, "张三"), (2, None)], "id long, name string")
    maps = {
        "new_users": {
            "original_table": "old_users",
            "columns": {
                "id": "id",
                "username": {
                    "original": "name",
                    # Callable hook gets the whole Row (DBT.php:395-408);
                    # returning None falls back to default (DBT.php:405-407).
                    "function": lambda row: None if row.name is None else f"{row.name}-{row.id}",
                    "default": "anonymous",
                },
            },
        }
    }
    out = run(maps, spark, original={"old_users": old_users})["new_users"]
    got = {r["id"]: r["username"] for r in out.collect()}
    assert got == {1: "张三-1", 2: "anonymous"}


# --- P5: multi-output transform via affection (DBT.php:396-405) -----------

def test_affection_multi_output(spark):
    src = spark.createDataFrame([(1, "a b")], "id long, pair string")
    maps = {
        "out": {
            "original_table": "src",
            "columns": {
                "id": "id",
                "first": {
                    "original": "f",
                    "function": "named_struct('f', split(pair, ' ')[0], 's', split(pair, ' ')[1])",
                    "affection": {"target_column": "second", "source_key": "s"},
                },
                "second": None,  # P6 skip — filled by the affection
            },
        }
    }
    out = run(maps, spark, original={"src": src})["out"]
    r = out.collect()[0]
    assert (r["first"], r["second"]) == ("a", "b")


# --- A1.4: filtered migration (README.md:139-160) -------------------------

def test_filtered_migration_structured_and_raw(spark):
    old_users = spark.createDataFrame(
        [(1, "张三"), (2, "李四"), (3, "王五")], "id long, name string"
    )
    maps = {
        "new_users": {
            "original_table": "old_users",
            "extra_conditions": [["name", "<>", "王五"], "id >= 1"],
            "columns": {"id": "id", "username": "name"},
        }
    }
    out = run(maps, spark, original={"old_users": old_users})["new_users"]
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


# --- A2: single-key refer with staging col, rtrim, default (README.md:184-230)

def test_single_refer_rtrim_default_staging(spark):
    old_users = spark.createDataFrame(
        [(1, "张三", "管理员"), (2, "李四", "用户  "), (3, "王五", "黑户")],
        "id long, name string, role_name string",
    )
    # build side has a trailing-space key too: rtrim applies to BOTH sides
    new_roles = spark.createDataFrame(
        [(1, "管理员 "), (2, "用户")], "id long, role_name string"
    )
    maps = {
        "new_users": {
            "original_table": "old_users",
            "columns": {
                "id": "id",
                "username": "name",
                "temp_role_name": {
                    "original": "role_name",
                    "delete_after_transport": True,  # X5 staging
                    "rebuild": True,
                },
                "role_id": {
                    "refer": {
                        "search_source": "target",
                        "search_table": "new_roles",
                        "search_column": "role_name",
                        "according_column": "temp_role_name",
                        "wanted_column": "id",
                        "pre_format": "trim({value})",
                    },
                    "default": 0,
                },
            },
        }
    }
    eng = DBT(
        maps,
        target=MemoryCatalog({"new_roles": new_roles}),
        original=MemoryCatalog({"old_users": old_users}),
    )
    eng.do_transport()
    written = eng.target.tables["new_users"]
    # staging column dropped from the written table (X5)
    assert written.columns == ["id", "username", "role_id"]
    got = {r["id"]: r["role_id"] for r in written.collect()}
    assert got == {1: 1, 2: 2, 3: 0}  # miss ⇒ default 0


def test_refer_duplicate_build_keys_no_fanout(spark):
    """Duplicate search_column values must NOT fan out the driving table
    (pluck() dict semantics, DBT.php:302); winner pinned to max(wanted)."""
    fact = spark.createDataFrame([(1, "x")], "id long, k string")
    dim = spark.createDataFrame(
        [(10, "x"), (20, "x")], "id long, k string"
    )
    maps = {
        "out": {
            "original_table": "fact",
            "columns": {
                "id": "id",
                "ref_id": {
                    "refer": {
                        "search_source": "target",
                        "search_table": "dim",
                        "search_column": "k",
                        "according_column": "kk",
                        "wanted_column": "id",
                    },
                    "default": 0,
                },
                "kk": "k",
            },
        }
    }
    out = run(maps, spark, original={"fact": fact}, target={"dim": dim})["out"]
    rows = out.collect()
    assert len(rows) == 1  # no fan-out
    assert rows[0]["ref_id"] == 20  # deterministic max-wins


# --- A3: multi-key refer, miss ⇒ NULL not default (README.md:234-273) -----

def test_multi_key_refer_miss_is_null(spark):
    records = spark.createDataFrame(
        [(132, "2020-01-12", 3000.0), (322, "2020-01-15", 3100.0)],
        "id long, created_at string, amount double",
    )
    old_pay = spark.createDataFrame(
        [(1, 3000.0, "2020-01-12"), (2, 3100.0, "2020-01-15"), (3, 9999.0, "2020-01-01")],
        "id long, total double, create_date string",
    )
    maps = {
        "new_pay": {
            "original_table": "old_pay",
            "columns": {
                "id": "id",
                "bill_id": {
                    "refer": {
                        "according_column": ["total", "create_date"],
                        "search_source": "original",
                        "search_table": "records",
                        "search_column": ["amount", "created_at"],
                        "wanted_column": "id",
                    },
                    "default": 0,  # deliberately ignored on miss (J2 semantics)
                },
            },
        }
    }
    out = run(maps, spark, original={"old_pay": old_pay, "records": records})["new_pay"]
    got = {r["id"]: r["bill_id"] for r in out.collect()}
    assert got == {1: 132, 2: 322, 3: None}  # miss ⇒ NULL, NOT the default


# --- A4: refers grouped aggregation (README.md:279-316) -------------------

def test_refers_grouped_sum(spark):
    accounts = spark.createDataFrame(
        [(1, 1, 1, 100.0), (2, 1, 2, 200.0)],
        "id long, user_id long, fee_type_id long, amount double",
    )
    old_users = spark.createDataFrame([(1, "张三"), (2, "李四")], "id long, name string")
    maps = {
        "new_users": {
            "original_table": "old_users",
            "columns": {
                "id": "id",
                "username": "name",
                "amount": {
                    "refers": {
                        "according_column": "id",
                        "search_source": "original",
                        "search_table": "accounts",
                        "search_column": "user_id",
                        "processor": "sum(amount)",
                    },
                    "default": 0.0,
                },
            },
        }
    }
    out = run(maps, spark, original={"old_users": old_users, "accounts": accounts})["new_users"]
    got = {r["id"]: r["amount"] for r in out.collect()}
    assert got == {1: 300.0, 2: 0.0}  # no accounts ⇒ default


def test_refers_callable_processor(spark):
    accounts = spark.createDataFrame(
        [(1, 1, 100.0), (2, 1, 200.0)], "id long, user_id long, amount double"
    )
    old_users = spark.createDataFrame([(1, "张三")], "id long, name string")
    maps = {
        "new_users": {
            "original_table": "old_users",
            "columns": {
                "id": "id",
                "amount": {
                    "refers": {
                        "according_column": "id",
                        "search_source": "original",
                        "search_table": "accounts",
                        "search_column": "user_id",
                        # callable processor gets the group's rows like the
                        # reference's Collection (DBT.php:265)
                        "processor": (lambda rows: float(sum(r.amount for r in rows)), "double"),
                    },
                    "default": 0.0,
                },
            },
        }
    }
    out = run(maps, spark, original={"old_users": old_users, "accounts": accounts})["new_users"]
    assert out.collect()[0]["amount"] == 300.0


# --- A5: many-to-many middle explode (README.md:318-361) ------------------

def test_middle_many_to_many(spark):
    old_materials = spark.createDataFrame(
        [(1, "A4纸", "1,2,3"), (2, "铅笔", None), (3, "橡皮", "")],
        "id long, name string, type_id string",
    )
    types = spark.createDataFrame(
        [(1, "类型_1"), (2, "类型_2"), (3, "类型_3")], "id long, type_name string"
    )
    maps = {
        "new_materials": {
            "original_table": "old_materials",
            "columns": {
                "id": "id",
                "name": "name",
                "type_temp": {"original": "type_id", "delete_after_transport": True},
            },
        },
        "material_types": {
            "original_table": None,
            "columns": {"material_id": None, "type_id": None},
            "middle": {
                "one": {
                    "refer_table": "new_materials",
                    "wanted_column": "id",
                    "fill_column": "material_id",
                    "according_column": "type_temp",
                },
                "many": {
                    "fill_column": "type_id",
                    "refer_table": "types",
                    "wanted_column": "id",
                    "search_column": "id",
                    "search_method": "in",
                },
            },
        },
    }
    eng = DBT(
        maps,
        target=MemoryCatalog({"types": types}),
        original=MemoryCatalog({"old_materials": old_materials}),
    )
    eng.do_transport()
    junction = eng.target.tables["material_types"]
    assert junction.columns == ["material_id", "type_id"]
    got = sorted((r["material_id"], r["type_id"]) for r in junction.collect())
    # M2: NULL/empty according rows produce no junction rows
    assert got == [(1, 1), (1, 2), (1, 3)]
    # the one-side table itself was written without the staging column
    assert eng.target.tables["new_materials"].columns == ["id", "name"]


# --- X2/X3: orchestration ---------------------------------------------------

def test_transport_after_ordering_and_cycle_detection(spark):
    t = spark.createDataFrame([(1,)], "id long")
    maps = {
        "a": {"original_table": "t", "columns": {"id": "id"}, "transport_after": "b"},
        "b": {"original_table": "t", "columns": {"id": "id"}},
    }
    from database_transportor_spark.plans.planner import topo_order
    from database_transportor_spark.spec import parse_maps

    assert topo_order(parse_maps(maps)) == ["b", "a"]

    cyc = {
        "a": {"original_table": "t", "columns": {"id": "id"}, "transport_after": "b"},
        "b": {"original_table": "t", "columns": {"id": "id"}, "transport_after": "a"},
    }
    with pytest.raises(SpecError, match="cycle"):
        topo_order(parse_maps(cyc))


def test_seed_check_raises_on_missing(spark):
    fact = spark.createDataFrame([(1, "x")], "id long, k string")
    maps = {
        "out": {
            "original_table": "fact",
            "columns": {
                "id": "id",
                "r": {
                    "refer": {
                        "search_source": "target",
                        "search_table": "not_there",
                        "search_column": "k",
                        "according_column": "id",
                        "wanted_column": "id",
                    }
                },
            },
        }
    }
    eng = DBT(maps, target=MemoryCatalog({}), original=MemoryCatalog({"fact": fact}))
    with pytest.raises(SpecError, match="seed"):
        eng.do_transport()
