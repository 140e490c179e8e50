"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
**through the real engine** (spec → planner → DataFrame), not hand-written
DataFrame code, so the oracle harness validates the engine itself.
``oracle_sql()`` holds the DuckDB-equivalent ANSI SQL.

Numeric-parity policy: oracle-checked queries avoid float *aggregations*
except sums of integral-valued doubles (exact in IEEE754 well below 2^53) —
count/min/max/raw passthrough are bit-exact across engines.  Genuinely
float-heavy or non-SQL-expressible ops (LSH near-dup, ANN) omit the oracle
and take the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_transportor_spark import DBT, MemoryCatalog, ParquetCatalog


def _cat(spark: SparkSession, sf_dir: str) -> ParquetCatalog:
    return ParquetCatalog(spark, sf_dir)


def _run(spark: SparkSession, sf_dir: str, maps: dict, out_key: str,
         extra_original: dict | None = None) -> DataFrame:
    original: object = _cat(spark, sf_dir)
    if extra_original:
        # Overlay derived tables on top of the parquet catalog.
        class _Overlay(ParquetCatalog):
            def read(self, table: str) -> DataFrame:
                if table in extra_original:
                    return extra_original[table]
                return super().read(table)

        original = _Overlay(spark, sf_dir)
    eng = DBT(maps, target=_cat(spark, sf_dir), original=original)
    return eng.transform()[out_key]


# ---------------------------------------------------------------------------
# S1/P1/P2/P3 — scan, rename projection, constant injection, coalesce default
# ---------------------------------------------------------------------------

def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    maps = {
        "new_customers": {
            "original_table": "customer",
            "columns": {
                "id": "c_custkey",
                "username": "c_name",
                "segment": "c_mktsegment",
                "balance": {"original": "c_acctbal", "default": 0.0},
                "source_system": {"default": "legacy"},
            },
        }
    }
    return _run(spark, sf_dir, maps, "new_customers")


SQL_SCAN_PROJECT = """
SELECT c_custkey AS id, c_name AS username, c_mktsegment AS segment,
       COALESCE(c_acctbal, 0.0) AS balance, 'legacy' AS source_system
FROM customer
"""


# ---------------------------------------------------------------------------
# F1-F3 — structured predicates (incl. between / in / like / raw SQL)
# ---------------------------------------------------------------------------

def q_filter_conditions(spark: SparkSession, sf_dir: str) -> DataFrame:
    maps = {
        "filtered": {
            "original_table": "lineitem",
            "extra_conditions": [
                ["l_quantity", "between", [10, 20]],
                ["l_returnflag", "in", ["A", "R"]],
                "l_discount > 0.02",
                ["l_shipdate", ">", "1995-06-01"],
            ],
            "columns": {
                "orderkey": "l_orderkey",
                "linenumber": "l_linenumber",
                "qty": "l_quantity",
                "flag": "l_returnflag",
            },
        }
    }
    return _run(spark, sf_dir, maps, "filtered")


SQL_FILTER_CONDITIONS = """
SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
       l_quantity AS qty, l_returnflag AS flag
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_returnflag IN ('A', 'R')
  AND l_discount > 0.02
  AND l_shipdate > TIMESTAMP '1995-06-01'
"""


# ---------------------------------------------------------------------------
# F3b/F3d/F3e/F3f — NULL-aware + negated predicates
# ---------------------------------------------------------------------------

def q_filter_negations(spark: SparkSession, sf_dir: str) -> DataFrame:
    maps = {
        "neg": {
            "original_table": "customer",
            "extra_conditions": [
                ["c_mktsegment", "notin", ["AUTOMOBILE", "HOUSEHOLD"]],
                ["c_name", "notlike", "%0001%"],
                ["c_acctbal", "notbetween", [0.0, 1000.0]],
                ["c_name", "<>", None],  # NULL-aware: IS NOT NULL
            ],
            "columns": {"id": "c_custkey", "segment": "c_mktsegment", "bal": "c_acctbal"},
        }
    }
    return _run(spark, sf_dir, maps, "neg")


SQL_FILTER_NEGATIONS = """
SELECT c_custkey AS id, c_mktsegment AS segment, c_acctbal AS bal
FROM customer
WHERE c_mktsegment NOT IN ('AUTOMOBILE', 'HOUSEHOLD')
  AND c_name NOT LIKE '%0001%'
  AND c_acctbal NOT BETWEEN 0.0 AND 1000.0
  AND c_name IS NOT NULL
"""


# ---------------------------------------------------------------------------
# P4 — row-wise expression transform
# ---------------------------------------------------------------------------

def q_transform_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    maps = {
        "out": {
            "original_table": "customer",
            "columns": {
                "id": "c_custkey",
                "username": {
                    "original": "c_name",
                    "function": "concat(c_name, '-', c_custkey)",
                },
                "tier": {
                    "original": "c_acctbal",
                    "function": "CASE WHEN c_acctbal >= 5000 THEN 'gold' "
                                "WHEN c_acctbal >= 0 THEN 'silver' ELSE 'debt' END",
                },
            },
        }
    }
    return _run(spark, sf_dir, maps, "out")


SQL_TRANSFORM_EXPR = """
SELECT c_custkey AS id,
       c_name || '-' || CAST(c_custkey AS VARCHAR) AS username,
       CASE WHEN c_acctbal >= 5000 THEN 'gold'
            WHEN c_acctbal >= 0 THEN 'silver' ELSE 'debt' END AS tier
FROM customer
"""


# ---------------------------------------------------------------------------
# J1 — single-key refer lookup (left enrichment, miss ⇒ default)
# ---------------------------------------------------------------------------

def q_refer_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    maps = {
        "enriched_orders": {
            "original_table": "orders",
            "columns": {
                "orderkey": "o_orderkey",
                "custkey": "o_custkey",
                "customer_name": {
                    "refer": {
                        "search_source": "original",
                        "search_table": "customer",
                        "search_column": "c_custkey",
                        "according_column": "custkey",
                        "wanted_column": "c_name",
                    },
                    "default": "unknown",
                },
                "status": "o_orderstatus",
            },
        }
    }
    return _run(spark, sf_dir, maps, "enriched_orders")


SQL_REFER_SINGLE = """
SELECT o.o_orderkey AS orderkey, o.o_custkey AS custkey,
       COALESCE(c.c_name, 'unknown') AS customer_name,
       o.o_orderstatus AS status
FROM orders o
LEFT JOIN customer c ON c.c_custkey = o.o_custkey
"""


# ---------------------------------------------------------------------------
# J2 — multi-key refer; miss ⇒ NULL even with a default configured
# ---------------------------------------------------------------------------

def q_refer_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    maps = {
        "li": {
            "original_table": "lineitem",
            "columns": {
                "orderkey": "l_orderkey",
                "linenumber": "l_linenumber",
                "next_ln": {"original": "l_linenumber", "function": "l_linenumber + 4"},
                "next_qty": {
                    "refer": {
                        "search_source": "original",
                        "search_table": "lineitem",
                        "search_column": ["l_orderkey", "l_linenumber"],
                        "according_column": ["orderkey", "next_ln"],
                        "wanted_column": "l_quantity",
                    },
                    # J2 semantics: this default must NOT fill misses
                    "default": 99.0,
                },
            },
        }
    }
    return _run(spark, sf_dir, maps, "li")


SQL_REFER_MULTI = """
SELECT l1.l_orderkey AS orderkey, l1.l_linenumber AS linenumber,
       l1.l_linenumber + 4 AS next_ln,
       l2.l_quantity AS next_qty
FROM lineitem l1
LEFT JOIN (
    -- build-side key dedup: the engine pins duplicate lookup keys to a
    -- single max(wanted) winner so the driving table never fans out
    SELECT l_orderkey, l_linenumber, MAX(l_quantity) AS l_quantity
    FROM lineitem GROUP BY l_orderkey, l_linenumber
) l2
  ON l2.l_orderkey = l1.l_orderkey AND l2.l_linenumber = l1.l_linenumber + 4
"""


# ---------------------------------------------------------------------------
# J3 — refers grouped-aggregation lookup (miss ⇒ default)
# ---------------------------------------------------------------------------

def q_refers_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    maps = {
        "orders_agg": {
            "original_table": "orders",
            "columns": {
                "orderkey": "o_orderkey",
                "total_qty": {
                    "refers": {
                        "search_source": "original",
                        "search_table": "lineitem",
                        "search_column": "l_orderkey",
                        "according_column": "orderkey",
                        "processor": "sum(l_quantity)",
                    },
                    "default": 0.0,
                },
                "n_items": {
                    "refers": {
                        "search_source": "original",
                        "search_table": "lineitem",
                        "search_column": "l_orderkey",
                        "according_column": "orderkey",
                        "processor": "count(*)",
                    },
                    "default": 0,
                },
            },
        }
    }
    return _run(spark, sf_dir, maps, "orders_agg")


SQL_REFERS_GROUP = """
SELECT o.o_orderkey AS orderkey,
       COALESCE(l.total_qty, 0.0) AS total_qty,
       COALESCE(l.n_items, 0) AS n_items
FROM orders o
LEFT JOIN (
    SELECT l_orderkey, SUM(l_quantity) AS total_qty, COUNT(*) AS n_items
    FROM lineitem GROUP BY l_orderkey
) l ON l.l_orderkey = o.o_orderkey
"""


# ---------------------------------------------------------------------------
# M1/M2 — many-to-many middle explode over a CSV column
# ---------------------------------------------------------------------------

def q_middle_junction(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The fixture tables carry no CSV column; derive one deterministically
    # (same derivation as a CTE in the oracle) so the real middle operator —
    # split, explode, skip-empty, typed equi-join — is what's under test.
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    derived = customer.select(
        F.col("c_custkey"),
        F.concat_ws(
            ",",
            F.col("c_nationkey").cast("string"),
            ((F.col("c_nationkey") + 1) % 25).cast("string"),
            ((F.col("c_nationkey") + 2) % 25).cast("string"),
        ).alias("nk_csv"),
    )
    maps = {
        "cust_nations": {
            "original_table": None,
            "columns": {"cust_id": None, "nation_id": None},
            "middle": {
                "one": {
                    "refer_table": "customer_csv",
                    "refer_source": "original",
                    "wanted_column": "c_custkey",
                    "fill_column": "cust_id",
                    "according_column": "nk_csv",
                },
                "many": {
                    "refer_table": "nation",
                    "refer_source": "original",
                    "wanted_column": "n_name",
                    "fill_column": "nation_name",
                    "search_column": "n_nationkey",
                    "search_method": "in",
                },
            },
        }
    }
    return _run(spark, sf_dir, maps, "cust_nations",
                extra_original={"customer_csv": derived})


SQL_MIDDLE_JUNCTION = """
WITH customer_csv AS (
    SELECT c_custkey,
           CAST(c_nationkey AS VARCHAR) || ',' ||
           CAST((c_nationkey + 1) % 25 AS VARCHAR) || ',' ||
           CAST((c_nationkey + 2) % 25 AS VARCHAR) AS nk_csv
    FROM customer
)
SELECT cc.c_custkey AS cust_id, n.n_name AS nation_name
FROM customer_csv cc,
     UNNEST(string_split(cc.nk_csv, ',')) AS u(nk)
JOIN nation n ON n.n_nationkey = CAST(u.nk AS INTEGER)
"""


# ---------------------------------------------------------------------------
# X1/X2 flagship — multi-map DAG: dim migration + enrichment via in-flight
# target lookup + grouped refers, staging column dropped
# ---------------------------------------------------------------------------

def _flagship_maps() -> dict:
    return {
        "dim_nation": {
            "original_table": "nation",
            "columns": {"nationkey": "n_nationkey", "nation_name": "n_name"},
        },
        "new_customers": {
            "original_table": "customer",
            "extra_conditions": [
                ["c_mktsegment", "in", ["BUILDING", "MACHINERY"]],
                "c_acctbal > 0",
            ],
            "transport_after": "dim_nation",
            "columns": {
                "id": "c_custkey",
                "username": {"original": "c_name",
                             "function": "concat(c_name, '-', c_custkey)"},
                "balance": {"original": "c_acctbal", "default": 0.0},
                "temp_nk": {"original": "c_nationkey", "delete_after_transport": True},
                "nation": {
                    "refer": {
                        "search_source": "target",
                        "search_table": "dim_nation",
                        "search_column": "nationkey",
                        "according_column": "temp_nk",
                        "wanted_column": "nation_name",
                    },
                    "default": "unknown",
                },
                "n_orders": {
                    "refers": {
                        "search_source": "original",
                        "search_table": "orders",
                        "search_column": "o_custkey",
                        "according_column": "id",
                        "processor": "count(*)",
                    },
                    "default": 0,
                },
            },
        },
    }


def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = DBT(_flagship_maps(), target=MemoryCatalog({}), original=_cat(spark, sf_dir))
    out = eng.transform()["new_customers"]
    return out.select(*eng.write_columns("new_customers"))


SQL_FLAGSHIP = """
SELECT c.c_custkey AS id,
       c.c_name || '-' || CAST(c.c_custkey AS VARCHAR) AS username,
       COALESCE(c.c_acctbal, 0.0) AS balance,
       COALESCE(n.n_name, 'unknown') AS nation,
       COALESCE(o.n_orders, 0) AS n_orders
FROM customer c
LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
       ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY') AND c.c_acctbal > 0
"""


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship multi-map migration on sf0.001; driver checks rows>0."""
    return q_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "scan_project": q_scan_project,
        "filter_conditions": q_filter_conditions,
        "filter_negations": q_filter_negations,
        "transform_expr": q_transform_expr,
        "refer_single": q_refer_single,
        "refer_multi": q_refer_multi,
        "refers_group": q_refers_group,
        "middle_junction": q_middle_junction,
        "flagship": q_flagship,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "scan_project": SQL_SCAN_PROJECT,
        "filter_conditions": SQL_FILTER_CONDITIONS,
        "filter_negations": SQL_FILTER_NEGATIONS,
        "transform_expr": SQL_TRANSFORM_EXPR,
        "refer_single": SQL_REFER_SINGLE,
        "refer_multi": SQL_REFER_MULTI,
        "refers_group": SQL_REFERS_GROUP,
        "middle_junction": SQL_MIDDLE_JUNCTION,
        "flagship": SQL_FLAGSHIP,
    }
