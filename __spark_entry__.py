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
# P5 — multi-output transform (affection): one function fills several columns
# ---------------------------------------------------------------------------

def q_affection(spark: SparkSession, sf_dir: str) -> DataFrame:
    maps = {
        "out": {
            "original_table": "customer",
            "columns": {
                "id": "c_custkey",
                "uname": {
                    "original": "c_name",
                    "function": "named_struct('c_name', upper(c_name), "
                                "'seg_low', lower(c_mktsegment))",
                    "affection": [
                        {"target_column": "seg", "source_key": "seg_low"},
                    ],
                },
                "seg": None,  # P6 skip: filled by the affection above
            },
        }
    }
    return _run(spark, sf_dir, maps, "out")


SQL_AFFECTION = """
SELECT c_custkey AS id, upper(c_name) AS uname, lower(c_mktsegment) AS seg
FROM customer
"""


# ---------------------------------------------------------------------------
# J1 hooks — pre_format (probe-key transform) + format_wanted (post-lookup,
# applied even on miss, then ?? default)
# ---------------------------------------------------------------------------

def q_refer_hooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    maps = {
        "out": {
            "original_table": "customer",
            "columns": {
                "id": "c_custkey",
                "shifted_nk": {"original": "c_nationkey",
                               "function": "c_nationkey + 20"},
                "nation": {
                    "refer": {
                        "search_source": "original",
                        "search_table": "nation",
                        "search_column": "n_nationkey",
                        "according_column": "shifted_nk",
                        "wanted_column": "n_name",
                        "pre_format": "abs({value})",
                        "format_wanted": "upper({value})",
                    },
                    "default": "none",
                },
            },
        }
    }
    return _run(spark, sf_dir, maps, "out")


SQL_REFER_HOOKS = """
SELECT c.c_custkey AS id,
       c.c_nationkey + 20 AS shifted_nk,
       COALESCE(UPPER(n.n_name), 'none') AS nation
FROM customer c
LEFT JOIN nation n ON n.n_nationkey = abs(c.c_nationkey + 20)
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
# J1 rtrim — string keys normalized with rtrim on BOTH sides (trailing
# whitespace in either table still matches; DBT.php:306-312)
# ---------------------------------------------------------------------------

def q_refer_rtrim(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    padded = nation.select(
        F.concat(F.col("n_name"), F.lit("   ")).alias("name_padded"),
        F.col("n_regionkey"),
    )
    maps = {
        "out": {
            "original_table": "customer",
            "columns": {
                "id": "c_custkey",
                "nname": {
                    "refer": {
                        "search_source": "original",
                        "search_table": "nation",
                        "search_column": "n_nationkey",
                        "according_column": "id",
                        "wanted_column": "n_name",
                    },
                    # harness detail: derive a per-row STRING probe key
                    # (nation name) so the rtrim path is actually string-typed
                },
                "regionkey": {
                    "refer": {
                        "search_source": "original",
                        "search_table": "nation_padded",
                        "search_column": "name_padded",
                        "according_column": "nname",
                        "wanted_column": "n_regionkey",
                    },
                    "default": -1,
                },
            },
        }
    }
    # first refer maps custkey→nation name (int key); second probes the
    # PADDED name table with the unpadded name — only rtrim makes it hit.
    out = _run(spark, sf_dir, maps, "out",
               extra_original={"nation_padded": padded})
    return out.select("id", "nname", "regionkey")


SQL_REFER_RTRIM = """
WITH padded AS (
    SELECT n_name || '   ' AS name_padded, n_regionkey FROM nation
)
SELECT c.c_custkey AS id,
       n.n_name AS nname,
       COALESCE(p.n_regionkey, -1) AS regionkey
FROM customer c
LEFT JOIN nation n ON n.n_nationkey = c.c_custkey
LEFT JOIN padded p ON rtrim(p.name_padded) = rtrim(n.n_name)
"""


# ---------------------------------------------------------------------------
# J1 dup-key dedup — duplicate build-side keys collapse to ONE winner
# (max(wanted), the engine's pinned determinization of PHP pluck()
# last-wins); driving cardinality must not fan out
# ---------------------------------------------------------------------------

def q_refer_dupkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    maps = {
        "out": {
            "original_table": "customer",
            "columns": {
                "id": "c_custkey",
                "max_order_total": {
                    "refer": {
                        "search_source": "original",
                        "search_table": "orders",
                        "search_column": "o_custkey",  # duplicated per customer
                        "according_column": "id",
                        "wanted_column": "o_totalprice",
                    },
                    "default": 0.0,
                },
            },
        }
    }
    return _run(spark, sf_dir, maps, "out")


SQL_REFER_DUPKEYS = """
SELECT c.c_custkey AS id,
       COALESCE(o.w, 0.0) AS max_order_total
FROM customer c
LEFT JOIN (
    SELECT o_custkey, MAX(o_totalprice) AS w FROM orders GROUP BY o_custkey
) o ON o.o_custkey = c.c_custkey
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
        "affection": q_affection,
        "refer_hooks": q_refer_hooks,
        "refer_single": q_refer_single,
        "refer_rtrim": q_refer_rtrim,
        "refer_dupkeys": q_refer_dupkeys,
        "refer_multi": q_refer_multi,
        "refers_group": q_refers_group,
        "middle_junction": q_middle_junction,
        "flagship": q_flagship,
        **_EXTENSION_QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "scan_project": SQL_SCAN_PROJECT,
        "filter_conditions": SQL_FILTER_CONDITIONS,
        "filter_negations": SQL_FILTER_NEGATIONS,
        "transform_expr": SQL_TRANSFORM_EXPR,
        "affection": SQL_AFFECTION,
        "refer_hooks": SQL_REFER_HOOKS,
        "refer_single": SQL_REFER_SINGLE,
        "refer_rtrim": SQL_REFER_RTRIM,
        "refer_dupkeys": SQL_REFER_DUPKEYS,
        "refer_multi": SQL_REFER_MULTI,
        "refers_group": SQL_REFERS_GROUP,
        "middle_junction": SQL_MIDDLE_JUNCTION,
        "flagship": SQL_FLAGSHIP,
        **_EXTENSION_ORACLES,
    }


# ===========================================================================
# Extension surface: LLM-data-pipeline operators (SURVEY §7 / driver north
# star) — dedup, similarity search, text analysis, multimodal, streaming.
# ===========================================================================

def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture adapter: normalize events.ts to TIMESTAMP whatever the
    fixture's physical encoding (long nanos under the legacy flag, NTZ
    micros, or native TIMESTAMP) — see functions/timecols.py.

    The legacy flag is deliberately session-scoped HERE (harness glue, not
    library code): the returned DataFrame is lazy, so the flag must still
    be set when a downstream action scans a nanos-typed file; it is a
    no-op for micros/NTZ fixtures.  The library's streaming operators, by
    contrast, run to completion and restore the flag
    (events.py:_scoped_nanos_conf)."""
    from database_transportor_spark.functions.timecols import normalize_event_time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_event_time(df, "ts")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.text import text_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = text_stats(docs, "text")
    return out.select(
        "doc_id",
        F.col("n_chars_calc").cast("long").alias("n_chars_calc"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "punct_ratio",
        "upper_ratio",
        F.col("stopword_hits").cast("long").alias("stopword_hits"),
    )


SQL_TEXT_STATS = """
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens,
       length(regexp_replace(text, '[^.,!?;:''"()\\[\\]{}\\-]', '', 'g'))
         / greatest(length(text), 1) AS punct_ratio,
       length(regexp_replace(text, '[^A-Z]', '', 'g'))
         / greatest(length(text), 1) AS upper_ratio,
       len(list_distinct(list_intersect(
           string_split_regex(trim(lower(text)), '\\s+'),
           ['the','a','and','of','to','in','is','it','that','for']))) AS stopword_hits
FROM documents
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.text import language_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return language_id(docs, "text").select("doc_id", "lang", "lang_pred")


SQL_LANG_ID = """
WITH t AS (
    SELECT doc_id, lang, text,
           string_split_regex(trim(lower(text)), '\\s+') AS toks,
           length(regexp_replace(text, '[^\\x{4E00}-\\x{9FFF}]', '', 'g')) AS n_cjk
    FROM documents
), h AS (
    SELECT doc_id, lang, n_cjk,
           len(list_distinct(list_intersect(toks, ['the','a','and','of','to','in','is','it','that','for']))) AS h_en,
           len(list_distinct(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','zu','mit']))) AS h_de,
           len(list_distinct(list_intersect(toks, ['le','la','les','et','est','un','une','de','pour']))) AS h_fr,
           len(list_distinct(list_intersect(toks, ['el','los','las','y','es','un','una','de','para']))) AS h_es
    FROM t
)
SELECT doc_id, lang,
       CASE WHEN n_cjk > 0 THEN 'zh'
            WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'unknown'
            WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
            WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
            WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM h
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.text import fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return fingerprint(docs, "text", k=8).select("doc_id", "fp")


SQL_FINGERPRINT = """
SELECT doc_id,
       md5(array_to_string(string_split_regex(trim(lower(text)), '\\s+')[1:8], ' ')) AS fp
FROM documents
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # through the declarative planner: migration + dedup as one spec
    maps = {
        "docs_unique": {
            "original_table": "documents",
            "columns": {"doc_id": "doc_id", "text": "text"},
            "post_ops": [
                {"op": "exact_dedup", "keys": ["text"], "order_by": "doc_id",
                 "keep": "min"},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "docs_unique")


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text
"""


def q_doc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data pipeline as ONE declarative spec: scan → rename →
    language-ID tag → quality score → quality filter → exact dedup."""
    maps = {
        "corpus": {
            "original_table": "documents",
            "columns": {"doc_id": "doc_id", "text": "text", "lang": "lang"},
            "post_ops": [
                {"op": "language_id", "text_col": "text"},
                {"op": "quality_score", "text_col": "text"},
                {"op": "filter", "condition": "quality >= 0.5"},
                {"op": "exact_dedup", "keys": ["text"], "order_by": "doc_id",
                 "keep": "min"},
                {"op": "select",
                 "columns": ["doc_id", "lang", "lang_pred", "quality"]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "corpus")


SQL_DOC_PIPELINE = """
WITH t AS (
    SELECT doc_id, lang, text,
           string_split_regex(trim(lower(text)), '\\s+') AS toks,
           length(text) AS n_chars,
           length(regexp_replace(text, '[^\\x{4E00}-\\x{9FFF}]', '', 'g')) AS n_cjk
    FROM documents
), h AS (
    SELECT *,
           len(list_distinct(list_intersect(toks, ['the','a','and','of','to','in','is','it','that','for']))) AS h_en,
           len(list_distinct(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','zu','mit']))) AS h_de,
           len(list_distinct(list_intersect(toks, ['le','la','les','et','est','un','une','de','pour']))) AS h_fr,
           len(list_distinct(list_intersect(toks, ['el','los','las','y','es','un','una','de','para']))) AS h_es
    FROM t
), scored AS (
    SELECT doc_id, lang, text,
           CASE WHEN n_cjk > 0 THEN 'zh'
                WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'unknown'
                WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
                WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                ELSE 'es' END AS lang_pred,
           (CASE WHEN n_chars BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.0 END
            + CASE WHEN n_chars / greatest(len(toks), 1) BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.0 END
            + CASE WHEN h_en > 0 THEN 1.0 ELSE 0.0 END) / 3.0 AS quality
    FROM h
), filtered AS (
    SELECT * FROM scored WHERE quality >= 0.5
)
SELECT min(doc_id) AS doc_id,
       arg_min(lang, doc_id) AS lang,
       arg_min(lang_pred, doc_id) AS lang_pred,
       arg_min(quality, doc_id) AS quality
FROM filtered GROUP BY text
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.05, max_df=100,
        min_partitions=spark.sparkContext.defaultParallelism,
    )
    return out.select(
        "id_a", "id_b",
        F.col("intersection").cast("long").alias("intersection"),
        F.col("union_size").cast("long").alias("union_size"),
    )


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-duplicate passages (winnowing-anchored 8-token
    spans repeated verbatim across >=2 docs) — the cut list a
    substring-dedup pass consumes.  `operators/dedup.py:repeated_passages`."""
    from database_transportor_spark.operators.dedup import repeated_passages

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repeated_passages(docs, "doc_id", "text", span_words=8)


SQL_DUP_SPANS = """
WITH t AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents
), s0 AS (
    SELECT doc_id, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS pos, toks FROM t
), sites AS (
    SELECT doc_id, pos, array_to_string(toks[pos:pos+7], ' ') AS s
    FROM s0 WHERE substr(md5(toks[pos]), 1, 1) IN ('0','1','2','3')
), g AS (
    SELECT s, count(*) AS n_sites, count(DISTINCT doc_id) AS n_docs
    FROM sites GROUP BY s HAVING count(DISTINCT doc_id) >= 2
)
SELECT si.doc_id, CAST(si.pos AS BIGINT) AS pos, g.n_docs, g.n_sites,
       (row_number() OVER (PARTITION BY g.s ORDER BY si.doc_id, si.pos)) = 1 AS keep
FROM sites si JOIN g ON si.s = g.s
"""


def q_embed_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer-grid covariance of the embedding table — one Arrow
    X'X partials pass, d²-bounded state.
    `operators/similarity.py:embedding_covariance`."""
    from database_transportor_spark.operators.similarity import embedding_covariance

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_covariance(emb, "vec_id", "embedding")


SQL_EMBED_COV = """
WITH qx AS (
    SELECT vec_id, CAST(i AS INTEGER) - 1 AS pos,
           CAST(round(CAST(list_extract(embedding, i) AS DOUBLE) * 1000000.0) AS BIGINT) AS v
    FROM embeddings, range(1, 65) AS t(i)
), nn AS (SELECT count(*) AS n FROM embeddings),
s AS (SELECT pos, CAST(sum(v) AS BIGINT) AS s FROM qx GROUP BY pos),
p AS (SELECT a.pos AS i, b.pos AS j, CAST(sum(a.v * b.v) AS BIGINT) AS sum_prod
      FROM qx a JOIN qx b USING (vec_id) GROUP BY 1, 2)
SELECT p.i, p.j, p.sum_prod,
       round((CAST(p.sum_prod AS DOUBLE)
              - CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE) / CAST(nn.n AS DOUBLE))
             / CAST(nn.n AS DOUBLE) / 1000000000000.0, 6) + 0.0 AS cov
FROM p JOIN s sa ON sa.pos = p.i JOIN s sb ON sb.pos = p.j CROSS JOIN nn
"""


def q_pca_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA fit contract (`operators/similarity.py:pca_project`): the
    top-8 components of the exact covariance must be orthonormal with
    non-negative descending eigenvalues, and the DISTRIBUTED variance
    of each projected component must equal its eigenvalue — linking the
    Arrow projection pass back to the driver-side eigh.  Oracle is the
    contract itself (all-true rows), the `minhash_lsh` recall-oracle
    pattern."""
    import numpy as np

    from database_transportor_spark.operators.similarity import pca_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k = 8
    proj = pca_project(emb, "vec_id", "embedding", k=k)
    W, lam = proj.pca_components, proj.pca_eigenvalues
    unit = np.abs((W ** 2).sum(axis=1) - 1.0) < 1e-9
    G = W @ W.T
    orth = np.abs(G - np.diag(np.diag(G))).max(axis=1) < 1e-9
    sorted_ok = np.concatenate([[True], np.diff(lam) <= 1e-12])
    nonneg = lam >= -1e-9
    var_row = proj.agg(
        *[F.var_pop(F.col("pca")[i]).alias(f"v{i}") for i in range(k)]
    ).first()
    rows = []
    for i in range(k):
        v = float(var_row[f"v{i}"])
        var_ok = abs(v - float(lam[i])) <= 1e-9 + 1e-6 * abs(float(lam[i]))
        rows.append(
            (i, bool(unit[i]), bool(orth[i]), bool(sorted_ok[i]),
             bool(nonneg[i]), var_ok)
        )
    return spark.createDataFrame(
        rows,
        "component int, unit_norm boolean, orthogonal boolean, "
        "eigs_sorted boolean, eigs_nonneg boolean, var_matches boolean",
    )


SQL_PCA_CHECK = """
SELECT CAST(i AS INTEGER) AS component,
       true AS unit_norm, true AS orthogonal,
       true AS eigs_sorted, true AS eigs_nonneg, true AS var_matches
FROM range(0, 8) t(i)
"""


def q_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excise non-canonical duplicated passages (normalized-token
    rewrite, one surviving copy corpus-wide).
    `operators/dedup.py:strip_repeated_passages`."""
    from database_transportor_spark.operators.dedup import strip_repeated_passages

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return strip_repeated_passages(docs, "doc_id", "text", span_words=8)


SQL_STRIP_SPANS = """
WITH t AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents
), s0 AS (
    SELECT doc_id, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS pos, toks FROM t
), sites AS (
    SELECT doc_id, pos, array_to_string(toks[pos:pos+7], ' ') AS s
    FROM s0 WHERE substr(md5(toks[pos]), 1, 1) IN ('0','1','2','3')
), g AS (
    SELECT s FROM sites GROUP BY s HAVING count(DISTINCT doc_id) >= 2
), ranked AS (
    SELECT si.doc_id, si.pos,
           row_number() OVER (PARTITION BY si.s ORDER BY si.doc_id, si.pos) AS rn
    FROM sites si JOIN g ON si.s = g.s
), cuts AS (
    SELECT doc_id, list(pos) AS cut_pos FROM ranked WHERE rn > 1 GROUP BY doc_id
), rebuilt AS (
    SELECT t.doc_id, t.toks, coalesce(c.cut_pos, []) AS cut_pos,
           list_filter(range(1, len(t.toks) + 1),
                       i -> len(list_filter(coalesce(c.cut_pos, []),
                                            p -> p <= i AND i < p + 8)) = 0) AS kept
    FROM t LEFT JOIN cuts c ON c.doc_id = t.doc_id
)
SELECT doc_id,
       array_to_string(list_transform(kept, i -> toks[i]), ' ') AS text,
       CAST(len(toks) - len(kept) AS BIGINT) AS removed
FROM rebuilt
"""


SQL_NGRAM_JACCARD = """
WITH t AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                                        i -> array_to_string(toks[i:i+2], ' '))) AS shingles
    FROM t
), ex0 AS (
    SELECT doc_id, unnest(shingles) AS s FROM sh
), hot AS (
    SELECT s FROM ex0 GROUP BY s HAVING count(*) > 100
), ex AS (
    SELECT doc_id, s FROM ex0 WHERE s NOT IN (SELECT s FROM hot)
), sizes AS (
    SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS intersection
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.intersection,
       sa.n + sb.n - i.intersection AS union_size
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.intersection / (sa.n + sb.n - i.intersection) >= 0.05
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.05, max_df=100,
        min_partitions=spark.sparkContext.defaultParallelism,
    )
    return dedup_clusters(docs, pairs, "doc_id")


SQL_DEDUP_CLUSTERS = """
WITH RECURSIVE t AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                                        i -> array_to_string(toks[i:i+2], ' '))) AS shingles
    FROM t
), ex0 AS (
    SELECT doc_id, unnest(shingles) AS s FROM sh
), hot AS (
    SELECT s FROM ex0 GROUP BY s HAVING count(*) > 100
), ex AS (
    SELECT doc_id, s FROM ex0 WHERE s NOT IN (SELECT s FROM hot)
), sizes AS (
    SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), pairs AS (
    SELECT i.id_a, i.id_b
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.i / (sa.n + sb.n - i.i) >= 0.05
), edges AS (
    SELECT id_a AS s, id_b AS d FROM pairs
    UNION ALL SELECT id_b, id_a FROM pairs
), reach AS (
    SELECT doc_id AS id, doc_id AS r FROM documents
    UNION
    SELECT e.d AS id, reach.r FROM reach JOIN edges e ON e.s = reach.id
)
SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH under a driver-checkable *contract* (the signatures are
    xxhash64-based, so DuckDB cannot replay them pair-for-pair; per VERDICT
    r1 the oracle instead checks the contract the operator promises):

    - ``n_exact_pairs`` — |{pairs with exact n-gram Jaccard >= threshold}|,
      computed independently by both engines (anchors the exact machinery);
    - ``n_unsound`` — emitted pairs NOT in the exact set; the operator
      verifies every candidate against exact Jaccard, so this must be 0;
    - ``recall_ok`` — LSH recalled >= 80% of the exact set (fixture pairs
      sit at J >= 0.9 where 16/4-banded collision probability is ~0.99).
    """
    from database_transportor_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mp = spark.sparkContext.defaultParallelism
    emitted = minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=16, bands=4, shingle_n=3, threshold=0.2,
        min_partitions=mp,
    ).select("id_a", "id_b", F.lit(1).alias("__em"))
    exact = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2, min_partitions=mp,
    ).select("id_a", "id_b", F.lit(1).alias("__ex"))
    both = emitted.join(exact, ["id_a", "id_b"], "full_outer")
    return both.agg(
        F.sum(F.coalesce("__ex", F.lit(0))).cast("long").alias("n_exact_pairs"),
        F.sum(F.when(F.col("__ex").isNull(), 1).otherwise(0))
        .cast("long").alias("n_unsound"),
        (
            F.sum(F.when(F.col("__em").isNotNull() & F.col("__ex").isNotNull(), 1)
                  .otherwise(0))
            >= F.sum(F.coalesce("__ex", F.lit(0))) * 0.8
        ).alias("recall_ok"),
    )


# Exact-Jaccard pair count over the same word-3-gram shingle sets (no
# max_df cap — the LSH verify step sees the full shingle universe too);
# soundness and the recall floor are asserted as literals because the
# Spark side computes them against this same exact set.
SQL_MINHASH_LSH = """
WITH sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                                        i -> array_to_string(toks[i:i+2], ' '))) AS shingles
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
          FROM documents)
),
ex AS (
    SELECT doc_id, unnest(shingles) AS s FROM sh
), sizes AS (
    SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
       CAST(0 AS BIGINT) AS n_unsound,
       TRUE AS recall_ok
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.i / (sa.n + sb.n - i.i) >= 0.2
"""


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup contract (signature is xxhash64-based — see
    q_minhash_lsh for why the oracle checks the contract, not the pairs):

    - ``n_exact_pairs`` — exact n-gram Jaccard >= 0.9 pair count (both
      engines compute it independently);
    - ``recall_ok`` — simhash emitted >= 80% of those near-identical
      pairs (hamming <= 3 at J >= 0.9 with overwhelming probability);
    - ``n_identical_missed`` — pairs with *identical normalized token
      lists* not emitted: identical tokens force identical signatures,
      which always collide in every band, so this is deterministically 0.
    """
    from database_transportor_spark.operators.dedup import (
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from database_transportor_spark.operators.text import tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mp = spark.sparkContext.defaultParallelism
    emitted = simhash_pairs(
        docs, "doc_id", "text", bits=32, max_hamming=3, bands=4,
        min_partitions=mp,
    ).select("id_a", "id_b", F.lit(1).alias("__em"))
    # Same (params, plan) as q_minhash_lsh's anchor, filtered up to 0.9:
    # ngram_jaccard_pairs persists its output, and Spark's cache manager
    # matches canonicalized plans — so in a session that already ran the
    # minhash contract the expensive exact join is served from cache
    # instead of recomputed (one shared anchor for both LSH contracts).
    exact = (
        ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.2, min_partitions=mp,
        )
        .filter(F.col("jaccard") >= 0.9)
        .select("id_a", "id_b", F.lit(1).alias("__ex"))
    )
    toks = docs.select("doc_id", tokens("text").alias("__t"))
    ident = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("a.__t") == F.col("b.__t"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.lit(1).alias("__id"),
        )
    )
    both = (
        emitted.join(exact, ["id_a", "id_b"], "full_outer")
        .join(ident, ["id_a", "id_b"], "full_outer")
    )
    return both.agg(
        F.sum(F.coalesce("__ex", F.lit(0))).cast("long").alias("n_exact_pairs"),
        (
            F.sum(F.when(F.col("__em").isNotNull() & F.col("__ex").isNotNull(), 1)
                  .otherwise(0))
            >= F.sum(F.coalesce("__ex", F.lit(0))) * 0.8
        ).alias("recall_ok"),
        F.sum(F.when(F.col("__id").isNotNull() & F.col("__em").isNull(), 1)
              .otherwise(0)).cast("long").alias("n_identical_missed"),
    )


SQL_SIMHASH_PAIRS = """
WITH sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                                        i -> array_to_string(toks[i:i+2], ' '))) AS shingles
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
          FROM documents)
),
ex AS (
    SELECT doc_id, unnest(shingles) AS s FROM sh
), sizes AS (
    SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
       TRUE AS recall_ok,
       CAST(0 AS BIGINT) AS n_identical_missed
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.i / (sa.n + sb.n - i.i) >= 0.9
"""


def q_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10)
    out = cosine_topk(emb, probes, "vec_id", "embedding", k=10)
    return out.select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))


SQL_ANN_COSINE = """
WITH probes AS (
    SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10
), scored AS (
    SELECT p.query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(p.qe, e.embedding) AS cos
    FROM probes p, embeddings e
    WHERE e.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 10
"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with the bounded deterministic centroid rule
    (``vec_id % 37 = 0 ORDER BY vec_id LIMIT 64``) — the same rule the
    DuckDB oracle expresses in SQL, so bucket assignment, candidate set,
    and final ranks are all cross-engine checkable.  Only integral
    columns are hashed (rank, ids); cosine stays internal."""
    from database_transportor_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10)
    out = ivf_topk(emb, probes, "vec_id", "embedding", k=10, stride=37, nprobe=3)
    return out.select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))


# Mirrors ivf_topk exactly: bounded stride centroids, nearest-centroid
# bucket per corpus vector (ties -> lowest centroid id), nprobe=3 buckets
# per probe, exact cosine re-score over the candidates, rank <= k.
SQL_ANN_IVF = """
WITH cent AS (
    SELECT vec_id AS cid, embedding AS ce FROM embeddings
    WHERE vec_id % 37 = 0 ORDER BY vec_id LIMIT 64
), assign AS (
    SELECT vec_id, bucket FROM (
        SELECT e.vec_id, c.cid AS bucket,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c
    ) WHERE rn = 1
), qa AS (
    SELECT query_id, bucket FROM (
        SELECT e.vec_id AS query_id, c.cid AS bucket,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < 10
    ) WHERE rn <= 3
), cand AS (
    SELECT q.query_id, a.vec_id AS neighbor_id
    FROM qa q JOIN assign a USING (bucket)
    WHERE a.vec_id <> q.query_id
), scored AS (
    SELECT c.query_id, c.neighbor_id,
           list_cosine_similarity(qe.embedding, ne.embedding) AS cos
    FROM cand c
    JOIN embeddings qe ON qe.vec_id = c.query_id
    JOIN embeddings ne ON ne.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 10
"""


def q_ann_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-to-table ANN join — BOTH sides large: every third vector is a
    query (a query TABLE, not a bounded probe list) matched against the
    full corpus through the IVF bucket equi-join; per-query scan stays
    ~nprobe/C of the corpus and the only shuffle is on the bucket id.
    Same bounded deterministic centroid rule as q_ann_ivf, so bucket
    assignment, candidates, and ranks replay exactly in SQL."""
    from database_transportor_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 3 == 0)
    out = ivf_topk(emb, queries, "vec_id", "embedding", k=5, stride=37, nprobe=3)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
    )


SQL_ANN_JOIN = """
WITH cent AS (
    SELECT vec_id AS cid, embedding AS ce FROM embeddings
    WHERE vec_id % 37 = 0 ORDER BY vec_id LIMIT 64
), assign AS (
    SELECT vec_id, bucket FROM (
        SELECT e.vec_id, c.cid AS bucket,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c
    ) WHERE rn = 1
), qa AS (
    SELECT query_id, bucket FROM (
        SELECT e.vec_id AS query_id, c.cid AS bucket,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c WHERE e.vec_id % 3 = 0
    ) WHERE rn <= 3
), cand AS (
    SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id
    FROM qa q JOIN assign a USING (bucket)
    WHERE a.vec_id <> q.query_id
), scored AS (
    SELECT c.query_id, c.neighbor_id,
           list_cosine_similarity(qe.embedding, ne.embedding) AS cos
    FROM cand c
    JOIN embeddings qe ON qe.vec_id = c.query_id
    JOIN embeddings ne ON ne.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 5
"""


def q_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed near-dup pairs, oracle-checked on pair membership:
    the bounded centroid rule and bucket-local join are both SQL-
    expressible, and the float cosine stays out of the hashed projection."""
    from database_transportor_spark.operators.similarity import cosine_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = cosine_pairs(emb, "vec_id", "embedding", threshold=0.3, stride=37)
    return out.select("id_a", "id_b")


SQL_COSINE_PAIRS = """
WITH cent AS (
    SELECT vec_id AS cid, embedding AS ce FROM embeddings
    WHERE vec_id % 37 = 0 ORDER BY vec_id LIMIT 64
), assign AS (
    SELECT vec_id, embedding, bucket FROM (
        SELECT e.vec_id, e.embedding, c.cid AS bucket,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c
    ) WHERE rn = 1
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM assign a JOIN assign b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.multimodal import attach_binary, byte_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = attach_binary(docs, "text")
    return byte_features(media, "doc_id", "content")


SQL_MULTIMODAL_FEATURES = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS digest
FROM documents
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.multimodal import (
        attach_binary,
        sample_frames,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = attach_binary(docs, "text")
    out = sample_frames(media, "doc_id", "content",
                        frame_bytes=64, stride=128, max_frames=8)
    # DuckDB cannot slice BLOBs; compare frames through their hex encoding
    # (byte slice == substring of hex at doubled offsets).
    return out.select(
        "doc_id", "frame_idx", F.md5(F.hex("frame")).alias("frame_digest")
    )


SQL_MULTIMODAL_FRAMES = """
SELECT doc_id, i AS frame_idx,
       md5(substring(hex(encode(text)), i * 256 + 1, 128)) AS frame_digest
FROM documents, UNNEST(range(0, 8)) AS u(i)
WHERE i * 128 < octet_length(encode(text))
"""


def q_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end (`operators/multimodal.py:decode_image`):
    synthesize a genuine PNG per document (dims/channels are deterministic
    functions of doc_id), run it through the pure-Python PNG codec
    (zlib inflate + per-filter reconstruction), and report the decoded
    dimensions plus an exact pixel-sum integrity check.  The oracle
    computes the same table in closed form — a hash match proves the
    decoder recovered every byte."""
    import pandas as pd

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from database_transportor_spark.operators.multimodal import (
        decode_image, encode_png)

    # documents.parquet is ONE file ⇒ one scan partition: without the
    # repartition the whole Python synth+decode chain below runs in a
    # single task (the mjpeg_frames/_m4a_fixture discipline)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("content", BinaryType())])

    def make_png(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                h, w, ch = 4 + d % 7, 3 + d % 5, 1 + d % 4
                arr = ((np.arange(h * w * ch, dtype=np.int64) * 37 + d)
                       % 251).astype(np.uint8).reshape(h, w, ch)
                out.append(encode_png(arr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": pd.Series(out, dtype="object")})

    media = docs.mapInPandas(make_png, schema)
    decoded = decode_image(media, "doc_id", "content", with_pixels=True)
    return decoded.select(
        "doc_id", "width", "height", "channels",
        F.aggregate(
            # binary → byte values via 2-char hex slices (JVM-side, no UDF)
            F.transform(
                F.sequence(F.lit(1), (F.length(F.hex("pixels")) / 2).cast("int")),
                lambda i: F.conv(
                    F.substring(F.hex("pixels"), (i * 2 - 1).cast("int"), 2),
                    16, 10,
                ).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("pixel_sum"),
    )


SQL_IMAGE_DECODE = """
WITH dims AS (
  SELECT doc_id,
         3 + doc_id % 5 AS width,
         4 + doc_id % 7 AS height,
         1 + doc_id % 4 AS channels
  FROM documents
)
SELECT d.doc_id, d.width, d.height, d.channels,
       CAST(sum((i * 37 + d.doc_id) % 251) AS BIGINT) AS pixel_sum
FROM dims d, UNNEST(range(0, 281)) AS r(i)
WHERE i < d.height * d.width * d.channels
GROUP BY d.doc_id, d.width, d.height, d.channels
"""


def q_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end (`operators/multimodal.py:decode_audio`):
    synthesize a genuine PCM-16 WAV per document (sample count and sample
    values are closed-form functions of doc_id), decode it through the
    pure-Python RIFF/WAVE parser, and report exact signal statistics.
    The oracle computes the same table in closed form — a hash match
    proves every sample was recovered."""
    import pandas as pd

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from database_transportor_spark.operators.multimodal import (
        decode_audio, encode_wav)

    # documents.parquet is ONE file ⇒ one scan partition: without the
    # repartition the whole Python synth+decode chain below runs in a
    # single task (the mjpeg_frames/_m4a_fixture discipline)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("content", BinaryType())])

    def make_wav(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 500 + d % 300
                s = (((np.arange(n, dtype=np.int64) * 37 + d) % 251) - 125
                     ).astype(np.int16)
                out.append(encode_wav(s, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": pd.Series(out, dtype="object")})

    media = docs.mapInPandas(make_wav, schema)
    return decode_audio(media, "doc_id", "content")


SQL_AUDIO_DECODE = """
WITH sig AS (
  SELECT d.doc_id, 500 + d.doc_id % 300 AS n,
         ((i * 37 + d.doc_id) % 251) - 125 AS s
  FROM documents d, UNNEST(range(0, 800)) AS r(i)
  WHERE i < 500 + d.doc_id % 300
)
SELECT doc_id,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
       CAST(max(abs(s)) AS BIGINT) AS peak,
       CAST(sum(s) AS BIGINT) AS sum_samples,
       CAST(sum(s * s) AS BIGINT) AS sum_squares
FROM sig
GROUP BY doc_id, n
"""


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document (`operators/
    text.py:char_entropy`): the gibberish/boilerplate quality signal.
    One (id, char) count shuffle from exact integer counts; the oracle
    recomputes −Σ p·log2 p from the same counts."""
    from database_transportor_spark.operators.text import char_entropy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    return char_entropy(docs).select("doc_id", "char_entropy")


SQL_CHAR_ENTROPY = """
WITH ch AS (
  SELECT doc_id, substring(text, i + 1, 1) AS c
  FROM documents, UNNEST(range(0, 1024)) AS r(i)
  WHERE i < length(text)
), counts AS (
  SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c
), agg AS (
  SELECT doc_id, sum(n) AS total, sum(n * log2(n)) AS nlogn
  FROM counts GROUP BY doc_id
)
SELECT d.doc_id,
       round(log2(a.total) - a.nlogn / a.total, 6) AS char_entropy
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing weights at T=2 (`operators/
    corpus.py:temperature_weights`): one count aggregation over the
    corpus, then domain-count-sized arithmetic; `weight` feeds straight
    into `upsample_domains`."""
    from database_transportor_spark.operators.corpus import (
        temperature_weights)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return temperature_weights(docs, "source", temperature=2.0)


SQL_TEMPERATURE_MIX = """
WITH c AS (
  SELECT source AS domain, count(*) AS n_docs FROM documents GROUP BY 1
), t AS (
  SELECT domain, n_docs,
         CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () AS share,
         pow(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 0.5) AS raw
  FROM c
)
SELECT domain, CAST(n_docs AS BIGINT) AS n_docs,
       round(share, 6) AS share,
       round(raw / sum(raw) OVER (), 6) AS q,
       round(raw / sum(raw) OVER () / share, 6) AS weight
FROM t
"""


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document first-occurrence dedup (`operators/text.py:
    dedup_lines`) applied at word granularity (the fixture docs are
    single-line): every repeated token after its first occurrence is
    dropped, order preserved, zero shuffle.  Oracle: DuckDB's indexed
    list lambda recomputes the same first-occurrence filter."""
    from database_transportor_spark.operators.text import dedup_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    out = dedup_lines(docs, "text", sep=" ", out_col="deduped")
    return out.select("doc_id", "deduped", "n_lines_removed")


SQL_DEDUP_LINES = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)
SELECT doc_id,
       array_to_string(
         list_filter(arr, (x, i) ->
           coalesce(list_position(arr[1:i-1], x), 0) = 0), ' ')
         AS deduped,
       CAST(len(arr) - len(list_filter(arr, (x, i) ->
           coalesce(list_position(arr[1:i-1], x), 0) = 0)) AS BIGINT)
         AS n_lines_removed
FROM t
"""


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animation frame sampling (`operators/multimodal.py:
    decode_video_frames`): synthesize a genuine APNG per document
    (frame count, dims, and pixels are closed-form in doc_id), extract
    every frame through the acTL/fcTL/fdAT chunk walk + PNG
    reconstruction, and report exact per-frame stats.  The oracle
    recomputes the table in pure SQL — a hash match proves every frame
    byte was recovered."""
    import pandas as pd

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from database_transportor_spark.operators.multimodal import (
        decode_video_frames, encode_apng)

    # documents.parquet is ONE file ⇒ one scan partition: without the
    # repartition the whole Python synth+decode chain below runs in a
    # single task (the mjpeg_frames/_m4a_fixture discipline)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("content", BinaryType())])

    def make_apng(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                h, w, ch = 4 + d % 5, 3 + d % 4, 1 + d % 3
                nf = 2 + d % 3
                frames = [
                    ((np.arange(h * w * ch, dtype=np.int64) * 37 + d
                      + f * 101) % 251).astype(np.uint8).reshape(h, w, ch)
                    for f in range(nf)
                ]
                out.append(encode_apng(
                    frames, delays=[(f + 1, 100) for f in range(nf)]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": pd.Series(out, dtype="object")})

    media = docs.mapInPandas(make_apng, schema)
    return decode_video_frames(media, "doc_id", "content")


SQL_VIDEO_FRAMES = """
WITH dims AS (
  SELECT doc_id, 3 + doc_id % 4 AS w, 4 + doc_id % 5 AS h,
         1 + doc_id % 3 AS ch, 2 + doc_id % 3 AS nf
  FROM documents
), fr AS (
  SELECT d.*, f FROM dims d, UNNEST(range(0, 4)) AS r(f) WHERE f < d.nf
)
SELECT fr.doc_id, CAST(f AS BIGINT) AS frame_idx,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(ch AS BIGINT) AS channels,
       CAST(f + 1 AS BIGINT) AS delay_num,
       CAST(100 AS BIGINT) AS delay_den,
       CAST(sum((i * 37 + fr.doc_id + f * 101) % 251) AS BIGINT)
         AS pixel_sum
FROM fr, UNNEST(range(0, 144)) AS rr(i)
WHERE i < fr.h * fr.w * fr.ch
GROUP BY fr.doc_id, f, w, h, ch
"""


def q_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-WORLD video container demux (`operators/multimodal.py:
    decode_avi` + `decode_video_frames`): synthesize a genuine AVI RIFF
    file per document — PNG-compressed frames under the real `MPNG`
    handler, `avih`/`strh`/`strf` headers, `movi` chunk list, `idx1`
    index — then demux the container, decode every PNG frame payload,
    and report exact per-frame stats with stream-timing delays
    (dwScale/dwRate).  The oracle recomputes the table in pure SQL —
    a hash match proves the chunk walk recovered every frame byte AND
    the header timing survived the round trip."""
    import pandas as pd

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from database_transportor_spark.operators.multimodal import (
        decode_video_frames, encode_avi, encode_png)

    # documents.parquet is ONE file ⇒ one scan partition: without the
    # repartition the whole Python synth+decode chain below runs in a
    # single task (the mjpeg_frames/_m4a_fixture discipline)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("content", BinaryType())])

    def make_avi(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                h, w, ch = 3 + d % 4, 2 + d % 3, 1 + d % 3
                nf, fps = 2 + d % 2, 12 + d % 5
                payloads = [
                    encode_png(
                        ((np.arange(h * w * ch, dtype=np.int64) * 41 + d
                          + f * 89) % 247).astype(np.uint8).reshape(h, w, ch))
                    for f in range(nf)
                ]
                out.append(encode_avi(payloads, width=w, height=h,
                                      fps_num=fps, fps_den=1, codec=b"MPNG"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": pd.Series(out, dtype="object")})

    media = docs.mapInPandas(make_avi, schema)
    return decode_video_frames(media, "doc_id", "content")


SQL_AVI_FRAMES = """
WITH dims AS (
  SELECT doc_id, 2 + doc_id % 3 AS w, 3 + doc_id % 4 AS h,
         1 + doc_id % 3 AS ch, 2 + doc_id % 2 AS nf,
         12 + doc_id % 5 AS fps
  FROM documents
), fr AS (
  SELECT d.*, f FROM dims d, UNNEST(range(0, 3)) AS r(f) WHERE f < d.nf
)
SELECT fr.doc_id, CAST(f AS BIGINT) AS frame_idx,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(ch AS BIGINT) AS channels,
       CAST(1 AS BIGINT) AS delay_num,
       CAST(fps AS BIGINT) AS delay_den,
       CAST(sum((i * 41 + fr.doc_id + f * 89) % 247) AS BIGINT)
         AS pixel_sum
FROM fr, UNNEST(range(0, 72)) AS rr(i)
WHERE i < fr.h * fr.w * fr.ch
GROUP BY fr.doc_id, f, w, h, ch, fps
"""


def q_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MJPEG-in-AVI with REAL scan decode (`operators/jpeg.py` +
    `multimodal.decode_video_frames`): synthesize constant-color baseline
    JPEG frames (actual DCT/Huffman/JFIF bytes via `encode_jpeg`), pack
    them into a genuine AVI RIFF container under the `MJPG` handler, and
    demux + entropy-decode every frame.  Constant blocks quantize to a
    lone DC coefficient and reconstruct EXACTLY, so the oracle computes
    `pixel_sum = w*h*ch*value` in closed form — a hash match proves the
    Huffman decode, dequantize, IDCT, and color path recovered every
    pixel (round-6 verdict #5: the last fake-decode tier, closed)."""
    import pandas as pd

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from database_transportor_spark.operators.jpeg import encode_jpeg
    from database_transportor_spark.operators.multimodal import (
        decode_video_frames, encode_avi)

    # the codec work is CPU-per-row: spread it across the cluster width
    # (documents.parquet is one file — an unrepartitioned mapInPandas
    # would run the whole encode+decode on a single core)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("content", BinaryType())])

    def make_avi(batches):
        import numpy as np

        memo: dict = {}  # fixture-build cost only — the (w,h,ch,value)
        # space is tiny and constant frames repeat across docs; the
        # DECODE under test still runs per frame, nothing is memoized
        # on the read side

        def jpg(w, h, ch, val):
            k = (w, h, ch, val)
            if k not in memo:
                memo[k] = encode_jpeg(
                    np.full((h, w, ch), val, dtype=np.uint8), quality=90,
                    subsampling="4:2:0" if ch == 3 else "4:4:4",
                )
            return memo[k]

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h, ch = 6 + d % 5, 4 + d % 3, 1 + 2 * (d % 2)
                nf, fps = 2 + d % 2, 9 + d % 4
                payloads = [jpg(w, h, ch, (37 * d + 89 * f) % 256)
                            for f in range(nf)]
                out.append(encode_avi(payloads, width=w, height=h,
                                      fps_num=fps, fps_den=1, codec=b"MJPG"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": pd.Series(out, dtype="object")})

    media = docs.mapInPandas(make_avi, schema)
    return decode_video_frames(media, "doc_id", "content")


SQL_MJPEG_FRAMES = """
WITH dims AS (
  SELECT doc_id, 6 + doc_id % 5 AS w, 4 + doc_id % 3 AS h,
         1 + 2 * (doc_id % 2) AS ch, 2 + doc_id % 2 AS nf,
         9 + doc_id % 4 AS fps
  FROM documents
), fr AS (
  SELECT d.*, f FROM dims d, UNNEST(range(0, 3)) AS r(f) WHERE f < d.nf
)
SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(ch AS BIGINT) AS channels,
       CAST(1 AS BIGINT) AS delay_num,
       CAST(fps AS BIGINT) AS delay_den,
       CAST(w * h * ch * ((37 * doc_id + 89 * f) % 256) AS BIGINT)
         AS pixel_sum
FROM fr
"""


def q_mp4_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4/ISO-BMFF demux tier (round 8, `multimodal.encode_mp4`/
    `decode_mp4`): synthesize a genuine MP4 per document — ftyp + mdat
    + a full moov sample table (stsd/stts/stsc/stsz/stco) holding
    constant-color baseline JPEG samples with VARYING per-sample stts
    deltas, one sample per chunk (exercises the stsc/stco expansion) —
    then demux by walking the sample table to absolute mdat offsets and
    entropy-decode every JPEG payload.  pixel_sum = w*h*ch*value in
    closed form (constant blocks reconstruct exactly); delay is the
    stts delta over the mdhd timescale, both data-dependent, so a hash
    match proves the chunk map, the timing table, AND the scan decode."""
    import pandas as pd

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from database_transportor_spark.operators.jpeg import encode_jpeg
    from database_transportor_spark.operators.multimodal import (
        decode_video_frames, encode_mp4)

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("content", BinaryType())])

    def make_mp4(batches):
        import numpy as np

        memo: dict = {}  # fixture-build cost only, as in q_mjpeg_frames

        def jpg(w, h, ch, val):
            k = (w, h, ch, val)
            if k not in memo:
                memo[k] = encode_jpeg(
                    np.full((h, w, ch), val, dtype=np.uint8), quality=90,
                    subsampling="4:2:0" if ch == 3 else "4:4:4",
                )
            return memo[k]

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h, ch = 5 + d % 4, 4 + d % 3, 1 + 2 * (d % 2)
                nf, ts = 2 + d % 2, 500 + d % 7
                out.append(encode_mp4(
                    [jpg(w, h, ch, (41 * d + 97 * f) % 256)
                     for f in range(nf)],
                    width=w, height=h, timescale=ts,
                    sample_deltas=[100 + 50 * f for f in range(nf)],
                    samples_per_chunk=1))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": pd.Series(out, dtype="object")})

    media = docs.mapInPandas(make_mp4, schema)
    return decode_video_frames(media, "doc_id", "content")


SQL_MP4_FRAMES = """
WITH dims AS (
  SELECT doc_id, 5 + doc_id % 4 AS w, 4 + doc_id % 3 AS h,
         1 + 2 * (doc_id % 2) AS ch, 2 + doc_id % 2 AS nf,
         500 + doc_id % 7 AS ts
  FROM documents
), fr AS (
  SELECT d.*, f FROM dims d, UNNEST(range(0, 3)) AS r(f) WHERE f < d.nf
)
SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(ch AS BIGINT) AS channels,
       CAST(100 + 50 * f AS BIGINT) AS delay_num,
       CAST(ts AS BIGINT) AS delay_den,
       CAST(w * h * ch * ((41 * doc_id + 97 * f) % 256) AS BIGINT)
         AS pixel_sum
FROM fr
"""


def q_lang_quality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure spec data (round-7 discipline): a text-quality stage composed
    with a relational agg through the declarative planner — no DataFrame
    code.  Integer-exact: quality ∈ {0,⅓,⅔,1} aggregates as
    sum(round(q·3))."""
    maps = {"lang_mix": {
        "original_table": "documents",
        "columns": {"doc_id": "doc_id", "lang": "lang", "text": "text"},
        "post_ops": [
            {"op": "quality_score", "text_col": "text"},
            {"op": "agg", "group_by": ["lang"],
             "aggs": ["count(*) AS n_docs",
                      "cast(sum(round(quality * 3)) as bigint)"
                      " AS quality_points"]},
        ],
    }}
    return _run(spark, sf_dir, maps, "lang_mix")


SQL_LANG_QUALITY_MIX = r"""
WITH t AS (
    SELECT lang,
           length(text) AS n_chars,
           len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens,
           string_split_regex(trim(lower(text)), '\s+') AS toks
    FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN n_chars BETWEEN 50 AND 10000 THEN 1 ELSE 0 END
            + CASE WHEN n_chars / greatest(n_tokens, 1)
                   BETWEEN 3.0 AND 12.0 THEN 1 ELSE 0 END
            + CASE WHEN len(list_intersect(toks,
                  ['the','a','and','of','to','in','is','it','that','for']))
                   > 0 THEN 1 ELSE 0 END) AS BIGINT) AS quality_points
FROM t GROUP BY lang
"""


def q_status_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative wide pivot as spec data: one conditional-agg shuffle
    (see `operators/rollup.py:pivot_table` — never Spark's two-exchange
    native pivot), categories pinned by the spec's `values` list."""
    maps = {"status_pivot": {
        "original_table": "orders",
        "columns": {"status": "o_orderstatus",
                    "priority": "o_orderpriority"},
        "post_ops": [
            {"op": "pivot", "group_cols": ["status"],
             "pivot_col": "priority",
             "values": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                        "4-NOT SPECIFIED", "5-LOW"],
             "agg": "count"},
        ],
    }}
    return _run(spark, sf_dir, maps, "status_pivot")


SQL_STATUS_PRIORITY_PIVOT = """
SELECT o_orderstatus AS status,
       count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS "1-URGENT",
       count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS "2-HIGH",
       count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS "3-MEDIUM",
       count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
         AS "4-NOT SPECIFIED",
       count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS "5-LOW"
FROM orders GROUP BY o_orderstatus
"""


def q_source_lang_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-2 languages by document count — agg + partitioned
    window_rank, both as spec stages (deterministic tiebreak on lang)."""
    maps = {"src_rank": {
        "original_table": "documents",
        "columns": {"source": "source", "lang": "lang"},
        "post_ops": [
            {"op": "agg", "group_by": ["source", "lang"],
             "aggs": ["count(*) AS n_docs"]},
            {"op": "window_rank", "partition_by": ["source"],
             "order_by": ["n_docs desc", "lang asc"], "rank_col": "rank",
             "method": "row_number", "top": 2},
        ],
    }}
    return _run(spark, sf_dir, maps, "src_rank")


SQL_SOURCE_LANG_RANK = """
WITH c AS (
    SELECT source, lang, count(*) AS n_docs FROM documents GROUP BY 1, 2
), r AS (
    SELECT *, row_number() OVER (PARTITION BY source
                                 ORDER BY n_docs DESC, lang) AS rank
    FROM c
)
SELECT source, lang, n_docs, rank FROM r WHERE rank <= 2
"""


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE: train 60 merges on the corpus word-frequency dict
    (`operators/text.py:train_bpe`), encode every document distributed
    (`bpe_encode`, Arrow-batched with per-batch word memoization).
    ORACLE CONTRACT (BPE itself is iterative and not SQL-expressible):
    BPE segmentation is lossless, so concatenating each document's
    tokens and mapping `</w>`→space must rebuild the whitespace-
    normalized lowercased text exactly — the oracle computes that
    normalization directly; a hash match proves the distributed encode
    corrupted no character of any document.  Token-count invariants and
    merge-table exactness are pinned separately in tests/test_bpe.py."""
    from database_transportor_spark.operators.text import (bpe_encode,
                                                           train_bpe)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    merges = train_bpe(docs, "text", num_merges=60)
    enc = bpe_encode(docs, "text", merges)
    return enc.select(
        "doc_id",
        F.md5(
            F.rtrim(
                F.regexp_replace(
                    F.array_join(F.col("bpe_tokens"), ""), "</w>", " "
                )
            )
        ).alias("rebuilt_md5"),
    )


SQL_BPE_TOKENS = r"""
SELECT doc_id,
       md5(rtrim(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')))
         AS rebuilt_md5
FROM documents
"""


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed random projection 64→8 dims (`operators/similarity.py:
    random_projection`): zero-shuffle JL sketch whose projection matrix
    is a Knuth-multiplicative hash, with components quantized to exact
    integers so the signed sums are order-independent.  Oracle recomputes
    every projected component in pure SQL."""
    from database_transportor_spark.operators.similarity import (
        random_projection)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = random_projection(emb, "embedding", out_dim=8, seed=7)
    return out.select(
        "vec_id", F.posexplode("proj").alias("dim_idx", "proj")
    ).select("vec_id", F.col("dim_idx").cast("long").alias("dim_idx"), "proj")


SQL_RANDOM_PROJECTION = """
WITH v AS (
  SELECT vec_id, k,
         CAST(round(CAST(embedding[k + 1] AS DOUBLE) * 1000000) AS BIGINT)
           AS vi
  FROM embeddings, UNNEST(range(0, 64)) AS r(k)
)
SELECT vec_id, CAST(j AS BIGINT) AS dim_idx,
       CAST(sum(vi * (CASE WHEN
             (((j + 8) * 2654435761 % 4294967296)
              + 1 - ((j + 8) * 2654435761 % 4294967296 % 2))
             * (k + 1) % 4294967296 // 65536 % 2 = 0
                           THEN 1 ELSE -1 END)) AS BIGINT) AS proj
FROM v, UNNEST(range(0, 8)) AS r(j)
GROUP BY vec_id, j
"""


def q_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated p50/p90/p99 of order totals per priority
    (`operators/sketches.py:grouped_percentiles`) — one sort-based
    aggregate; Spark `percentile` and DuckDB `quantile_cont` share the
    interpolation rule (round(6) absorbs the ulp)."""
    from database_transportor_spark.operators.sketches import (
        grouped_percentiles)

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = grouped_percentiles(o, ["o_orderpriority"], "o_totalprice",
                              [0.5, 0.9, 0.99])
    return out.select(
        "o_orderpriority",
        F.round(F.col("percentiles")[0], 6).alias("p50"),
        F.round(F.col("percentiles")[1], 6).alias("p90"),
        F.round(F.col("percentiles")[2], 6).alias("p99"),
    )


SQL_GROUPED_PERCENTILES = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 6) AS p99
FROM orders GROUP BY 1
"""


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize end-to-end (`operators/multimodal.py:
    resize_image`, non-PIL PNG tier): synthesize a genuine PNG per
    document, decode + nearest-neighbor resample to 4×3 through the
    pure-Python codec, and report the exact byte sum of the resized
    payload.  The oracle recomputes the nearest-neighbor index math in
    closed form — a hash match proves decode AND resample."""
    import pandas as pd

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from database_transportor_spark.operators.multimodal import (
        encode_png, resize_image)

    # documents.parquet is ONE file ⇒ one scan partition: without the
    # repartition the whole Python synth+decode chain below runs in a
    # single task (the mjpeg_frames/_m4a_fixture discipline)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("content", BinaryType())])

    def make_png(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                h, w, ch = 6 + d % 5, 5 + d % 4, 1 + d % 3
                arr = ((np.arange(h * w * ch, dtype=np.int64) * 37 + d)
                       % 251).astype(np.uint8).reshape(h, w, ch)
                out.append(encode_png(arr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": pd.Series(out, dtype="object")})

    media = docs.mapInPandas(make_png, schema)
    resized = resize_image(media, "doc_id", "content",
                           target_width=4, target_height=3)
    return resized.select(
        "doc_id",
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), (F.length(F.hex("content")) / 2).cast("int")),
                lambda i: F.conv(
                    F.substring(F.hex("content"), (i * 2 - 1).cast("int"), 2),
                    16, 10,
                ).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("byte_sum"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


SQL_IMAGE_RESIZE = """
WITH dims AS (
  SELECT doc_id, 5 + doc_id % 4 AS w, 6 + doc_id % 5 AS h,
         1 + doc_id % 3 AS ch
  FROM documents
), idx AS (
  -- nearest-neighbor sample grid: ys = (y*h)//3, xs = (x*w)//4
  SELECT d.doc_id, d.w, d.h, d.ch,
         (y * d.h) // 3 AS sy, (x * d.w) // 4 AS sx, c
  FROM dims d,
       UNNEST(range(0, 3)) AS ry(y),
       UNNEST(range(0, 4)) AS rx(x),
       UNNEST(range(0, 3)) AS rc(c)
  WHERE c < d.ch
)
SELECT doc_id,
       CAST(sum((((sy * w + sx) * ch + c) * 37 + doc_id) % 251) AS BIGINT)
         AS byte_sum,
       CAST(4 AS BIGINT) AS width,
       CAST(3 AS BIGINT) AS height
FROM idx
GROUP BY doc_id, w, h, ch
"""


def q_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node in/out degrees (`operators/graph.py:degrees`) over the
    customer→supplier trade graph — two partial-aggregated counts and a
    full-outer merge on the node id."""
    from database_transportor_spark.operators.graph import degrees

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select((F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"))
    )
    out = degrees(e)
    return out.select(
        "node",
        F.col("out_degree").cast("long").alias("out_degree"),
        F.col("in_degree").cast("long").alias("in_degree"),
    )


SQL_GRAPH_DEGREES = """
WITH e AS (
  SELECT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), outd AS (SELECT src AS node, count(*) AS out_degree FROM e GROUP BY 1),
ind AS (SELECT dst AS node, count(*) AS in_degree FROM e GROUP BY 1)
SELECT coalesce(outd.node, ind.node) AS node,
       CAST(coalesce(out_degree, 0) AS BIGINT) AS out_degree,
       CAST(coalesce(in_degree, 0) AS BIGINT) AS in_degree
FROM outd FULL OUTER JOIN ind ON outd.node = ind.node
"""


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count (`operators/graph.py:triangle_count`) over the
    part co-purchase graph (parts linked when bought in the same order),
    with degree orientation bounding every node's wedge fan-out by O(√m)
    — the hub-part guard a 100 TB co-occurrence graph needs.  Oracle: the
    textbook a<b<c triple-join over the same canonical edge set."""
    from database_transportor_spark.operators.graph import triangle_count

    lp = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey").distinct()
    )
    x, y = lp.alias("x"), lp.alias("y")
    edges = (
        x.join(y, (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
               & (F.col("x.l_partkey") < F.col("y.l_partkey")))
        .select(F.col("x.l_partkey").alias("src"),
                F.col("y.l_partkey").alias("dst"))
    )
    return triangle_count(edges, orient="degree")


SQL_TRIANGLE_COUNT = """
WITH lp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
  SELECT DISTINCT x.p AS a, y.p AS b
  FROM lp x JOIN lp y ON x.o = y.o AND x.p < y.p
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.b
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
"""


def q_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio frame features (`operators/multimodal.py:
    audio_frames`): real WAV decode then a 200-sample window hopping by
    100 — per-frame exact energy / zero-crossing / peak integers, one
    output row per frame (fan-out mapInPandas).  Oracle recomputes every
    frame in closed form over the same synthesized signal."""
    import pandas as pd

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from database_transportor_spark.operators.multimodal import (
        audio_frames, encode_wav)

    # documents.parquet is ONE file ⇒ one scan partition: without the
    # repartition the whole Python synth+decode chain below runs in a
    # single task (the mjpeg_frames/_m4a_fixture discipline)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("content", BinaryType())])

    def make_wav(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 500 + d % 300
                s = (((np.arange(n, dtype=np.int64) * 37 + d) % 251) - 125
                     ).astype(np.int16)
                out.append(encode_wav(s, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": pd.Series(out, dtype="object")})

    media = docs.mapInPandas(make_wav, schema)
    return audio_frames(media, "doc_id", "content", frame_len=200, hop=100)


SQL_AUDIO_FRAMES = """
WITH sig AS (
  SELECT d.doc_id, 500 + d.doc_id % 300 AS len, i,
         ((i * 37 + d.doc_id) % 251) - 125 AS s
  FROM documents d, UNNEST(range(0, 800)) AS r(i)
  WHERE i < 500 + d.doc_id % 300
), sig2 AS (
  SELECT *, lead(s) OVER (PARTITION BY doc_id ORDER BY i) AS s_next
  FROM sig
), fr AS (SELECT f FROM UNNEST(range(0, 8)) AS t(f))
SELECT s.doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(f * 100 AS BIGINT) AS frame_start,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(s.s * s.s) AS BIGINT) AS energy,
       CAST(sum(CASE WHEN s.i < f * 100 + 199 AND s.i < s.len - 1
                      AND s.s * s.s_next < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS zero_crossings,
       CAST(max(abs(s.s)) AS BIGINT) AS peak
FROM sig2 s JOIN fr ON s.i >= f * 100 AND s.i < f * 100 + 200
WHERE f * 100 < s.len
GROUP BY s.doc_id, f
"""


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.streaming.events import tumbling_agg

    events = _read_events(spark, sf_dir)
    return tumbling_agg(events, "ts", "event_type", "1 hour").select(
        "window_start", "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value", "min_value", "max_value",
    )


SQL_EVENTS_WINDOW = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY 1, 2
"""


def q_events_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from database_transportor_spark.streaming.events import stream_tumbling_agg

    out = stream_tumbling_agg(
        spark,
        f"{sf_dir}/events.parquet",
        sink_table=f"swa_{uuid.uuid4().hex[:8]}",
        # fixture-sized state-store count: a handful of stateful keys
        # per micro-batch makes 32 state partitions pure fixed cost
        state_partitions=8,
    )
    return out.select(
        "window_start", "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value", "min_value", "max_value",
    )


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.streaming.events import sliding_agg

    events = _read_events(spark, sf_dir)
    return sliding_agg(events, "ts", "event_type", "2 hours", "1 hour").select(
        "window_start", "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value", "min_value", "max_value",
    )


SQL_EVENTS_SLIDING = """
SELECT ws AS window_start, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events,
     UNNEST([date_trunc('hour', ts),
             date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS u(ws)
GROUP BY 1, 2
"""


def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.streaming.events import session_agg

    events = _read_events(spark, sf_dir)
    return session_agg(events, "ts", "event_type", "10 minutes").select(
        "session_start", "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value", "min_value", "max_value",
    )


SQL_EVENTS_SESSION = """
WITH o AS (
    SELECT event_type, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTES
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts)
), g AS (
    SELECT *, SUM(new_s) OVER (PARTITION BY event_type ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM o
)
SELECT min(ts) AS session_start, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM g GROUP BY event_type, sid
"""


def q_events_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from database_transportor_spark.streaming.events import stream_stateful_totals

    return stream_stateful_totals(
        spark,
        f"{sf_dir}/events.parquet",
        sink_table=f"sst_{uuid.uuid4().hex[:8]}",
        # fixture-sized state-store count: a handful of stateful keys
        # per micro-batch makes 32 state partitions pure fixed cost
        state_partitions=8,
    )


SQL_EVENTS_STATEFUL = """
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.text import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_count(docs, "text").select(
        "doc_id", F.col("n_subwords").cast("long").alias("n_subwords")
    )


SQL_TOKEN_COUNT = r"""
-- DuckDB RE2 has no lookarounds; a letter->digit (or digit->letter)
-- transition adds exactly one split, and the length-2 transition patterns
-- cannot self-overlap, so counting them separately equals Spark's
-- lookaround split count.
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+'))
       + len(regexp_extract_all(text, '[a-zA-Z][0-9]'))
       + len(regexp_extract_all(text, '[0-9][a-zA-Z]')) AS n_subwords
FROM documents
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.text import repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_stats(docs, "doc_id", "text").select(
        "doc_id", "dup_token_fraction", "top_bigram_fraction"
    )


SQL_REPETITION_STATS = r"""
WITH t AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
    FROM documents
), base AS (
    SELECT doc_id,
           CASE WHEN len(toks) > 0
                THEN 1.0 - len(list_distinct(toks)) / len(toks)
                ELSE 0.0 END AS dup_token_fraction,
           CASE WHEN len(toks) >= 2
                THEN list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i+1])
                ELSE [] END AS bgs
    FROM t
), ex AS (
    SELECT doc_id, unnest(bgs) AS bg FROM base
), counts AS (
    SELECT doc_id, bg, count(*) AS c FROM ex GROUP BY 1, 2
), top AS (
    SELECT doc_id, max(c) / sum(c) AS top_bigram_fraction
    FROM counts GROUP BY doc_id
)
SELECT b.doc_id, b.dup_token_fraction,
       COALESCE(t.top_bigram_fraction, 0.0) AS top_bigram_fraction
FROM base b LEFT JOIN top t ON t.doc_id = b.doc_id
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quality_score(docs, "text").select("doc_id", "quality")


SQL_QUALITY_SCORE = r"""
WITH t AS (
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split_regex(trim(lower(text)), '\s+')) AS n_tokens,
           string_split_regex(trim(lower(text)), '\s+') AS toks
    FROM documents
)
SELECT doc_id,
       (CASE WHEN n_chars BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.0 END
        + CASE WHEN n_chars / greatest(n_tokens, 1) BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.0 END
        + CASE WHEN len(list_intersect(toks,
              ['the','a','and','of','to','in','is','it','that','for'])) > 0
          THEN 1.0 ELSE 0.0 END) / 3.0 AS quality
FROM t
"""


def q_events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from database_transportor_spark.streaming.events import stream_dedup_count

    return stream_dedup_count(
        spark,
        f"{sf_dir}/events.parquet",
        sink_table=f"sdd_{uuid.uuid4().hex[:8]}",
        # fixture-sized state-store count: a handful of stateful keys
        # per micro-batch makes 32 state partitions pure fixed cost
        state_partitions=8,
    )


SQL_EVENTS_STREAM_DEDUP = """
SELECT count(DISTINCT event_id % 1000) AS n_unique,
       count(DISTINCT event_id % 1000) AS n_keys
FROM events
"""


def q_events_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.streaming.events import topn_per_key

    events = _read_events(spark, sf_dir)
    out = topn_per_key(events, "event_type", "value", "event_id", n=5)
    return out.select(
        "event_id", "event_type", "value", F.col("rn").cast("long").alias("rn")
    )


SQL_EVENTS_TOPN = """
SELECT event_id, event_type, value, rn FROM (
    SELECT event_id, event_type, value,
           row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
    FROM events
) WHERE rn <= 5
"""


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus prep as ONE declarative spec: scan → redact → deterministic
    split → per-split sequence packing → drop the test split."""
    maps = {
        "prepped": {
            "original_table": "documents",
            "columns": {"doc_id": "doc_id", "text": "text", "n_chars": "n_chars"},
            "post_ops": [
                {"op": "redact_pii", "text_col": "text"},
                {"op": "split_assign", "id_col": "doc_id",
                 "weights": {"train": 0.9, "val": 0.05, "test": 0.05},
                 "hash_fn": "multiplicative"},
                {"op": "pack_sequences", "id_col": "doc_id",
                 "tokens_col": "n_chars", "budget": 2000,
                 "group_cols": ["split"]},
                {"op": "filter", "condition": "split <> 'test'"},
                {"op": "select",
                 "columns": ["doc_id", "split", "pack_id", "n_email"]},
            ],
        }
    }
    out = _run(spark, sf_dir, maps, "prepped")
    return out.select(
        "doc_id", "split", "pack_id", F.col("n_email").cast("long").alias("n_email")
    )


SQL_CORPUS_PIPELINE = r"""
WITH s AS (
    SELECT doc_id, n_chars,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
           CASE WHEN ((doc_id * 2654435761) % 4294967296) % 10000 < 9000 THEN 'train'
                WHEN ((doc_id * 2654435761) % 4294967296) % 10000 < 9500 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
), p AS (
    SELECT doc_id, split, n_email,
           split || '#' || CAST(CAST(FLOOR((sum(n_chars) OVER (
               PARTITION BY split ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars)
               / 2000) AS BIGINT) AS VARCHAR) AS pack_id
    FROM s
)
SELECT doc_id, split, pack_id, n_email FROM p WHERE split <> 'test'
"""


def q_events_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchases × prior views within 1 hour,
    per user), run to completion with availableNow; the oracle is the
    equivalent batch interval join."""
    from database_transportor_spark.streaming.events import stream_interval_join

    import uuid

    return stream_interval_join(
        spark, f"{sf_dir}/events.parquet",
        sink_table=f"sij_{uuid.uuid4().hex[:8]}",
        # fixture-sized state-store count: a handful of stateful keys
        # per micro-batch makes 32 state partitions pure fixed cost
        state_partitions=8,
    )


SQL_EVENTS_STREAM_JOIN = """
SELECT l.event_id AS l_id, r.event_id AS r_id,
       l.user_id AS l_key, l.value AS l_value, r.value AS r_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
JOIN (SELECT * FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id
 AND r.ts <= l.ts AND r.ts >= l.ts - INTERVAL 1 HOUR
"""


# ---------------------------------------------------------------------------
# Hypertable rollups and sketch aggregates
# ---------------------------------------------------------------------------

def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-level continuous aggregate computed by re-aggregating the hour
    level, which re-aggregates the minute level — NOT from raw events; the
    oracle aggregates raw events directly, so a hash match proves the
    merge hierarchy is exact."""
    from database_transportor_spark.operators.rollup import time_rollup

    events = _read_events(spark, sf_dir)
    levels = time_rollup(
        events, "ts", ["event_type"],
        {
            "n_events": ("count", None),
            "sum_value": ("sum", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
        ["1 minute", "1 hour", "1 day"],
    )
    day = levels["1 day"]
    return day.select(
        F.col("bucket_start").alias("day_start"), "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("sum_value", 2).alias("sum_value"),
        "min_value", "max_value",
    )


SQL_EVENTS_ROLLUP = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY 1, 2
"""


def q_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.sketches import grouped_median

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return grouped_median(li, ["l_returnflag"], "l_quantity")


SQL_GROUPED_MEDIAN = """
SELECT l_returnflag, median(l_quantity) AS median
FROM lineitem GROUP BY l_returnflag
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users per event type, oracle-checked via its accuracy
    contract: the hashed projection carries the exact distinct count plus a
    Spark-computed flag asserting the sketch landed within 5× the configured
    rsd; the DuckDB oracle emits the same exact count and a literal TRUE.
    Spark's HLL++ is deterministic for a fixed dataset, so the flag is
    stable run-to-run (tight-bound test in tests/test_sketches.py)."""
    from database_transportor_spark.operators.sketches import approx_distinct

    events = _read_events(spark, sf_dir)
    approx = approx_distinct(events, ["event_type"], "user_id", rsd=0.02)
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return approx.join(exact, "event_type").select(
        "event_type",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            <= F.col("exact_distinct") * (5 * 0.02)
        ).alias("approx_within_bound"),
    )


SQL_APPROX_DISTINCT = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       TRUE AS approx_within_bound
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Temporal joins: as-of (union + carry-forward) and range (bucketed)
# ---------------------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the most recent prior (or same-instant) view by
    the same user — classic event-attribution as-of join."""
    from database_transportor_spark.operators.temporal import asof_join

    events = _read_events(spark, sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # right side made unique per (user, ts) so both engines pick the same row
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = asof_join(purchases, views, "user_id", "ts")
    return out.select("event_id", "user_id", "value", "view_value")


SQL_ASOF_JOIN = """
SELECT p.event_id, p.user_id, p.value, v.view_value
FROM (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS view_value FROM events
                WHERE event_type = 'view' GROUP BY 1, 2) v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def q_asof_refer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of lookup as a declarative spec column THROUGH the engine:
    each purchase enriched with the latest prior view value, miss ⇒ -1."""
    events = _read_events(spark, sf_dir)
    maps = {
        "enriched": {
            "original_table": "purchases",
            "columns": {
                "event_id": "event_id",
                "user_id": "user_id",
                "value": "value",
                "last_view": {
                    "asof_refer": {
                        "search_table": "views",
                        "search_source": "original",
                        "on": "user_id",
                        "according_ts": "ts",
                        "search_ts": "ts",
                        "wanted_column": "value",
                    },
                    "default": -1.0,
                },
            },
        }
    }
    return _run(
        spark, sf_dir, maps, "enriched",
        extra_original={
            "purchases": events.filter(F.col("event_type") == "purchase"),
            "views": events.filter(F.col("event_type") == "view"),
        },
    )


SQL_ASOF_REFER = """
SELECT p.event_id, p.user_id, p.value,
       COALESCE(v.view_value, -1.0) AS last_view
FROM (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS view_value FROM events
                WHERE event_type = 'view' GROUP BY 1, 2) v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def q_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same as-of enrichment THROUGH the time-bucketed hot-key path
    (``bucket``): each key's timeline splits into aligned 6-hour buckets,
    per-bucket latest rows are carried across buckets, and the big sort is
    per (key, bucket) — so one pathological key can't pin a task to
    |L|+|R|.  Bucketing must be result-transparent, hence the oracle is
    the identical DuckDB ASOF JOIN."""
    events = _read_events(spark, sf_dir)
    maps = {
        "enriched": {
            "original_table": "purchases",
            "columns": {
                "event_id": "event_id",
                "user_id": "user_id",
                "value": "value",
                "last_view": {
                    "asof_refer": {
                        "search_table": "views",
                        "search_source": "original",
                        "on": "user_id",
                        "according_ts": "ts",
                        "search_ts": "ts",
                        "wanted_column": "value",
                        "bucket": "6 hours",
                    },
                    "default": -1.0,
                },
            },
        }
    }
    return _run(
        spark, sf_dir, maps, "enriched",
        extra_original={
            "purchases": events.filter(F.col("event_type") == "purchase"),
            "views": events.filter(F.col("event_type") == "view"),
        },
    )


SQL_ASOF_BUCKETED = SQL_ASOF_REFER


def q_refer_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The J1 refer through the declarative skew-salting lane: pinned hot
    keys spread over 8 reducers, the long tail joins plain, and the two
    lanes union.  Salting must be result-transparent, so the oracle is the
    plain LEFT JOIN."""
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
                        "salt": {"salts": 8, "hot_keys": [1, 2, 3, 5, 8]},
                    },
                    "default": "unknown",
                },
                "status": "o_orderstatus",
            },
        }
    }
    return _run(spark, sf_dir, maps, "enriched_orders")


SQL_REFER_SALTED = """
SELECT o.o_orderkey AS orderkey, o.o_custkey AS custkey,
       COALESCE(c.c_name, 'unknown') AS customer_name,
       o.o_orderstatus AS status
FROM orders o
LEFT JOIN customer c ON c.c_custkey = o.o_custkey
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events landing inside each user's first active hour — equi-key +
    interval containment via the bucketed range join."""
    from database_transportor_spark.operators.temporal import range_join

    events = _read_events(spark, sf_dir)
    intervals = events.groupBy("user_id").agg(
        F.min("ts").alias("lo"),
        (F.min("ts") + F.expr("INTERVAL 1 HOUR")).alias("hi"),
    )
    out = range_join(
        events.select("event_id", "user_id", "ts"),
        intervals, "user_id", "ts", "lo", "hi", bucket="900",
    )
    return out.select("event_id", "user_id", "lo")


SQL_RANGE_JOIN = """
WITH iv AS (
    SELECT user_id, min(ts) AS lo, min(ts) + INTERVAL 1 HOUR AS hi
    FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, iv.lo
FROM events e JOIN iv ON e.user_id = iv.user_id
WHERE iv.lo <= e.ts AND e.ts <= iv.hi
"""


# ---------------------------------------------------------------------------
# Corpus-level pipeline ops: decontamination, splits, sampling, packing, PII
# ---------------------------------------------------------------------------

# DuckDB mirror of ngram_shingle_hashes' word-3-gram sets (string-valued;
# hash equality == string equality for oracle purposes, as in ngram_jaccard).
_SQL_SHINGLES = """
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                                        i -> array_to_string(toks[i:i+2], ' '))) AS shingles
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
          FROM documents)
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.corpus import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    benchmark = docs.filter(F.col("doc_id") % 50 == 0)
    out = decontaminate(corpus, benchmark, "doc_id", "text", n=3, threshold=0.05)
    # Hash the contamination ratio as integral parts-per-million (integer
    # division on both engines) rather than a raw IEEE754 double, per the
    # numeric-parity policy in the module header.
    return out.select(
        "doc_id",
        F.col("doc_ngrams").cast("long").alias("doc_ngrams"),
        F.col("overlap_ngrams").cast("long").alias("overlap_ngrams"),
        F.expr(
            "CAST(overlap_ngrams AS BIGINT) * 1000000 div CAST(doc_ngrams AS BIGINT)"
        ).alias("contamination_ppm"),
    )


SQL_DECONTAMINATE = f"""
WITH sh AS ({_SQL_SHINGLES}),
bench AS (
    SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 50 = 0
), posting AS (
    SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 50 <> 0
), agg AS (
    SELECT p.doc_id,
           count(*) AS doc_ngrams,
           sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS overlap_ngrams
    FROM posting p LEFT JOIN bench b ON p.s = b.s
    GROUP BY p.doc_id
)
SELECT doc_id,
       CAST(doc_ngrams AS BIGINT) AS doc_ngrams,
       CAST(overlap_ngrams AS BIGINT) AS overlap_ngrams,
       CAST((overlap_ngrams * 1000000) // doc_ngrams AS BIGINT) AS contamination_ppm
FROM agg WHERE overlap_ngrams / doc_ngrams >= 0.05
"""


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.corpus import split_assign

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = split_assign(
        docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05},
        hash_fn="multiplicative",  # ANSI-SQL-portable for the oracle;
    )                              # production default is xxhash64
    return out.select("doc_id", "lang", "split")


SQL_SPLIT_ASSIGN = """
SELECT doc_id, lang,
       CASE WHEN ((doc_id * 2654435761) % 4294967296) % 10000 < 9000 THEN 'train'
            WHEN ((doc_id * 2654435761) % 4294967296) % 10000 < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.corpus import leakage_safe_split
    from database_transportor_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.05, max_df=100,
        min_partitions=spark.sparkContext.defaultParallelism,
    )
    clusters = dedup_clusters(docs, pairs, "doc_id")
    out = leakage_safe_split(
        docs, clusters, "doc_id", "cluster_id",
        {"train": 0.9, "val": 0.05, "test": 0.05}, hash_fn="multiplicative",
    )
    return out.select("doc_id", "cluster_id", "split")


SQL_LEAKAGE_SPLIT = f"""
WITH RECURSIVE sh AS ({_SQL_SHINGLES}),
ex0 AS (
    SELECT doc_id, unnest(shingles) AS s FROM sh
), hot AS (
    SELECT s FROM ex0 GROUP BY s HAVING count(*) > 100
), ex AS (
    SELECT doc_id, s FROM ex0 WHERE s NOT IN (SELECT s FROM hot)
), sizes AS (
    SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), pairs AS (
    SELECT i.id_a, i.id_b
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.i / (sa.n + sb.n - i.i) >= 0.05
), edges AS (
    SELECT id_a AS s, id_b AS d FROM pairs
    UNION ALL SELECT id_b, id_a FROM pairs
), reach AS (
    SELECT doc_id AS id, doc_id AS r FROM documents
    UNION
    SELECT e.d AS id, reach.r FROM reach JOIN edges e ON e.s = reach.id
), clusters AS (
    SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
)
SELECT doc_id, cluster_id,
       CASE WHEN ((cluster_id * 2654435761) % 4294967296) % 10000 < 9000 THEN 'train'
            WHEN ((cluster_id * 2654435761) % 4294967296) % 10000 < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM clusters
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.corpus import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_sample(
        docs, ["lang", "source"], k=5, id_col="doc_id", hash_fn="multiplicative"
    )
    return out.select("doc_id", "lang", "source")


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang, source FROM (
    SELECT doc_id, lang, source,
           row_number() OVER (
               PARTITION BY lang, source
               ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
           ) AS rn
    FROM documents
) WHERE rn <= 5
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.corpus import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pack_sequences(
        docs, "doc_id", "n_chars", budget=2000, group_cols=["lang"]
    )
    # Cast the running offset to long explicitly: DuckDB's windowed sum is
    # HUGEINT, which serializes (and hashes) differently from BIGINT.
    return out.select(
        "doc_id", "lang",
        F.col("pack_offset").cast("long").alias("pack_offset"),
        "pack_id",
    )


SQL_PACK_SEQUENCES = """
SELECT doc_id, lang,
       CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         - n_chars AS BIGINT) AS pack_offset,
       lang || '#' || CAST(CAST(FLOOR((sum(n_chars) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars)
           / 2000) AS BIGINT) AS VARCHAR) AS pack_id
FROM documents
"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from database_transportor_spark.operators.corpus import redact_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # Fixture text is synthetic lowercase prose with no PII; splice a
    # deterministic email + IP into every 5th document so the redaction
    # path has real matches to find.
    seeded = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"), F.lit(" contact user"),
                F.col("doc_id").cast("string"), F.lit("@example.com from 10.0.0."),
                (F.col("doc_id") % 250).cast("string"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    out = redact_pii(seeded, "text")
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.col("text").alias("redacted"),
    )


SQL_REDACT_PII = r"""
WITH seeded AS (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0
                THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                     || '@example.com from 10.0.0.' || CAST(doc_id % 250 AS VARCHAR)
                ELSE text END AS text
    FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
       len(regexp_extract_all(text, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS n_ipv4,
       len(regexp_extract_all(text, '\+\d[\d()\- ]{7,}\d')) AS n_phone,
       regexp_replace(regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IPV4>', 'g'),
           '\+\d[\d()\- ]{7,}\d', '<PHONE>', 'g') AS redacted
FROM seeded
"""


def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded epoch shuffle: shard + in-shard position via
    the ANSI-portable multiplicative hash, so the oracle reproduces the
    exact permutation (no global sort — per-shard windows)."""
    from database_transportor_spark.operators.corpus import corpus_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus_shuffle(docs, "doc_id", n_shards=8, seed=42,
                         hash_fn="multiplicative")
    return out.select(
        "doc_id",
        F.col("shard").cast("long").alias("shard"),
        F.col("shuffle_pos").cast("long").alias("shuffle_pos"),
    )


SQL_CORPUS_SHUFFLE = """
WITH keyed AS (
    SELECT doc_id,
           (doc_id * 2654435761 + 42) % 4294967296 AS skey
    FROM documents
)
SELECT doc_id,
       CAST(skey % 8 AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id)
            AS BIGINT) AS shuffle_pos
FROM keyed
"""


def q_upsample_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix rebalancing: src0 repeated 2.5x (half the ids get a 3rd
    copy, chosen by id-hash), src1 dropped, everything else kept 1x.
    Zero-shuffle explode; the oracle replays the multiplicative draw."""
    from database_transportor_spark.operators.corpus import upsample_domains

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = upsample_domains(
        docs, "source", {"src0": 2.5, "src1": 0.0}, "doc_id",
        salt=7, hash_fn="multiplicative",
    )
    return out.select(
        "doc_id", "source", F.col("copy_idx").cast("long").alias("copy_idx")
    )


SQL_UPSAMPLE_DOMAINS = """
WITH w AS (
    SELECT doc_id, source,
           CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.0
                ELSE 1.0 END AS wt,
           (doc_id * 2654435761 + 7) % 4294967296 AS draw
    FROM documents
), c AS (
    SELECT doc_id, source,
           CAST(floor(wt) AS BIGINT)
           + CASE WHEN draw < (wt - floor(wt)) * 4294967296 THEN 1 ELSE 0 END
             AS copies
    FROM w
)
SELECT doc_id, source, CAST(unnest(range(copies)) AS BIGINT) AS copy_idx
FROM c WHERE copies > 0
"""


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column.  floor-based
    codes are exact IEEE-double arithmetic, so DuckDB reproduces every
    code and the per-vector scale bit-for-bit."""
    from database_transportor_spark.operators.similarity import (
        quantize_embeddings,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return quantize_embeddings(emb, "embedding", id_col="vec_id")


SQL_QUANTIZE_EMBEDDINGS = """
WITH s AS (
    SELECT vec_id,
           list_max(list_transform(embedding,
                                   x -> abs(CAST(x AS DOUBLE)))) AS qscale,
           embedding
    FROM embeddings
)
SELECT vec_id, qscale,
       CASE WHEN qscale = 0
            THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
            ELSE list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / qscale)
                           AS BIGINT))
       END AS qvec
FROM s
"""


# ---------------------------------------------------------------------------
# Mutation operators: MERGE upsert + CDC apply (operators/mutations.py) —
# the "changed rows at the source" story the reference can only solve by a
# full reload (DBT.php:85-112).
# ---------------------------------------------------------------------------

def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE customer with a derived source: keys %7 carry an updated name
    (matched ⇒ replace), keys %13 re-enter shifted by +10M (not matched ⇒
    insert); everything else passes through.  Single-shuffle union+max_by."""
    from database_transportor_spark.operators.mutations import merge_upsert

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    updates = cust.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_name", F.concat(F.col("c_name"), F.lit("#UPD"))
    )
    inserts = cust.filter(F.col("c_custkey") % 13 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(10_000_000)
    )
    return merge_upsert(cust, updates.unionByName(inserts), "c_custkey")


SQL_MERGE_UPSERT = """
WITH base AS (
    SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer
), src AS (
    SELECT c_custkey, c_name || '#UPD' AS c_name, c_nationkey, c_acctbal
    FROM base WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal
    FROM base WHERE c_custkey % 13 = 0
), tagged AS (
    SELECT *, 0 AS pri FROM base
    UNION ALL
    SELECT *, 1 AS pri FROM src
)
SELECT c_custkey, c_name, c_nationkey, c_acctbal
FROM (SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY pri DESC) AS rn
      FROM tagged)
WHERE rn = 1
"""


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a synthetic CDC feed to orders: %5 keys get status 'X' (seq 1),
    %10 keys are then deleted (seq 2), %20 keys re-inserted with status 'Z'
    (seq 3) — per-key latest image wins, deletes drop the row."""
    from database_transportor_spark.operators.mutations import cdc_apply

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )

    def ch(mod: int, op: str, seq: int, status: str | None) -> DataFrame:
        df = orders.filter(F.col("o_orderkey") % mod == 0)
        if status is not None:
            df = df.withColumn("o_orderstatus", F.lit(status))
        return df.withColumn("op", F.lit(op)).withColumn(
            "seq", F.lit(seq).cast("long")
        )

    changes = (
        ch(5, "U", 1, "X").unionByName(ch(10, "D", 2, None)).unionByName(
            ch(20, "I", 3, "Z")
        )
    )
    return cdc_apply(orders, changes, "o_orderkey")


SQL_CDC_APPLY = """
WITH t AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority FROM orders
), changes AS (
    SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus, o_orderpriority,
           'U' AS op, 1 AS seq FROM t WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
           'D' AS op, 2 AS seq FROM t WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, 'Z' AS o_orderstatus, o_orderpriority,
           'I' AS op, 3 AS seq FROM t WHERE o_orderkey % 20 = 0
), latest AS (
    SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                                ORDER BY seq DESC) AS rn
                   FROM changes)
    WHERE rn = 1
)
SELECT COALESCE(c.o_orderkey, t.o_orderkey) AS o_orderkey,
       CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_custkey
            ELSE t.o_custkey END AS o_custkey,
       CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_orderstatus
            ELSE t.o_orderstatus END AS o_orderstatus,
       CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_orderpriority
            ELSE t.o_orderpriority END AS o_orderpriority
FROM t FULL OUTER JOIN latest c ON t.o_orderkey = c.o_orderkey
WHERE COALESCE(c.op, '') <> 'D'
"""


def q_stream_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE sink (streaming/merge_sink.py) run to completion
    with availableNow: a parquet feed stream upserts into a live target by
    key through ``foreachBatch`` + the catalog's staged swap.  Live = keys
    %3 != 0, feed = keys %2 == 0 with bumped balances — so the merged
    table exercises updates (overlap), inserts (feed-only keys), and
    pass-through (live-only keys).  The oracle is the equivalent batch
    MERGE; a hash match proves the streaming path lands the exact batch
    answer."""
    import tempfile
    import uuid

    from database_transportor_spark.sources.catalog import ParquetCatalog
    from database_transportor_spark.streaming.merge_sink import stream_merge_sink

    work = tempfile.mkdtemp(prefix=f"smq_{uuid.uuid4().hex[:8]}_")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    live = cust.filter(F.col("c_custkey") % 3 != 0)
    feed = cust.filter(F.col("c_custkey") % 2 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 1000, 2)
    )
    tgt = ParquetCatalog(spark, f"{work}/tgt")
    tgt.write(live, "sm", mode="overwrite")
    feed.coalesce(4).write.mode("overwrite").parquet(f"{work}/feed")
    stream_merge_sink(
        spark, f"{work}/feed", tgt, "sm", "c_custkey",
        checkpoint=f"{work}/ckpt",
    )
    # the returned frame lazily reads the merged target — the temp dir must
    # outlive this call (driver/bench collect it right after)
    return tgt.read("sm")


SQL_STREAM_MERGE = """
WITH base AS (
    SELECT c_custkey, c_name, c_acctbal FROM customer
), live AS (
    SELECT * FROM base WHERE c_custkey % 3 <> 0
), feed AS (
    SELECT c_custkey, c_name, round(c_acctbal + 1000, 2) AS c_acctbal
    FROM base WHERE c_custkey % 2 = 0
)
SELECT COALESCE(f.c_custkey, l.c_custkey) AS c_custkey,
       CASE WHEN f.c_custkey IS NOT NULL THEN f.c_name
            ELSE l.c_name END AS c_name,
       CASE WHEN f.c_custkey IS NOT NULL THEN f.c_acctbal
            ELSE l.c_acctbal END AS c_acctbal
FROM live l FULL OUTER JOIN feed f ON l.c_custkey = f.c_custkey
"""


# ---------------------------------------------------------------------------
# Event-sequence analytics: funnel + cohort retention (operators/funnel.py)
# ---------------------------------------------------------------------------

def q_build_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-500 corpus vocabulary (min_df 2): exact tf/df counts and a
    deterministic rank-assigned token_id."""
    from database_transportor_spark.operators.text import build_vocab

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_vocab(docs, "text", "doc_id", min_df=2, max_vocab=500)


SQL_BUILD_VOCAB = """
WITH toks AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
    FROM documents
), counts AS (
    SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
    FROM toks WHERE token <> '' GROUP BY token
    HAVING count(DISTINCT doc_id) >= 2
), top AS (
    SELECT * FROM counts ORDER BY tf DESC, token ASC LIMIT 500
)
SELECT CAST(row_number() OVER (ORDER BY tf DESC, token ASC) - 1 AS BIGINT)
         AS token_id,
       token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
FROM top
"""


def q_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents encoded against the top-500 (min_df 2) vocabulary; OOV
    tokens drop.  Position-exact id sequences."""
    from database_transportor_spark.operators.text import build_vocab, encode_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = build_vocab(docs, "text", "doc_id", min_df=2, max_vocab=500)
    return encode_tokens(docs, vocab, "text", "doc_id")


# the vocab SQL nests verbatim as a CTE body (a WITH inside a CTE is legal)
SQL_ENCODE_TOKENS = f"""
WITH top AS (
{SQL_BUILD_VOCAB}
), vm AS (
    SELECT MAP(list(token), list(token_id)) AS m FROM top
)
SELECT d.doc_id,
       list_filter(
           list_transform(string_split_regex(trim(lower(d.text)), '\\s+'),
                          t -> m[t][1]),
           x -> x IS NOT NULL) AS token_ids,
       CAST(len(list_filter(
           list_transform(string_split_regex(trim(lower(d.text)), '\\s+'),
                          t -> m[t][1]),
           x -> x IS NOT NULL)) AS BIGINT) AS n_encoded
FROM documents d, vm
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→click→purchase funnel, 7-day horizon — per-user earliest
    in-order stage times via a single-shuffle sorted-array fold."""
    from database_transportor_spark.operators.funnel import funnel

    ev = _read_events(spark, sf_dir)
    return funnel(
        ev, ["view", "click", "purchase"], horizon="INTERVAL 7 DAYS"
    )


SQL_FUNNEL = """
WITH s1 AS (
    SELECT user_id, min(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click'
      AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 7 DAY
    GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM events e
    JOIN s2 ON e.user_id = s2.user_id
    JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'purchase'
      AND e.ts > s2.t2 AND e.ts <= s1.t1 + INTERVAL 7 DAY
    GROUP BY e.user_id
)
SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
       CAST(1 + (CASE WHEN s2.t2 IS NOT NULL THEN 1 ELSE 0 END)
              + (CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS stages_completed
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


def q_funnel_declarative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME funnel routed through the declarative planner
    (`operators/post_ops.py`): a transport spec whose post_ops stage IS the
    funnel — proving the analytics tier participates in the reference-
    shaped declarative surface (VERDICT r3 #6), not just the Python API.
    Oracle: identical to `funnel`."""
    maps = {
        "funnel_tbl": {
            "original_table": "events_norm",
            "columns": {"user_id": "user_id", "ts": "ts",
                        "event_type": "event_type"},
            "post_ops": [
                {"op": "funnel",
                 "stages": ["view", "click", "purchase"],
                 "horizon": "INTERVAL 7 DAYS"},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "funnel_tbl",
                extra_original={"events_norm": _read_events(spark, sf_dir)})


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix with exact distinct-user counts."""
    from database_transportor_spark.operators.funnel import cohort_retention

    ev = _read_events(spark, sf_dir)
    return cohort_retention(ev, period="week").withColumnRenamed(
        "offset", "week_offset"
    )


SQL_COHORT_RETENTION = """
WITH first AS (
    -- DuckDB date_trunc('week') yields DATE; Spark yields TIMESTAMP — cast
    SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort
    FROM events GROUP BY user_id
), active AS (
    SELECT DISTINCT user_id,
           CAST(date_trunc('week', ts) AS TIMESTAMP) AS p FROM events
)
SELECT f.cohort,
       CAST(date_diff('day', f.cohort, a.p) / 7 AS BIGINT) AS week_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM active a JOIN first f ON a.user_id = f.user_id
GROUP BY 1, 2
"""


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension history of each user's event_type state: no-op
    changes collapsed, validity intervals from change ts to next change."""
    from database_transportor_spark.operators.temporal import build_scd2

    ev = _read_events(spark, sf_dir)
    return build_scd2(ev, "user_id", "ts", attr_cols=["event_type"])


SQL_SCD2 = """
WITH collapsed AS (
    SELECT user_id, ts, event_type FROM (
        SELECT user_id, ts, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events)
    WHERE prev IS NULL OR prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
FROM collapsed
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session assignment (30-minute inactivity gap)."""
    from database_transportor_spark.operators.funnel import sessionize

    ev = _read_events(spark, sf_dir).select("event_id", "user_id", "ts")
    return sessionize(ev, gap="30 minutes")


SQL_SESSIONIZE = """
WITH flagged AS (
    SELECT event_id, user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT event_id, user_id, ts,
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
         AS session_idx,
       CAST(user_id AS VARCHAR) || ':' ||
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) - 1 AS VARCHAR)
         AS session_id
FROM flagged
"""


def q_validate_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality report over lineitem: six rule kinds in one pass
    (row-level rules fold into a single scan), including the fixture's
    known duplicate (l_orderkey, l_linenumber) pairs and the 0.05+
    discounts as nonzero violation counts."""
    from database_transportor_spark.operators.validate import validate

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return validate(li, [
        {"rule": "not_null", "column": "l_orderkey"},
        {"rule": "range", "column": "l_discount", "min": 0.0, "max": 0.05},
        {"rule": "range", "column": "l_quantity", "min": 1.0, "max": 50.0},
        {"rule": "accepted_values", "column": "l_returnflag",
         "values": ["A", "N", "R"]},
        {"rule": "expression", "name": "price_nonneg",
         "sql": "l_extendedprice >= 0"},
        {"rule": "unique", "columns": ["l_orderkey", "l_linenumber"]},
        {"rule": "foreign_key", "column": "l_orderkey", "ref": orders,
         "ref_column": "o_orderkey"},
    ])


SQL_VALIDATE_RULES = """
SELECT 'not_null' AS rule, 'l_orderkey' AS target,
       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations
FROM lineitem
UNION ALL
SELECT 'range', 'l_discount',
       CAST(sum(CASE WHEN l_discount IS NOT NULL
                      AND (l_discount < 0.0 OR l_discount > 0.05)
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'range', 'l_quantity',
       CAST(sum(CASE WHEN l_quantity IS NOT NULL
                      AND (l_quantity < 1.0 OR l_quantity > 50.0)
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'accepted_values', 'l_returnflag',
       CAST(sum(CASE WHEN l_returnflag IS NOT NULL
                      AND l_returnflag NOT IN ('A', 'N', 'R')
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'expression', 'price_nonneg',
       CAST(sum(CASE WHEN NOT coalesce(l_extendedprice >= 0, FALSE)
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'unique', 'l_orderkey,l_linenumber',
       CAST(coalesce(sum(c - 1), 0) AS BIGINT)
FROM (SELECT count(*) AS c FROM lineitem
      GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
UNION ALL
SELECT 'foreign_key', 'l_orderkey',
       CAST((SELECT count(*) FROM lineitem l
             LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
               ON l.l_orderkey = o.o_orderkey
             WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL)
            AS BIGINT)
"""


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals with pinned bounds (the
    one-pass mode): width_bucket semantics replay exactly in DuckDB."""
    from database_transportor_spark.operators.maintenance import (
        column_histogram,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return column_histogram(
        orders, "o_totalprice", bins=8, lo=0.0, hi=600_000.0
    )


# DuckDB has no width_bucket; the oracle replays Spark's formula exactly:
# floor((v - lo) / ((hi - lo) / n)) + 1, clamped to 0 / n+1 outside
SQL_HISTOGRAM = """
WITH b AS (
    SELECT CAST(CASE WHEN v < 0.0 THEN 0
                     WHEN v >= 600000.0 THEN 9
                     ELSE FLOOR(v / 75000.0) + 1 END AS BIGINT) AS bucket
    FROM (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
          WHERE o_totalprice IS NOT NULL)
)
SELECT bucket, count(*) AS n,
       round(CAST((bucket - 1) * 75000.0 AS DOUBLE), 6) AS bucket_lo,
       round(CAST(bucket * 75000.0 AS DOUBLE), 6) AS bucket_hi
FROM b GROUP BY 1
"""


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column stats over orders (exact-distinct audit
    mode so the oracle can hash it; production default is HLL++)."""
    from database_transportor_spark.operators.maintenance import profile_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return profile_table(
        orders,
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
        exact_distinct=True,
    )


SQL_PROFILE_TABLE = """
SELECT 'o_orderkey' AS column, 'bigint' AS dtype,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(min(o_orderkey) AS VARCHAR) AS min_value,
       CAST(max(o_orderkey) AS VARCHAR) AS max_value
FROM orders
UNION ALL
SELECT 'o_custkey', 'bigint', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', 'string', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', 'string', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT),
       min(o_orderpriority), max(o_orderpriority)
FROM orders
"""


def q_diff_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Migration-parity diff: customer vs a derived 'migrated copy' with
    known edits — %11 keys renamed (changed), %13 keys dropped (removed),
    a shifted block inserted (added)."""
    from database_transportor_spark.operators.mutations import diff_tables

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    migrated = (
        cust.filter(F.col("c_custkey") % 13 != 0)
        .withColumn(
            "c_name",
            F.when(
                F.col("c_custkey") % 11 == 0,
                F.concat(F.col("c_name"), F.lit("~v2")),
            ).otherwise(F.col("c_name")),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 17 == 0).withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(20_000_000)
            )
        )
    )
    return diff_tables(cust, migrated, "c_custkey")


SQL_DIFF_TABLES = """
WITH base AS (
    SELECT c_custkey, c_name, c_mktsegment FROM customer
), migrated AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 11 = 0 THEN c_name || '~v2'
                ELSE c_name END AS c_name,
           c_mktsegment
    FROM base WHERE c_custkey % 13 != 0
    UNION ALL
    SELECT c_custkey + 20000000, c_name, c_mktsegment
    FROM base WHERE c_custkey % 17 = 0
), j AS (
    SELECT COALESCE(l.c_custkey, r.c_custkey) AS c_custkey,
           l.c_custkey IS NOT NULL AS in_l,
           r.c_custkey IS NOT NULL AS in_r,
           list_filter([
               CASE WHEN NOT (l.c_name IS NOT DISTINCT FROM r.c_name)
                    THEN 'c_name' END,
               CASE WHEN NOT (l.c_mktsegment IS NOT DISTINCT FROM r.c_mktsegment)
                    THEN 'c_mktsegment' END
           ], x -> x IS NOT NULL) AS cc
    FROM base l FULL OUTER JOIN migrated r ON l.c_custkey = r.c_custkey
)
SELECT c_custkey,
       CASE WHEN NOT in_l THEN 'added'
            WHEN NOT in_r THEN 'removed'
            ELSE 'changed' END AS change_type,
       CASE WHEN in_l AND in_r THEN cc ELSE [] END AS changed_cols
FROM j
WHERE NOT in_l OR NOT in_r OR len(cc) > 0
"""


def q_dedup_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END-GAME: cluster near-dups (same pair-gen parameters as
    q_leakage_split), then REMOVE rows keeping each cluster's best copy —
    quality = (n_chars, doc_id) lexicographically, so the winner is
    deterministic even among equal-length near-dups."""
    from database_transportor_spark.operators.dedup import (
        dedup_clusters,
        dedup_keep_best,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.05, max_df=100,
        min_partitions=spark.sparkContext.defaultParallelism,
    )
    clusters = dedup_clusters(docs, pairs, "doc_id")
    ranked = docs.withColumn(
        "__q", F.col("n_chars") * F.lit(10_000_000) + F.col("doc_id")
    )
    kept = dedup_keep_best(
        ranked, clusters, "doc_id", "cluster_id", order_col="__q", keep="max"
    )
    return kept.select("doc_id", "lang", "n_chars")


SQL_DEDUP_BEST = f"""
WITH RECURSIVE sh AS ({_SQL_SHINGLES}),
ex0 AS (
    SELECT doc_id, unnest(shingles) AS s FROM sh
), hot AS (
    SELECT s FROM ex0 GROUP BY s HAVING count(*) > 100
), ex AS (
    SELECT doc_id, s FROM ex0 WHERE s NOT IN (SELECT s FROM hot)
), sizes AS (
    SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), pairs AS (
    SELECT i.id_a, i.id_b
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.i / (sa.n + sb.n - i.i) >= 0.05
), edges AS (
    SELECT id_a AS s, id_b AS d FROM pairs
    UNION ALL SELECT id_b, id_a FROM pairs
), reach AS (
    SELECT doc_id AS id, doc_id AS r FROM documents
    UNION
    SELECT e.d AS id, reach.r FROM reach JOIN edges e ON e.s = reach.id
), clusters AS (
    SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
)
SELECT doc_id, lang, n_chars
FROM (
    SELECT d.doc_id, d.lang, d.n_chars,
           row_number() OVER (
               PARTITION BY c.cluster_id
               ORDER BY d.n_chars * 10000000 + d.doc_id DESC
           ) AS rn
    FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
)
WHERE rn = 1
"""


def q_zscore_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-based outlier gate: drop events whose value sits more
    than 2.5 population-sigma from its event_type's mean."""
    from database_transportor_spark.operators.corpus import zscore_filter

    events = _read_events(spark, sf_dir)
    out = zscore_filter(events, "value", ["event_type"], max_z=2.5)
    return out.select("event_id", "event_type", "value")


SQL_ZSCORE_GATE = """
WITH stats AS (
    SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sd
    FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value
FROM events e LEFT JOIN stats s ON e.event_type = s.event_type
WHERE e.value IS NULL OR s.sd IS NULL OR s.sd = 0
   OR abs(e.value - s.mu) / s.sd <= 2.5
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the events JSON payload (ONE from_json parse
    per row against the minimal schema — never per-field re-parses), with
    a per-type aggregate over the extracted value to prove the typing."""
    from database_transportor_spark.functions.json_cols import (
        json_extract_columns,
    )

    events = _read_events(spark, sf_dir)
    out = json_extract_columns(events, "props", {"k": "long"})
    return out.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
        .cast("long").alias("n_null_k"),
    )


SQL_JSON_EXTRACT = """
SELECT event_type,
       count(*) AS n,
       SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       SUM(CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 ELSE 0 END)
           AS n_null_k
FROM events
GROUP BY event_type
"""


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget domain mixing: cap en at 30k chars / de at 10k chars of
    expected kept volume, other langs pass through; kept set decided by a
    deterministic multiplicative id-hash so DuckDB can replay it exactly."""
    from database_transportor_spark.operators.corpus import sample_to_token_budget

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = sample_to_token_budget(
        docs, "lang", "n_chars", {"en": 30_000, "de": 10_000}, "doc_id",
        hash_fn="multiplicative",
    )
    return out.select("doc_id", "lang", "n_chars")


SQL_TOKEN_BUDGET = """
WITH totals AS (
    SELECT lang, SUM(n_chars) AS total FROM documents GROUP BY lang
), rates AS (
    SELECT lang,
           CASE WHEN lang = 'en' THEN LEAST(1.0, 30000.0 / total)
                WHEN lang = 'de' THEN LEAST(1.0, 10000.0 / total)
                ELSE 1.0 END AS r
    FROM totals
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d LEFT JOIN rates t ON d.lang = t.lang
WHERE ((d.doc_id * 2654435761) % 4294967296) % 1000000
      < COALESCE(t.r, 1.0) * 1000000
"""


def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms with exact corpus counts; ranking
    key is the 6-decimal-rounded score (ulp-stable across engines), ties
    break by token string."""
    from database_transportor_spark.operators.text import tfidf_top_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf_top_terms(docs, "text", "doc_id", k=3)


SQL_TFIDF_TERMS = """
WITH toks AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
    FROM documents
), tf AS (
    SELECT doc_id, token, count(*) AS tf
    FROM toks WHERE token <> '' GROUP BY 1, 2
), dfreq AS (
    SELECT token, count(*) AS df FROM tf GROUP BY token
), scored AS (
    SELECT t.doc_id, t.token, t.tf, d.df,
           round(t.tf * ln((SELECT count(DISTINCT doc_id) FROM documents)
                           * 1.0 / d.df), 6) AS tfidf
    FROM tf t JOIN dfreq d USING (token)
)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       tfidf, CAST(rn AS INTEGER) AS term_rank
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token ASC) AS rn
      FROM scored)
WHERE rn <= 3
"""


def q_lsh_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: corpus (doc_id %10 != 0) indexed ONCE via
    build_lsh_index, then the incoming batch (%10 == 0) probed against the
    index without rescanning the corpus.  Contract oracle (signatures are
    xxhash64-based; see q_minhash_lsh): ``n_exact_pairs`` = exact
    cross-side Jaccard >= 0.2 pairs (both engines compute independently),
    ``n_unsound`` = emitted pairs outside the exact set (always 0 — every
    candidate is exact-verified), ``recall_ok`` = >= 80% of exact pairs
    recalled (fixture near-dups sit at J >= 0.9 where 16/4-band collision
    probability is ~0.99)."""
    from database_transportor_spark.operators.dedup import (
        build_lsh_index,
        ngram_jaccard_pairs,
        query_lsh_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    mp = spark.sparkContext.defaultParallelism
    index = build_lsh_index(
        corpus, "doc_id", "text", n_hashes=16, bands=4, min_partitions=mp
    )
    emitted = query_lsh_index(
        index, batch, "doc_id", "text", n_hashes=16, bands=4, threshold=0.2,
        min_partitions=mp,
    ).select("batch_id", "corpus_id", F.lit(1).alias("__em"))
    # exact anchor: same plan as the other LSH contracts (served from the
    # plan cache when they ran in-session), filtered to cross-side pairs
    ex = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.2, min_partitions=mp,
    ).filter((F.col("id_a") % 10 == 0) != (F.col("id_b") % 10 == 0))
    exact = ex.select(
        F.when(F.col("id_a") % 10 == 0, F.col("id_a"))
        .otherwise(F.col("id_b")).alias("batch_id"),
        F.when(F.col("id_a") % 10 == 0, F.col("id_b"))
        .otherwise(F.col("id_a")).alias("corpus_id"),
        F.lit(1).alias("__ex"),
    )
    both = emitted.join(exact, ["batch_id", "corpus_id"], "full_outer")
    return both.agg(
        F.sum(F.coalesce("__ex", F.lit(0))).cast("long").alias("n_exact_pairs"),
        F.sum(F.when(F.col("__ex").isNull(), 1).otherwise(0))
        .cast("long").alias("n_unsound"),
        (
            F.sum(F.when(F.col("__em").isNotNull() & F.col("__ex").isNotNull(), 1)
                  .otherwise(0))
            >= F.sum(F.coalesce("__ex", F.lit(0))) * 0.8
        ).alias("recall_ok"),
    )


SQL_LSH_INDEX = """
WITH sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                                        i -> array_to_string(toks[i:i+2], ' '))) AS shingles
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
          FROM documents)
),
ex AS (
    SELECT doc_id, unnest(shingles) AS s FROM sh
), sizes AS (
    SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
       CAST(0 AS BIGINT) AS n_unsound,
       TRUE AS recall_ok
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.i / (sa.n + sb.n - i.i) >= 0.2
  AND (i.id_a % 10 = 0) <> (i.id_b % 10 = 0)
"""


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (`operators/text.py:normalize_text`):
    lowercase + whitespace-collapse + trim as a zero-shuffle projection."""
    from database_transportor_spark.operators.text import normalize_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return normalize_text(docs).select(
        "doc_id", "norm_text", F.length("norm_text").cast("long").alias("norm_len")
    )


SQL_NORMALIZE_TEXT = r"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g')) AS norm_text,
       len(trim(regexp_replace(lower(text), '[ \t\n\r\f]+', ' ', 'g'))) AS norm_len
FROM documents
"""


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping character-window chunking
    (`operators/text.py:chunk_documents`): size 200 / stride 150 — 50-char
    overlap; zero-shuffle posexplode(sequence) fan-out."""
    from database_transportor_spark.operators.text import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_documents(docs, size=200, stride=150).select(
        "doc_id", "chunk_idx", "chunk_text", "chunk_len"
    )


SQL_CHUNK_DOCS = r"""
WITH s AS (
    SELECT doc_id, text,
           unnest(generate_series(1, greatest(len(text), 1), 150)) AS start
    FROM documents
)
SELECT doc_id,
       CAST((start - 1) // 150 AS BIGINT) AS chunk_idx,
       substr(text, CAST(start AS BIGINT), 200) AS chunk_text,
       CAST(len(substr(text, CAST(start AS BIGINT), 200)) AS BIGINT) AS chunk_len
FROM s
"""


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self unigram LM quality score (`operators/text.py:lm_score`):
    add-1-smoothed mean token log-probability per document; counts are
    exact, the mean is rounded to 4 decimals for cross-engine stability."""
    from database_transportor_spark.operators.text import lm_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return lm_score(docs).select("doc_id", "avg_logprob", "n_scored")


SQL_LM_SCORE = r"""
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
    FROM documents
    WHERE trim(text) <> ''
), toks2 AS (
    SELECT * FROM toks WHERE token <> ''
), counts AS (
    SELECT token, count(*) AS cnt FROM toks2 GROUP BY token
), tot AS (
    SELECT sum(cnt) AS total, count(*) AS v FROM counts
), logp AS (
    SELECT token,
           ln((cnt + 1.0) / (total + 1.0 * v)) AS logp
    FROM counts, tot
)
SELECT doc_id,
       round(avg(logp), 4) AS avg_logprob,
       count(*) AS n_scored
FROM toks2 JOIN logp USING (token)
GROUP BY doc_id
"""


def q_rolling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user window features
    (`operators/temporal.py:rolling_agg`): RANGE frame over exact integer
    microseconds; one shuffle shared by count/sum/avg."""
    from database_transportor_spark.operators.temporal import rolling_agg

    events = _read_events(spark, sf_dir)
    return rolling_agg(events, "user_id", "ts", "value", window_sec=3600).select(
        "event_id", "user_id", "rolling_count", "rolling_sum", "rolling_avg"
    )


SQL_ROLLING_AGG = r"""
SELECT event_id, user_id,
       count(value) OVER w AS rolling_count,
       round(sum(value) OVER w, 4) AS rolling_sum,
       round(avg(value) OVER w, 4) AS rolling_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix
    (`operators/funnel.py:transition_matrix`): lead window per user
    (event_id tiebreak), |types|²-sized count + conditional probability."""
    from database_transportor_spark.operators.funnel import transition_matrix

    events = _read_events(spark, sf_dir)
    return transition_matrix(
        events, "user_id", "event_type", "ts", tiebreak_col="event_id"
    ).select("from_type", "to_type", "n_transitions", "prob")


SQL_TRANSITIONS = r"""
WITH pairs AS (
    SELECT user_id, event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
    FROM events
), counts AS (
    SELECT from_type, to_type, count(*) AS n_transitions
    FROM pairs WHERE to_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
       round(n_transitions / (sum(n_transitions)
             OVER (PARTITION BY from_type)), 6) AS prob
FROM counts
"""


#: the event-type vocabulary is part of the pipeline contract (an explicit
#: pivot column list keeps the output schema stable and skips Spark's
#: distinct-discovery job)
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user event-type count matrix
    (`operators/rollup.py:pivot_table`): one shuffle, explicit category
    list, absent cells filled with 0."""
    from database_transportor_spark.operators.rollup import pivot_table

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return pivot_table(events, ["user_id"], "event_type", _EVENT_TYPES)


SQL_PIVOT_EVENTS = r"""
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'error')    AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'view')     AS view
FROM events
GROUP BY user_id
"""


def q_unpivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot → unpivot round trip (`operators/rollup.py:unpivot_table`):
    melt the wide count matrix back to (user_id, metric, value) long form
    via Spark's native Expand — zero extra shuffle beyond the pivot's."""
    from database_transportor_spark.operators.rollup import (
        pivot_table,
        unpivot_table,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    wide = pivot_table(events, ["user_id"], "event_type", _EVENT_TYPES)
    return unpivot_table(wide, ["user_id"], _EVENT_TYPES)


SQL_UNPIVOT_EVENTS = r"""
WITH p AS (
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events
    GROUP BY user_id
)
SELECT user_id, 'click' AS metric, click AS value FROM p
UNION ALL SELECT user_id, 'error', error FROM p
UNION ALL SELECT user_id, 'purchase', purchase FROM p
UNION ALL SELECT user_id, 'signup', signup FROM p
UNION ALL SELECT user_id, 'view', view FROM p
"""


def q_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting (`operators/funnel.py:growth_accounting`):
    active/new/returning/cumulative users — the cumulative count is the
    running sum of first-seen counts (exact, no distinct-over-growing-
    window)."""
    from database_transportor_spark.operators.funnel import growth_accounting

    return growth_accounting(_read_events(spark, sf_dir), "user_id", "ts", "day")


SQL_GROWTH = r"""
WITH active AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS period,
           count(DISTINCT user_id) AS n_active
    FROM events GROUP BY 1
), fs AS (
    SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1
), nw AS (
    SELECT CAST(date_trunc('day', first_ts) AS TIMESTAMP) AS period, count(*) AS n_new
    FROM fs GROUP BY 1
), merged AS (
    SELECT a.period, a.n_active, coalesce(n.n_new, 0) AS n_new
    FROM active a LEFT JOIN nw n USING (period)
)
SELECT period, n_active, n_new,
       n_active - n_new AS n_returning,
       sum(n_new) OVER (ORDER BY period
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_entities
FROM merged
"""


def q_mad_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier gate (`operators/corpus.py:mad_filter`): per-source
    median/MAD deviation on document length; zero-MAD and NULL pass.  All
    arithmetic is exact-integer-derived, rounded 6 for belt-and-braces."""
    from database_transportor_spark.operators.corpus import mad_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = mad_filter(docs, "n_chars", ["source"], max_dev=3.0, out_col="dev")
    return out.select("doc_id", "source", F.round("dev", 6).alias("dev"))


SQL_MAD_GATE = r"""
WITH med AS (
    SELECT source, median(n_chars) AS med FROM documents GROUP BY source
), mad AS (
    SELECT d.source, median(abs(d.n_chars - m.med)) AS mad
    FROM documents d JOIN med m USING (source) GROUP BY d.source
), scored AS (
    SELECT d.doc_id, d.source,
           CASE WHEN a.mad = 0 THEN NULL
                ELSE abs(d.n_chars - m.med) / (1.4826 * a.mad) END AS dev
    FROM documents d
    JOIN med m USING (source)
    JOIN mad a ON a.source = d.source
)
SELECT doc_id, source, round(dev, 6) AS dev
FROM scored
WHERE dev IS NULL OR dev <= 3.0
"""


def q_rank_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-rank normalization (`operators/corpus.py:rank_normalize`):
    per-language percent_rank of document length — exact-integer rank
    division, deterministic under ties, one window shuffle."""
    from database_transportor_spark.operators.corpus import rank_normalize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return rank_normalize(docs, "n_chars", ["lang"]).select(
        "doc_id", "lang", "pct_rank"
    )


SQL_RANK_NORM = r"""
SELECT doc_id, lang,
       percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS pct_rank
FROM documents
"""


def q_item_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (`operators/affinity.py:
    cooccurrence_pairs`): part pairs co-ordered in the same order, with
    exact integer support/lift in ppm.  Distinct+cap first (max_basket=5,
    smallest-N deterministic), then ONE equi-join on the basket key —
    never a cross join; the basket total is the documented 1-row
    broadcast-totals shape (see lm_score)."""
    from database_transportor_spark.operators.affinity import (
        cooccurrence_pairs,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return cooccurrence_pairs(
        li, "l_orderkey", "l_partkey", min_pair_count=2, max_basket=5
    )


SQL_ITEM_AFFINITY = """
WITH items AS (
    SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
), capped AS (
    SELECT b, i FROM (
        SELECT b, i, row_number() OVER (PARTITION BY b ORDER BY i) AS rn
        FROM items
    ) WHERE rn <= 5
), tot AS (
    SELECT count(DISTINCT b) AS n_baskets FROM capped
), sup AS (
    SELECT i, count(*) AS cnt FROM capped GROUP BY i
), pairs AS (
    SELECT a.i AS item_a, c.i AS item_b, count(*) AS pair_count
    FROM capped a JOIN capped c ON a.b = c.b AND a.i < c.i
    GROUP BY 1, 2
    HAVING count(*) >= 2
)
SELECT item_a, item_b,
       CAST(pair_count AS BIGINT) AS pair_count,
       CAST(sa.cnt AS BIGINT) AS count_a,
       CAST(sb.cnt AS BIGINT) AS count_b,
       CAST(pair_count * 1000000 // n_baskets AS BIGINT) AS support_ppm,
       CAST(CAST(pair_count AS HUGEINT) * n_baskets * 1000000
            // (sa.cnt * sb.cnt) AS BIGINT) AS lift_ppm
FROM pairs
JOIN sup sa ON pairs.item_a = sa.i
JOIN sup sb ON pairs.item_b = sb.i, tot
"""


def q_ref_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-schema FK audit (`operators/validate.py:referential_audit`):
    exact orphan counts per declared relationship.  Parents collapse to
    DISTINCT key sets and broadcast, so the fact-side scans need no
    shuffle.  The last relation audits orders against a FILTERED customer
    dim (every 10th key removed) — the stale-dimension case that makes
    the nonzero-orphan path observable."""
    from database_transportor_spark.operators.validate import (
        referential_audit,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    stale_dim = customer.filter(F.col("c_custkey") % 10 != 0)
    return referential_audit([
        {"name": "lineitem->orders", "child": li,
         "child_keys": ["l_orderkey"],
         "parent": orders, "parent_keys": ["o_orderkey"]},
        {"name": "lineitem->part", "child": li,
         "child_keys": ["l_partkey"],
         "parent": part, "parent_keys": ["p_partkey"]},
        {"name": "orders->customer", "child": orders,
         "child_keys": ["o_custkey"],
         "parent": customer, "parent_keys": ["c_custkey"]},
        {"name": "supplier->nation", "child": supplier,
         "child_keys": ["s_nationkey"],
         "parent": nation, "parent_keys": ["n_nationkey"]},
        {"name": "orders->stale_customer", "child": orders,
         "child_keys": ["o_custkey"],
         "parent": stale_dim, "parent_keys": ["c_custkey"]},
    ])


SQL_REF_INTEGRITY = """
SELECT 'lineitem->orders' AS relation,
       CAST(count(*) AS BIGINT) AS child_rows,
       CAST(sum(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_keys,
       CAST(sum(CASE WHEN l.l_orderkey IS NOT NULL AND p.k IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS orphan_rows,
       CAST(count(DISTINCT CASE WHEN l.l_orderkey IS NOT NULL AND p.k IS NULL
                THEN l.l_orderkey END) AS BIGINT) AS distinct_missing
FROM lineitem l
LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
  ON l.l_orderkey = p.k
UNION ALL
SELECT 'lineitem->part',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN l.l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN l.l_partkey IS NOT NULL AND p.k IS NULL
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT CASE WHEN l.l_partkey IS NOT NULL AND p.k IS NULL
                THEN l.l_partkey END) AS BIGINT)
FROM lineitem l
LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
  ON l.l_partkey = p.k
UNION ALL
SELECT 'orders->customer',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN o.o_custkey IS NOT NULL AND p.k IS NULL
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT CASE WHEN o.o_custkey IS NOT NULL AND p.k IS NULL
                THEN o.o_custkey END) AS BIGINT)
FROM orders o
LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
  ON o.o_custkey = p.k
UNION ALL
SELECT 'supplier->nation',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN s.s_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN s.s_nationkey IS NOT NULL AND p.k IS NULL
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT CASE WHEN s.s_nationkey IS NOT NULL AND p.k IS NULL
                THEN s.s_nationkey END) AS BIGINT)
FROM supplier s
LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) p
  ON s.s_nationkey = p.k
UNION ALL
SELECT 'orders->stale_customer',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN o.o_custkey IS NOT NULL AND p.k IS NULL
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(count(DISTINCT CASE WHEN o.o_custkey IS NOT NULL AND p.k IS NULL
                THEN o.o_custkey END) AS BIGINT)
FROM orders o
LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer
           WHERE c_custkey % 10 <> 0) p
  ON o.o_custkey = p.k
"""


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term → posting-list index (`operators/text.py:inverted_index`):
    exact document frequency plus the first 10 doc ids per term
    (ascending, comma-joined).  The posting cap runs as a spillable
    row_number BEFORE any collect — a stopword's posting list never
    materializes in one task."""
    from database_transportor_spark.operators.text import inverted_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return inverted_index(docs, "doc_id", "text", min_df=3, max_postings=10)


SQL_INVERTED_INDEX = r"""
WITH toks AS (
    SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents
    ) WHERE token <> ''
), cnt AS (
    SELECT token AS term, count(*) AS df FROM toks
    GROUP BY 1 HAVING count(*) >= 3
), capped AS (
    SELECT token AS term, doc_id,
           row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
    FROM toks
), post AS (
    SELECT term,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS postings
    FROM capped WHERE rn <= 10 GROUP BY term
)
SELECT c.term, CAST(df AS BIGINT) AS df, postings
FROM cnt c JOIN post USING (term)
"""


def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM level-shift detector
    (`operators/temporal.py:cusum`) over daily event counts per type:
    s_i = max(0, s_{i-1} + x_i - k) with k = each type's integer-mean
    daily count — exact integer arithmetic end to end, so the fold is
    bit-reproducible.  Same one-shuffle sorted-array-fold shape as ewma."""
    from database_transportor_spark.operators.temporal import cusum

    ev = _read_events(spark, sf_dir)
    daily = (
        ev.filter(F.col("ts").isNotNull())  # NULL-ts: engines disagree on
        .groupBy(                           # NULL sort order (see cusum doc)
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(F.count("*").alias("n_events"))
    )
    return cusum(
        daily, ["event_type"], "day", "n_events", threshold=100
    )


SQL_CUSUM = """
WITH RECURSIVE d AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(*) AS BIGINT) AS x
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), m AS (
    SELECT event_type,
           CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS k
    FROM d GROUP BY 1
), s AS (
    SELECT event_type, day, x,
           row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
    FROM d
), r AS (
    SELECT s.event_type, s.day, s.x, s.rn,
           CAST(greatest(0, s.x - m.k) AS BIGINT) AS cusum
    FROM s JOIN m USING (event_type) WHERE s.rn = 1
    UNION ALL
    SELECT s.event_type, s.day, s.x, s.rn,
           CAST(greatest(0, r.cusum + s.x - m.k) AS BIGINT)
    FROM s JOIN r ON s.event_type = r.event_type AND s.rn = r.rn + 1
         JOIN m ON m.event_type = s.event_type
)
SELECT event_type, day, x AS n_events, cusum,
       CAST(cusum > 100 AS INT) AS is_shift
FROM r
"""


def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth discretization (`operators/corpus.py:quantile_bins`):
    per-language decile of document length, doc_id tiebreak — one window
    shuffle, NULLS-LAST order pinned on both engines."""
    from database_transportor_spark.operators.corpus import quantile_bins

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = quantile_bins(
        docs, "n_chars", 10, group_cols=["lang"], tiebreak_cols=["doc_id"]
    )
    return out.select(
        "doc_id", "lang", "n_chars", F.col("bin").cast("long").alias("bin")
    )


SQL_QUANTILE_BINS = """
SELECT doc_id, lang, n_chars,
       CAST(ntile(10) OVER (PARTITION BY lang
                            ORDER BY n_chars ASC NULLS LAST,
                                     doc_id ASC NULLS LAST) AS BIGINT)
           AS bin
FROM documents
"""


def q_null_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missingness-pattern census
    (`operators/maintenance.py:null_patterns`): NULL-combination counts
    over a derived nullable view of orders — ONE conditional-agg scan,
    integer ppm shares."""
    from database_transportor_spark.operators.maintenance import (
        null_patterns,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nullable = orders.select(
        F.expr("nullif(o_orderpriority, '1-URGENT')").alias("prio"),
        F.expr(
            "CASE WHEN o_totalprice < 50000 THEN NULL ELSE o_totalprice END"
        ).alias("big_price"),
        F.expr("nullif(o_orderstatus, 'F')").alias("status"),
    )
    return null_patterns(nullable, ["prio", "big_price", "status"])


SQL_NULL_PATTERNS = """
WITH nullable AS (
    SELECT nullif(o_orderpriority, '1-URGENT') AS prio,
           CASE WHEN o_totalprice < 50000 THEN NULL
                ELSE o_totalprice END AS big_price,
           nullif(o_orderstatus, 'F') AS status
    FROM orders
), agg AS (
    SELECT concat_ws(',',
               CASE WHEN prio IS NULL THEN 'prio' END,
               CASE WHEN big_price IS NULL THEN 'big_price' END,
               CASE WHEN status IS NULL THEN 'status' END) AS pattern,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM nullable GROUP BY 1
)
SELECT pattern, n_rows,
       CAST(n_rows * 1000000 // sum(n_rows) OVER () AS BIGINT) AS share_ppm
FROM agg
"""


def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (`operators/temporal.py:time_weighted_avg`):
    per-user TWAP of event values over irregular timestamps — exact
    integer-micro dot product in DECIMAL(38,0), deterministic
    same-microsecond tiebreak, one exchange (lead + agg share the key)."""
    from database_transportor_spark.operators.temporal import (
        time_weighted_avg,
    )

    ev = _read_events(spark, sf_dir)
    return time_weighted_avg(ev, ["user_id"], "ts", "value")


SQL_TWAP = """
WITH pts AS (
    SELECT user_id, ts, epoch_us(ts) AS t,
           CAST(round(value * 1000000) AS BIGINT) AS v6
    FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), led AS (
    SELECT user_id, ts, t, v6,
           lead(t) OVER (PARTITION BY user_id ORDER BY t, v6) - t AS dt
    FROM pts
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
       min(ts) AS t_first, max(ts) AS t_last,
       CAST(sum(dt) AS BIGINT) AS dt_total_micros,
       CASE WHEN coalesce(sum(dt), 0) > 0 THEN
           CAST(sum(CAST(v6 AS HUGEINT) * dt) // sum(dt) AS BIGINT)
       END AS twap_micro
FROM led GROUP BY user_id
"""


def q_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency
    (`operators/temporal.py:interval_concurrency`): open 1-hour event
    intervals per type at every change point — +1/−1 deltas + ONE
    running-sum window whose RANGE frame settles same-instant peers;
    linear, no interval×interval join."""
    from database_transportor_spark.operators.temporal import (
        interval_concurrency,
    )

    ev = _read_events(spark, sf_dir)
    iv = ev.filter(F.col("ts").isNotNull()).select(
        "event_type",
        F.col("ts").alias("s"),
        F.expr("ts + interval 1 hour").alias("e"),
    )
    return interval_concurrency(iv, "s", "e", ["event_type"])


SQL_CONCURRENCY = """
WITH iv AS (
    SELECT event_type, ts AS s, ts + INTERVAL 1 HOUR AS e
    FROM events WHERE ts IS NOT NULL
), d AS (
    SELECT event_type, s AS ts, 1 AS dd FROM iv
    UNION ALL
    SELECT event_type, e AS ts, -1 AS dd FROM iv
)
SELECT DISTINCT event_type, ts,
       CAST(sum(dd) OVER (PARTITION BY event_type ORDER BY ts) AS BIGINT)
           AS concurrent
FROM d
"""


def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day
    (`operators/temporal.py:rolling_distinct`): DISTINCT (user, day)
    collapse first, bounded 7-bucket explode, ONE count-distinct agg —
    never a day-range self-join."""
    from database_transportor_spark.operators.temporal import (
        rolling_distinct,
    )

    ev = _read_events(spark, sf_dir)
    return rolling_distinct(
        ev, "ts", "user_id", window_buckets=7, bucket="day",
        out_col="active_7d",
    )


SQL_ROLLING_ACTIVE = """
WITH ed AS (
    SELECT DISTINCT user_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
    FROM events WHERE ts IS NOT NULL
), cov AS (
    SELECT user_id, day + INTERVAL (i) DAY AS bucket
    FROM ed, UNNEST(range(0, 7)) AS r(i)
)
SELECT bucket, CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
FROM cov GROUP BY 1
"""


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test (`operators/experiment.py:ab_test`):
    entity-level conversion per variant (user_id parity assignment,
    purchase = conversion), exact integer counts/ppm rates, z as ONE
    closed-form double from exact ints, round(6).  The pairwise join
    runs on the variant-count-sized table, never on events."""
    from database_transportor_spark.operators.experiment import ab_test

    ev = _read_events(spark, sf_dir)
    ev = ev.withColumn(
        "variant",
        F.when(F.col("user_id") % 2 == 0, "control").otherwise("treatment"),
    )
    return ab_test(ev, "variant", "user_id", "event_type = 'purchase'")


SQL_AB_TEST = """
WITH ent AS (
    SELECT CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END
               AS variant,
           user_id,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY 1, 2
), pv AS (
    SELECT variant, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(conv) AS BIGINT) AS conv
    FROM ent GROUP BY 1
)
SELECT a.variant AS variant_a, b.variant AS variant_b,
       a.n AS n_a, b.n AS n_b, a.conv AS conv_a, b.conv AS conv_b,
       CAST(a.conv * 1000000 // a.n AS BIGINT) AS rate_a_ppm,
       CAST(b.conv * 1000000 // b.n AS BIGINT) AS rate_b_ppm,
       round(CASE WHEN a.conv + b.conv > 0
                   AND a.conv + b.conv < a.n + b.n THEN
           (CAST(a.conv AS DOUBLE) / a.n - CAST(b.conv AS DOUBLE) / b.n) /
           sqrt((CAST(a.conv + b.conv AS DOUBLE) / (a.n + b.n)) *
                (1.0 - CAST(a.conv + b.conv AS DOUBLE) / (a.n + b.n)) *
                (1.0 / a.n + 1.0 / b.n))
       END, 6) AS z_score
FROM pv a JOIN pv b ON a.variant < b.variant
"""


_EXTENSION_QUERIES = {
    "quantile_bins": q_quantile_bins,
    "null_patterns": q_null_patterns,
    "twap": q_twap,
    "concurrency": q_concurrency,
    "rolling_active": q_rolling_active,
    "ab_test": q_ab_test,
    "item_affinity": q_item_affinity,
    "ref_integrity": q_ref_integrity,
    "inverted_index": q_inverted_index,
    "cusum": q_cusum,
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "dedup_exact": q_dedup_exact,
    "doc_pipeline": q_doc_pipeline,
    "ngram_jaccard": q_ngram_jaccard,
    "dup_spans": q_dup_spans,
    "strip_spans": q_strip_spans,
    "embed_cov": q_embed_cov,
    "pca_check": q_pca_check,
    "dedup_clusters": q_dedup_clusters,
    "minhash_lsh": q_minhash_lsh,
    "simhash_pairs": q_simhash_pairs,
    "ann_cosine": q_ann_cosine,
    "ann_ivf": q_ann_ivf,
    "cosine_pairs": q_cosine_pairs,
    "multimodal_features": q_multimodal_features,
    "multimodal_frames": q_multimodal_frames,
    "image_decode": q_image_decode,
    "audio_decode": q_audio_decode,
    "audio_frames": q_audio_frames,
    "triangle_count": q_triangle_count,
    "graph_degrees": q_graph_degrees,
    "grouped_percentiles": q_grouped_percentiles,
    "image_resize": q_image_resize,
    "random_projection": q_random_projection,
    "bpe_tokens": q_bpe_tokens,
    "video_frames": q_video_frames,
    "avi_frames": q_avi_frames,
    "mjpeg_frames": q_mjpeg_frames,
    "mp4_frames": q_mp4_frames,
    "lang_quality_mix": q_lang_quality_mix,
    "status_priority_pivot": q_status_priority_pivot,
    "source_lang_rank": q_source_lang_rank,
    "dedup_lines": q_dedup_lines,
    "temperature_mix": q_temperature_mix,
    "char_entropy": q_char_entropy,
    "events_window": q_events_window,
    "events_sliding": q_events_sliding,
    "events_session": q_events_session,
    "events_stream_window": q_events_stream_window,
    "events_stateful": q_events_stateful,
    "events_stream_dedup": q_events_stream_dedup,
    "events_topn": q_events_topn,
    "events_stream_join": q_events_stream_join,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "repetition_stats": q_repetition_stats,
    "decontaminate": q_decontaminate,
    "split_assign": q_split_assign,
    "leakage_split": q_leakage_split,
    "stratified_sample": q_stratified_sample,
    "pack_sequences": q_pack_sequences,
    "redact_pii": q_redact_pii,
    "corpus_pipeline": q_corpus_pipeline,
    "asof_join": q_asof_join,
    "asof_refer": q_asof_refer,
    "asof_bucketed": q_asof_bucketed,
    "refer_salted": q_refer_salted,
    "range_join": q_range_join,
    "events_rollup": q_events_rollup,
    "grouped_median": q_grouped_median,
    "approx_distinct": q_approx_distinct,
    "corpus_shuffle": q_corpus_shuffle,
    "upsample_domains": q_upsample_domains,
    "quantize_embeddings": q_quantize_embeddings,
    "merge_upsert": q_merge_upsert,
    "cdc_apply": q_cdc_apply,
    "stream_merge": q_stream_merge,
    "funnel": q_funnel,
    "funnel_declarative": q_funnel_declarative,
    "cohort_retention": q_cohort_retention,
    "build_vocab": q_build_vocab,
    "token_budget": q_token_budget,
    "json_extract": q_json_extract,
    "dedup_best": q_dedup_best,
    "zscore_gate": q_zscore_gate,
    "ann_join": q_ann_join,
    "histogram": q_histogram,
    "tfidf_terms": q_tfidf_terms,
    "lsh_index": q_lsh_index,
    "encode_tokens": q_encode_tokens,
    "scd2": q_scd2,
    "sessionize": q_sessionize,
    "validate_rules": q_validate_rules,
    "profile_table": q_profile_table,
    "diff_tables": q_diff_tables,
    "normalize_text": q_normalize_text,
    "chunk_docs": q_chunk_docs,
    "lm_score": q_lm_score,
    "rolling_agg": q_rolling_agg,
    "transitions": q_transitions,
    "pivot_events": q_pivot_events,
    "unpivot_events": q_unpivot_events,
    "growth": q_growth,
    "mad_gate": q_mad_gate,
    "rank_norm": q_rank_norm,
}

_EXTENSION_ORACLES = {
    "quantile_bins": SQL_QUANTILE_BINS,
    "null_patterns": SQL_NULL_PATTERNS,
    "twap": SQL_TWAP,
    "concurrency": SQL_CONCURRENCY,
    "rolling_active": SQL_ROLLING_ACTIVE,
    "ab_test": SQL_AB_TEST,
    "item_affinity": SQL_ITEM_AFFINITY,
    "ref_integrity": SQL_REF_INTEGRITY,
    "inverted_index": SQL_INVERTED_INDEX,
    "cusum": SQL_CUSUM,
    "normalize_text": SQL_NORMALIZE_TEXT,
    "chunk_docs": SQL_CHUNK_DOCS,
    "lm_score": SQL_LM_SCORE,
    "rolling_agg": SQL_ROLLING_AGG,
    "transitions": SQL_TRANSITIONS,
    "pivot_events": SQL_PIVOT_EVENTS,
    "unpivot_events": SQL_UNPIVOT_EVENTS,
    "growth": SQL_GROWTH,
    "mad_gate": SQL_MAD_GATE,
    "rank_norm": SQL_RANK_NORM,
    "text_stats": SQL_TEXT_STATS,
    "lang_id": SQL_LANG_ID,
    "fingerprint": SQL_FINGERPRINT,
    "dedup_exact": SQL_DEDUP_EXACT,
    "doc_pipeline": SQL_DOC_PIPELINE,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "dup_spans": SQL_DUP_SPANS,
    "strip_spans": SQL_STRIP_SPANS,
    "embed_cov": SQL_EMBED_COV,
    "pca_check": SQL_PCA_CHECK,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "minhash_lsh": SQL_MINHASH_LSH,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "ann_cosine": SQL_ANN_COSINE,
    "ann_ivf": SQL_ANN_IVF,
    "cosine_pairs": SQL_COSINE_PAIRS,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "multimodal_frames": SQL_MULTIMODAL_FRAMES,
    "image_decode": SQL_IMAGE_DECODE,
    "audio_decode": SQL_AUDIO_DECODE,
    "audio_frames": SQL_AUDIO_FRAMES,
    "triangle_count": SQL_TRIANGLE_COUNT,
    "graph_degrees": SQL_GRAPH_DEGREES,
    "grouped_percentiles": SQL_GROUPED_PERCENTILES,
    "image_resize": SQL_IMAGE_RESIZE,
    "random_projection": SQL_RANDOM_PROJECTION,
    "bpe_tokens": SQL_BPE_TOKENS,
    "video_frames": SQL_VIDEO_FRAMES,
    "avi_frames": SQL_AVI_FRAMES,
    "mjpeg_frames": SQL_MJPEG_FRAMES,
    "mp4_frames": SQL_MP4_FRAMES,
    "lang_quality_mix": SQL_LANG_QUALITY_MIX,
    "status_priority_pivot": SQL_STATUS_PRIORITY_PIVOT,
    "source_lang_rank": SQL_SOURCE_LANG_RANK,
    "dedup_lines": SQL_DEDUP_LINES,
    "temperature_mix": SQL_TEMPERATURE_MIX,
    "char_entropy": SQL_CHAR_ENTROPY,
    "events_window": SQL_EVENTS_WINDOW,
    "events_sliding": SQL_EVENTS_SLIDING,
    "events_session": SQL_EVENTS_SESSION,
    "events_stream_window": SQL_EVENTS_WINDOW,
    "events_stateful": SQL_EVENTS_STATEFUL,
    "events_stream_dedup": SQL_EVENTS_STREAM_DEDUP,
    "events_topn": SQL_EVENTS_TOPN,
    "events_stream_join": SQL_EVENTS_STREAM_JOIN,
    "token_count": SQL_TOKEN_COUNT,
    "quality_score": SQL_QUALITY_SCORE,
    "repetition_stats": SQL_REPETITION_STATS,
    "decontaminate": SQL_DECONTAMINATE,
    "split_assign": SQL_SPLIT_ASSIGN,
    "leakage_split": SQL_LEAKAGE_SPLIT,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "redact_pii": SQL_REDACT_PII,
    "corpus_pipeline": SQL_CORPUS_PIPELINE,
    "asof_join": SQL_ASOF_JOIN,
    "asof_refer": SQL_ASOF_REFER,
    "asof_bucketed": SQL_ASOF_BUCKETED,
    "refer_salted": SQL_REFER_SALTED,
    "range_join": SQL_RANGE_JOIN,
    "events_rollup": SQL_EVENTS_ROLLUP,
    "grouped_median": SQL_GROUPED_MEDIAN,
    "approx_distinct": SQL_APPROX_DISTINCT,
    "corpus_shuffle": SQL_CORPUS_SHUFFLE,
    "upsample_domains": SQL_UPSAMPLE_DOMAINS,
    "quantize_embeddings": SQL_QUANTIZE_EMBEDDINGS,
    "merge_upsert": SQL_MERGE_UPSERT,
    "cdc_apply": SQL_CDC_APPLY,
    "stream_merge": SQL_STREAM_MERGE,
    "funnel": SQL_FUNNEL,
    "funnel_declarative": SQL_FUNNEL,
    "cohort_retention": SQL_COHORT_RETENTION,
    "build_vocab": SQL_BUILD_VOCAB,
    "token_budget": SQL_TOKEN_BUDGET,
    "json_extract": SQL_JSON_EXTRACT,
    "dedup_best": SQL_DEDUP_BEST,
    "zscore_gate": SQL_ZSCORE_GATE,
    "ann_join": SQL_ANN_JOIN,
    "histogram": SQL_HISTOGRAM,
    "tfidf_terms": SQL_TFIDF_TERMS,
    "lsh_index": SQL_LSH_INDEX,
    "encode_tokens": SQL_ENCODE_TOKENS,
    "scd2": SQL_SCD2,
    "sessionize": SQL_SESSIONIZE,
    "validate_rules": SQL_VALIDATE_RULES,
    "profile_table": SQL_PROFILE_TABLE,
    "diff_tables": SQL_DIFF_TABLES,
}


# ===========================================================================
# Round-3 additions: OLAP cube, graph PageRank, boilerplate detection,
# weighted sampling, and classic TPC-H-style analytics rollups.
# ===========================================================================


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional CUBE over (event_type, day)
    (`operators/rollup.py:cube_agg`): one Expand + ONE hash-aggregate
    shuffle for all four grouping sets; `gid` disambiguates aggregated
    NULLs.  The money sum goes through exact integer cents so every cell
    — including the grand total — is bit-stable across engines."""
    from database_transportor_spark.operators.rollup import cube_agg

    ev = _read_events(spark, sf_dir).withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    cents = F.round(F.col("value") * 100).cast("long")
    out = cube_agg(
        ev.withColumn("cents", cents),
        ["event_type", "day"],
        [
            F.count("*").alias("n_events"),
            (F.sum("cents") / F.lit(100.0)).alias("sum_value"),
        ],
    )
    return out.select("event_type", "day", "gid", "n_events", "sum_value")


SQL_EVENTS_CUBE = r"""
WITH ev AS (
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
)
SELECT event_type, day,
       GROUPING(event_type, day) AS gid,
       count(*) AS n_events,
       sum(cents) / 100.0 AS sum_value
FROM ev
GROUP BY CUBE (event_type, day)
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (`operators/graph.py:pagerank`) over the
    symmetrized customer<->supplier trade graph (edge when a customer's
    order has a line item from that supplier).  Symmetrization makes the
    graph provably dangling-free, so the harness run skips the
    per-iteration dangling-mass scalar job.  3 iterations: each is one
    rank-table shuffle join against the src-partitioned cached edge
    table + one map-side-combined aggregation."""
    from database_transportor_spark.operators.graph import pagerank, symmetrize

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # LONG node ids (customer 2k, supplier 2k+1), not decorated strings:
    # 8-byte keys halve the shuffle payload of every distinct/join/agg in
    # the walk.  Dedup BEFORE symmetrizing (the reversed copies are
    # distinct by parity construction), then skip the operator's re-dedup.
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(
        symmetrize(e), iterations=3, handle_dangling=False,
        checkpoint_every=10, dedup_edges=False,
    )
    return pr.select("node", F.round("rank", 9).alias("rank"))


SQL_PAGERANK = r"""
WITH e0 AS (
    SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), e AS (
    SELECT src, dst FROM e0
    UNION ALL
    SELECT dst AS src, src AS dst FROM e0
), nodes AS (
    SELECT DISTINCT src AS node FROM e
), nn AS (
    SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
), deg AS (
    SELECT src, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY src
), r0 AS (
    SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
), r1 AS (
    SELECT nodes.node,
           (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(c.s, 0.0) + 0.0 AS rank
    FROM nodes LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / deg.d) AS s
        FROM e JOIN r0 r ON e.src = r.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst
    ) c ON nodes.node = c.node
), r2 AS (
    SELECT nodes.node,
           (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(c.s, 0.0) + 0.0 AS rank
    FROM nodes LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / deg.d) AS s
        FROM e JOIN r1 r ON e.src = r.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst
    ) c ON nodes.node = c.node
), r3 AS (
    SELECT nodes.node,
           (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * coalesce(c.s, 0.0) + 0.0 AS rank
    FROM nodes LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / deg.d) AS s
        FROM e JOIN r2 r ON e.src = r.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst
    ) c ON nodes.node = c.node
)
SELECT node, round(rank, 9) AS rank FROM r3
"""


def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate signal
    (`operators/text.py:boilerplate_ratio`): per-doc fraction of distinct
    3-gram shingles occurring in >= 2 documents.  Shingles travel as
    8-byte xxhash64 values on the Spark side (the oracle uses the raw
    strings — identical structure when the hash is collision-free at
    fixture scale)."""
    from database_transportor_spark.operators.text import boilerplate_ratio

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return boilerplate_ratio(docs, "doc_id", "text", n=3, min_df=2)


SQL_BOILERPLATE = r"""
WITH t AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
    FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                                        i -> array_to_string(toks[i:i+2], ' '))) AS shingles
    FROM t
), ex AS (
    SELECT doc_id, unnest(shingles) AS s FROM sh
), dfreq AS (
    SELECT s, count(*) AS df FROM ex GROUP BY s
)
SELECT ex.doc_id,
       count(*) AS n_shingles,
       sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_common,
       round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) / count(*), 6)
           AS boilerplate_ratio
FROM ex JOIN dfreq USING (s)
GROUP BY ex.doc_id
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance sampling
    (`operators/corpus.py:weighted_sample`): keep probability grows with
    document length (p = n_chars/256 clamped to 1).  Multiplicative hash
    so the assignment is ANSI-SQL-reproducible; zero shuffle, filter
    directly above the scan."""
    from database_transportor_spark.operators.corpus import weighted_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = weighted_sample(
        docs,
        "doc_id",
        F.col("n_chars") / F.lit(256.0),
        hash_fn="multiplicative",
    )
    return out.select("doc_id", "source", "n_chars")


SQL_WEIGHTED_SAMPLE = r"""
SELECT doc_id, source, n_chars
FROM documents
WHERE (((doc_id * 2654435761) % 4294967296) % 1000000) / 1000000.0
      < least(1.0, greatest(n_chars / 256.0, 0.0))
"""


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: top 20 customers by revenue
    lost to returns in 1996.  Fact-side joins (lineitem⋈orders on
    orderkey, ⋈customer on custkey) shuffle; nation is BROADCAST.
    Exact-integer cents; deterministic (revenue desc, custkey asc) rank.
    Expressed as a declarative spec — the full join→agg→rank report is
    data (join/agg/window_rank post_ops), not Python composition."""
    maps = {
        "returned_items": {
            "original_table": "lineitem",
            "extra_conditions": [["l_returnflag", "=", "R"]],
            "columns": {
                "l_orderkey": "l_orderkey",
                "l_extendedprice": "l_extendedprice",
                "l_discount": "l_discount",
            },
            "post_ops": [
                {"op": "derive", "columns": {
                    "rev_cp": "CAST(round(l_extendedprice * 100) AS BIGINT)"
                              " * (100 - CAST(round(l_discount * 100) AS BIGINT))",
                }},
                {"op": "join", "table": "orders",
                 "filter": "o_orderdate >= TIMESTAMP '1996-01-01'"
                           " AND o_orderdate < TIMESTAMP '1997-01-01'",
                 "select": ["o_orderkey", "o_custkey"],
                 "on": "l_orderkey = o_orderkey"},
                {"op": "join", "table": "customer",
                 "select": ["c_custkey", "c_name", "c_nationkey"],
                 "on": "o_custkey = c_custkey"},
                {"op": "join", "table": "nation", "broadcast": True,
                 "select": ["n_nationkey", "n_name"],
                 "on": "c_nationkey = n_nationkey"},
                {"op": "agg",
                 "group_by": ["c_custkey", "c_name", "n_name"],
                 "aggs": ["sum(rev_cp) AS __rev_cp", "count(*) AS n_items"]},
                {"op": "window_rank",
                 "order_by": ["__rev_cp desc", "c_custkey asc"],
                 "rank_col": "rank", "top": 20},
                {"op": "derive", "columns": {"revenue": "__rev_cp / 10000.0D"}},
                {"op": "select", "columns": [
                    "rank", "c_custkey", "c_name", "n_name", "revenue",
                    "n_items"]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "returned_items")


SQL_RETURNED_ITEMS = """
WITH agg AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS rev_cp,
         count(*) AS n_items
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2, 3
)
SELECT CAST(row_number() OVER (ORDER BY rev_cp DESC, c_custkey ASC) AS INT)
         AS rank,
       c_custkey, c_name, n_name,
       rev_cp / 10000.0 AS revenue,
       CAST(n_items AS BIGINT) AS n_items
FROM agg
ORDER BY rank
LIMIT 20
"""


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity revenue: for one brand, the yearly
    revenue of lineitems whose quantity is below 20% of that part's
    average quantity.  The per-part average is a pre-aggregation joined
    back BROADCAST (parts of one brand ≪ lineitem) — no correlated
    subquery re-scan.  The threshold compare is exact integer algebra:
    qty < 0.2·(sum/n)  ⇔  5·qty·n < sum  (quantities are integral).
    Declarative two-map DAG: the per-part stats are their own map,
    broadcast-joined back via side='target' (stats rows ≤ parts of one
    brand — dimension-sized at any SF, so the rejoin never shuffles the
    fact side)."""
    maps = {
        "part_qty_stats": {
            "original_table": "lineitem",
            "columns": {"l_partkey": "l_partkey", "l_quantity": "l_quantity"},
            "post_ops": [
                {"op": "join", "table": "part", "broadcast": True,
                 "filter": "p_brand = 'Brand#13'", "select": ["p_partkey"],
                 "on": "l_partkey = p_partkey"},
                {"op": "agg", "group_by": ["p_partkey AS sp_partkey"],
                 "aggs": [
                     "sum(CAST(round(l_quantity) AS BIGINT)) AS __sum_q",
                     "count(*) AS __n",
                 ]},
            ],
        },
        "small_qty_revenue": {
            "original_table": "lineitem",
            "columns": {
                "l_partkey": "l_partkey",
                "l_quantity": "l_quantity",
                "l_extendedprice": "l_extendedprice",
                "l_shipdate": "l_shipdate",
            },
            "transport_after": ["part_qty_stats"],
            "post_ops": [
                {"op": "join", "table": "part_qty_stats", "side": "target",
                 "broadcast": True, "on": "l_partkey = sp_partkey"},
                {"op": "filter", "condition":
                    "5 * CAST(round(l_quantity) AS BIGINT) * __n < __sum_q"},
                {"op": "agg",
                 "group_by": ["CAST(year(l_shipdate) AS BIGINT) AS ship_year"],
                 "aggs": [
                     "sum(CAST(round(l_extendedprice * 100) AS BIGINT))"
                     " / 100.0D AS revenue",
                     "count(*) AS n_items",
                 ]},
            ],
        },
    }
    return _run(spark, sf_dir, maps, "small_qty_revenue")


SQL_SMALL_QTY_REVENUE = """
WITH lp AS (
  SELECT l.*, p.p_partkey AS pk
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#13'
), stats AS (
  SELECT pk, sum(CAST(round(l_quantity) AS BIGINT)) AS sum_q,
         count(*) AS n
  FROM lp GROUP BY pk
)
SELECT CAST(year(lp.l_shipdate) AS BIGINT) AS ship_year,
       sum(CAST(round(lp.l_extendedprice * 100) AS BIGINT)) / 100.0
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lp JOIN stats ON lp.pk = stats.pk
WHERE 5 * CAST(round(lp.l_quantity) AS BIGINT) * stats.n < stats.sum_q
GROUP BY 1
"""


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier-part relationship count: distinct
    suppliers able to supply each (brand, type, size) bucket, excluding
    one brand and the PROMO type family.  The part dimension filter is
    BROADCAST into the (l_partkey, l_suppkey) distinct-pair scan — the
    only shuffle is the final count_distinct aggregation.  Declarative:
    distinct/join/agg post_ops stages."""
    maps = {
        "supplier_part_counts": {
            "original_table": "lineitem",
            "columns": {"l_partkey": "l_partkey", "l_suppkey": "l_suppkey"},
            "post_ops": [
                {"op": "distinct"},
                {"op": "join", "table": "part", "broadcast": True,
                 "filter": "p_brand <> 'Brand#9'"
                           " AND p_type NOT LIKE 'PROMO%'",
                 "select": ["p_partkey", "p_brand", "p_type", "p_size"],
                 "on": "l_partkey = p_partkey"},
                {"op": "agg",
                 "group_by": ["p_brand", "p_type",
                              "CAST(p_size AS BIGINT) AS p_size"],
                 "aggs": ["CAST(count(DISTINCT l_suppkey) AS BIGINT)"
                          " AS supplier_cnt"]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "supplier_part_counts")


SQL_SUPPLIER_PART_COUNTS = """
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT lp.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) lp
JOIN part p ON lp.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#9' AND p.p_type NOT LIKE 'PROMO%'
GROUP BY 1, 2, 3
"""


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: orders placed in 1996 that
    had at least one lineitem shipped after the order date, counted per
    priority.  ``EXISTS(l.shipdate > o.orderdate)`` is algebraically
    ``max(l.shipdate) per order > o.orderdate``, so lineitem is
    PRE-AGGREGATED to one (orderkey, max_shipdate) row per order —
    map-side combined — before a plain equi semi join.  The naive
    direct semi join builds a hash table from the RAW fact side, which
    measured 18× wall at 10× data on this box; the pre-aggregated shape
    re-measured at 1.5× (the aggregation shrinks the build to
    per-order rows and the date predicate still prunes the orders
    scan).  Declarative two-map DAG: the pre-aggregation is its own map
    and the report semi-joins it via side='target' + transport_after —
    the post_ops analogue of the reference's recursive-dependency
    trigger (J4)."""
    maps = {
        "lmax": {
            "original_table": "lineitem",
            "columns": {"l_orderkey": "l_orderkey", "l_shipdate": "l_shipdate"},
            "post_ops": [
                {"op": "agg", "group_by": ["l_orderkey"],
                 "aggs": ["max(l_shipdate) AS __max_ship"]},
            ],
        },
        "order_priority_counts": {
            "original_table": "orders",
            "extra_conditions": [
                "o_orderdate >= TIMESTAMP '1996-01-01'",
                "o_orderdate < TIMESTAMP '1997-01-01'",
            ],
            "columns": {
                "o_orderkey": "o_orderkey",
                "o_orderdate": "o_orderdate",
                "o_orderpriority": "o_orderpriority",
            },
            "transport_after": ["lmax"],
            "post_ops": [
                {"op": "join", "table": "lmax", "side": "target",
                 "how": "left_semi",
                 "on": "l_orderkey = o_orderkey"
                       " AND __max_ship > o_orderdate"},
                {"op": "agg", "group_by": ["o_orderpriority"],
                 "aggs": ["count(*) AS n_orders"]},
            ],
        },
    }
    return _run(spark, sf_dir, maps, "order_priority_counts")


SQL_ORDER_PRIORITY_COUNTS = """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY 1
"""


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer order-count distribution: LEFT join
    customers to orders (customers with no orders count at 0), per-
    customer count, then the distribution of those counts.  Two
    shuffles — the outer join on custkey and the tiny histogram agg;
    count(order-side column) gives the correct 0 for no-match rows.
    Declarative: left join + two stacked agg stages."""
    maps = {
        "customer_distribution": {
            "original_table": "customer",
            "columns": {"c_custkey": "c_custkey"},
            "post_ops": [
                {"op": "join", "table": "orders", "how": "left",
                 "select": ["o_orderkey", "o_custkey"],
                 "on": "c_custkey = o_custkey"},
                {"op": "agg", "group_by": ["c_custkey"],
                 "aggs": ["count(o_orderkey) AS c_count"]},
                {"op": "agg", "group_by": ["c_count"],
                 "aggs": ["count(*) AS n_customers"]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "customer_distribution")


SQL_CUSTOMER_DISTRIBUTION = """
WITH per AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS n_customers
FROM per GROUP BY 1
"""


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion revenue share: of all 1996 revenue,
    the percentage from PROMO-type parts — conditional aggregation over
    one broadcast part-dim join, exact-integer cents, one rounded
    division at the end.  Declarative: pushdown conditions + derive /
    broadcast-join / global-agg post_ops."""
    maps = {
        "promo_revenue_share": {
            "original_table": "lineitem",
            "extra_conditions": [
                "l_shipdate >= TIMESTAMP '1996-01-01'",
                "l_shipdate < TIMESTAMP '1997-01-01'",
            ],
            "columns": {
                "l_partkey": "l_partkey",
                "l_extendedprice": "l_extendedprice",
                "l_discount": "l_discount",
            },
            "post_ops": [
                {"op": "derive", "columns": {
                    "rev_cp": "CAST(round(l_extendedprice * 100) AS BIGINT)"
                              " * (100 - CAST(round(l_discount * 100) AS BIGINT))",
                }},
                {"op": "join", "table": "part", "broadcast": True,
                 "select": ["p_partkey", "p_type"],
                 "on": "l_partkey = p_partkey"},
                {"op": "agg", "aggs": [
                    "round(100.0D * sum(CASE WHEN p_type LIKE 'PROMO%'"
                    " THEN rev_cp ELSE 0 END) / sum(rev_cp), 6) AS promo_pct",
                    "sum(rev_cp) / 10000.0D AS total_revenue",
                ]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "promo_revenue_share")


SQL_PROMO_REVENUE_SHARE = """
WITH j AS (
  SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_cp,
         p.p_type
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
)
SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev_cp
                              ELSE 0 END) / sum(rev_cp), 6) AS promo_pct,
       sum(rev_cp) / 10000.0 AS total_revenue
FROM j
"""


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: three OR'd
    (brand, size-range, quantity-range) branches — the pattern that
    tests predicate handling, because naive engines scan once per
    branch.  Here it is ONE broadcast part join + one OR filter; the
    quantity bounds are exact-integer compares.  Declarative:
    derive / broadcast-join / filter / global-agg post_ops."""
    maps = {
        "disjunctive_revenue": {
            "original_table": "lineitem",
            "columns": {
                "l_partkey": "l_partkey",
                "l_quantity": "l_quantity",
                "l_extendedprice": "l_extendedprice",
                "l_discount": "l_discount",
            },
            "post_ops": [
                {"op": "derive", "columns": {
                    "__qty": "CAST(round(l_quantity) AS BIGINT)",
                    "rev_cp": "CAST(round(l_extendedprice * 100) AS BIGINT)"
                              " * (100 - CAST(round(l_discount * 100) AS BIGINT))",
                }},
                {"op": "join", "table": "part", "broadcast": True,
                 "select": ["p_partkey", "p_brand", "p_size"],
                 "on": "l_partkey = p_partkey"},
                {"op": "filter", "condition":
                    "(p_brand = 'Brand#1' AND p_size <= 5"
                    " AND __qty BETWEEN 1 AND 11)"
                    " OR (p_brand = 'Brand#7' AND p_size <= 10"
                    " AND __qty BETWEEN 10 AND 20)"
                    " OR (p_brand = 'Brand#13' AND p_size <= 15"
                    " AND __qty BETWEEN 20 AND 30)"},
                {"op": "agg", "aggs": [
                    "sum(rev_cp) / 10000.0D AS revenue",
                    "count(*) AS n_items",
                ]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "disjunctive_revenue")


SQL_DISJUNCTIVE_REVENUE = """
SELECT sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0
         AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size <= 5
       AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#7' AND p.p_size <= 10
       AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#13' AND p.p_size <= 15
       AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 20 AND 30)
"""


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: per nation, customers whose account balance is
    above the positive-balance average but who placed NO orders since
    2000 (lapsed big accounts) — a broadcast scalar threshold plus a
    LEFT ANTI join (never a NOT IN subquery re-scan), with the date
    predicate pushed to the orders scan.  Balance sums in exact cents.
    Declarative: broadcast-scalar cross join + left_anti join + agg."""
    maps = {
        "idle_rich_customers": {
            "original_table": "customer",
            "columns": {
                "c_custkey": "c_custkey",
                "c_nationkey": "c_nationkey",
                "c_acctbal": "c_acctbal",
            },
            "post_ops": [
                {"op": "derive", "columns": {
                    "__bal_cp": "CAST(round(c_acctbal * 100) AS BIGINT)"}},
                {"op": "join", "table": "customer", "how": "cross",
                 "broadcast": True,
                 "filter": "CAST(round(c_acctbal * 100) AS BIGINT) > 0",
                 "select": ["sum(CAST(round(c_acctbal * 100) AS BIGINT))"
                            " / count(*) AS __avg"]},
                {"op": "filter", "condition": "__bal_cp > __avg"},
                {"op": "join", "table": "orders", "how": "left_anti",
                 "filter": "o_orderdate >= TIMESTAMP '2000-01-01'",
                 "select": ["o_custkey"],
                 "on": "c_custkey = o_custkey"},
                {"op": "agg",
                 "group_by": ["CAST(c_nationkey AS BIGINT) AS nation"],
                 "aggs": ["count(*) AS n_customers",
                          "sum(__bal_cp) / 100.0D AS total_balance"]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "idle_rich_customers")


SQL_IDLE_RICH_CUSTOMERS = """
WITH cc AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cp
  FROM customer
), thr AS (
  SELECT sum(bal_cp) / count(*) AS avg_pos FROM cc WHERE bal_cp > 0
)
SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
       CAST(count(*) AS BIGINT) AS n_customers,
       sum(c.bal_cp) / 100.0 AS total_balance
FROM cc c, thr
WHERE c.bal_cp > thr.avg_pos
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: per-supplier 1996-H1 revenue, then
    the supplier(s) matching the maximum — the max is a 1-row broadcast
    scalar joined back (no second scan, no driver round-trip), revenue
    in exact cents.  Declarative two-map DAG: per-supplier revenue is
    its own map; the report joins it from the supplier dim and
    cross-joins its 1-row max back (the documented broadcast-scalar
    exception)."""
    maps = {
        "supp_rev": {
            "original_table": "lineitem",
            "extra_conditions": [
                "l_shipdate >= TIMESTAMP '1996-01-01'",
                "l_shipdate < TIMESTAMP '1996-07-01'",
            ],
            "columns": {
                "l_suppkey": "l_suppkey",
                "l_extendedprice": "l_extendedprice",
                "l_discount": "l_discount",
            },
            "post_ops": [
                {"op": "agg", "group_by": ["l_suppkey AS sr_suppkey"],
                 "aggs": [
                     "sum(CAST(round(l_extendedprice * 100) AS BIGINT)"
                     " * (100 - CAST(round(l_discount * 100) AS BIGINT)))"
                     " AS __rev_cp",
                 ]},
            ],
        },
        "top_supplier": {
            "original_table": "supplier",
            "columns": {"s_suppkey": "s_suppkey", "s_name": "s_name"},
            "transport_after": ["supp_rev"],
            "post_ops": [
                {"op": "join", "table": "supp_rev", "side": "target",
                 "on": "s_suppkey = sr_suppkey"},
                {"op": "join", "table": "supp_rev", "side": "target",
                 "how": "cross", "broadcast": True,
                 "select": ["max(__rev_cp) AS __mx"]},
                {"op": "filter", "condition": "__rev_cp = __mx"},
                {"op": "derive", "columns": {
                    "s_suppkey": "CAST(s_suppkey AS BIGINT)",
                    "total_revenue": "__rev_cp / 10000.0D",
                }},
                {"op": "select",
                 "columns": ["s_suppkey", "s_name", "total_revenue"]},
            ],
        },
    }
    return _run(spark, sf_dir, maps, "top_supplier")


SQL_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_cp
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-07-01'
  GROUP BY 1
)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
       r.rev_cp / 10000.0 AS total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.rev_cp = (SELECT max(rev_cp) FROM rev)
"""


def q_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped cheapest supplier per part (the fixture has no
    partsupp, so the observed lineitem relationship stands in): per
    (part, supplier) the minimum line total in exact cents, then per
    part the winning supplier via a deterministic struct-min
    (cost, suppkey) — one aggregation, no correlated re-scan, ties
    broken by supplier key.  Declarative: two stacked agg stages (the
    struct-min is a plain SQL aggregate expression)."""
    maps = {
        "cheapest_supplier": {
            "original_table": "lineitem",
            "columns": {
                "l_partkey": "l_partkey",
                "l_suppkey": "l_suppkey",
                "l_extendedprice": "l_extendedprice",
            },
            "post_ops": [
                {"op": "agg", "group_by": ["l_partkey", "l_suppkey"],
                 "aggs": ["min(CAST(round(l_extendedprice * 100) AS BIGINT))"
                          " AS __min_cp"]},
                {"op": "agg", "group_by": ["l_partkey"],
                 "aggs": ["min(struct(__min_cp, l_suppkey)) AS __b"]},
                {"op": "derive", "columns": {
                    "p_partkey": "CAST(l_partkey AS BIGINT)",
                    "s_suppkey": "CAST(__b.l_suppkey AS BIGINT)",
                    "min_cost": "__b.__min_cp / 100.0D",
                }},
                {"op": "select",
                 "columns": ["p_partkey", "s_suppkey", "min_cost"]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "cheapest_supplier")


SQL_CHEAPEST_SUPPLIER = """
WITH per AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS min_cp
  FROM lineitem GROUP BY 1, 2
), best AS (
  SELECT l_partkey, min_cp, l_suppkey,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY min_cp, l_suppkey) AS rn
  FROM per
)
SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
       CAST(l_suppkey AS BIGINT) AS s_suppkey,
       min_cp / 100.0 AS min_cost
FROM best WHERE rn = 1
"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan-filter-aggregate with the
    date predicate pushed to the parquet scan and 4-wide grouping.  All
    money math in exact integer cents (cent*percent for the discount /
    tax compounds), divided back out only at presentation — bit-stable
    sums at any scale and no float accumulation drift.  Single shuffle,
    map-side partial aggregation.  Expressed entirely as a declarative
    spec (extra_conditions → pushdown, derive/agg post_ops) so the
    analytics tier rides the same planner as the reference-parity maps."""
    maps = {
        "pricing_summary": {
            "original_table": "lineitem",
            "extra_conditions": ["l_shipdate <= TIMESTAMP '2000-12-01'"],
            "columns": {
                "l_returnflag": "l_returnflag",
                "l_linestatus": "l_linestatus",
                "l_quantity": "l_quantity",
                "l_extendedprice": "l_extendedprice",
                "l_discount": "l_discount",
                "l_tax": "l_tax",
            },
            "post_ops": [
                {"op": "derive", "columns": {
                    "qty": "CAST(round(l_quantity) AS BIGINT)",
                    "cents": "CAST(round(l_extendedprice * 100) AS BIGINT)",
                    "disc": "CAST(round(l_discount * 100) AS BIGINT)",
                    "tax": "CAST(round(l_tax * 100) AS BIGINT)",
                    "rev_cp": "cents * (100 - disc)",
                    "chg_cp2": "cents * (100 - disc) * (100 + tax)",
                }},
                {"op": "agg",
                 "group_by": ["l_returnflag", "l_linestatus"],
                 "aggs": [
                     "sum(qty) AS sum_qty",
                     "sum(cents) / 100.0D AS sum_base_price",
                     "sum(rev_cp) / 10000.0D AS sum_disc_price",
                     "sum(chg_cp2) / 1000000.0D AS sum_charge",
                     "round(sum(qty) / count(*), 6) AS avg_qty",
                     "count(*) AS count_order",
                 ]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "pricing_summary")


SQL_PRICING_SUMMARY = r"""
WITH f AS (
    SELECT l_returnflag, l_linestatus,
           CAST(round(l_quantity) AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
           CAST(round(l_discount * 100) AS BIGINT) AS disc,
           CAST(round(l_tax * 100) AS BIGINT) AS tax
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
)
SELECT l_returnflag, l_linestatus,
       sum(qty) AS sum_qty,
       sum(cents) / 100.0 AS sum_base_price,
       sum(cents * (100 - disc)) / 10000.0 AS sum_disc_price,
       sum(cents * (100 - disc) * (100 + tax)) / 1000000.0 AS sum_charge,
       round(sum(qty) / count(*), 6) AS avg_qty,
       count(*) AS count_order
FROM f
GROUP BY l_returnflag, l_linestatus
"""


def q_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority query: segment-filtered
    customers BROADCAST into orders, lineitem shuffle-joined on
    orderkey, top-10 by exact-integer revenue with a deterministic
    orderkey tiebreak (TakeOrdered — no global sort materialization).
    Declarative: join/agg/order_limit post_ops."""
    maps = {
        "top_unshipped": {
            "original_table": "lineitem",
            "extra_conditions": ["l_shipdate > TIMESTAMP '1998-06-30'"],
            "columns": {
                "l_orderkey": "l_orderkey",
                "l_extendedprice": "l_extendedprice",
                "l_discount": "l_discount",
            },
            "post_ops": [
                {"op": "derive", "columns": {
                    "rev_cp0": "CAST(round(l_extendedprice * 100) AS BIGINT)"
                               " * (100 - CAST(round(l_discount * 100) AS BIGINT))",
                }},
                {"op": "join", "table": "orders",
                 "filter": "o_orderdate < TIMESTAMP '1998-06-30'",
                 "select": ["o_orderkey", "o_custkey", "o_orderdate",
                            "o_orderpriority"],
                 "on": "l_orderkey = o_orderkey"},
                {"op": "join", "table": "customer", "broadcast": True,
                 "filter": "c_mktsegment = 'BUILDING'",
                 "select": ["c_custkey"],
                 "on": "o_custkey = c_custkey"},
                {"op": "agg",
                 "group_by": ["l_orderkey", "o_orderdate", "o_orderpriority"],
                 "aggs": ["sum(rev_cp0) AS rev_cp"]},
                {"op": "order_limit",
                 "by": ["rev_cp desc", "l_orderkey asc"], "limit": 10},
                {"op": "derive", "columns": {"revenue": "rev_cp / 10000.0D"}},
                {"op": "select", "columns": [
                    "l_orderkey", "o_orderdate", "o_orderpriority", "revenue"]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "top_unshipped")


SQL_TOP_UNSHIPPED = r"""
WITH j AS (
    SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_cp
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-30'
      AND l.l_shipdate > TIMESTAMP '1998-06-30'
), g AS (
    SELECT l_orderkey, o_orderdate, o_orderpriority, sum(rev_cp) AS rev_cp
    FROM j GROUP BY 1, 2, 3
)
SELECT l_orderkey, o_orderdate, o_orderpriority,
       rev_cp / 10000.0 AS revenue
FROM g
ORDER BY rev_cp DESC, l_orderkey
LIMIT 10
"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier revenue: six-table join where
    every dimension (supplier, nation, region) is BROADCAST — the only
    shuffles are the two fact-side equi-joins (orders⋈customer on
    custkey, lineitem⋈orders on orderkey) plus the final small
    aggregation.  Exact-integer revenue.  Declarative: four chained
    join stages (dims broadcast) + the final agg, all spec data."""
    maps = {
        "revenue_by_nation": {
            "original_table": "orders",
            "extra_conditions": [
                "o_orderdate >= TIMESTAMP '1996-01-01'",
                "o_orderdate < TIMESTAMP '1997-01-01'",
            ],
            "columns": {"o_orderkey": "o_orderkey", "o_custkey": "o_custkey"},
            "post_ops": [
                {"op": "join", "table": "customer",
                 "select": ["c_custkey", "c_nationkey"],
                 "on": "o_custkey = c_custkey"},
                {"op": "join", "table": "lineitem",
                 "select": ["l_orderkey", "l_suppkey",
                            "CAST(round(l_extendedprice * 100) AS BIGINT)"
                            " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
                            " AS rev_cp"],
                 "on": "l_orderkey = o_orderkey"},
                {"op": "join", "table": "supplier", "broadcast": True,
                 "select": ["s_suppkey", "s_nationkey"],
                 "on": "l_suppkey = s_suppkey"
                       " AND c_nationkey = s_nationkey"},
                {"op": "join", "table": "nation", "broadcast": True,
                 "select": ["n_nationkey", "n_name", "n_regionkey"],
                 "on": "s_nationkey = n_nationkey"},
                {"op": "join", "table": "region", "broadcast": True,
                 "filter": "r_name = 'ASIA'", "select": ["r_regionkey"],
                 "on": "n_regionkey = r_regionkey"},
                {"op": "agg", "group_by": ["n_name"],
                 "aggs": ["sum(rev_cp) / 10000.0D AS revenue",
                          "count(*) AS n_items"]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "revenue_by_nation")


SQL_REVENUE_BY_NATION = r"""
SELECT n.n_name,
       sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0
           AS revenue,
       count(*) AS n_items
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


_EXTENSION_QUERIES.update(
    {
        "events_cube": q_events_cube,
        "pagerank": q_pagerank,
        "boilerplate": q_boilerplate,
        "weighted_sample": q_weighted_sample,
        "pricing_summary": q_pricing_summary,
        "returned_items": q_returned_items,
        "small_qty_revenue": q_small_qty_revenue,
        "supplier_part_counts": q_supplier_part_counts,
        "order_priority_counts": q_order_priority_counts,
        "customer_distribution": q_customer_distribution,
        "promo_revenue_share": q_promo_revenue_share,
        "disjunctive_revenue": q_disjunctive_revenue,
        "idle_rich_customers": q_idle_rich_customers,
        "top_supplier": q_top_supplier,
        "cheapest_supplier": q_cheapest_supplier,
        "top_unshipped": q_top_unshipped,
        "revenue_by_nation": q_revenue_by_nation,
    }
)

_EXTENSION_ORACLES.update(
    {
        "events_cube": SQL_EVENTS_CUBE,
        "pagerank": SQL_PAGERANK,
        "boilerplate": SQL_BOILERPLATE,
        "weighted_sample": SQL_WEIGHTED_SAMPLE,
        "pricing_summary": SQL_PRICING_SUMMARY,
        "returned_items": SQL_RETURNED_ITEMS,
        "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
        "supplier_part_counts": SQL_SUPPLIER_PART_COUNTS,
        "order_priority_counts": SQL_ORDER_PRIORITY_COUNTS,
        "customer_distribution": SQL_CUSTOMER_DISTRIBUTION,
        "promo_revenue_share": SQL_PROMO_REVENUE_SHARE,
        "disjunctive_revenue": SQL_DISJUNCTIVE_REVENUE,
        "idle_rich_customers": SQL_IDLE_RICH_CUSTOMERS,
        "top_supplier": SQL_TOP_SUPPLIER,
        "cheapest_supplier": SQL_CHEAPEST_SUPPLIER,
        "top_unshipped": SQL_TOP_UNSHIPPED,
        "revenue_by_nation": SQL_REVENUE_BY_NATION,
    }
)


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k frequent values (`operators/sketches.py:heavy_hitters`):
    map-side-combined count over the value domain, then TakeOrdered of
    the k winners with a deterministic (count desc, value asc) tiebreak
    — the frequency table, not the input, is what gets ranked."""
    from database_transportor_spark.operators.sketches import heavy_hitters

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return heavy_hitters(events, "user_id", k=10)


SQL_HEAVY_HITTERS = r"""
WITH c AS (
    SELECT user_id, count(*) AS n FROM events GROUP BY user_id
), ranked AS (
    SELECT user_id, n,
           row_number() OVER (ORDER BY n DESC, user_id ASC) AS rank
    FROM c
)
SELECT user_id, n, rank FROM ranked WHERE rank <= 10
"""


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per user (`operators/temporal.py:gap_fill`):
    per-key date spine from a (min,max) aggregate + sequence() explode —
    no global calendar cross join; absent days filled with 0."""
    from database_transportor_spark.operators.temporal import gap_fill

    ev = _read_events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n_events"))
    return gap_fill(daily, ["user_id"], "day", "1 day", value_cols=["n_events"])


SQL_GAP_FILL = r"""
WITH d AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
), span AS (
    SELECT user_id, min(day) AS lo, max(day) AS hi FROM d GROUP BY user_id
), spine AS (
    SELECT user_id, unnest(generate_series(lo, hi, INTERVAL '1 day')) AS day
    FROM span
)
SELECT s.user_id, s.day, coalesce(d.n_events, 0) AS n_events
FROM spine s LEFT JOIN d ON s.user_id = d.user_id AND s.day = d.day
"""


def q_sample_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-k-per-group sampling
    (`operators/corpus.py:sample_per_group`): 20 docs per source by
    multiplicative-hash order — one window shuffle, reproducible by any
    ANSI SQL engine."""
    from database_transportor_spark.operators.corpus import sample_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = sample_per_group(
        docs, "doc_id", ["source"], k=20, hash_fn="multiplicative"
    )
    return out.select("doc_id", "source")


SQL_SAMPLE_GROUP = r"""
SELECT doc_id, source FROM (
    SELECT doc_id, source,
           row_number() OVER (
               PARTITION BY source
               ORDER BY ((doc_id * 2654435761) % 4294967296) % 2147483648,
                        doc_id
           ) AS rn
    FROM documents
) WHERE rn <= 20
"""


_EXTENSION_QUERIES.update(
    {
        "heavy_hitters": q_heavy_hitters,
        "gap_fill": q_gap_fill,
        "sample_group": q_sample_group,
    }
)

_EXTENSION_ORACLES.update(
    {
        "heavy_hitters": SQL_HEAVY_HITTERS,
        "gap_fill": SQL_GAP_FILL,
        "sample_group": SQL_SAMPLE_GROUP,
    }
)


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (`operators/corpus.py:winsorize`): exact
    [p05, p95] percentile bounds per language — one group-count-sized
    aggregate broadcast back, clip is a narrow projection."""
    from database_transportor_spark.operators.corpus import winsorize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = winsorize(docs, "n_chars", ["lang"], p_lo=0.05, p_hi=0.95)
    return out.select(
        "doc_id", "lang", F.round("n_chars_wins", 6).alias("n_chars_wins")
    )


SQL_WINSORIZE = r"""
WITH b AS (
    SELECT lang,
           quantile_cont(n_chars, 0.05) AS lo,
           quantile_cont(n_chars, 0.95) AS hi
    FROM documents GROUP BY lang
)
SELECT doc_id, d.lang,
       round(least(greatest(CAST(n_chars AS DOUBLE), b.lo), b.hi), 6)
           AS n_chars_wins
FROM documents d JOIN b ON d.lang = b.lang
"""


#: Z-order harness parameters — shared by the Spark query and the
#: generated oracle so the bit-interleave expressions stay in lockstep.
_Z_BITS = 8


def _z_terms_sql(var: str, idx: int, ncols: int, bits: int) -> str:
    return " + ".join(
        f"((({var} >> {b}) & 1) << {b * ncols + idx})" for b in range(bits)
    )


def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-curve layout key (`operators/layout.py:zorder_key`) over
    (user_id, value-cents): min/max bucketing to 8 bits each, bit planes
    interleaved — the clustering key a layout rewrite sorts by so file
    min/max stats prune scans on either column.  Key computation is a
    narrow projection; only the (min,max) bounds aggregate runs ahead."""
    from database_transportor_spark.operators.layout import zorder_key

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = zorder_key(ev, ["user_id", "cents"], bits=_Z_BITS)
    return out.select("event_id", "zkey")


SQL_ZORDER = f"""
WITH src AS (
    SELECT event_id, user_id,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
), mm AS (
    SELECT CAST(min(user_id) AS DOUBLE) AS ulo, CAST(max(user_id) AS DOUBLE) AS uhi,
           CAST(min(cents) AS DOUBLE) AS clo, CAST(max(cents) AS DOUBLE) AS chi
    FROM src
), b AS (
    SELECT event_id,
           least(greatest(CAST(floor((CAST(user_id AS DOUBLE) - ulo) * 255.0
                                     / (uhi - ulo)) AS BIGINT), 0), 255) AS bu,
           least(greatest(CAST(floor((CAST(cents AS DOUBLE) - clo) * 255.0
                                     / (chi - clo)) AS BIGINT), 0), 255) AS bc
    FROM src, mm
)
SELECT event_id,
       {_z_terms_sql('bu', 0, 2, _Z_BITS)}
     + {_z_terms_sql('bc', 1, 2, _Z_BITS)} AS zkey
FROM b
"""


def q_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup clustering — operator composition: IVF-bucketed
    cosine pairs (`similarity.py:cosine_pairs`) feed connected components
    (`dedup.py:dedup_clusters`); every vector gets cluster_id = min
    reachable vec_id.  The pair graph, not the corpus, is what the
    clustering step touches."""
    from database_transportor_spark.operators.dedup import dedup_clusters
    from database_transportor_spark.operators.similarity import cosine_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = cosine_pairs(emb, "vec_id", "embedding", threshold=0.3, stride=37)
    return dedup_clusters(
        emb.select("vec_id"), pairs.select("id_a", "id_b"), id_col="vec_id"
    )


SQL_SEMANTIC_CLUSTERS = """
WITH RECURSIVE cent AS (
    SELECT vec_id AS cid, embedding AS ce FROM embeddings
    WHERE vec_id % 37 = 0 ORDER BY vec_id LIMIT 64
), assign AS (
    SELECT vec_id, embedding, bucket FROM (
        SELECT e.vec_id, e.embedding, c.cid AS bucket,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c
    ) WHERE rn = 1
), pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM assign a JOIN assign b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
), edges AS (
    SELECT id_a AS s, id_b AS d FROM pairs
    UNION ALL SELECT id_b, id_a FROM pairs
), reach AS (
    SELECT vec_id AS id, vec_id AS r FROM embeddings
    UNION
    SELECT e.d AS id, reach.r FROM reach JOIN edges e ON e.s = reach.id
)
SELECT id AS vec_id, min(r) AS cluster_id FROM reach GROUP BY id
"""


_EXTENSION_QUERIES.update(
    {
        "winsorize": q_winsorize,
        "zorder": q_zorder,
        "semantic_clusters": q_semantic_clusters,
    }
)

_EXTENSION_ORACLES.update(
    {
        "winsorize": SQL_WINSORIZE,
        "zorder": SQL_ZORDER,
        "semantic_clusters": SQL_SEMANTIC_CLUSTERS,
    }
)


def q_rollup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count continuous aggregate
    (`operators/rollup.py:time_rollup` with the `hll` mergeable): daily
    distinct users computed by MERGING hour-level DataSketches HLL
    sketches, never re-scanning raw events.  Oracle = accuracy contract:
    exact distinct plus a Spark-computed flag that (a) the merged
    estimate is within 5% and (b) it equals the estimate from a direct
    one-level sketch over raw data (sketch-union exactness)."""
    from database_transportor_spark.operators.rollup import (
        hll_estimates,
        time_rollup,
    )

    ev = _read_events(spark, sf_dir)
    levels = time_rollup(
        ev, "ts", [], {"users": ("hll", "user_id"), "n_events": ("count", None)},
        ["1 hour", "1 day"],
    )
    day = hll_estimates(levels["1 day"], ["users"]).withColumnRenamed(
        "users", "merged_est"
    )
    direct = (
        ev.groupBy(F.window("ts", "1 day").getField("start").alias("bucket_start"))
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.round(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")))
            .cast("long")
            .alias("direct_est"),
        )
    )
    return day.join(direct, "bucket_start").select(
        "bucket_start",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("exact_users").cast("long").alias("exact_users"),
        (
            (F.abs(F.col("merged_est") - F.col("exact_users"))
             <= F.col("exact_users") * 0.05)
            & (F.col("merged_est") == F.col("direct_est"))
        ).alias("within_bound"),
    )


SQL_ROLLUP_DISTINCT = r"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
       count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_bound
FROM events
GROUP BY 1
"""


_EXTENSION_QUERIES.update({"rollup_distinct": q_rollup_distinct})
_EXTENSION_ORACLES.update({"rollup_distinct": SQL_ROLLUP_DISTINCT})


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit (`operators/validate.py:k_anonymity`): (lang,
    source) combinations covering fewer than 15 documents — one
    map-side-combined groupBy, output bounded by the rare combos."""
    from database_transportor_spark.operators.validate import k_anonymity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return k_anonymity(docs, ["lang", "source"], k=15)


SQL_K_ANONYMITY = r"""
SELECT lang, source, count(*) AS group_size
FROM documents
GROUP BY lang, source
HAVING count(*) < 15
"""


_EXTENSION_QUERIES.update({"k_anonymity": q_k_anonymity})
_EXTENSION_ORACLES.update({"k_anonymity": SQL_K_ANONYMITY})


def q_fuzzy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy catalog dedup (`operators/fuzzy.py:fuzzy_pairs`): distinct
    part names (exact dups canonicalized FIRST — fuzzy work runs on the
    value domain, not the row count) trigram-paired at Jaccard ≥ 0.4.
    The inverted gram-hash index means only names sharing a gram ever
    meet — never an N² name cross join."""
    from database_transportor_spark.operators.fuzzy import fuzzy_pairs

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    names = part.groupBy(
        F.lower(F.trim(F.col("p_name"))).alias("nm")
    ).agg(F.min("p_partkey").alias("id"))
    return fuzzy_pairs(names, "id", "nm", threshold=0.4)


SQL_FUZZY_PARTS = r"""
WITH names AS (
    SELECT lower(trim(p_name)) AS nm, min(p_partkey) AS id
    FROM part GROUP BY 1
), g0 AS (
    SELECT id,
           list_distinct(list_transform(range(1, greatest(length(nm) - 2, 0) + 1),
                                        i -> nm[i:i+2])) AS gs
    FROM names
), ex AS (
    SELECT id, unnest(gs) AS g FROM g0
), sizes AS (
    SELECT id, count(*) AS ng FROM ex GROUP BY id
), inter AS (
    SELECT a.id AS id_a, b.id AS id_b, count(*) AS intersection
    FROM ex a JOIN ex b ON a.g = b.g AND a.id < b.id
    GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.intersection,
       sa.ng + sb.ng - i.intersection AS union_size
FROM inter i
JOIN sizes sa ON sa.id = i.id_a
JOIN sizes sb ON sb.id = i.id_b
WHERE i.intersection >= 0.4 * (sa.ng + sb.ng - i.intersection)
"""


_EXTENSION_QUERIES.update({"fuzzy_parts": q_fuzzy_parts})
_EXTENSION_ORACLES.update({"fuzzy_parts": SQL_FUZZY_PARTS})


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift report (`operators/validate.py:psi_drift`):
    PSI of document length between two sources — per-bucket exact
    counts, proportions, and log-term; the table PSI is the sum.  Each
    side is scanned once into a bins+2-row bucket table."""
    from database_transportor_spark.operators.validate import psi_drift

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.filter(F.col("source") == "src0")
    b = docs.filter(F.col("source") == "src1")
    return psi_drift(a, b, "n_chars", bins=12, lo=0.0, hi=600.0)


SQL_PSI_DRIFT = r"""
WITH bk AS (
    SELECT source,
           CAST(CASE WHEN v < 0.0 THEN 0
                     WHEN v >= 600.0 THEN 13
                     ELSE FLOOR(v / 50.0) + 1 END AS BIGINT) AS bucket
    FROM (SELECT source, CAST(n_chars AS DOUBLE) AS v FROM documents
          WHERE n_chars IS NOT NULL AND source IN ('src0', 'src1'))
), a AS (
    SELECT bucket, count(*) AS n_a FROM bk WHERE source = 'src0' GROUP BY 1
), b AS (
    SELECT bucket, count(*) AS n_b FROM bk WHERE source = 'src1' GROUP BY 1
), j AS (
    SELECT coalesce(a.bucket, b.bucket) AS bucket,
           coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
    FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
), p AS (
    SELECT bucket, n_a, n_b,
           greatest(n_a / (SELECT sum(n_a) FROM j), 1e-6) AS pa,
           greatest(n_b / (SELECT sum(n_b) FROM j), 1e-6) AS pb
    FROM j
)
SELECT bucket, n_a, n_b,
       round(pa, 6) AS pct_a,
       round(pb, 6) AS pct_b,
       round((pa - pb) * ln(pa / pb), 6) AS psi_term
FROM p
"""


_EXTENSION_QUERIES.update({"psi_drift": q_psi_drift})
_EXTENSION_ORACLES.update({"psi_drift": SQL_PSI_DRIFT})


def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 5-step user journeys
    (`operators/funnel.py:top_paths`): per-user sorted-array fold (one
    shuffle, no window), journey-frequency count, TakeOrdered top-20
    with deterministic tiebreak."""
    from database_transportor_spark.operators.funnel import top_paths

    ev = _read_events(spark, sf_dir)
    return top_paths(
        ev, "user_id", "event_type", "ts", max_len=5, k=20,
        tiebreak_col="event_id",
    )


SQL_TOP_PATHS = r"""
WITH j AS (
    SELECT user_id,
           array_to_string(list_slice(
               list(event_type ORDER BY ts, event_id), 1, 5), '>') AS path
    FROM events GROUP BY user_id
), c AS (
    SELECT path, count(*) AS n_users FROM j GROUP BY path
), r AS (
    SELECT path, n_users,
           row_number() OVER (ORDER BY n_users DESC, path ASC) AS rank
    FROM c
)
SELECT path, n_users, rank FROM r WHERE rank <= 20
"""


_EXTENSION_QUERIES.update({"top_paths": q_top_paths})
_EXTENSION_ORACLES.update({"top_paths": SQL_TOP_PATHS})


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of daily event counts
    (`operators/temporal.py:ewma`): the recurrence runs as a JVM-side
    sorted-array fold (each output depends on the previous OUTPUT — no
    SQL window frame can express it); alpha=0.25 is binary-exact, so the
    fold is bit-reproducible across engines."""
    from database_transportor_spark.operators.temporal import ewma

    ev = _read_events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("double").alias("n_events"))
    out = ewma(daily, ["user_id"], "day", "n_events", alpha=0.25)
    return out.select(
        "user_id", "day", "n_events", F.round("ewma", 6).alias("ewma")
    )


SQL_EWMA = r"""
WITH RECURSIVE d AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(*) AS DOUBLE) AS x
    FROM events GROUP BY 1, 2
), s AS (
    SELECT user_id, day, x,
           row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
    FROM d
), r AS (
    SELECT user_id, day, x, rn, x AS ewma FROM s WHERE rn = 1
    UNION ALL
    SELECT s.user_id, s.day, s.x, s.rn, 0.25 * s.x + 0.75 * r.ewma
    FROM s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, day, x AS n_events, round(ewma, 6) AS ewma FROM r
"""


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution
    (`operators/funnel.py:attribute_conversions`): every purchase
    credits the latest view/click of the same user in the trailing day —
    computed as a struct max inside a RANGE window over exact integer
    microseconds, so there is NO touches-to-conversions join at all."""
    from database_transportor_spark.operators.funnel import attribute_conversions

    ev = _read_events(spark, sf_dir)
    return attribute_conversions(
        ev, "user_id", "event_type", "ts",
        touch_types=["view", "click"], conversion_type="purchase",
        value_col="value", model="last", lookback_sec=86400,
        tiebreak_col="event_id",
    )


SQL_ATTRIBUTION = r"""
SELECT user_id, ts AS conversion_ts,
       tch.e AS attributed_type, tch.t AS touch_ts,
       n_touches, value
FROM (
    SELECT user_id, ts, event_type, value,
           max(CASE WHEN event_type IN ('view', 'click')
                    THEN {'t': ts, 'b': event_id, 'e': event_type} END)
               OVER w AS tch,
           count(CASE WHEN event_type IN ('view', 'click') THEN 1 END)
               OVER w AS n_touches
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
)
WHERE event_type = 'purchase'
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic (`operators/skew.py:skew_report`): the
    10 heaviest order keys in lineitem with share and uniform-multiple —
    one combined count, two scalar aggregates, TakeOrdered."""
    from database_transportor_spark.operators.skew import skew_report

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return skew_report(l, ["l_orderkey"], top_k=10)


SQL_SKEW_REPORT = r"""
WITH c AS (
    SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1
), t AS (
    SELECT CAST(sum(n) AS BIGINT) AS rows_, count(*) AS keys_ FROM c
), ranked AS (
    SELECT l_orderkey, n,
           round(n / (SELECT rows_ FROM t), 6) AS share,
           round(n * (SELECT keys_ FROM t) / (SELECT rows_ FROM t), 2) AS skew_x,
           row_number() OVER (ORDER BY n DESC, l_orderkey ASC) AS rank
    FROM c
)
SELECT l_orderkey, n, share, skew_x, rank FROM ranked WHERE rank <= 10
"""


def q_key_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery (`operators/validate.py:discover_keys`):
    four candidate column sets over lineitem checked in ONE aggregation
    pass — the uniqueness question every migration starts with.  (The
    synthetic fixture's (l_orderkey, l_linenumber) is deliberately NOT
    unique, unlike real TPC-H — the report shows it.)"""
    from database_transportor_spark.operators.validate import discover_keys

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return discover_keys(
        l,
        [
            ["l_orderkey"],
            ["l_orderkey", "l_linenumber"],
            ["l_orderkey", "l_linenumber", "l_partkey"],
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        ],
    )


SQL_KEY_DISCOVERY = r"""
SELECT c AS candidate, n_rows, n_distinct, n_with_nulls,
       (n_distinct = n_rows AND n_with_nulls = 0) AS is_key
FROM (
    SELECT 'l_orderkey' AS c, count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_distinct,
           CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_with_nulls
    FROM lineitem
    UNION ALL
    SELECT 'l_orderkey,l_linenumber', count(*),
           count(DISTINCT (l_orderkey, l_linenumber)),
           CAST(sum(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_orderkey,l_linenumber,l_partkey', count(*),
           count(DISTINCT (l_orderkey, l_linenumber, l_partkey)),
           CAST(sum(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL
                         OR l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_orderkey,l_partkey,l_suppkey,l_linenumber', count(*),
           count(DISTINCT (l_orderkey, l_partkey, l_suppkey, l_linenumber)),
           CAST(sum(CASE WHEN l_orderkey IS NULL OR l_partkey IS NULL
                         OR l_suppkey IS NULL OR l_linenumber IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
)
"""


_EXTENSION_QUERIES.update(
    {
        "ewma": q_ewma,
        "attribution": q_attribution,
        "skew_report": q_skew_report,
        "key_discovery": q_key_discovery,
    }
)

_EXTENSION_ORACLES.update(
    {
        "ewma": SQL_EWMA,
        "attribution": SQL_ATTRIBUTION,
        "skew_report": SQL_SKEW_REPORT,
        "key_discovery": SQL_KEY_DISCOVERY,
    }
)


def q_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine flow (`operators/validate.py:split_valid`): rule
    violations are ROUTED with machine-readable reason labels instead of
    aborting the batch — one projection computes every rule flag, two
    filter branches over the same scan, zero shuffle."""
    from database_transportor_spark.operators.validate import split_valid

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    _clean, quar = split_valid(
        orders,
        [
            {"rule": "range", "column": "o_totalprice", "max": 400000.0},
            {"rule": "accepted_values", "column": "o_orderstatus",
             "values": ["F", "O"]},
            {"rule": "expression", "name": "dated",
             "sql": "o_orderdate < timestamp'2001-06-01'"},
        ],
    )
    return quar.select(
        "o_orderkey",
        F.col("__violations").alias("violations"),
    )


SQL_QUARANTINE = r"""
SELECT o_orderkey, violations FROM (
    SELECT o_orderkey,
           list_filter(
               [CASE WHEN o_totalprice IS NOT NULL AND o_totalprice > 400000.0
                     THEN 'range:o_totalprice' END,
                CASE WHEN o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('F', 'O')
                     THEN 'accepted_values:o_orderstatus' END,
                CASE WHEN NOT coalesce(o_orderdate < TIMESTAMP '2001-06-01',
                                       FALSE)
                     THEN 'expression:dated' END],
               x -> x IS NOT NULL) AS violations
    FROM orders
) WHERE len(violations) > 0
"""


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII exposure audit (`operators/corpus.py:detect_pii`): every
    (string column, pattern) pair counted in ONE conditional-aggregation
    scan.  The fixture corpus is PII-free, so a synthetic contact column
    (one email per 10 docs) proves the regexes fire and the clean
    columns prove the zero-hit report."""
    from database_transportor_spark.operators.corpus import detect_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = docs.withColumn(
        "contact",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.lit("user"), F.col("doc_id").cast("string"),
                     F.lit("@example.com")),
        ).otherwise(F.lit("no contact on file")),
    )
    return detect_pii(aug, columns=["text", "contact"])


SQL_PII_SCAN = r"""
WITH aug AS (
    SELECT text,
           CASE WHEN doc_id % 10 = 0
                THEN 'user' || doc_id || '@example.com'
                ELSE 'no contact on file' END AS contact
    FROM documents
), n AS (SELECT count(*) AS n_rows FROM aug)
SELECT col AS "column", pattern, (SELECT n_rows FROM n) AS n_rows,
       n_hits, round(n_hits / (SELECT n_rows FROM n), 6) AS hit_rate
FROM (
    SELECT 'text' AS col, 'email' AS pattern,
           CAST(sum(CASE WHEN regexp_matches(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_hits FROM aug
    UNION ALL
    SELECT 'text', 'ipv4',
           CAST(sum(CASE WHEN regexp_matches(text,
               '\b(?:\d{1,3}\.){3}\d{1,3}\b') THEN 1 ELSE 0 END) AS BIGINT)
    FROM aug
    UNION ALL
    SELECT 'text', 'phone',
           CAST(sum(CASE WHEN regexp_matches(text,
               '\+\d[\d()\- ]{7,}\d') THEN 1 ELSE 0 END) AS BIGINT) FROM aug
    UNION ALL
    SELECT 'contact', 'email',
           CAST(sum(CASE WHEN regexp_matches(contact,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
               THEN 1 ELSE 0 END) AS BIGINT) FROM aug
    UNION ALL
    SELECT 'contact', 'ipv4',
           CAST(sum(CASE WHEN regexp_matches(contact,
               '\b(?:\d{1,3}\.){3}\d{1,3}\b') THEN 1 ELSE 0 END) AS BIGINT)
    FROM aug
    UNION ALL
    SELECT 'contact', 'phone',
           CAST(sum(CASE WHEN regexp_matches(contact,
               '\+\d[\d()\- ]{7,}\d') THEN 1 ELSE 0 END) AS BIGINT) FROM aug
)
"""


def q_evolve_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving MERGE (`operators/mutations.py:align_schemas` +
    `merge_upsert`): the feed carries a NEW column the live table lacks;
    alignment adds it as a typed NULL on the live side, the single-
    shuffle MERGE then upserts — additive evolution with no rewrite of
    untouched history."""
    from database_transportor_spark.operators.mutations import (
        align_schemas,
        merge_upsert,
    )

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    live = part.select("p_partkey", "p_name", "p_retailprice")
    feed = (
        part.filter(F.col("p_partkey") % 3 == 0)
        .select(
            "p_partkey", "p_name",
            (F.round(F.col("p_retailprice") * 100).cast("long") + 100)
            .alias("price_cents"),
        )
        .withColumn("p_retailprice",
                    F.col("price_cents") / F.lit(100.0))
        .select("p_partkey", "p_name", "p_retailprice", "price_cents")
    )
    t, s = align_schemas(live, feed)
    return merge_upsert(t, s, "p_partkey")


SQL_EVOLVE_MERGE = r"""
WITH feed AS (
    SELECT p_partkey, p_name,
           (CAST(round(p_retailprice * 100) AS BIGINT) + 100) / 100.0
               AS p_retailprice,
           CAST(round(p_retailprice * 100) AS BIGINT) + 100 AS price_cents
    FROM part WHERE p_partkey % 3 = 0
)
SELECT p.p_partkey, p.p_name,
       coalesce(f.p_retailprice, p.p_retailprice) AS p_retailprice,
       f.price_cents
FROM part p LEFT JOIN feed f ON p.p_partkey = f.p_partkey
"""


_EXTENSION_QUERIES.update(
    {
        "quarantine": q_quarantine,
        "pii_scan": q_pii_scan,
        "evolve_merge": q_evolve_merge,
    }
)

_EXTENSION_ORACLES.update(
    {
        "quarantine": SQL_QUARANTINE,
        "pii_scan": SQL_PII_SCAN,
        "evolve_merge": SQL_EVOLVE_MERGE,
    }
)


def q_stream_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC sink (streaming/merge_sink.py with ``op_col``):
    an op-tagged parquet feed drains through availableNow — updates
    (U, keys %4==0), deletes (D, keys %5==0 among the live), inserts
    (I, keys beyond the live range).  The oracle replays the same
    change set as batch SQL; a hash match proves the streaming CDC path
    lands the exact batch answer, including the removals; the
    retained seq column (NULL for untouched live rows) is hashed too."""
    import tempfile
    import uuid

    from database_transportor_spark.sources.catalog import ParquetCatalog
    from database_transportor_spark.streaming.merge_sink import stream_merge_sink

    work = tempfile.mkdtemp(prefix=f"scdc_{uuid.uuid4().hex[:8]}_")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    live = cust.filter(F.col("c_custkey") % 3 != 0)
    updates = (
        cust.filter(F.col("c_custkey") % 4 == 0)
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 500, 2))
        .withColumn("op", F.lit("U"))
    )
    deletes = (
        cust.filter((F.col("c_custkey") % 5 == 0) & (F.col("c_custkey") % 3 != 0))
        .withColumn("op", F.lit("D"))
    )
    inserts = (
        cust.filter(F.col("c_custkey") % 7 == 0)
        .withColumn("c_custkey", F.col("c_custkey") + 1_000_000)
        .withColumn("op", F.lit("I"))
    )
    # seq must order SAME-KEY changes deterministically: a key hit by both
    # U (%4) and D (%5) resolves delete-last — encode op rank into seq
    feed = (
        updates.unionByName(deletes).unionByName(inserts)
        .withColumn(
            "seq",
            F.col("c_custkey") * 10
            + F.when(F.col("op") == "D", 2).otherwise(1),
        )
    )
    tgt = ParquetCatalog(spark, f"{work}/tgt")
    tgt.write(live, "sc", mode="overwrite")
    feed.coalesce(4).write.mode("overwrite").parquet(f"{work}/feed")
    stream_merge_sink(
        spark, f"{work}/feed", tgt, "sc", "c_custkey",
        seq_col="seq", checkpoint=f"{work}/ckpt", op_col="op",
    )
    return tgt.read("sc")


SQL_STREAM_CDC = """
WITH base AS (
    SELECT c_custkey, c_name, c_acctbal FROM customer
), live AS (
    SELECT * FROM base WHERE c_custkey % 3 <> 0
), feed AS (
    SELECT c_custkey, c_name,
           round(c_acctbal + 500, 2) AS c_acctbal, 'U' AS op
    FROM base WHERE c_custkey % 4 = 0
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal, 'D'
    FROM base WHERE c_custkey % 5 = 0 AND c_custkey % 3 <> 0
    UNION ALL
    SELECT c_custkey + 1000000, c_name, c_acctbal, 'I'
    FROM base WHERE c_custkey % 7 = 0
), latest AS (
    -- highest seq per key wins; seq encodes op rank so a key hit by both
    -- U and D resolves delete-last (matching the Spark feed's seq)
    SELECT c_custkey, c_name, c_acctbal, op,
           c_custkey * 10 + CASE WHEN op = 'D' THEN 2 ELSE 1 END AS seq
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY c_custkey
            ORDER BY CASE WHEN op = 'D' THEN 2 ELSE 1 END DESC
        ) AS rn
        FROM feed
    ) WHERE rn = 1
)
SELECT COALESCE(f.c_custkey, l.c_custkey) AS c_custkey,
       CASE WHEN f.c_custkey IS NOT NULL THEN f.c_name ELSE l.c_name END
           AS c_name,
       CASE WHEN f.c_custkey IS NOT NULL THEN f.c_acctbal
            ELSE l.c_acctbal END AS c_acctbal,
       f.seq AS seq
FROM live l FULL OUTER JOIN latest f ON l.c_custkey = f.c_custkey
WHERE COALESCE(f.op, '') <> 'D'
"""


_EXTENSION_QUERIES.update({"stream_cdc": q_stream_cdc})
_EXTENSION_ORACLES.update({"stream_cdc": SQL_STREAM_CDC})


def q_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup refresh
    (`operators/rollup.py:refresh_rollup`): build the daily rollup from
    the first half of the stream, then refresh with the full stream —
    only tail buckets recompute (pushdown ts filter), yet the committed
    table must hash-equal the full recompute (the oracle)."""
    import tempfile
    import uuid

    from database_transportor_spark.operators.rollup import refresh_rollup
    from database_transportor_spark.sources.catalog import ParquetCatalog

    work = tempfile.mkdtemp(prefix=f"rrq_{uuid.uuid4().hex[:8]}_")
    ev = _read_events(spark, sf_dir)
    cutoff = F.lit("2024-01-16").cast("timestamp")
    cat = ParquetCatalog(spark, work)
    measures = {"n_events": ("count", None), "n_users": ("hll", "user_id")}
    refresh_rollup(
        cat, "daily", ev.filter(F.col("ts") < cutoff), "ts",
        ["event_type"], measures, "1 day",
    )
    out = refresh_rollup(
        cat, "daily", ev, "ts", ["event_type"], measures, "1 day",
    )
    from database_transportor_spark.operators.rollup import hll_estimates

    exact = ev.groupBy(
        F.window("ts", "1 day").getField("start").alias("bucket_start"),
        "event_type",
    ).agg(F.count_distinct("user_id").alias("exact_users"))
    est = hll_estimates(out, ["n_users"]).withColumnRenamed(
        "n_users", "est_users"
    )
    return est.join(exact, ["bucket_start", "event_type"]).select(
        "bucket_start",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("exact_users").cast("long").alias("exact_users"),
        (
            F.abs(F.col("est_users") - F.col("exact_users"))
            <= F.greatest(F.col("exact_users") * 0.05, F.lit(2.0))
        ).alias("within_bound"),
    )


SQL_ROLLUP_REFRESH = r"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
       event_type,
       count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_bound
FROM events
GROUP BY 1, 2
"""


_EXTENSION_QUERIES.update({"rollup_refresh": q_rollup_refresh})
_EXTENSION_ORACLES.update({"rollup_refresh": SQL_ROLLUP_REFRESH})


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations in one pass
    (`operators/maintenance.py:corr_matrix`): qty / price / discount over
    lineitem, all sums in exact DECIMAL so r is bit-stable across
    engines and partitionings."""
    from database_transportor_spark.operators.maintenance import corr_matrix

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct"),
    )
    return corr_matrix(l, ["qty", "price_cents", "disc_pct"])


SQL_CORR_MATRIX = r"""
WITH src AS (
    SELECT CAST(round(l_quantity) AS BIGINT) AS q,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
           CAST(round(l_discount * 100) AS BIGINT) AS d
    FROM lineitem
), s AS (
    SELECT CAST(count(*) AS BIGINT) AS cnt,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(p) AS DOUBLE) AS sp,
           CAST(sum(d) AS DOUBLE) AS sd,
           CAST(sum(q * q) AS DOUBLE) AS sqq,
           CAST(sum(p * p) AS DOUBLE) AS spp,
           CAST(sum(d * d) AS DOUBLE) AS sdd,
           CAST(sum(q * p) AS DOUBLE) AS sqp,
           CAST(sum(q * d) AS DOUBLE) AS sqd,
           CAST(sum(p * d) AS DOUBLE) AS spd
    FROM src
)
SELECT 'qty' AS col_a, 'price_cents' AS col_b, cnt AS n,
       round((n * sqp - sq * sp)
             / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)), 6) AS r
FROM s
UNION ALL
SELECT 'qty', 'disc_pct', cnt,
       round((n * sqd - sq * sd)
             / sqrt((n * sqq - sq * sq) * (n * sdd - sd * sd)), 6)
FROM s
UNION ALL
SELECT 'price_cents', 'disc_pct', cnt,
       round((n * spd - sp * sd)
             / sqrt((n * spp - sp * sp) * (n * sdd - sd * sd)), 6)
FROM s
"""


_EXTENSION_QUERIES.update({"corr_matrix": q_corr_matrix})
_EXTENSION_ORACLES.update({"corr_matrix": SQL_CORR_MATRIX})


# --- TPC-H-shaped additions, batch 3 (Q7/Q8/Q9/Q11/Q12/Q18/Q20/Q21) ----


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral trade volume between two nations by ship
    year.  Both nation dims are pre-filtered to the two names and
    BROADCAST onto supplier/customer, so the pair predicate prunes the
    fact early; the only shuffles are lineitem⋈orders (orderkey) and
    orders⋈customer (custkey).  Exact-integer revenue.  Declarative:
    the pair-filtered nation dim joins twice under different aliases."""
    maps = {
        "nation_trade_volume": {
            "original_table": "lineitem",
            "extra_conditions": [
                "l_shipdate >= TIMESTAMP '1996-01-01'",
                "l_shipdate < TIMESTAMP '1999-01-01'",
            ],
            "columns": {
                "l_orderkey": "l_orderkey",
                "l_suppkey": "l_suppkey",
                "l_shipdate": "l_shipdate",
                "l_extendedprice": "l_extendedprice",
                "l_discount": "l_discount",
            },
            "post_ops": [
                {"op": "derive", "columns": {
                    "rev_cp": "CAST(round(l_extendedprice * 100) AS BIGINT)"
                              " * (100 - CAST(round(l_discount * 100) AS BIGINT))",
                }},
                {"op": "join", "table": "supplier", "broadcast": True,
                 "select": ["s_suppkey", "s_nationkey"],
                 "on": "l_suppkey = s_suppkey"},
                {"op": "join", "table": "nation", "broadcast": True,
                 "filter": "n_name IN ('NATION_1', 'NATION_2')",
                 "select": ["n_nationkey AS sn_key",
                            "n_name AS supp_nation"],
                 "on": "s_nationkey = sn_key"},
                {"op": "join", "table": "orders",
                 "select": ["o_orderkey", "o_custkey"],
                 "on": "l_orderkey = o_orderkey"},
                {"op": "join", "table": "customer",
                 "select": ["c_custkey", "c_nationkey"],
                 "on": "o_custkey = c_custkey"},
                {"op": "join", "table": "nation", "broadcast": True,
                 "filter": "n_name IN ('NATION_1', 'NATION_2')",
                 "select": ["n_nationkey AS cn_key",
                            "n_name AS cust_nation"],
                 "on": "c_nationkey = cn_key"},
                {"op": "filter", "condition":
                    "(supp_nation = 'NATION_1' AND cust_nation = 'NATION_2')"
                    " OR (supp_nation = 'NATION_2'"
                    " AND cust_nation = 'NATION_1')"},
                {"op": "agg",
                 "group_by": ["supp_nation", "cust_nation",
                              "CAST(year(l_shipdate) AS INT) AS l_year"],
                 "aggs": ["sum(rev_cp) / 10000.0D AS revenue",
                          "count(*) AS n_items"]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "nation_trade_volume")


SQL_NATION_TRADE_VOLUME = r"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
           AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY 1, 2, 3
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: of all ECONOMY-part revenue sold to
    ASIA customers per order year, the fraction supplied from NATION_5.
    Numerator and denominator are conditional sums of the SAME exact-int
    revenue column in ONE aggregation — no second pass, no self-join.
    part / supplier / nation / region are all broadcast.  Declarative:
    six chained join stages + conditional-sum agg."""
    maps = {
        "market_share": {
            "original_table": "lineitem",
            "columns": {
                "l_orderkey": "l_orderkey",
                "l_partkey": "l_partkey",
                "l_suppkey": "l_suppkey",
                "l_extendedprice": "l_extendedprice",
                "l_discount": "l_discount",
            },
            "post_ops": [
                {"op": "derive", "columns": {
                    "rev_cp": "CAST(round(l_extendedprice * 100) AS BIGINT)"
                              " * (100 - CAST(round(l_discount * 100) AS BIGINT))",
                }},
                {"op": "join", "table": "part", "broadcast": True,
                 "filter": "p_type = 'ECONOMY'", "select": ["p_partkey"],
                 "on": "l_partkey = p_partkey"},
                {"op": "join", "table": "supplier", "broadcast": True,
                 "select": ["s_suppkey", "s_nationkey"],
                 "on": "l_suppkey = s_suppkey"},
                {"op": "join", "table": "nation", "broadcast": True,
                 "select": ["n_nationkey AS sn_key",
                            "n_name AS supp_nation"],
                 "on": "s_nationkey = sn_key"},
                {"op": "join", "table": "orders",
                 "filter": "o_orderdate >= TIMESTAMP '1996-01-01'"
                           " AND o_orderdate < TIMESTAMP '1999-01-01'",
                 "select": ["o_orderkey", "o_custkey", "o_orderdate"],
                 "on": "l_orderkey = o_orderkey"},
                {"op": "join", "table": "customer",
                 "select": ["c_custkey", "c_nationkey"],
                 "on": "o_custkey = c_custkey"},
                {"op": "join", "table": "nation", "broadcast": True,
                 "select": ["n_nationkey AS cn_key", "n_regionkey"],
                 "on": "c_nationkey = cn_key"},
                {"op": "join", "table": "region", "broadcast": True,
                 "filter": "r_name = 'ASIA'", "select": ["r_regionkey"],
                 "on": "n_regionkey = r_regionkey"},
                {"op": "agg",
                 "group_by": ["CAST(year(o_orderdate) AS INT) AS o_year"],
                 "aggs": [
                     "sum(CASE WHEN supp_nation = 'NATION_5' THEN rev_cp"
                     " ELSE 0 END) AS nation_cp",
                     "sum(rev_cp) AS total_cp",
                 ]},
                {"op": "derive", "columns": {
                    "mkt_share": "round(nation_cp / total_cp, 6)",
                    "total_revenue": "total_cp / 10000.0D",
                }},
                {"op": "select",
                 "columns": ["o_year", "mkt_share", "total_revenue"]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "market_share")


SQL_MARKET_SHARE = r"""
WITH rev AS (
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_cp,
           n1.n_name AS supp_nation
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region ON n2.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev_cp
                           ELSE 0 END) AS DOUBLE)
             / CAST(sum(rev_cp) AS DOUBLE), 6) AS mkt_share,
       sum(rev_cp) / 10000.0 AS total_revenue
FROM rev
GROUP BY o_year
"""


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-type profit by supplier nation and order
    year for '%gear%' parts.  profit = revenue − retail cost, both kept
    in exact 10^-4-dollar integers until the final divide (there is no
    partsupp table in this corpus, so p_retailprice×qty stands in for
    supplycost×qty).  part + supplier + nation broadcast; the fact-side
    shuffle is lineitem⋈orders only.  Declarative join/derive/agg."""
    maps = {
        "product_profit": {
            "original_table": "lineitem",
            "columns": {
                "l_orderkey": "l_orderkey",
                "l_partkey": "l_partkey",
                "l_suppkey": "l_suppkey",
                "l_quantity": "l_quantity",
                "l_extendedprice": "l_extendedprice",
                "l_discount": "l_discount",
            },
            "post_ops": [
                {"op": "join", "table": "part", "broadcast": True,
                 "filter": "p_name LIKE '%gear%'",
                 "select": ["p_partkey", "p_retailprice"],
                 "on": "l_partkey = p_partkey"},
                {"op": "join", "table": "supplier", "broadcast": True,
                 "select": ["s_suppkey", "s_nationkey"],
                 "on": "l_suppkey = s_suppkey"},
                {"op": "join", "table": "nation", "broadcast": True,
                 "select": ["n_nationkey", "n_name AS nation"],
                 "on": "s_nationkey = n_nationkey"},
                {"op": "join", "table": "orders",
                 "select": ["o_orderkey", "o_orderdate"],
                 "on": "l_orderkey = o_orderkey"},
                {"op": "derive", "columns": {
                    "profit_cp":
                        "CAST(round(l_extendedprice * 100) AS BIGINT)"
                        " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
                        " - CAST(round(p_retailprice * 100) AS BIGINT)"
                        " * CAST(round(l_quantity) AS BIGINT) * 100",
                }},
                {"op": "agg",
                 "group_by": ["nation",
                              "CAST(year(o_orderdate) AS INT) AS o_year"],
                 "aggs": ["sum(profit_cp) / 10000.0D AS sum_profit",
                          "count(*) AS n_items"]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "product_profit")


SQL_PRODUCT_PROFIT = r"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))
           - CAST(round(p_retailprice * 100) AS BIGINT)
             * CAST(round(l_quantity) AS BIGINT) * 100) / 10000.0
           AS sum_profit,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
"""


def q_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped late-shipment priority split: for lineitems
    shipped in 1997 more than 180 days after their order date, count
    high-priority (1-URGENT / 2-HIGH) vs lower-priority order lines per
    return flag.  The ship-year filter is PUSHED to the parquet scan;
    the lateness predicate (a cross-table comparison) runs right after
    the single lineitem⋈orders shuffle.  Declarative join/filter/agg."""
    maps = {
        "late_priority_counts": {
            "original_table": "lineitem",
            "extra_conditions": [
                "l_shipdate >= TIMESTAMP '1997-01-01'",
                "l_shipdate < TIMESTAMP '1998-01-01'",
            ],
            "columns": {
                "l_orderkey": "l_orderkey",
                "l_shipdate": "l_shipdate",
                "l_returnflag": "l_returnflag",
            },
            "post_ops": [
                {"op": "join", "table": "orders",
                 "select": ["o_orderkey", "o_orderdate", "o_orderpriority"],
                 "on": "l_orderkey = o_orderkey"},
                {"op": "filter",
                 "condition": "datediff(l_shipdate, o_orderdate) > 180"},
                {"op": "agg", "group_by": ["l_returnflag"],
                 "aggs": [
                     "sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
                     " THEN 1 ELSE 0 END) AS high_line_count",
                     "sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
                     " THEN 0 ELSE 1 END) AS low_line_count",
                 ]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "late_priority_counts")


SQL_LATE_PRIORITY_COUNTS = r"""
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND date_diff('day', o_orderdate, l_shipdate) > 180
GROUP BY l_returnflag
"""


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume customers: orders whose total
    quantity exceeds 300.  AGGREGATE-BEFORE-JOIN: lineitem is reduced to
    (orderkey, sum_qty) with map-side partials and HAVING-filtered to a
    tiny survivor set BEFORE touching orders/customer — at 100 TB the
    join probes ~0.3% of orders, and AQE broadcasts the survivor side.
    Declarative two-map DAG: the HAVING-filtered pre-aggregation is its
    own map, joined via side='target'."""
    maps = {
        "big_orders": {
            "original_table": "lineitem",
            "columns": {"l_orderkey": "l_orderkey", "l_quantity": "l_quantity"},
            "post_ops": [
                {"op": "agg", "group_by": ["l_orderkey"],
                 "aggs": ["sum(CAST(round(l_quantity) AS BIGINT))"
                          " AS sum_qty"]},
                {"op": "filter", "condition": "sum_qty > 300"},
            ],
        },
        "large_volume_customers": {
            "original_table": "orders",
            "columns": {
                "o_orderkey": "o_orderkey",
                "o_custkey": "o_custkey",
                "o_orderdate": "o_orderdate",
                "o_totalprice": "o_totalprice",
            },
            "transport_after": ["big_orders"],
            "post_ops": [
                {"op": "join", "table": "big_orders", "side": "target",
                 "on": "o_orderkey = l_orderkey"},
                {"op": "join", "table": "customer",
                 "select": ["c_custkey", "c_name"],
                 "on": "o_custkey = c_custkey"},
                {"op": "derive", "columns": {
                    "o_total": "CAST(round(o_totalprice * 100) AS BIGINT)"
                               " / 100.0D"}},
                {"op": "select", "columns": [
                    "c_name", "c_custkey", "o_orderkey", "o_orderdate",
                    "o_total", "sum_qty"]},
            ],
        },
    }
    return _run(spark, sf_dir, maps, "large_volume_customers")


SQL_LARGE_VOLUME_CUSTOMERS = r"""
WITH big AS (
    SELECT l_orderkey, sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS o_total,
       sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important-stock scan (no partsupp table here, so
    lineitem revenue from EUROPE-nation suppliers stands in for
    supplycost×availqty): parts holding more than 0.1% of the region's
    total value.  The grand total is a 1-row aggregate crossJoin-
    broadcast onto the per-part rollup — the corpus is scanned ONCE and
    re-aggregated from the (partkey,value) table, never rescanned.
    Declarative two-map DAG: the per-part rollup is its own map; the
    report joins it from the part dim and cross-joins its 1-row total."""
    maps = {
        "part_values": {
            "original_table": "lineitem",
            "columns": {
                "l_partkey": "l_partkey",
                "l_suppkey": "l_suppkey",
                "l_extendedprice": "l_extendedprice",
            },
            "post_ops": [
                {"op": "join", "table": "supplier", "broadcast": True,
                 "select": ["s_suppkey", "s_nationkey"],
                 "on": "l_suppkey = s_suppkey"},
                {"op": "join", "table": "nation", "broadcast": True,
                 "select": ["n_nationkey", "n_regionkey"],
                 "on": "s_nationkey = n_nationkey"},
                {"op": "join", "table": "region", "broadcast": True,
                 "filter": "r_name = 'EUROPE'", "select": ["r_regionkey"],
                 "on": "n_regionkey = r_regionkey"},
                {"op": "agg", "group_by": ["l_partkey"],
                 "aggs": ["sum(CAST(round(l_extendedprice * 100) AS BIGINT))"
                          " AS val_cents"]},
            ],
        },
        "important_parts": {
            "original_table": "part",
            "columns": {"p_partkey": "p_partkey"},
            "transport_after": ["part_values"],
            "post_ops": [
                {"op": "join", "table": "part_values", "side": "target",
                 "on": "p_partkey = l_partkey"},
                {"op": "join", "table": "part_values", "side": "target",
                 "how": "cross", "broadcast": True,
                 "select": ["sum(val_cents) AS tot_cents"]},
                {"op": "filter",
                 "condition": "val_cents * 1000 > tot_cents"},
                {"op": "derive",
                 "columns": {"part_value": "val_cents / 100.0D"}},
                {"op": "select", "columns": ["l_partkey", "part_value"]},
            ],
        },
    }
    return _run(spark, sf_dir, maps, "important_parts")


SQL_IMPORTANT_PARTS = r"""
WITH v AS (
    SELECT l_partkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS val_cents
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    GROUP BY l_partkey
), t AS (SELECT sum(val_cents) AS tot_cents FROM v)
SELECT l_partkey, val_cents / 100.0 AS part_value
FROM v, t
WHERE val_cents * 1000 > tot_cents
"""


def q_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped promotion-eligible suppliers: anyone who shipped
    more than 50 units of a single 'small%' part during 1997.  The
    nested-EXISTS of the original is rewritten as PRE-AGGREGATION
    (suppkey,partkey → sum qty) against a broadcast filtered part dim,
    then a distinct suppkey probe of the broadcast supplier dim — no
    correlated subquery, no fact-sized hash table (the same rewrite that
    fixed order_priority_counts' 18× blow-up; see SCALE.md).
    Declarative: join/agg/filter/distinct stages."""
    maps = {
        "promotable_suppliers": {
            "original_table": "lineitem",
            "extra_conditions": [
                "l_shipdate >= TIMESTAMP '1997-01-01'",
                "l_shipdate < TIMESTAMP '1998-01-01'",
            ],
            "columns": {
                "l_suppkey": "l_suppkey",
                "l_partkey": "l_partkey",
                "l_quantity": "l_quantity",
            },
            "post_ops": [
                {"op": "join", "table": "part", "broadcast": True,
                 "filter": "p_name LIKE 'small%'", "select": ["p_partkey"],
                 "on": "l_partkey = p_partkey"},
                {"op": "agg", "group_by": ["l_suppkey", "l_partkey"],
                 "aggs": ["sum(CAST(round(l_quantity) AS BIGINT))"
                          " AS sum_qty"]},
                {"op": "filter", "condition": "sum_qty > 50"},
                {"op": "select", "columns": ["l_suppkey"]},
                {"op": "distinct"},
                {"op": "join", "table": "supplier", "broadcast": True,
                 "select": ["s_suppkey", "s_name"],
                 "on": "l_suppkey = s_suppkey"},
                {"op": "select", "columns": ["s_suppkey", "s_name"]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "promotable_suppliers")


SQL_PROMOTABLE_SUPPLIERS = r"""
WITH hot AS (
    SELECT DISTINCT l_suppkey
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 50
)
SELECT s_suppkey, s_name
FROM hot
JOIN supplier ON l_suppkey = s_suppkey
"""


def q_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped waiting-orders scan: suppliers who were the ONLY
    late shipper (>365 days after order date) on a finished multi-
    supplier order.  The original's EXISTS + NOT-EXISTS self-joins are
    rewritten as ONE aggregation to (order, supplier, late-flag) plus a
    window over the order — the fact is shuffled twice (orderkey, then
    the window's orderkey reuse), never self-joined three times.
    Declarative: join/agg/window_agg/filter/agg stages."""
    maps = {
        "sole_late_supplier": {
            "original_table": "lineitem",
            "columns": {
                "l_orderkey": "l_orderkey",
                "l_suppkey": "l_suppkey",
                "l_shipdate": "l_shipdate",
            },
            "post_ops": [
                {"op": "join", "table": "orders",
                 "filter": "o_orderstatus = 'F'",
                 "select": ["o_orderkey", "o_orderdate"],
                 "on": "l_orderkey = o_orderkey"},
                {"op": "agg", "group_by": ["l_orderkey", "l_suppkey"],
                 "aggs": [
                     "max(CASE WHEN datediff(l_shipdate, o_orderdate) > 365"
                     " THEN 1 ELSE 0 END) AS late"]},
                {"op": "window_agg", "partition_by": ["l_orderkey"],
                 "aggs": {"n_supp": "count(*)", "n_late": "sum(late)"}},
                {"op": "filter",
                 "condition": "late = 1 AND n_supp >= 2 AND n_late = 1"},
                {"op": "agg", "group_by": ["l_suppkey"],
                 "aggs": ["count(*) AS numwait"]},
                {"op": "join", "table": "supplier", "broadcast": True,
                 "select": ["s_suppkey", "s_name"],
                 "on": "l_suppkey = s_suppkey"},
                {"op": "select", "columns": ["s_name", "numwait"]},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "sole_late_supplier")


SQL_SOLE_LATE_SUPPLIER = r"""
WITH ls AS (
    SELECT l_orderkey, l_suppkey,
           max(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 365
                    THEN 1 ELSE 0 END) AS late
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY 1, 2
), w AS (
    SELECT l_suppkey, late,
           count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
           sum(late) OVER (PARTITION BY l_orderkey) AS n_late
    FROM ls
)
SELECT s_name, count(*) AS numwait
FROM w
JOIN supplier ON l_suppkey = s_suppkey
WHERE late = 1 AND n_supp >= 2 AND n_late = 1
GROUP BY s_name
"""


_EXTENSION_QUERIES.update(
    {
        "nation_trade_volume": q_nation_trade_volume,
        "market_share": q_market_share,
        "product_profit": q_product_profit,
        "late_priority_counts": q_late_priority_counts,
        "large_volume_customers": q_large_volume_customers,
        "important_parts": q_important_parts,
        "promotable_suppliers": q_promotable_suppliers,
        "sole_late_supplier": q_sole_late_supplier,
    }
)

_EXTENSION_ORACLES.update(
    {
        "nation_trade_volume": SQL_NATION_TRADE_VOLUME,
        "market_share": SQL_MARKET_SHARE,
        "product_profit": SQL_PRODUCT_PROFIT,
        "late_priority_counts": SQL_LATE_PRIORITY_COUNTS,
        "large_volume_customers": SQL_LARGE_VOLUME_CUSTOMERS,
        "important_parts": SQL_IMPORTANT_PARTS,
        "promotable_suppliers": SQL_PROMOTABLE_SUPPLIERS,
        "sole_late_supplier": SQL_SOLE_LATE_SUPPLIER,
    }
)


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped revenue-change forecast: one scan, ZERO joins,
    every predicate (ship year, discount band, quantity cap) PUSHED to
    the parquet reader, exact-integer discount revenue.  The whole query
    is a single map-side-combinable aggregate — the canonical 'filters
    reach the scan' probe for the plan census."""
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return l.agg(
        (F.sum(cents * disc) / F.lit(10000.0)).alias("revenue"),
        F.count("*").alias("n_items"),
    )


SQL_FORECAST_REVENUE = r"""
SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


_EXTENSION_QUERIES.update({"forecast_revenue": q_forecast_revenue})
_EXTENSION_ORACLES.update({"forecast_revenue": SQL_FORECAST_REVENUE})


def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document paragraph dedup (`operators/text.py:
    dedup_paragraphs`, the CCNet/RefinedWeb boilerplate rule): segments
    between ' the ' tokens stand in for paragraphs on these single-line
    fixtures; any segment found in 2+ distinct docs is removed from all
    of them, order preserved.  Two corpus shuffles (count-distinct on
    the paragraph, reassembly on the doc) + a left-anti probe of the
    tiny hot set.  Oracle: same hot-set rule via DuckDB list lambdas."""
    from database_transportor_spark.operators.text import dedup_paragraphs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    out = dedup_paragraphs(
        docs, sep=" the ", max_docs=1, out_col="cleaned")
    return out.select("doc_id", "cleaned", "n_paras_removed")


SQL_DEDUP_PARAGRAPHS = """
WITH t AS (SELECT doc_id, string_split(text, ' the ') AS arr
           FROM documents),
p AS (SELECT doc_id, unnest(arr) AS para FROM t),
hot AS (SELECT para FROM p GROUP BY para
        HAVING count(DISTINCT doc_id) > 1),
hl AS (SELECT coalesce(list(para), []) AS hot_list FROM hot)
SELECT doc_id,
       array_to_string(
         list_filter(arr, x -> NOT list_contains(hot_list, x)),
         ' the ') AS cleaned,
       coalesce(CAST(len(arr) - len(list_filter(arr,
            x -> NOT list_contains(hot_list, x))) AS BIGINT), 0)
         AS n_paras_removed
FROM t, hl
"""


_EXTENSION_QUERIES.update({"dedup_paragraphs": q_dedup_paragraphs})
_EXTENSION_ORACLES.update({"dedup_paragraphs": SQL_DEDUP_PARAGRAPHS})


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means (`operators/similarity.py:
    kmeans_lloyd`): k=8, 2 iterations, components on an exact 1e-6
    integer grid so every distance is int64 and the whole fit is
    bit-reproducible.  Oracle: the same two iterations unrolled as
    relational SQL (explode dims → distance join → argmin → grid-snapped
    means) — a hash match proves init, assignment, tie-breaks, and the
    centroid update all agree."""
    from database_transportor_spark.operators.similarity import kmeans_lloyd

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans_lloyd(emb, k=8, iters=2)


SQL_KMEANS_CLUSTERS = r"""
WITH qx AS (
    SELECT vec_id, CAST(i AS INTEGER) AS pos,
           CAST(round(CAST(list_extract(embedding, i) AS DOUBLE)
                      * 1000000.0) AS BIGINT) AS v
    FROM embeddings, range(1, 65) AS t(i)
),
init AS (
    SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
           AS cid
    FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
),
c0 AS (SELECT cid, pos, v FROM qx JOIN init USING (vec_id)),
d1 AS (
    SELECT q.vec_id, c.cid, sum((q.v - c.v) * (q.v - c.v)) AS d
    FROM qx q JOIN c0 c ON q.pos = c.pos
    GROUP BY 1, 2
),
a1 AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d1) WHERE rn = 1
),
c1m AS (
    SELECT a1.cid, q.pos,
           CAST(round(CAST(sum(q.v) AS DOUBLE) / count(*)) AS BIGINT) AS v
    FROM a1 JOIN qx q USING (vec_id)
    GROUP BY 1, 2
),
c1 AS (  -- empty clusters carry the previous centroid forward
    SELECT c0.cid, c0.pos, coalesce(c1m.v, c0.v) AS v
    FROM c0 LEFT JOIN c1m ON c0.cid = c1m.cid AND c0.pos = c1m.pos
),
d2 AS (
    SELECT q.vec_id, c.cid, sum((q.v - c.v) * (q.v - c.v)) AS d
    FROM qx q JOIN c1 c ON q.pos = c.pos
    GROUP BY 1, 2
),
a2 AS (
    SELECT vec_id, cid, d FROM (
        SELECT vec_id, cid, d,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM d2) WHERE rn = 1
),
s2 AS (
    SELECT cid AS cluster, count(*) AS n_points, sum(d) AS inertia
    FROM a2 GROUP BY 1
),
m2 AS (
    SELECT a2.cid AS cluster, q.pos,
           CAST(round(CAST(sum(q.v) AS DOUBLE) / count(*)) AS BIGINT) AS v
    FROM a2 JOIN qx q USING (vec_id)
    GROUP BY 1, 2
),
cs AS (SELECT cluster, sum(v) AS centroid_sum FROM m2 GROUP BY 1)
SELECT cluster, n_points, inertia, centroid_sum
FROM s2 JOIN cs USING (cluster)
"""


_EXTENSION_QUERIES.update({"kmeans_clusters": q_kmeans_clusters})
_EXTENSION_ORACLES.update({"kmeans_clusters": SQL_KMEANS_CLUSTERS})


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment near-dups (`operators/dedup.py:
    ngram_containment_pairs`): pairs where EITHER doc's capped shingle
    set is ≥30% inside the other — the sub-document duplication measure
    (quotes, reposts, boilerplate-wrapped copies) that symmetric Jaccard
    under-scores.  Integer outputs only; same inverted-index plan and
    max_df stop-phrase cap as ngram_jaccard.  Oracle: string-shingle
    recomputation of both directions in DuckDB."""
    from database_transportor_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ngram_containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.3, max_df=100,
        min_partitions=spark.sparkContext.defaultParallelism,
    )
    return out.select(
        "id_a", "id_b",
        F.col("intersection").cast("long").alias("intersection"),
        F.col("size_a").cast("long").alias("size_a"),
        F.col("size_b").cast("long").alias("size_b"),
    )


SQL_CONTAINMENT_PAIRS = """
WITH t AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                                        i -> array_to_string(toks[i:i+2], ' '))) AS shingles
    FROM t
), ex0 AS (
    SELECT doc_id, unnest(shingles) AS s FROM sh
), hot AS (
    SELECT s FROM ex0 GROUP BY s HAVING count(*) > 100
), ex AS (
    SELECT doc_id, s FROM ex0 WHERE s NOT IN (SELECT s FROM hot)
), sizes AS (
    SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS intersection
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.intersection,
       sa.n AS size_a, sb.n AS size_b
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE greatest(i.intersection / sa.n, i.intersection / sb.n) >= 0.3
"""


_EXTENSION_QUERIES.update({"containment_pairs": q_containment_pairs})
_EXTENSION_ORACLES.update({"containment_pairs": SQL_CONTAINMENT_PAIRS})


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self bigram LM scoring (`operators/text.py:
    bigram_lm_score`): per-doc mean ln p(w_i|w_{i-1}) with add-1
    smoothing, context counts derived from the bigram table and V from
    the unigram vocabulary.  Bigrams built array-side (zip_with of two
    slices — no lag window over the token stream), model broadcast back.
    Oracle: identical counts + expression shape in DuckDB, round(4)."""
    from database_transportor_spark.operators.text import bigram_lm_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bigram_lm_score(docs)


SQL_BIGRAM_LM = r"""
WITH t AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
    FROM documents
    WHERE trim(text) <> ''
), bg0 AS (
    -- indexed list lambda: no constant position cap, any doc length
    SELECT doc_id,
           unnest(list_transform(toks[1:len(toks)-1],
                                 (x, i) -> {'w1': x, 'w2': toks[i+1]})) AS b
    FROM t
), bg AS (
    SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg0
    WHERE b.w1 <> '' AND b.w2 <> ''
), bc AS (
    SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2
), cc AS (
    SELECT w1, sum(c12) AS c1 FROM bc GROUP BY 1
), toks AS (
    SELECT unnest(toks) AS token FROM t
), voc AS (
    SELECT count(DISTINCT token) AS v FROM toks WHERE token <> ''
), logp AS (
    SELECT bc.w1, bc.w2,
           ln((c12 + 1.0) / (c1 + 1.0 * v)) AS logp
    FROM bc JOIN cc USING (w1), voc
)
SELECT doc_id,
       round(avg(logp), 4) AS avg_logprob2,
       count(*) AS n_scored
FROM bg JOIN logp USING (w1, w2)
GROUP BY doc_id
"""


_EXTENSION_QUERIES.update({"bigram_lm": q_bigram_lm})
_EXTENSION_ORACLES.update({"bigram_lm": SQL_BIGRAM_LM})


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (`streaming/events.py:
    stream_enrich_agg`): the event STREAM broadcast-joined to the batch
    customer dim (stateless — no join state across micro-batches), then
    a watermarked daily rollup per market segment.  availableNow makes
    the streamed result equal the batch join+rollup, which the oracle
    recomputes in SQL."""
    import uuid

    from database_transportor_spark.streaming.events import stream_enrich_agg

    dim = spark.read.parquet(f"{sf_dir}/customer.parquet")
    out = stream_enrich_agg(
        spark,
        f"{sf_dir}/events.parquet",
        dim,
        sink_table=f"se_{uuid.uuid4().hex[:8]}",
    )
    return out.select(
        "window_start", "c_mktsegment",
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value", "min_value", "max_value",
    )


SQL_STREAM_ENRICH = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       c_mktsegment,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""


_EXTENSION_QUERIES.update({"stream_enrich": q_stream_enrich})
_EXTENSION_ORACLES.update({"stream_enrich": SQL_STREAM_ENRICH})


def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution
    (`operators/corpus.py:source_divergence`) — the outlier-source
    detector.  One corpus shuffle; per-term doubles rounded to a fixed
    grid and summed as DECIMAL so the total is accumulation-order
    independent.  Oracle: identical counts + expression shape in
    DuckDB."""
    from database_transportor_spark.operators.corpus import source_divergence

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return source_divergence(docs)


SQL_SOURCE_DIVERGENCE = r"""
WITH st AS (
    SELECT source, token, count(*) AS cst FROM (
        SELECT source,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents
        WHERE trim(text) <> ''
    ) WHERE token <> ''
    GROUP BY 1, 2
), tt AS (
    SELECT token, sum(cst) AS ct FROM st GROUP BY 1
), srt AS (
    SELECT source, sum(cst) AS ns FROM st GROUP BY 1
), g AS (SELECT sum(ct) AS n FROM tt)
SELECT source, max(ns) AS n_tokens,
       CAST(round(sum(CAST(round(
                (CAST(cst AS DOUBLE) / CAST(ns AS DOUBLE))
                * ln((CAST(cst AS DOUBLE) / CAST(ns AS DOUBLE))
                     / (CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))), 12)
            AS DECIMAL(28,12))), 6) AS DOUBLE) AS kl_divergence
FROM st JOIN tt USING (token) JOIN srt USING (source), g
GROUP BY source
"""


_EXTENSION_QUERIES.update({"source_divergence": q_source_divergence})
_EXTENSION_ORACLES.update({"source_divergence": SQL_SOURCE_DIVERGENCE})


def q_contained_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-removal application of containment dedup (`operators/dedup.py:
    drop_contained_docs`): any document ≥90%-contained in a LARGER
    document is dropped in one deterministic pass (chains collapse to
    the longest copy; ties keep the lower id).  Victims are an ids-only,
    threshold-bounded set anti-joined back onto the corpus.  Oracle:
    the same victim rule over the string-shingle pair table."""
    from database_transportor_spark.operators.dedup import drop_contained_docs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = drop_contained_docs(
        docs, "doc_id", "text", n=3, threshold=0.9, max_df=100,
        min_partitions=spark.sparkContext.defaultParallelism,
    )
    return out.select("doc_id", "source", "n_chars")


SQL_CONTAINED_DEDUP = """
WITH t AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents
), sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                                        i -> array_to_string(toks[i:i+2], ' '))) AS shingles
    FROM t
), ex0 AS (
    SELECT doc_id, unnest(shingles) AS s FROM sh
), hot AS (
    SELECT s FROM ex0 GROUP BY s HAVING count(*) > 100
), ex AS (
    SELECT doc_id, s FROM ex0 WHERE s NOT IN (SELECT s FROM hot)
), sizes AS (
    SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), victims AS (
    SELECT DISTINCT CASE
        WHEN i >= 0.9 * sa.n AND sa.n < sb.n THEN id_a
        WHEN i >= 0.9 * sb.n AND sb.n <= sa.n THEN id_b
    END AS victim
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE (i >= 0.9 * sa.n AND sa.n < sb.n)
       OR (i >= 0.9 * sb.n AND sb.n <= sa.n)
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT victim FROM victims)
"""


_EXTENSION_QUERIES.update({"contained_dedup": q_contained_dedup})
_EXTENSION_ORACLES.update({"contained_dedup": SQL_CONTAINED_DEDUP})


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus URL canonicalization (`operators/corpus.py:
    normalize_urls`): scheme/host case, default ports, www., fragments,
    tracking params, and trailing slashes collapse, so recrawls of the
    same page dedup exactly.  The fixture has no URL column, so one is
    derived deterministically from (source, doc_id) with every noise
    class injected; the oracle rebuilds AND renormalizes it in SQL.
    Zero-shuffle normalization; one count aggregation."""
    from database_transportor_spark.operators.corpus import normalize_urls

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with_url = docs.withColumn(
        "url",
        F.concat(
            F.lit("HTTPS://WWW."), F.upper(F.col("source")),
            F.lit(".Example.COM:443/docs/"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit("/?utm_source=feed&ref="),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("#sec"),
        ),
    )
    out = normalize_urls(with_url, "url")
    return (
        out.groupBy("url_norm", "url_host", "url_domain")
        .agg(F.count("*").alias("n_docs"))
    )


SQL_URL_DEDUP = r"""
WITH raw AS (
    SELECT concat('HTTPS://WWW.', upper(source), '.Example.COM:443/docs/',
                  CAST(doc_id % 50 AS VARCHAR), '/?utm_source=feed&ref=',
                  CAST(doc_id % 7 AS VARCHAR), '#sec') AS url
    FROM documents
), s1 AS (
    SELECT regexp_replace(trim(url), '#.*', '', 'g') AS u FROM raw
), s2 AS (
    SELECT CASE WHEN regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1) = ''
                THEN u
                ELSE lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1))
                     || substr(u, length(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)) + 1)
           END AS u
    FROM s1
), s3 AS (
    SELECT regexp_replace(
             regexp_replace(
               regexp_replace(u, '^(http://[^/:?#]*):80([/?].*)?$', '\1\2'),
               '^(https://[^/:?#]*):443([/?].*)?$', '\1\2'),
             '^(https?://)www\.', '\1') AS u
    FROM s2
), s4 AS (
    SELECT regexp_replace(
             regexp_replace(
               regexp_replace(u, '&(utm_[^&#=]*|gclid|fbclid|ref|mc_eid)=[^&#]*', '', 'g'),
               '\?(utm_[^&#=]*|gclid|fbclid|ref|mc_eid)=[^&#]*&', '?', 'g'),
             '\?(utm_[^&#=]*|gclid|fbclid|ref|mc_eid)=[^&#]*$', '') AS u
    FROM s3
), norm AS (
    SELECT regexp_replace(regexp_replace(u, '/+\?', '?', 'g'), '/+$', '')
             AS url_norm
    FROM s4
), hosted AS (
    SELECT url_norm,
           regexp_extract(url_norm, '^[a-z][a-z0-9+.-]*://([^/:?#]*)', 1) AS url_host
    FROM norm
)
SELECT url_norm, url_host,
       regexp_extract(url_host, '([^.]+\.[^.]+)$', 1) AS url_domain,
       count(*) AS n_docs
FROM hosted
GROUP BY 1, 2, 3
"""


def q_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality diagnostic (`operators/skew.py:
    join_size_report`): the exact output size and top contributing keys
    of a lineitem self-join on partkey — computed from the two per-key
    count tables, never by running the fact-sized join.  The number a
    planner checks before an all-pairs-by-key dedup at 100 TB."""
    from database_transportor_spark.operators.skew import join_size_report

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return join_size_report(l, l, ["l_partkey"], top_k=10)


SQL_JOIN_SIZE = """
WITH c AS (
    SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY 1
), contrib AS (
    SELECT l_partkey, n AS n_left, n AS n_right, n * n AS out_rows FROM c
), t AS (
    SELECT CAST(sum(out_rows) AS BIGINT) AS total FROM contrib
)
SELECT l_partkey, n_left, n_right, CAST(out_rows AS BIGINT) AS out_rows,
       round(out_rows / t.total, 6) AS share,
       t.total AS total_out,
       CAST(row_number() OVER (ORDER BY out_rows DESC, l_partkey ASC) AS INT)
         AS rank
FROM contrib, t
ORDER BY out_rows DESC, l_partkey ASC
LIMIT 10
"""


_EXTENSION_QUERIES.update({"url_dedup": q_url_dedup, "join_size": q_join_size})
_EXTENSION_ORACLES.update({"url_dedup": SQL_URL_DEDUP, "join_size": SQL_JOIN_SIZE})


def q_stream_declarative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative spec language over a genuine stream
    (`streaming/declarative.py:run_stream_spec`): the SAME filter /
    static-broadcast-join / derive stages a batch map uses, plus a
    watermarked tumbling-window aggregation, executed via readStream +
    availableNow so the memory-sink snapshot equals the batch
    computation — which is what the DuckDB oracle checks.  State is
    bounded by the watermark; the static customer dim joins statelessly
    (broadcast into every micro-batch)."""
    import uuid

    from database_transportor_spark.sources.catalog import ParquetCatalog
    from database_transportor_spark.streaming.declarative import run_stream_spec

    spec = {
        "source": {"path": f"{sf_dir}/events.parquet", "ts_col": "ts"},
        "watermark": "2 hours",
        "stages": [
            {"op": "filter", "condition": "value IS NOT NULL"},
            {"op": "join", "table": "customer", "broadcast": True,
             "select": ["c_custkey", "c_mktsegment"],
             "on": "user_id % 1000 + 1 = c_custkey"},
            {"op": "derive", "columns": {"v2": "value * 2"}},
            {"op": "stream_window", "window": "1 hour",
             "keys": ["event_type", "c_mktsegment"],
             "aggs": ["count(*) AS n_events",
                      "round(sum(v2), 2) AS sum_v2"]},
        ],
        "sink": {"name": f"decl_{uuid.uuid4().hex[:8]}"},
    }
    out = run_stream_spec(
        spark, spec, catalog=ParquetCatalog(spark, sf_dir),
        state_partitions=8,
    )
    return out.select(
        "window_start", "event_type", "c_mktsegment",
        F.col("n_events").cast("long").alias("n_events"), "sum_v2",
    )


SQL_STREAM_DECLARATIVE = """
SELECT date_trunc('hour', ts) AS window_start, event_type, c_mktsegment,
       count(*) AS n_events,
       round(sum(value * 2), 2) AS sum_v2
FROM events
JOIN customer ON user_id % 1000 + 1 = c_custkey
WHERE value IS NOT NULL
GROUP BY 1, 2, 3
"""


_EXTENSION_QUERIES.update({"stream_declarative": q_stream_declarative})
_EXTENSION_ORACLES.update({"stream_declarative": SQL_STREAM_DECLARATIVE})


def q_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form regression at scale (`operators/experiment.py:
    linear_fit`): price ~ quantity per return flag, fitted from ONE
    aggregation of exact DECIMAL(38) sufficient statistics — no
    iterations, no driver data, group-count-sized output.  Slope /
    intercept / R² each come from a single double division over exact
    integers, so DuckDB (HUGEINT sums) reproduces them bit-for-bit."""
    from database_transportor_spark.operators.experiment import linear_fit

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return linear_fit(
        l, "l_quantity", "l_extendedprice", group_cols=["l_returnflag"]
    )


SQL_TREND_FIT = """
WITH q AS (
    SELECT l_returnflag,
           CAST(round(l_quantity * 100) AS HUGEINT) AS x,
           CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
), s AS (
    SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
           sum(x) AS sx, sum(y) AS sy,
           sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
    FROM q GROUP BY 1
), d AS (
    SELECT l_returnflag, n, sx, sy,
           n * sxy - sx * sy AS num,
           n * sxx - sx * sx AS den_x,
           n * syy - sy * sy AS den_y
    FROM s
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       round(CAST(num AS DOUBLE) / CAST(den_x AS DOUBLE)
             * (100.0 / 100.0), 10) AS slope,
       round(CAST(sy * den_x - num * sx AS DOUBLE)
             / CAST(n * den_x * 100 AS DOUBLE), 10) AS intercept,
       round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
             / (CAST(den_x AS DOUBLE) * CAST(den_y AS DOUBLE)), 10) AS r2
FROM d
"""


_EXTENSION_QUERIES.update({"trend_fit": q_trend_fit})
_EXTENSION_ORACLES.update({"trend_fit": SQL_TREND_FIT})


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-call corpus data card (`operators/corpus.py:corpus_report`):
    exact-dup pressure, language spread with a deterministic top-language
    pick, size shape, and whitespace token total — two map-side
    aggregates + two 1-row broadcasts, one corpus scan."""
    from database_transportor_spark.operators.corpus import corpus_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus_report(docs)


SQL_CORPUS_REPORT = r"""
WITH stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dup_texts,
           round(CAST(count(*) - count(DISTINCT text) AS DOUBLE)
                 / count(*), 6) AS dup_pct,
           round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars,
           round(CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS pct_short,
           CAST(sum(CASE WHEN trim(text) = '' THEN 0
                         ELSE len(string_split_regex(trim(text), '\s+'))
                    END) AS BIGINT) AS total_tokens
    FROM documents
), pl AS (
    SELECT lang, count(*) AS cnt FROM documents GROUP BY 1
), nl AS (
    SELECT CAST(count(*) AS BIGINT) AS n_langs FROM pl
), top AS (
    SELECT lang AS top_lang, cnt FROM pl
    ORDER BY cnt DESC, lang ASC LIMIT 1
)
SELECT s.n_docs, s.n_dup_texts, s.dup_pct, s.avg_chars, s.pct_short,
       s.total_tokens, nl.n_langs, top.top_lang,
       round(CAST(top.cnt AS DOUBLE) / s.n_docs, 6) AS top_lang_pct
FROM stats s, nl, top
"""


_EXTENSION_QUERIES.update({"corpus_report": q_corpus_report})
_EXTENSION_ORACLES.update({"corpus_report": SQL_CORPUS_REPORT})


def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning (`operators/runtime_filter.py:
    bloom_prune_join`): urgent finished orders are too many for a static
    broadcast at 100 TB, so a 2^17-bit Bloom bitmap of their keys is
    built with one narrow agg and applied to lineitem BELOW the shuffle;
    the exact join then removes the bitmap's false positives.  Output is
    row-identical to the plain join by construction — which is exactly
    what the oracle checks.  Plan: one bitmap-bounded collect (2 KiB of
    longs), one codegen'd pre-shuffle filter, one equi-join, one agg."""
    from database_transportor_spark.operators.runtime_filter import (
        bloom_prune_join,
    )

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderstatus") == "F")
    )
    joined = bloom_prune_join(l, o, "l_orderkey", "o_orderkey",
                              num_bits=1 << 17)
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
         / F.lit(100.0)).alias("revenue"),
    )


SQL_BLOOM_PRUNE = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
GROUP BY l_returnflag
"""


_EXTENSION_QUERIES.update({"bloom_prune": q_bloom_prune})
_EXTENSION_ORACLES.update({"bloom_prune": SQL_BLOOM_PRUNE})


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k overlap sketches (`operators/sketches.py:kmv_sketch`
    /`kmv_pairwise`): distinct-order overlap between return-flag segments
    estimated from 512-hash sketches — the corpus is scanned once to
    build one sketch row per segment; every pairwise intersection/union/
    Jaccard then comes from k-sized arrays, never a corpus re-join.
    Oracle-checked via the accuracy contract: the projection carries the
    EXACT pair overlap (computed independently) plus Spark-evaluated
    flags asserting each deterministic estimate landed inside a 4.5-sigma
    (20% of union) envelope; DuckDB emits the same exact values and
    literal TRUEs.

    Round-7 contract-cost fix: the exact overlap used to be a
    distinct×distinct SELF-JOIN (30M rows at x50 — it dominated the
    benched wall at a 17.4× x10/x2 slope and misstated the sketch, per
    the round-6 verdict).  Now each orderkey's flag SET is collected
    once and its ≤C(|flags|,2)=3 pairs exploded — the exact contract is
    one linear agg pass with bounded fan-out, so the benched number is
    the sketch path plus a linear contract, never a quadratic scaffold.
    The full self-join cross-check lives in
    tests/test_sketches.py::TestKMV::test_pairwise_matches_exact_selfjoin.
    Output values are identical, so the oracle SQL and hash are
    unchanged."""
    from database_transportor_spark.operators.pins import pin
    from database_transportor_spark.operators.sketches import (
        kmv_pairwise,
        kmv_sketch,
    )

    k = 512
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sk = kmv_sketch(l, ["l_returnflag"], "l_orderkey", k=k)
    pw = kmv_pairwise(sk, ["l_returnflag"], k=k)

    # one (orderkey → sorted flag set) row per key; |set| ≤ 3 here, and in
    # general the explode below is C(|set|,2) per key — linear in keys
    sets = pin(
        l.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_returnflag")).alias("__fs"))
    )
    c = (
        sets.select(F.explode("__fs").alias("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    fs = F.col("__fs")
    pair_arr = F.flatten(
        F.transform(
            fs,
            lambda x, i: F.transform(
                F.slice(fs, i + F.lit(2), F.size(fs)),
                lambda y: F.struct(x.alias("ga"), y.alias("gb")),
            ),
        )
    )
    ex = (
        sets.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.ga").alias("ga"), F.col("p.gb").alias("gb"))
        .agg(F.count("*").alias("exact_inter"))
    )
    out = (
        pw.join(
            ex,
            (pw["group_a"] == ex["ga"]) & (pw["group_b"] == ex["gb"]),
            "left",
        )
        .join(c.withColumnRenamed("l_returnflag", "group_a")
               .withColumnRenamed("n", "na"), "group_a")
        .join(c.withColumnRenamed("l_returnflag", "group_b")
               .withColumnRenamed("n", "nb"), "group_b")
        .withColumn("exact_inter", F.coalesce("exact_inter", F.lit(0)))
        .withColumn("exact_union", F.col("na") + F.col("nb") - F.col("exact_inter"))
    )
    tol = F.col("exact_union") * 0.2 + 5
    return out.select(
        "group_a",
        "group_b",
        F.col("exact_inter").cast("long").alias("exact_inter"),
        F.col("exact_union").cast("long").alias("exact_union"),
        (F.abs(F.col("inter_est") - F.col("exact_inter")) <= tol)
        .alias("inter_ok"),
        (F.abs(F.col("union_est") - F.col("exact_union")) <= tol)
        .alias("union_ok"),
        (
            F.abs(
                F.col("jaccard_est")
                - F.col("exact_inter") / F.col("exact_union")
            )
            <= 0.1
        ).alias("jaccard_ok"),
    )


SQL_KMV_OVERLAP = """
WITH d AS (
    SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem
), c AS (
    SELECT l_returnflag, count(*) AS n FROM d GROUP BY 1
), pairs AS (
    SELECT ca.l_returnflag AS group_a, cb.l_returnflag AS group_b,
           ca.n AS na, cb.n AS nb
    FROM c ca JOIN c cb ON ca.l_returnflag < cb.l_returnflag
), i AS (
    SELECT a.l_returnflag AS group_a, b.l_returnflag AS group_b,
           count(*) AS exact_inter
    FROM d a JOIN d b
      ON a.l_orderkey = b.l_orderkey AND a.l_returnflag < b.l_returnflag
    GROUP BY 1, 2
)
SELECT p.group_a, p.group_b,
       CAST(coalesce(i.exact_inter, 0) AS BIGINT) AS exact_inter,
       CAST(p.na + p.nb - coalesce(i.exact_inter, 0) AS BIGINT) AS exact_union,
       TRUE AS inter_ok, TRUE AS union_ok, TRUE AS jaccard_ok
FROM pairs p
LEFT JOIN i ON i.group_a = p.group_a AND i.group_b = p.group_b
"""


_EXTENSION_QUERIES.update({"kmv_overlap": q_kmv_overlap})
_EXTENSION_ORACLES.update({"kmv_overlap": SQL_KMV_OVERLAP})


def q_kmv_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lean KMV path (`operators/sketches.py:kmv_sketch`/`kmv_distinct`):
    per-segment distinct-order estimates from saturated 256-hash
    sketches.  This is the query the scale harness times — unlike
    `kmv_overlap` it carries no pairwise self-join scaffold, so the wall
    measures the sketch build itself (one dedupe shuffle + one windowed
    bottom-k, both on the group key).  Contract oracle: exact distinct
    count per group plus a flag that the deterministic estimate landed
    within the 4-sigma envelope (4/sqrt(256) = 25%)."""
    from database_transportor_spark.operators.sketches import (
        kmv_distinct,
        kmv_sketch,
    )

    k = 256
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    est = kmv_distinct(kmv_sketch(l, ["l_returnflag"], "l_orderkey", k=k), k=k)
    exact = (
        l.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("exact_distinct"))
    )
    return (
        est.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_distinct",
            (
                F.abs(F.col("distinct_est") - F.col("exact_distinct"))
                <= F.col("exact_distinct") * 0.25 + 5
            ).alias("est_ok"),
        )
    )


SQL_KMV_GROUPS = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS exact_distinct,
       TRUE AS est_ok
FROM lineitem
GROUP BY l_returnflag
"""


_EXTENSION_QUERIES.update({"kmv_groups": q_kmv_groups})
_EXTENSION_ORACLES.update({"kmv_groups": SQL_KMV_GROUPS})


def q_image_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs end-to-end
    (`operators/media_dedup.py:image_dup_pairs`): synthesize a REAL PNG
    per document — consecutive doc-id pairs share a base image; the odd
    twin gets a +3 brightness shift (dHash-invariant) plus a corner
    patch edit (flips a few gradient bits) — then dHash every image
    through the pure-Python PNG decoder and join candidates in the
    banded Hamming join.  The planted pair set is exactly the
    (2k, 2k+1) pairs; unrelated bases are sha256-derived, so cross-pair
    dHash collisions within Hamming 6 are ~1e-12 probable and the
    deterministic fixture pins the outcome.  Oracle: the closed-form
    planted pairs."""
    import hashlib

    import pandas as pd

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from database_transportor_spark.operators.media_dedup import (
        image_dup_pairs,
    )
    from database_transportor_spark.operators.multimodal import encode_png

    # documents.parquet is ONE file ⇒ one scan partition: without the
    # repartition the whole Python synth+decode chain below runs in a
    # single task (the mjpeg_frames/_m4a_fixture discipline)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("content", BinaryType())])

    def make_png(batches):
        import numpy as np

        h = w = 24
        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                g = d // 2
                blocks = [
                    hashlib.sha256(f"img:{g}:{i}".encode()).digest()
                    for i in range((h * w) // 32 + 1)
                ]
                raw = b"".join(blocks)[: h * w]
                # 0..250 leaves headroom so the +3 shift never clips
                base = (np.frombuffer(raw, dtype=np.uint8) % 251).reshape(
                    h, w, 1
                )
                if d % 2:
                    base = np.clip(base.astype(np.int64) + 3, 0, 255)
                    base = base.astype(np.uint8).copy()
                    base[0:2, 0:2, 0] = 250
                out.append(encode_png(base))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": pd.Series(out, dtype="object")})

    media = docs.mapInPandas(make_png, schema)
    return (
        image_dup_pairs(media, "doc_id", "content")
        .select("id_a", "id_b")
    )


SQL_IMAGE_DUPS = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
WHERE a.doc_id % 2 = 0
"""


def q_audio_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprint near-dup pairs end-to-end
    (`operators/media_dedup.py:audio_dup_pairs`): synthesize a REAL
    PCM-16 WAV per document — consecutive doc-id pairs share a
    frequency-hopping two-tone pattern (sha256-derived band choice per
    frame); the odd twin is 10 dB quieter, which the spectral-contrast
    bits are invariant to — then fingerprint through the real RIFF
    parser and pair in the banded Hamming join.  `max_hamming=4` keeps
    the cross-pair false-positive expectation of the 100-group fixture
    below 1e-3 (two random 2-of-8-band hop patterns must agree on 6+ of
    8 frames).  Oracle: the closed-form planted pairs."""
    import hashlib

    import pandas as pd

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from database_transportor_spark.operators.media_dedup import (
        audio_dup_pairs,
    )
    from database_transportor_spark.operators.multimodal import encode_wav

    frame, n_frames, rate = 1024, 8, 16_000
    # one-file scan ⇒ repartition so the WAV synth + fingerprint Python
    # passes spread across cores (the mjpeg_frames discipline)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .filter(F.col("doc_id") < 200)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("content", BinaryType())])

    # band-center bins of the fingerprint's log-spaced bands (frame=1024)
    import numpy as np

    edges = np.unique(np.geomspace(1, frame // 2 + 1, 9).astype(np.int64))
    centers = [int((edges[i] * edges[i + 1]) ** 0.5) for i in range(8)]

    def make_wav(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                g = d // 2
                digest = hashlib.sha256(f"aud:{g}".encode()).digest()
                amp = 9000 if d % 2 == 0 else 2800  # ~10 dB gain change
                clips = []
                for t in range(n_frames):
                    b1 = digest[2 * t] % 8
                    b2 = digest[2 * t + 1] % 7
                    if b2 >= b1:
                        b2 += 1
                    tt = np.arange(frame) / rate
                    f1 = centers[b1] * rate / frame
                    f2 = centers[b2] * rate / frame
                    x = np.sin(2 * np.pi * f1 * tt) + np.sin(2 * np.pi * f2 * tt)
                    clips.append((amp / 2 * x).astype(np.int16))
                out.append(encode_wav(np.concatenate(clips), rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": pd.Series(out, dtype="object")})

    media = docs.mapInPandas(make_wav, schema)
    return (
        audio_dup_pairs(media, "doc_id", "content",
                        frame=frame, n_frames=n_frames, max_hamming=4)
        .select("id_a", "id_b")
    )


SQL_AUDIO_DUPS = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
WHERE a.doc_id % 2 = 0 AND b.doc_id < 200
"""


_EXTENSION_QUERIES.update({"image_dups": q_image_dups,
                           "audio_dups": q_audio_dups})
_EXTENSION_ORACLES.update({"image_dups": SQL_IMAGE_DUPS,
                           "audio_dups": SQL_AUDIO_DUPS})


def q_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental join-view maintenance end-to-end
    (`operators/rollup.py:join_view_delta`/`refresh_join_view`):
    orders ⋈ lineitem arrives as two batches per side (split on key
    parity); each refresh appends only the DELTA of the view —
    Δ(A⋈B) = ΔA⋈(B∪ΔB) ∪all A_old⋈ΔB — as two broadcast small-big
    joins, never re-running the big-big shuffle.  The returned
    aggregate of the incrementally-built view must equal the one-shot
    join, which is exactly what the oracle computes."""
    from database_transportor_spark import MemoryCatalog
    from database_transportor_spark.operators.rollup import (
        refresh_join_view,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    items = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    ).withColumnRenamed("l_orderkey", "o_orderkey")

    o1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    o2 = orders.filter(F.col("o_orderkey") % 2 == 1)
    l1 = items.filter(F.col("l_quantity") <= 25)
    l2 = items.filter(F.col("l_quantity") > 25)

    cat = MemoryCatalog()
    refresh_join_view(cat, "v", "o", "l", ["o_orderkey"],
                      left_batch=o1, right_batch=l1)
    view = refresh_join_view(cat, "v", "o", "l", ["o_orderkey"],
                             left_batch=o2, right_batch=l2)
    return (
        view.groupBy("o_orderstatus", "l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct("o_orderkey").alias("n_orders"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
    )


SQL_JOIN_VIEW = """
SELECT o_orderstatus, l_returnflag,
       count(*) AS n_rows,
       count(DISTINCT o_orderkey) AS n_orders,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderstatus, l_returnflag
"""


_EXTENSION_QUERIES.update({"join_view": q_join_view})
_EXTENSION_ORACLES.update({"join_view": SQL_JOIN_VIEW})


def q_hist_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram percentiles
    (`operators/sketches.py:hist_measure`/`hist_quantiles` +
    `operators/rollup.py:time_rollup` custom measures): per-returnflag
    price histograms built at the week level and MERGED up to a coarse
    level by element-wise addition — the decomposable-quantile story
    approx percentiles can't tell (a p95 of p95s is not a p95).  The
    projection returns the EXACT total carried by the merged histogram
    plus contract flags that each histogram-read quantile landed within
    one bin width (1000) of the true percentile, which the oracle
    computes exactly."""
    from database_transportor_spark.operators.sketches import (
        hist_measure,
        hist_quantiles,
        hist_table,
    )

    lo, hi, bins = 0.0, 120_000.0, 120
    hm = hist_measure(lo, hi, bins=bins)
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # leaf histograms per (flag, linestatus) merged down to per-flag — the
    # same leaf/merge hierarchy time_rollup runs, with the leaf built by
    # the two-level bin-count plan (hist_table: bit-identical arrays,
    # ~5x cheaper than the conditional-sum measure leaf at 120 bins)
    leaf = hist_table(l, ["l_returnflag", "l_linestatus"],
                      "l_extendedprice", lo, hi, bins=bins)
    merged = leaf.groupBy("l_returnflag").agg(hm[1]("h").alias("h"))
    est = hist_quantiles(merged, "h", [0.5, 0.95], lo, hi, bins=bins)
    # exact contract side via the rank-locating plan — percentile_cont
    # buffers each flag's 10M+ prices in one reducer at x50 (SCALE.md)
    from database_transportor_spark.operators.sketches import (
        grouped_percentiles_scalable,
    )

    exact = grouped_percentiles_scalable(
        l, ["l_returnflag"], "l_extendedprice", [0.5, 0.95],
        out_col="__p",
    ).select(
        "l_returnflag",
        F.element_at("__p", 1).alias("x50"),
        F.element_at("__p", 2).alias("x95"),
    )
    w = (hi - lo) / bins
    return (
        est.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            F.aggregate("h", F.lit(0).cast("long"), lambda a, x: a + x)
            .alias("n_rows"),
            (F.abs(F.col("p50") - F.col("x50")) <= w).alias("p50_ok"),
            (F.abs(F.col("p95") - F.col("x95")) <= w).alias("p95_ok"),
        )
    )


SQL_HIST_ROLLUP = """
SELECT l_returnflag,
       count(l_extendedprice) AS n_rows,
       TRUE AS p50_ok, TRUE AS p95_ok
FROM lineitem
GROUP BY l_returnflag
"""


_EXTENSION_QUERIES.update({"hist_rollup": q_hist_rollup})
_EXTENSION_ORACLES.update({"hist_rollup": SQL_HIST_ROLLUP})


def q_bfs_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source-free BFS shortest paths
    (`operators/graph.py:shortest_paths`): hop distance from every node
    of the undirected customer-supplier trade graph to supplier node 1,
    discovered frontier-by-frontier (first discovery IS the shortest
    distance, so no min-merge).  Oracle: DuckDB recursive CTE over the
    same symmetrized edge set, `min(dist)` per node, both sides capped
    at 6 hops."""
    from database_transportor_spark.operators.graph import shortest_paths

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select((F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"))
    )
    out = shortest_paths(e, [1], directed=False, max_iterations=6)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("landmark").cast("long").alias("landmark"),
        F.col("dist").cast("long").alias("dist"),
    )


SQL_BFS_DIST = """
WITH RECURSIVE d AS (
    SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), e AS (
    SELECT src, dst FROM d UNION SELECT dst, src FROM d
), r(node, dist) AS (
    SELECT CAST(1 AS BIGINT), 0
    UNION
    SELECT e.src, r.dist + 1 FROM r JOIN e ON e.dst = r.node
    WHERE r.dist < 6
)
SELECT node, CAST(1 AS BIGINT) AS landmark,
       CAST(min(dist) AS BIGINT) AS dist
FROM r GROUP BY node
"""


def q_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation
    (`operators/graph.py:label_propagation`, 3 rounds, count-desc/
    label-asc tie-break) over the undirected trade graph; output is the
    community size table.  Oracle: the same three rounds unrolled as
    DuckDB CTEs — join, count, row_number pick — which is possible
    precisely because the tie-break makes every round deterministic."""
    from database_transportor_spark.operators.graph import (
        label_propagation,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select((F.col("o_custkey") * 2).alias("src"),
                (F.col("l_suppkey") * 2 + 1).alias("dst"))
    )
    labels = label_propagation(e, iterations=3)
    return labels.groupBy(F.col("label").cast("long").alias("community")) \
        .agg(F.count("*").alias("n_members"))


def _lpa_oracle_sql(iterations: int) -> str:
    parts = ["""
WITH d AS (
    SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), e AS (
    SELECT src, dst FROM d UNION SELECT dst, src FROM d
), l0 AS (
    SELECT DISTINCT src AS node, src AS label FROM e
)"""]
    for i in range(1, iterations + 1):
        parts.append(f""", c{i} AS (
    SELECT e.src AS node, l{i - 1}.label, count(*) AS c
    FROM e JOIN l{i - 1} ON l{i - 1}.node = e.dst
    GROUP BY 1, 2
), l{i} AS (
    SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, label ASC) AS rn
        FROM c{i}
    ) t WHERE rn = 1
)""")
    parts.append(f"""
SELECT CAST(label AS BIGINT) AS community, count(*) AS n_members
FROM l{iterations} GROUP BY 1""")
    return "".join(parts)


SQL_COMMUNITIES = _lpa_oracle_sql(3)


_EXTENSION_QUERIES.update({"bfs_dist": q_bfs_dist,
                           "communities": q_communities})
_EXTENSION_ORACLES.update({"bfs_dist": SQL_BFS_DIST,
                           "communities": SQL_COMMUNITIES})


def q_approx_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQP with error bars (`operators/sketches.py:approx_agg`): revenue
    and row-count per return flag estimated from a 10% Bernoulli sample,
    scaled by the Horvitz-Thompson estimator, with 4-sigma CLT
    intervals.  Contract oracle: the EXACT aggregates (computed
    independently) plus flags asserting each interval covers the truth
    and the count estimate sits within a 4.5-sigma envelope of it — the
    sample is seed-deterministic, so the flags are stable at any
    fixture scale."""
    from database_transportor_spark.operators.sketches import approx_agg

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    est = approx_agg(
        l, ["l_returnflag"],
        {"n": ("count", None), "rev": ("sum", "l_extendedprice")},
        fraction=0.1,
    )
    exact = l.groupBy("l_returnflag").agg(
        F.count("*").alias("exact_n"),
        F.sum("l_extendedprice").alias("exact_rev"),
    )
    return (
        est.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_n",
            F.round("exact_rev", 2).alias("exact_rev"),
            ((F.col("n_lo") <= F.col("exact_n"))
             & (F.col("exact_n") <= F.col("n_hi"))).alias("n_covered"),
            ((F.col("rev_lo") <= F.col("exact_rev"))
             & (F.col("exact_rev") <= F.col("rev_hi"))).alias("rev_covered"),
            # sigma-scaled closeness: Var(est) = N(1-f)/f under
            # Bernoulli(f), so a 4.5-sigma + slack bound holds at EVERY
            # fixture scale (a fixed 10% bound is ~1.5 sigma at sf0.001
            # and flaps)
            (F.abs(F.col("n") - F.col("exact_n"))
             <= F.lit(4.5) * F.sqrt(F.col("exact_n") * 9.0) + 5)
            .alias("n_close"),
        )
    )


SQL_APPROX_REVENUE = """
SELECT l_returnflag,
       count(*) AS exact_n,
       round(sum(l_extendedprice), 2) AS exact_rev,
       TRUE AS n_covered, TRUE AS rev_covered, TRUE AS n_close
FROM lineitem
GROUP BY l_returnflag
"""


_EXTENSION_QUERIES.update({"approx_revenue": q_approx_revenue})
_EXTENSION_ORACLES.update({"approx_revenue": SQL_APPROX_REVENUE})


def q_edit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-threshold edit-distance self-join
    (`operators/fuzzy.py:edit_distance_join`): all part-name pairs
    within Levenshtein distance 2 — trigram blocking pruned by the
    count-filtering bound (an edit destroys ≤ n grams), then Spark's
    thresholded `levenshtein` verify.  The oracle brute-forces the same
    threshold with DuckDB's `levenshtein` over the (bounded) key slice,
    so every blocked-out pair the operator misses would surface as a
    row mismatch — blocking soundness IS the contract."""
    from database_transportor_spark.operators.fuzzy import (
        edit_distance_join,
    )

    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_partkey") < 500)
        .select("p_partkey", "p_name")
    )
    out = edit_distance_join(p, p, "p_partkey", "p_name",
                             "p_partkey", "p_name", max_distance=2)
    return (
        out.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "distance")
    )


SQL_EDIT_JOIN = """
WITH p AS (
    SELECT p_partkey, lower(trim(p_name)) AS t
    FROM part WHERE p_partkey < 500
)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS distance
FROM p a JOIN p b
  ON a.p_partkey < b.p_partkey
 AND abs(length(a.t) - length(b.t)) <= 2
 AND levenshtein(a.t, b.t) <= 2
"""


_EXTENSION_QUERIES.update({"edit_join": q_edit_join})
_EXTENSION_ORACLES.update({"edit_join": SQL_EDIT_JOIN})


def q_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution
    (`operators/fuzzy.py:resolve_entities`): part names within
    Levenshtein 1 collapse transitively (blocked edit-distance pairs →
    connected components → keep-min-id canonical row).  Oracle: DuckDB
    recursive CTE computes the same transitive closure (min reachable
    id per node) over brute-forced distance-1 pairs, then picks each
    entity's canonical row — chaining semantics and survivor choice
    both pinned."""
    from database_transportor_spark.operators.fuzzy import (
        resolve_entities,
    )

    p = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_partkey") < 500)
        .select("p_partkey", "p_name")
    )
    out = resolve_entities(p, "p_partkey", "p_name", max_distance=1)
    return out.select(
        F.col("entity_id").cast("long").alias("entity_id"),
        "p_name",
    )


SQL_ENTITIES = """
WITH RECURSIVE p AS (
    SELECT p_partkey AS id, lower(trim(p_name)) AS t, p_name
    FROM part WHERE p_partkey < 500
), pr AS (
    SELECT a.id AS ia, b.id AS ib
    FROM p a JOIN p b
      ON a.id <> b.id
     AND abs(length(a.t) - length(b.t)) <= 1
     AND levenshtein(a.t, b.t) <= 1
), r(node, label) AS (
    SELECT id, id FROM p
    UNION
    SELECT pr.ia, r.label FROM pr JOIN r ON r.node = pr.ib
), c AS (
    SELECT node AS id, min(label) AS entity_id FROM r GROUP BY node
)
SELECT DISTINCT c.entity_id, p.p_name
FROM c JOIN p ON p.id = c.entity_id
"""


_EXTENSION_QUERIES.update({"entities": q_entities})
_EXTENSION_ORACLES.update({"entities": SQL_ENTITIES})


def q_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition
    (`operators/temporal.py:seasonal_decompose`): a planted
    line + period-7 pattern per nation (slope 1/2 and integer pattern
    keep every intermediate binary-exact, so trend/seasonal/residual are
    EXACT, not approximate).  The oracle emits the closed form: trend =
    the line (NULL at the 3-row edges), seasonal = the centered pattern,
    residual = 0 — any deviation in the window math, phase indexing, or
    centering shows up as a value mismatch."""
    from database_transportor_spark.operators.temporal import (
        seasonal_decompose,
    )

    pattern = [6.0, -2.0, -4.0, 1.0, 3.0, -5.0, 1.0]  # sums to 0
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select("n_nationkey")
    series = (
        n.select(
            "n_nationkey",
            F.explode(F.sequence(F.lit(0), F.lit(27))).alias("t"),
        )
        .withColumn(
            "v",
            F.lit(10.0)
            + F.col("n_nationkey")
            + F.col("t") * 0.5
            + F.element_at(
                F.array(*[F.lit(p) for p in pattern]),
                (F.col("t") % 7 + 1).cast("int"),
            ),
        )
    )
    out = seasonal_decompose(series, ["n_nationkey"], "t", "v", period=7)
    return out.select(
        "n_nationkey",
        F.col("t").cast("long").alias("t"),
        F.round("v", 6).alias("v"),
        "trend", "seasonal", "residual",
    )


SQL_SEASONAL = """
WITH s AS (
    SELECT n_nationkey, t.t AS t,
           CAST(10.0 + n_nationkey + t.t * 0.5
           + (CASE t.t % 7 WHEN 0 THEN 6.0 WHEN 1 THEN -2.0
              WHEN 2 THEN -4.0 WHEN 3 THEN 1.0 WHEN 4 THEN 3.0
              WHEN 5 THEN -5.0 ELSE 1.0 END) AS DOUBLE) AS v
    FROM nation, generate_series(0, 27) AS t(t)
)
SELECT n_nationkey, CAST(t AS BIGINT) AS t,
       CAST(round(v, 6) AS DOUBLE) AS v,
       CAST(CASE WHEN t BETWEEN 3 AND 24
            THEN round(10.0 + n_nationkey + t * 0.5, 6) END AS DOUBLE)
           AS trend,
       CAST(round(CASE t % 7 WHEN 0 THEN 6.0 WHEN 1 THEN -2.0
                 WHEN 2 THEN -4.0 WHEN 3 THEN 1.0 WHEN 4 THEN 3.0
                 WHEN 5 THEN -5.0 ELSE 1.0 END, 6) AS DOUBLE) AS seasonal,
       CAST(CASE WHEN t BETWEEN 3 AND 24 THEN 0.0 END AS DOUBLE)
           AS residual
FROM s
"""


_EXTENSION_QUERIES.update({"seasonal": q_seasonal})
_EXTENSION_ORACLES.update({"seasonal": SQL_SEASONAL})


def q_cheapest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bounded Bellman-Ford (`operators/graph.py:weighted_paths`):
    cheapest 3-hop cost from every node of a pruned undirected trade
    graph (customers < 100, suppliers < 20; edge weight = the pair's
    min line quantity) to supplier node 1.  Oracle: DuckDB recursive
    path enumeration with the same hop cap, min(cost) per node — every
    relaxation round must equal one more edge of path freedom."""
    from database_transportor_spark.operators.graph import weighted_paths

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter((F.col("o_custkey") < 100) & (F.col("l_suppkey") < 20))
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.min(F.col("l_quantity").cast("double")).alias("weight"))
    )
    out = weighted_paths(e, [1], directed=False, hops=3)
    return out.select(
        F.col("node").cast("long").alias("node"),
        F.col("landmark").cast("long").alias("landmark"),
        F.round("dist", 6).alias("dist"),
    )


SQL_CHEAPEST_PATHS = """
WITH RECURSIVE d AS (
    SELECT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst,
           CAST(min(l.l_quantity) AS DOUBLE) AS w
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_custkey < 100 AND l.l_suppkey < 20
    GROUP BY 1, 2
), e AS (
    SELECT src, dst, w FROM d
    UNION ALL
    SELECT dst, src, w FROM d
), r(node, dist, hops) AS (
    SELECT CAST(1 AS BIGINT), CAST(0.0 AS DOUBLE), 0
    UNION ALL
    SELECT e.src, r.dist + e.w, r.hops + 1
    FROM r JOIN e ON e.dst = r.node
    WHERE r.hops < 3
)
SELECT node, CAST(1 AS BIGINT) AS landmark,
       CAST(round(min(dist), 6) AS DOUBLE) AS dist
FROM r GROUP BY node
"""


_EXTENSION_QUERIES.update({"cheapest_paths": q_cheapest_paths})
_EXTENSION_ORACLES.update({"cheapest_paths": SQL_CHEAPEST_PATHS})


def q_zone_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping report over a clustered layout
    (`operators/maintenance.py:file_stats`/`pruning_report`): lineitem
    rewritten into 10 range-bucketed files (one file per bucket by
    construction), then the report counts how many files a min/max
    zone-map reader skips for `l_orderkey BETWEEN 1000 AND 2000`.
    Because file ↔ bucket is 1:1, the oracle reproduces the exact
    numbers from plain SQL over the same bucket expression — the
    layout-physics claim (clustering ⇒ ~9/10 files skipped) becomes a
    value-checked contract."""
    import tempfile

    from database_transportor_spark.operators.maintenance import (
        pruning_report,
    )

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey")
    w = l.agg((F.floor(F.max("l_orderkey") / 10) + 1).alias("w")).first()["w"]
    out = tempfile.mkdtemp(prefix="zone_prune_")
    (
        l.withColumn("bucket", F.floor(F.col("l_orderkey") / F.lit(int(w))))
        .coalesce(1)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return pruning_report(back, "l_orderkey", 1000, 2000).select(
        F.col("files_total").cast("long").alias("files_total"),
        F.col("files_skippable").cast("long").alias("files_skippable"),
        F.col("rows_total").cast("long").alias("rows_total"),
        F.col("rows_skippable").cast("long").alias("rows_skippable"),
    )


SQL_ZONE_PRUNE = """
WITH m AS (
    SELECT CAST(floor(max(l_orderkey) / 10) + 1 AS BIGINT) AS w
    FROM lineitem
), b AS (
    SELECT CAST(floor(l_orderkey / m.w) AS BIGINT) AS bucket, l_orderkey
    FROM lineitem, m
), s AS (
    SELECT bucket, count(*) AS n,
           min(l_orderkey) AS mn, max(l_orderkey) AS mx
    FROM b GROUP BY bucket
)
SELECT CAST(count(*) AS BIGINT) AS files_total,
       CAST(sum(CASE WHEN mx < 1000 OR mn > 2000 THEN 1 ELSE 0 END)
            AS BIGINT) AS files_skippable,
       CAST(sum(n) AS BIGINT) AS rows_total,
       CAST(sum(CASE WHEN mx < 1000 OR mn > 2000 THEN n ELSE 0 END)
            AS BIGINT) AS rows_skippable
FROM s
"""


_EXTENSION_QUERIES.update({"zone_prune": q_zone_prune})
_EXTENSION_ORACLES.update({"zone_prune": SQL_ZONE_PRUNE})


def q_png_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-only PNG metadata extraction
    (`operators/multimodal.py:png_metadata`): every document gets a real
    PNG with planted tEXt chunks (generator/license derived from
    doc_id); the extractor walks the chunk directory without ever
    inflating IDAT, and the projection pulls typed fields out of the
    metadata map.  Oracle: the closed-form planted values."""
    import pandas as pd

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from database_transportor_spark.operators.multimodal import (
        encode_png, png_metadata,
    )

    # documents.parquet is ONE file ⇒ one scan partition: without the
    # repartition the whole Python synth+decode chain below runs in a
    # single task (the mjpeg_frames/_m4a_fixture discipline)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("content", BinaryType())])

    def make_png(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                h, w = 2 + d % 5, 3 + d % 4
                arr = np.full((h, w, 1), d % 251, dtype=np.uint8)
                out.append(encode_png(arr, text={
                    "Software": f"gen-{d % 7}",
                    "Copyright": "cc-by" if d % 3 == 0 else "unknown",
                }))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": pd.Series(out, dtype="object")})

    media = docs.mapInPandas(make_png, schema)
    meta = png_metadata(media)
    return meta.select(
        "doc_id", "width", "height",
        F.col("meta")["Software"].alias("software"),
        F.col("meta")["Copyright"].alias("license"),
    )


SQL_PNG_META = """
SELECT doc_id,
       CAST(3 + doc_id % 4 AS BIGINT) AS width,
       CAST(2 + doc_id % 5 AS BIGINT) AS height,
       'gen-' || CAST(doc_id % 7 AS VARCHAR) AS software,
       CASE WHEN doc_id % 3 = 0 THEN 'cc-by' ELSE 'unknown' END AS license
FROM documents
"""


_EXTENSION_QUERIES.update({"png_meta": q_png_meta})
_EXTENSION_ORACLES.update({"png_meta": SQL_PNG_META})


def q_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curves
    (`operators/experiment.py:kaplan_meier`): per line-status curves
    over duration = quantity with return ('R') as the event — the
    at-risk bookkeeping (censored rows leave the risk set without a
    step) and the exp∘sum∘log product are mirrored exactly by the
    oracle's window SQL, including the everyone-dies zeroing."""
    from database_transportor_spark.operators.experiment import (
        kaplan_meier,
    )

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("d"),
        (F.col("l_returnflag") == "R").alias("e"),
    )
    out = kaplan_meier(l, "d", "e", ["l_linestatus"])
    return out.select(
        "l_linestatus",
        F.col("t").cast("long").alias("t"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("n_events").cast("long").alias("n_events"),
        "survival",
    )


SQL_SURVIVAL = """
WITH src AS (
    SELECT l_linestatus, CAST(l_quantity AS BIGINT) AS d,
           (l_returnflag = 'R') AS e
    FROM lineitem
), per_t AS (
    SELECT l_linestatus, d AS t,
           sum(CASE WHEN e THEN 1 ELSE 0 END) AS n_events,
           count(*) AS n_exits
    FROM src GROUP BY 1, 2
), risk AS (
    SELECT *,
           sum(n_exits) OVER (PARTITION BY l_linestatus)
           - coalesce(sum(n_exits) OVER (
                 PARTITION BY l_linestatus ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
    FROM per_t
), curve AS (
    SELECT *,
           CASE WHEN max(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END)
                     OVER (PARTITION BY l_linestatus ORDER BY t) = 1
                THEN 0.0
                ELSE exp(sum(ln(1.0 - CAST(n_events AS DOUBLE) / n_risk))
                         OVER (PARTITION BY l_linestatus ORDER BY t))
           END AS s
    FROM risk
)
SELECT l_linestatus, t, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(round(s, 6) AS DOUBLE) AS survival
FROM curve WHERE n_events > 0
"""


_EXTENSION_QUERIES.update({"survival": q_survival})
_EXTENSION_ORACLES.update({"survival": SQL_SURVIVAL})


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document vocabulary coverage
    (`operators/text.py:vocab_coverage`): occurrences and distinct
    types covered by the same top-500/min-df-2 vocabulary
    `build_vocab` produces — the OOV-rate readout a pipeline checks
    before freezing a tokenizer.  Exact integers; oracle recomputes
    both the vocabulary and the coverage in SQL."""
    from database_transportor_spark.operators.text import (
        build_vocab, vocab_coverage,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = build_vocab(docs, min_df=2, max_vocab=500)
    return vocab_coverage(docs, vocab)


SQL_VOCAB_COVERAGE = """
WITH toks AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
    FROM documents
), toks_ne AS (
    SELECT doc_id, token FROM toks WHERE token <> ''
), counts AS (
    SELECT token, count(*) AS tf
    FROM toks_ne GROUP BY token
    HAVING count(DISTINCT doc_id) >= 2
), vocab AS (
    SELECT token FROM counts ORDER BY tf DESC, token ASC LIMIT 500
), marked AS (
    SELECT t.doc_id, t.token, (v.token IS NOT NULL) AS covered
    FROM toks_ne t LEFT JOIN vocab v ON v.token = t.token
), per_doc AS (
    SELECT doc_id,
           count(*) AS n_tokens,
           sum(CASE WHEN covered THEN 1 ELSE 0 END) AS n_covered,
           count(DISTINCT token) AS n_types,
           count(DISTINCT CASE WHEN covered THEN token END)
               AS n_types_covered
    FROM marked GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(n_covered, 0) AS BIGINT) AS n_covered,
       CAST(coalesce(n_types, 0) AS BIGINT) AS n_types,
       CAST(coalesce(n_types_covered, 0) AS BIGINT) AS n_types_covered
FROM documents d LEFT JOIN per_doc USING (doc_id)
"""


_EXTENSION_QUERIES.update({"vocab_coverage": q_vocab_coverage})
_EXTENSION_ORACLES.update({"vocab_coverage": SQL_VOCAB_COVERAGE})


def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile bucketing (`operators/corpus.py:quantile_bin`):
    per-returnflag price quartiles with exact interpolated thresholds,
    aggregated to (flag, bucket) counts plus each bucket's exact price
    span.  Oracle: DuckDB reproduces the thresholds with
    `percentile_cont` (both engines compute exact linear-interpolation
    percentiles) and the same threshold-count bucketing."""
    from database_transportor_spark.operators.corpus import quantile_bin

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    )
    binned = quantile_bin(l, "l_extendedprice", 4,
                          group_cols=["l_returnflag"])
    return binned.groupBy("l_returnflag", "bucket").agg(
        F.count("*").alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("lo"),
        F.round(F.max("l_extendedprice"), 2).alias("hi"),
    )


SQL_QUANTILE_BINS = """
WITH q AS (
    SELECT l_returnflag,
           percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS q1,
           percentile_cont(0.50) WITHIN GROUP (ORDER BY l_extendedprice) AS q2,
           percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS q3
    FROM lineitem GROUP BY 1
), b AS (
    SELECT l.l_returnflag, l.l_extendedprice,
           (CASE WHEN q.q1 <= l.l_extendedprice THEN 1 ELSE 0 END
            + CASE WHEN q.q2 <= l.l_extendedprice THEN 1 ELSE 0 END
            + CASE WHEN q.q3 <= l.l_extendedprice THEN 1 ELSE 0 END)
               AS bucket
    FROM lineitem l JOIN q USING (l_returnflag)
)
SELECT l_returnflag, CAST(bucket AS BIGINT) AS bucket,
       count(*) AS n,
       round(min(l_extendedprice), 2) AS lo,
       round(max(l_extendedprice), 2) AS hi
FROM b GROUP BY 1, 2
"""


_EXTENSION_QUERIES.update({"quantile_bins": q_quantile_bins})
_EXTENSION_ORACLES.update({"quantile_bins": SQL_QUANTILE_BINS})


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (`operators/temporal.py:asof_join_forward`):
    for every view, the NEXT purchase (at or after the view) by the
    same user — time-to-convert attribution's other half.  DuckDB's
    native ASOF with the inequality flipped is the oracle."""
    from database_transportor_spark.operators.temporal import (
        asof_join_forward,
    )

    events = _read_events(spark, sf_dir)
    views = events.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join_forward(views, purchases, "user_id", "ts")
    return out.select("event_id", "user_id", "value", "purchase_value")


SQL_ASOF_FORWARD = """
SELECT v.event_id, v.user_id, v.value, p.purchase_value
FROM (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'view') v
ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS purchase_value
                FROM events WHERE event_type = 'purchase'
                GROUP BY 1, 2) p
  ON v.user_id = p.user_id AND p.ts >= v.ts
"""


_EXTENSION_QUERIES.update({"asof_forward": q_asof_forward})
_EXTENSION_ORACLES.update({"asof_forward": SQL_ASOF_FORWARD})


def q_stream_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histograms as streaming state
    (`streaming/events.py:stream_hist_agg` +
    `operators/sketches.py:hist_measure`): per-(window, type) leaf
    histograms computed under a watermark by a genuinely streamed
    query (availableNow), then MERGED across windows to per-type
    quantiles after the stream — no event replay.  Contract oracle:
    exact per-type counts (carried by the merged histogram) plus flags
    that the histogram p50/p95 land within one bin width of the exact
    percentiles."""
    import uuid

    from database_transportor_spark.operators.sketches import (
        grouped_percentiles_scalable,
        hist_measure,
        hist_quantiles,
    )
    from database_transportor_spark.streaming.events import (
        stream_hist_agg,
    )

    lo, hi, bins = 0.0, 500.0, 100
    snap = stream_hist_agg(
        spark, f"{sf_dir}/events.parquet",
        lo=lo, hi=hi, bins=bins,
        sink_table=f"sh_{uuid.uuid4().hex[:8]}",
        # fixture-sized state-store count (same knob as the sibling
        # streaming queries): the live windows hold a few hundred
        # (window, type, bin) groups, so 32 state partitions are pure
        # per-batch fixed cost — measured ~2 s of HDFSBackedStateStore
        # setup/commit per run; production passes its own N
        state_partitions=8,
    )
    hm = hist_measure(lo, hi, bins=bins)
    merged = snap.groupBy("event_type").agg(
        hm[1]("hist").alias("hist"), F.sum("n").alias("n_events")
    )
    est = hist_quantiles(merged, "hist", [0.5, 0.95], lo, hi, bins=bins)
    events = _read_events(spark, sf_dir)
    # contract envelope: the histogram read-off has < 1 RANK of error
    # (its counts are exact) plus one bin width of value error — but the
    # interpolated exact percentile can sit between two order statistics
    # that straddle bins in a sparse tail, so the sound check brackets
    # each estimate between the exact quantiles one percent either side
    # (rank slack 0.01·n covers the <1-rank error for any n ≥ 100) ± w
    exact = grouped_percentiles_scalable(
        events, ["event_type"], "value",
        [0.49, 0.51, 0.94, 0.96], out_col="__p",
    ).select(
        "event_type",
        F.element_at("__p", 1).alias("x50_lo"),
        F.element_at("__p", 2).alias("x50_hi"),
        F.element_at("__p", 3).alias("x95_lo"),
        F.element_at("__p", 4).alias("x95_hi"),
    )
    w = (hi - lo) / bins
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            ((F.col("p50") >= F.col("x50_lo") - w)
             & (F.col("p50") <= F.col("x50_hi") + w)).alias("p50_ok"),
            ((F.col("p95") >= F.col("x95_lo") - w)
             & (F.col("p95") <= F.col("x95_hi") + w)).alias("p95_ok"),
        )
    )


SQL_STREAM_HIST = """
SELECT event_type, count(*) AS n_events,
       TRUE AS p50_ok, TRUE AS p95_ok
FROM events
GROUP BY event_type
"""


_EXTENSION_QUERIES.update({"stream_hist": q_stream_hist})
_EXTENSION_ORACLES.update({"stream_hist": SQL_STREAM_HIST})


def q_stream_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental join-view maintenance
    (`streaming/join_view_sink.py`): lineitem arrives as two file
    batches; each micro-batch appends only its `batch ⋈ orders` delta
    (broadcast small-big join, commit-marker idempotent) to the stored
    view — the big-big shuffle never runs.  The aggregated view must
    equal the one-shot join, which is what the oracle computes."""
    import tempfile
    import uuid

    from database_transportor_spark import ParquetCatalog
    from database_transportor_spark.streaming.join_view_sink import (
        stream_join_view_sink,
    )

    work = tempfile.mkdtemp(prefix=f"sjv_{uuid.uuid4().hex[:6]}_")
    src = f"{work}/facts"
    cat = ParquetCatalog(spark, f"{work}/cat")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"), "o_orderstatus"
    )
    cat.write(orders, "dim", mode="overwrite")
    items = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("k"),
        F.col("l_quantity").cast("long").alias("qty"),
        "l_returnflag",
    )
    ckpt = f"{work}/ckpt"
    # each half lands as a parallel multi-file append — the sink's
    # availableNow run drains whatever files are new, so nothing needs
    # the serial coalesce(1) bottleneck a one-file-per-batch layout
    # would cost at scale
    for half in (items.filter(F.col("k") % 2 == 0),
                 items.filter(F.col("k") % 2 == 1)):
        half.write.mode("append").parquet(src)
        stream_join_view_sink(spark, src, cat, "view", "dim", "k",
                              checkpoint=ckpt)
    return (
        cat.read("view")
        .groupBy("o_orderstatus", "l_returnflag")
        .agg(F.count("*").alias("n_rows"), F.sum("qty").alias("sum_qty"))
    )


SQL_STREAM_JOIN_VIEW = """
SELECT o_orderstatus, l_returnflag,
       count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY 1, 2
"""


_EXTENSION_QUERIES.update({"stream_join_view": q_stream_join_view})
_EXTENSION_ORACLES.update({"stream_join_view": SQL_STREAM_JOIN_VIEW})


def q_stream_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest dedup gate (`streaming/dedup_gate.py`): documents
    arrive in two file batches (even ids, then odd ids); each micro-batch
    is probed — exact 3-gram Jaccard >= 0.5, inverted-posting join, no
    LSH recall loss — against the persisted index of everything accepted
    so far, and against smaller-id batch-mates; survivors append to the
    clean table and the index.  The corpus text is read exactly once per
    document, ever.  Arrival-order semantics are exactly batch-
    reproducible (the >=0.5 pair graph of the fixture is a union of
    cliques — verified in both sf fixtures), which is what the oracle
    computes: keep a doc iff it has no >=0.5 partner of earlier arrival,
    arrival = (doc_id % 2, doc_id)."""
    import tempfile
    import uuid

    from database_transportor_spark import ParquetCatalog
    from database_transportor_spark.streaming.dedup_gate import (
        stream_dedup_gate,
    )

    work = tempfile.mkdtemp(prefix=f"sdg_{uuid.uuid4().hex[:6]}_")
    src = f"{work}/feed"
    cat = ParquetCatalog(spark, f"{work}/cat")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    ckpt = f"{work}/ckpt"
    for half in (docs.filter(F.col("doc_id") % 2 == 0),
                 docs.filter(F.col("doc_id") % 2 == 1)):
        half.write.mode("append").parquet(src)
        # schema= skips the gate's per-call spark.read.parquet inference
        # (the feed schema is the projection we just wrote);
        # shuffle_partitions sizes the per-batch reducers to the
        # micro-batch volume (a few thousand docs here) instead of the
        # session width — the same fixture-scale sizing discipline as
        # state_partitions on the sibling streaming queries; production
        # passes its own batch-volume-derived value
        stream_dedup_gate(spark, src, cat, "clean", "idx", "doc_id",
                          "text", shingle_n=3, threshold=0.5,
                          schema=docs.schema, checkpoint=ckpt,
                          shuffle_partitions=8)
    return cat.read("clean").select(
        "doc_id", (F.col("doc_id") % 2).cast("long").alias("arrival_batch")
    )


SQL_STREAM_DEDUP_GATE = f"""
WITH RECURSIVE sh AS ({_SQL_SHINGLES}),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), close AS (
    SELECT ia, ib FROM inter
    JOIN sizes sa ON sa.doc_id = ia
    JOIN sizes sb ON sb.doc_id = ib
    WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
), partners AS (
    SELECT ia AS d, ib AS e FROM close
    UNION ALL SELECT ib, ia FROM close
)
SELECT d.doc_id, CAST(d.doc_id % 2 AS BIGINT) AS arrival_batch
FROM documents d
WHERE NOT EXISTS (
    SELECT 1 FROM partners p
    WHERE p.d = d.doc_id
      AND ((p.e % 2 < d.doc_id % 2)
           OR (p.e % 2 = d.doc_id % 2 AND p.e < d.doc_id))
)
"""


_EXTENSION_QUERIES.update({"stream_dedup_gate": q_stream_dedup_gate})
_EXTENSION_ORACLES.update({"stream_dedup_gate": SQL_STREAM_DEDUP_GATE})


def q_stream_semantic_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding sibling of `stream_dedup_gate`
    (`streaming/dedup_gate.py:stream_semantic_gate`): vectors arrive in
    two batches (even ids, then odd); each batch is bucket-assigned by
    the same deterministic stride-centroid rule as `cosine_pairs`
    (nearest centroid, ties to lowest cid) and rejected iff cosine >=
    0.35 against an accepted same-bucket vector or a smaller-id
    same-bucket batch-mate; survivors append to the clean table and the
    vector index.  The oracle reproduces the gate's exact policy with
    no graph-shape assumption: batch 0's accepted set is closed-form
    ("no smaller even bucket-partner"), batch 1 checks against exactly
    that set plus smaller odd mates — two non-recursive levels."""
    import tempfile
    import uuid

    from database_transportor_spark import ParquetCatalog
    from database_transportor_spark.streaming.dedup_gate import (
        stream_semantic_gate,
    )

    work = tempfile.mkdtemp(prefix=f"ssg_{uuid.uuid4().hex[:6]}_")
    src = f"{work}/feed"
    cat = ParquetCatalog(spark, f"{work}/cat")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cat.write(
        emb.filter(F.col("vec_id") % 37 == 0)
        .orderBy("vec_id")
        .limit(64)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")),
        "cent",
        mode="overwrite",
    )
    ckpt = f"{work}/ckpt"
    for half in (emb.filter(F.col("vec_id") % 2 == 0),
                 emb.filter(F.col("vec_id") % 2 == 1)):
        half.write.mode("append").parquet(src)
        # shuffle_partitions: per-batch reducers sized to the micro-batch
        # (see q_stream_dedup_gate)
        stream_semantic_gate(spark, src, cat, "clean", "idx", "vec_id",
                             "embedding", "cent", threshold=0.35,
                             schema=emb.schema, checkpoint=ckpt,
                             shuffle_partitions=8)
    return cat.read("clean").select(
        "vec_id", (F.col("vec_id") % 2).cast("long").alias("arrival_batch")
    )


SQL_STREAM_SEMANTIC_GATE = """
WITH cent AS (
    SELECT vec_id AS cid, embedding AS ce FROM embeddings
    WHERE vec_id % 37 = 0 ORDER BY vec_id LIMIT 64
), assign AS (
    SELECT vec_id, embedding, bucket FROM (
        SELECT e.vec_id, e.embedding, c.cid AS bucket,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c
    ) WHERE rn = 1
), pairs AS (
    SELECT a.vec_id AS ia, b.vec_id AS ib
    FROM assign a JOIN assign b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
), sym AS (
    SELECT ia AS d, ib AS e FROM pairs
    UNION ALL SELECT ib, ia FROM pairs
), kept0 AS (
    SELECT vec_id FROM embeddings e0
    WHERE vec_id % 2 = 0 AND NOT EXISTS (
        SELECT 1 FROM sym
        WHERE sym.d = e0.vec_id AND sym.e % 2 = 0 AND sym.e < e0.vec_id)
), kept1 AS (
    SELECT vec_id FROM embeddings e1
    WHERE vec_id % 2 = 1
      AND NOT EXISTS (
        SELECT 1 FROM sym JOIN kept0 k ON sym.e = k.vec_id
        WHERE sym.d = e1.vec_id)
      AND NOT EXISTS (
        SELECT 1 FROM sym
        WHERE sym.d = e1.vec_id AND sym.e % 2 = 1 AND sym.e < e1.vec_id)
)
SELECT vec_id, CAST(0 AS BIGINT) AS arrival_batch FROM kept0
UNION ALL
SELECT vec_id, CAST(1 AS BIGINT) AS arrival_batch FROM kept1
"""


_EXTENSION_QUERIES.update({"stream_semantic_gate": q_stream_semantic_gate})
_EXTENSION_ORACLES.update({"stream_semantic_gate": SQL_STREAM_SEMANTIC_GATE})


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked lexical retrieval (`operators/text.py:bm25_topk`):
    Lucene-variant BM25 top-10 docs for three fixed queries over the
    documents corpus.  Scores round to 6 decimals before ranking (ulp
    armor, same contract as tfidf_terms); ties break by doc_id.  The
    oracle recomputes BM25 end-to-end in SQL with the identical
    expression tree (same literal constants, same association order), so
    score values AND the rank cut are hash-checked."""
    from database_transportor_spark.operators.text import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_topk(docs, _bm25_queries(spark), k=10)


SQL_BM25_SEARCH = """
WITH q(query_id, qtext) AS (
    VALUES (1, 'spark window join'), (2, 'fast hash merge'),
           (3, 'stream batch sort')
), toks AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
    FROM documents
), tf AS (
    SELECT doc_id, token, count(*) AS tf
    FROM toks WHERE token <> '' GROUP BY 1, 2
), dl AS (
    SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
), stats AS (
    SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM dl
), dfreq AS (
    SELECT token, count(*) AS df FROM tf GROUP BY 1
), qt AS (
    SELECT DISTINCT query_id, token FROM (
        SELECT query_id,
               unnest(string_split_regex(trim(lower(qtext)), '\\s+')) AS token
        FROM q
    ) WHERE token <> ''
), scored AS (
    SELECT qt.query_id, tf.doc_id,
           round(sum(
               ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
           ), 6) AS score
    FROM qt
    JOIN tf USING (token)
    JOIN dfreq d USING (token)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats s
    GROUP BY 1, 2
)
SELECT CAST(query_id AS INTEGER) AS query_id,
       CAST(doc_id AS BIGINT) AS doc_id,
       score,
       CAST(rn AS INTEGER) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id ASC) AS rn
      FROM scored)
WHERE rn <= 10
"""


_EXTENSION_QUERIES.update({"bm25_search": q_bm25_search})
_EXTENSION_ORACLES.update({"bm25_search": SQL_BM25_SEARCH})


def _m4a_fixture(spark: SparkSession, sf_dir: str, mp4a: bool):
    """Deterministic ISO-BMFF audio fixture shared by `mp4_audio` and
    `audio_decoder`: one file per document over the closed-form ramp
    (rate/channels/length and sample values all functions of doc_id),
    sample table chunked every 16 PCM frames, byte order alternating
    sowt/twos by doc.  ``mp4a=True`` additionally swaps odd docs'
    trailing-stsd fourcc to ``mp4a`` (never mdat bytes), making them
    "compressed" payloads the built-in demuxer refuses."""
    import pandas as pd

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from database_transportor_spark.operators.multimodal import (
        encode_mp4_audio)

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("content", BinaryType())])

    def make_m4a(batches):
        import numpy as np

        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                rate = 8000 + 1000 * (d % 3)
                ch = 1 + d % 2
                n = 40 + d % 7
                vals = ((7 * d + 3 * np.arange(n * ch)) % 401 - 200
                        ).astype(np.int16).reshape(n, ch)
                b = encode_mp4_audio(
                    vals, rate,
                    codec=b"sowt" if d % 2 == 0 else b"twos",
                    samples_per_chunk=16)
                if mp4a and d % 2:
                    i = b.rindex(b"twos")
                    b = b[:i] + b"mp4a" + b[i + 4:]
                out.append(b)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": pd.Series(out, dtype="object")})

    return docs.mapInPandas(make_m4a, schema)


def q_mp4_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4/M4A PCM audio tier (round 8, `multimodal.encode_mp4_audio`/
    `decode_mp4_audio` via the container sniff in `decode_audio`):
    synthesize a genuine ISO-BMFF audio file per document — ftyp +
    mdat (raw int16 PCM) + a soun-trak sample table chunked every 16
    PCM frames (exercises the stsc/stco expansion), byte order
    alternating sowt/twos by doc — then decode back to exact integer
    signal statistics.  Every output column is in closed form over the
    deterministic ramp, so a hash match proves the audio sample-entry
    parse, the chunk walk, and both endianness paths."""
    from database_transportor_spark.operators.multimodal import decode_audio

    media = _m4a_fixture(spark, sf_dir, mp4a=False)
    return decode_audio(media, "doc_id", "content")


SQL_MP4_AUDIO = """
WITH p AS (
  SELECT doc_id, 8000 + 1000 * (doc_id % 3) AS rate,
         1 + doc_id % 2 AS ch, 40 + doc_id % 7 AS n
  FROM documents
), v AS (
  SELECT doc_id, rate, ch, n, ((7 * doc_id + 3 * j) % 401) - 200 AS val
  FROM p, UNNEST(range(0, 100)) AS r(j) WHERE j < n * ch
)
SELECT doc_id,
       CAST(rate AS BIGINT) AS sample_rate,
       CAST(ch AS BIGINT) AS n_channels,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
       CAST(max(abs(val)) AS BIGINT) AS peak,
       CAST(sum(val) AS BIGINT) AS sum_samples,
       CAST(sum(val * val) AS BIGINT) AS sum_squares
FROM v GROUP BY 1, 2, 3, 4, 5
"""


_EXTENSION_QUERIES.update({"mp4_audio": q_mp4_audio})
_EXTENSION_ORACLES.update({"mp4_audio": SQL_MP4_AUDIO})


def q_transitions_spec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure spec data (round 8): first-order Markov transition matrix
    over the event stream (`operators/funnel.py:transition_matrix` via
    its post-op) — consecutive-event pairs per user (lead window,
    event_id tiebreak), exact pair counts, P(to|from) as an
    exact-int/exact-int division rounded to 6."""
    maps = {"transitions": {
        "original_table": "events",
        "columns": {"event_id": "event_id", "ts": "ts",
                    "user_id": "user_id", "event_type": "event_type"},
        "post_ops": [
            {"op": "transition_matrix", "entity_col": "user_id",
             "type_col": "event_type", "ts_col": "ts",
             "tiebreak_col": "event_id"},
        ],
    }}
    return _run(spark, sf_dir, maps, "transitions")


SQL_TRANSITIONS_SPEC = """
WITH s AS (
    SELECT user_id, event_type AS from_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_type
    FROM events
), c AS (
    SELECT from_type, to_type, count(*) AS n_transitions
    FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, CAST(n_transitions AS BIGINT) AS n_transitions,
       round(n_transitions * 1.0
             / sum(n_transitions) OVER (PARTITION BY from_type), 6) AS prob
FROM c
"""


def q_growth_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure spec data (round 8): DAU growth accounting
    (`operators/funnel.py:growth_accounting` post-op) — per day: active,
    first-ever-seen (new), returning, and cumulative distinct users as
    the running sum of first-seen counts (never a distinct over a
    growing window)."""
    maps = {"growth": {
        "original_table": "events",
        "columns": {"ts": "ts", "user_id": "user_id"},
        "post_ops": [
            {"op": "growth_accounting", "entity_col": "user_id",
             "ts_col": "ts", "bucket": "day"},
        ],
    }}
    return _run(spark, sf_dir, maps, "growth")


SQL_GROWTH_LEDGER = """
WITH a AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS period,
           count(DISTINCT user_id) AS n_active
    FROM events GROUP BY 1
), fs AS (
    SELECT user_id, min(ts) AS f FROM events GROUP BY 1
), nw AS (
    SELECT CAST(date_trunc('day', f) AS TIMESTAMP) AS period,
           count(*) AS n_new
    FROM fs GROUP BY 1
)
SELECT a.period, CAST(n_active AS BIGINT) AS n_active,
       CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
       CAST(n_active - coalesce(n_new, 0) AS BIGINT) AS n_returning,
       CAST(sum(coalesce(n_new, 0))
            OVER (ORDER BY a.period ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_entities
FROM a LEFT JOIN nw ON a.period = nw.period
"""


def q_active_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure spec data (round 8): trailing 7-day distinct active users
    per day (`operators/temporal.py:rolling_distinct` post-op) — the
    WAU curve, computed by the linear distinct-(entity,day) x window
    explode plan, never a day-by-day distinct re-scan."""
    maps = {"wau": {
        "original_table": "events",
        "columns": {"ts": "ts", "user_id": "user_id"},
        "post_ops": [
            {"op": "rolling_distinct", "ts_col": "ts",
             "entity_col": "user_id", "window_buckets": 7,
             "bucket": "day"},
        ],
    }}
    return _run(spark, sf_dir, maps, "wau")


SQL_ACTIVE_7D = """
WITH pairs AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS b
    FROM events WHERE ts IS NOT NULL
), cov AS (
    SELECT user_id, b + j * INTERVAL 1 DAY AS bucket
    FROM pairs, UNNEST(range(0, 7)) AS r(j)
)
SELECT bucket, CAST(count(DISTINCT user_id) AS BIGINT) AS active
FROM cov GROUP BY 1
"""


def q_cooccur_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure spec data (round 8): event-type co-occurrence with exact
    integer support/lift (`operators/affinity.py:cooccurrence_pairs`
    post-op) — baskets are users, items their distinct event types;
    support/lift in parts-per-million via integer division, so both
    engines reproduce them bit-for-bit."""
    maps = {"cooc": {
        "original_table": "events",
        "columns": {"user_id": "user_id", "event_type": "event_type"},
        "post_ops": [
            {"op": "cooccurrence_pairs", "basket_col": "user_id",
             "item_col": "event_type", "min_pair_count": 2},
        ],
    }}
    return _run(spark, sf_dir, maps, "cooc")


SQL_COOCCUR_TYPES = """
WITH items AS (
    SELECT DISTINCT user_id AS b, event_type AS i FROM events
), nb AS (SELECT count(DISTINCT b) AS n FROM items),
cnt AS (SELECT i, count(*) AS c FROM items GROUP BY i),
pairs AS (
    SELECT a.i AS item_a, b2.i AS item_b, count(*) AS pair_count
    FROM items a JOIN items b2 ON a.b = b2.b AND a.i < b2.i
    GROUP BY 1, 2
)
SELECT item_a, item_b, CAST(pair_count AS BIGINT) AS pair_count,
       CAST(ca.c AS BIGINT) AS count_a, CAST(cb.c AS BIGINT) AS count_b,
       CAST(pair_count * 1000000 // nb.n AS BIGINT) AS support_ppm,
       CAST(pair_count * nb.n * 1000000 // (ca.c * cb.c) AS BIGINT)
         AS lift_ppm
FROM pairs
JOIN cnt ca ON ca.i = item_a
JOIN cnt cb ON cb.i = item_b
CROSS JOIN nb
WHERE pair_count >= 2
"""


_EXTENSION_QUERIES.update({
    "transitions_spec": q_transitions_spec,
    "growth_ledger": q_growth_ledger,
    "active_7d": q_active_7d,
    "cooccur_types": q_cooccur_types,
})
_EXTENSION_ORACLES.update({
    "transitions_spec": SQL_TRANSITIONS_SPEC,
    "growth_ledger": SQL_GROWTH_LEDGER,
    "active_7d": SQL_ACTIVE_7D,
    "cooccur_types": SQL_COOCCUR_TYPES,
})


def q_metrics_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure spec data (round 8): wide-to-long melt
    (`operators/rollup.py:unpivot_table` post-op — Spark's native
    Expand node, zero shuffle) over a per-status metrics table.  All
    metrics are integer-exact (floor before sum, never a double sum),
    so the long frame hashes bit-for-bit."""
    maps = {"metrics_long": {
        "original_table": "orders",
        "columns": {"status": "o_orderstatus",
                    "price": "o_totalprice", "okey": "o_orderkey"},
        "post_ops": [
            {"op": "agg", "group_by": ["status"],
             "aggs": ["count(*) AS n_orders",
                      "cast(sum(cast(floor(price) as bigint)) as bigint)"
                      " AS sum_price_floor",
                      "cast(min(okey) as bigint) AS min_key",
                      "cast(max(okey) as bigint) AS max_key"]},
            {"op": "unpivot", "id_cols": ["status"],
             "value_cols": ["n_orders", "sum_price_floor",
                            "min_key", "max_key"]},
        ],
    }}
    return _run(spark, sf_dir, maps, "metrics_long")


SQL_METRICS_LONG = """
WITH a AS (
    SELECT o_orderstatus AS status,
           count(*) AS n_orders,
           sum(CAST(floor(o_totalprice) AS BIGINT)) AS sum_price_floor,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
    FROM orders GROUP BY 1
)
SELECT status, 'n_orders' AS metric, CAST(n_orders AS BIGINT) AS value
FROM a
UNION ALL
SELECT status, 'sum_price_floor', CAST(sum_price_floor AS BIGINT) FROM a
UNION ALL
SELECT status, 'min_key', CAST(min_key AS BIGINT) FROM a
UNION ALL
SELECT status, 'max_key', CAST(max_key AS BIGINT) FROM a
"""


_EXTENSION_QUERIES.update({"metrics_long": q_metrics_long})
_EXTENSION_ORACLES.update({"metrics_long": SQL_METRICS_LONG})


def q_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-backed retrieval (round 8, `operators/text.py:bm25_index`/
    `bm25_topk_indexed`): the corpus is tokenized ONCE into a posting
    table (token, doc, tf, dl) and the same three queries as
    `bm25_search` are served from it — N/avgdl/df all derive from the
    index, the text column is never rescanned.  Output contract
    identical to the direct path (pinned in tests), so the oracle is
    the same end-to-end SQL: a hash match proves the index round-trip
    loses nothing."""
    from database_transportor_spark.operators.text import (
        bm25_index, bm25_topk_indexed,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_topk_indexed(bm25_index(docs), _bm25_queries(spark), k=10)


_EXTENSION_QUERIES.update({"bm25_indexed": q_bm25_indexed})
_EXTENSION_ORACLES.update({"bm25_indexed": SQL_BM25_SEARCH})


def q_bm25_updated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance (round 9,
    `operators/text.py:bm25_index_update`): build the posting table,
    apply a delta — every 17th doc deleted (the dedup-pipeline shape),
    every 13th re-added under a new id with appended text (append +
    retrievability) — then serve the same three queries from the
    UPDATED index.  The oracle runs full BM25 over the mutated corpus,
    so a hash match proves update ≡ rebuild end-to-end: the anti-join
    delete, the union append, and the index-derived N/avgdl/df."""
    from database_transportor_spark.operators.text import (
        bm25_index, bm25_index_update, bm25_topk_indexed,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    idx = bm25_index(docs)
    dels = docs.filter("doc_id % 17 = 0").select("doc_id")
    adds = docs.filter("doc_id % 13 = 0").select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" spark spark window")).alias("text"))
    updated = bm25_index_update(idx, add_docs=adds, delete_ids=dels)
    return bm25_topk_indexed(updated, _bm25_queries(spark), k=10)


# the mutated corpus as a CTE, spliced into the shared BM25 oracle body
SQL_BM25_UPDATED = SQL_BM25_SEARCH.replace(
    "WITH q(", """WITH corpus AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0
    UNION ALL
    SELECT doc_id + 10000000 AS doc_id, text || ' spark spark window'
    FROM documents WHERE doc_id % 13 = 0
), q(""").replace("FROM documents\n", "FROM corpus\n")


_EXTENSION_QUERIES.update({"bm25_updated": q_bm25_updated})
_EXTENSION_ORACLES.update({"bm25_updated": SQL_BM25_UPDATED})


def q_audio_decoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pluggable decoder hook (round 9, `decoder=` on
    `multimodal.decode_audio`): the shared `_m4a_fixture` with odd docs
    carrying an `mp4a` ("compressed") sample entry the built-in PCM
    demuxer refuses — a stub decoder restores the PCM fourcc and
    re-demuxes, standing in for a real AAC library.  Shares
    `mp4_audio`'s closed-form oracle, so the hash proves hook-decoded
    rows produce bit-identical statistics to built-in-decoded rows."""
    from database_transportor_spark.operators.multimodal import decode_audio

    def hook(b: bytes):
        from database_transportor_spark.operators.multimodal import (
            decode_mp4_audio)

        i = b.rfind(b"mp4a")
        if i < 0:
            return None
        return decode_mp4_audio(b[:i] + b"twos" + b[i + 4:])

    media = _m4a_fixture(spark, sf_dir, mp4a=True)
    return decode_audio(media, "doc_id", "content", decoder=hook)


_EXTENSION_QUERIES.update({"audio_decoder": q_audio_decoder})
_EXTENSION_ORACLES.update({"audio_decoder": SQL_MP4_AUDIO})


def _work_cat(spark: SparkSession, prefix: str = "wrk"):
    """Throwaway ParquetCatalog under a fresh tempdir — the shared
    scaffold every stored-table query used to hand-roll (VERDICT r10
    #4: harness-LoC budget)."""
    import tempfile
    import uuid

    from database_transportor_spark import ParquetCatalog

    work = tempfile.mkdtemp(prefix=f"{prefix}_{uuid.uuid4().hex[:6]}_")
    return ParquetCatalog(spark, f"{work}/cat")


def _bm25_queries(spark: SparkSession) -> DataFrame:
    """The fixed 3-query retrieval probe set every BM25 query serves."""
    return spark.createDataFrame(
        [(1, "spark window join"), (2, "fast hash merge"),
         (3, "stream batch sort")],
        "query_id int, query string",
    )


def _stream_fixture(spark: SparkSession, sf_dir: str, sink,
                    prefix: str = "sfx", batches: int = 2):
    """Shared streaming scaffold: feed the documents corpus in
    ``batches`` micro-batches (doc_id mod round-robin) through
    ``sink(src_dir, cat, checkpoint)`` — one call per batch, same
    checkpoint, so the sink sees genuine incremental arrivals.
    Returns the catalog holding whatever the sink maintained."""
    cat = _work_cat(spark, prefix)
    work = cat.root.rsplit("/", 1)[0]
    src, ckpt = f"{work}/feed", f"{work}/ckpt"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    for i in range(batches):
        docs.filter(F.col("doc_id") % batches == i) \
            .write.mode("append").parquet(src)
        sink(src, cat, ckpt)
    return cat


def q_stream_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming retrieval-index maintenance (round 9,
    `streaming/bm25_sink.py:stream_bm25_sink`): the documents corpus
    arrives in two micro-batches (even ids, then odd); each batch's
    posting rows append to the stored index — tokenized exactly once,
    first arrival wins, commit-marker exactly-once — and the three
    fixed queries are then served from the STREAMED table.  The oracle
    is the full batch BM25 SQL: a hash match proves the streamed index
    is indistinguishable from a one-shot build."""
    from database_transportor_spark.operators.text import bm25_topk_indexed
    from database_transportor_spark.streaming.bm25_sink import (
        stream_bm25_sink,
    )

    cat = _stream_fixture(
        spark, sf_dir,
        lambda src, c, ckpt: stream_bm25_sink(spark, src, c, "idx",
                                              checkpoint=ckpt),
        prefix="sbm")
    return bm25_topk_indexed(cat.read("idx"), _bm25_queries(spark), k=10)


_EXTENSION_QUERIES.update({"stream_bm25": q_stream_bm25})
_EXTENSION_ORACLES.update({"stream_bm25": SQL_BM25_SEARCH})


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff (round 9, `operators/corpus.py:corpus_diff`):
    the documents corpus vs a mutated rebuild — every 17th doc removed,
    every 13th re-texted, a re-id'd slice added — classified into
    added/removed/changed by a 16-byte-per-row full-outer hash join
    (unchanged docs excluded).  The oracle recomputes the diff with
    direct value comparison, so a hash match ALSO witnesses that the
    content-hash path classifies identically to value equality."""
    from database_transportor_spark.operators.corpus import corpus_diff

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    new = (
        docs.filter("doc_id % 17 <> 0")
        .withColumn("text", F.when(F.col("doc_id") % 13 == 0,
                                   F.concat(F.col("text"), F.lit(" v2")))
                    .otherwise(F.col("text")))
        .unionByName(docs.filter("doc_id % 11 = 0").select(
            (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"))
    )
    return corpus_diff(docs, new)


SQL_CORPUS_DIFF = """
WITH new AS (
    SELECT doc_id,
           CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
    FROM documents WHERE doc_id % 17 <> 0
    UNION ALL
    SELECT doc_id + 10000000 AS doc_id, text
    FROM documents WHERE doc_id % 11 = 0
)
SELECT doc_id, status FROM (
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.text IS DISTINCT FROM n.text THEN 'changed'
           END AS status
    FROM documents o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
) WHERE status IS NOT NULL
"""


_EXTENSION_QUERIES.update({"corpus_diff": q_corpus_diff})
_EXTENSION_ORACLES.update({"corpus_diff": SQL_CORPUS_DIFF})


def q_bm25_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB serving mode (round 9, `operators/text.py:
    bm25_index_stats`): N/avgdl/df come from a materialized
    vocabulary-sized stats table and the posting scan is pruned to the
    query terms with a literal IN — per batch the engine reads only
    postings the queries touch instead of re-aggregating the whole
    index.  Shares the full BM25 oracle: a hash match proves the
    stats-served scores equal the self-derived (and direct) paths."""
    from database_transportor_spark.operators.text import (
        bm25_index, bm25_index_stats, bm25_topk_indexed,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # unpinned on purpose: the round-10 staleness count re-derives the
    # index lineage once more (the guard's honest cost on a computed
    # frame — stored-index serving pays a metadata-only count instead,
    # see bm25_layout/bm25_stats_fresh), and a pin here would smear the
    # cached lineage across the census plan text
    idx = bm25_index(docs)
    return bm25_topk_indexed(idx, _bm25_queries(spark), k=10,
                             stats=bm25_index_stats(idx))


_EXTENSION_QUERIES.update({"bm25_served": q_bm25_served})
_EXTENSION_ORACLES.update({"bm25_served": SQL_BM25_SEARCH})


def q_bm25_stats_fresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional stats freshness (round 10, `streaming/bm25_sink.py`
    `stats_table=` + `operators/text.py:bm25_topk_indexed` staleness
    guard): the corpus streams in through two micro-batches, the sink
    refreshes the `bm25_index_stats` table inside each committed batch,
    and the fixed queries are served `stats=` against the sink-maintained
    table — the serve path's n_postings guard verifies stats match the
    live index before scoring.  Shares the full BM25 oracle: a hash
    match proves sink-maintained stats serve bit-identically to a
    one-shot build."""
    from database_transportor_spark.operators.text import bm25_topk_indexed
    from database_transportor_spark.streaming.bm25_sink import (
        stream_bm25_sink,
    )

    cat = _stream_fixture(
        spark, sf_dir,
        lambda src, c, ckpt: stream_bm25_sink(spark, src, c, "idx",
                                              checkpoint=ckpt,
                                              stats_table="idx_stats"),
        prefix="sbf")
    return bm25_topk_indexed(cat.read("idx"), _bm25_queries(spark), k=10,
                             stats=cat.read("idx_stats"))


_EXTENSION_QUERIES.update({"bm25_stats_fresh": q_bm25_stats_fresh})
_EXTENSION_ORACLES.update({"bm25_stats_fresh": SQL_BM25_SEARCH})


def q_bm25_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turnkey file-skipping layout (round 10, `operators/text.py:
    bm25_index_layout`): the posting table is stored, rewritten into
    the token-range-sorted layout via one staged swap, and the fixed
    queries are served `stats=` from the laid-out table — the literal
    query-term IN now skips whole files by parquet min/max footers
    (SCALE.md round-9 measured 1-of-16 files touched on this layout).
    Shares the full BM25 oracle: a hash match proves the rewrite is
    score-transparent."""
    from database_transportor_spark.operators.text import (
        bm25_index, bm25_index_layout, bm25_index_stats,
        bm25_topk_indexed,
    )

    cat = _work_cat(spark, "sbl")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cat.write(bm25_index(docs), "idx", mode="overwrite")
    bm25_index_layout(cat, "idx", files=8)
    stats = bm25_index_stats(cat.read("idx"))
    return bm25_topk_indexed(cat.read("idx"), _bm25_queries(spark), k=10,
                             stats=stats)


_EXTENSION_QUERIES.update({"bm25_layout": q_bm25_layout})
_EXTENSION_ORACLES.update({"bm25_layout": SQL_BM25_SEARCH})


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (round 10, `operators/similarity.py:rrf_fuse`):
    three probe documents retrieve their top-10 neighbors LEXICALLY
    (BM25 over the probe's own text, self excluded after the rank cut)
    and SEMANTICALLY (exact cosine over the embeddings table, self
    excluded), and the two lists fuse by reciprocal rank
    (`sum 1/(60+rank)`, round-6, doc-id tiebreak).  The oracle
    recomputes both retrievals AND the fusion in SQL — ranks are
    integers, so the fused score is engine-exact."""
    from database_transportor_spark.operators.similarity import (
        cosine_topk, rrf_fuse,
    )
    from database_transportor_spark.operators.text import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query"))
    lex = (
        bm25_topk(docs, qs, k=10)
        .filter(F.col("doc_id") != F.col("query_id"))
        .select("query_id", F.col("doc_id").alias("neighbor_id"), "rank")
    )
    sem = cosine_topk(
        emb, emb.filter(F.col("vec_id") < 3), "vec_id", "embedding", k=10
    ).select("query_id", "neighbor_id", "rank")
    return rrf_fuse([lex, sem]).select(
        "query_id", "neighbor_id", "rrf_score",
        F.col("rank").cast("long").alias("rank"))


SQL_HYBRID_RRF = """
WITH toks AS (
    SELECT doc_id,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
    FROM documents
), tf AS (
    SELECT doc_id, token, count(*) AS tf
    FROM toks WHERE token <> '' GROUP BY 1, 2
), dl AS (
    SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
), st AS (
    SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM dl
), dfreq AS (
    SELECT token, count(*) AS df FROM tf GROUP BY 1
), qt AS (
    SELECT DISTINCT doc_id AS query_id, token FROM toks
    WHERE doc_id < 3 AND token <> ''
), lex_scored AS (
    SELECT qt.query_id, tf.doc_id,
           round(sum(
               ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
           ), 6) AS score
    FROM qt
    JOIN tf USING (token)
    JOIN dfreq d USING (token)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN st s
    GROUP BY 1, 2
), lex AS (
    SELECT query_id, doc_id AS neighbor_id, rn AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rn
        FROM lex_scored
    ) WHERE rn <= 10 AND doc_id <> query_id
), sem_scored AS (
    SELECT p.query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(p.qe, e.embedding) AS cos
    FROM (SELECT vec_id AS query_id, embedding AS qe
          FROM embeddings WHERE vec_id < 3) p, embeddings e
    WHERE e.vec_id <> p.query_id
), sem AS (
    SELECT query_id, neighbor_id, rn AS rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rn
        FROM sem_scored
    ) WHERE rn <= 10
), fused AS (
    SELECT query_id, neighbor_id,
           round(sum(1.0 / (60 + rank)), 6) AS rrf_score
    FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)
    GROUP BY 1, 2
)
SELECT query_id, neighbor_id, rrf_score, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC,
                                            neighbor_id) AS rn
      FROM fused)
WHERE rn <= 10
"""


_EXTENSION_QUERIES.update({"hybrid_rrf": q_hybrid_rrf})
_EXTENSION_ORACLES.update({"hybrid_rrf": SQL_HYBRID_RRF})


def q_hybrid_declarative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME hybrid retrieval routed through the declarative planner
    (round 11, `operators/post_ops.py:hybrid_retrieve`): a transport
    spec whose post_ops stage composes the BM25 leg, the cosine leg,
    and the reciprocal-rank fusion — "gate → index → hybrid retrieve"
    is now expressible in one spec (VERDICT r10 #3).  Oracle: identical
    to `hybrid_rrf`, so a hash match proves the declarative node equals
    the hand-composed function path."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qs = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query"))
    maps = {
        "hybrid_out": {
            "original_table": "hybrid_queries",
            "columns": {"query_id": "query_id", "query": "query"},
            "post_ops": [
                {"op": "hybrid_retrieve", "corpus_table": "documents",
                 "embeddings_table": "embeddings", "k": 10, "topk": 10,
                 "exclude_self": True},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "hybrid_out",
                extra_original={"hybrid_queries": qs})


_EXTENSION_QUERIES.update({"hybrid_declarative": q_hybrid_declarative})
_EXTENSION_ORACLES.update({"hybrid_declarative": SQL_HYBRID_RRF})


def q_hybrid_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted hybrid retrieval, declaratively, on the SERVING path
    (round 11): the lexical leg reads a prebuilt posting table through
    `stats_table=` (the stats-served 100 TB mode, staleness-guarded)
    and the fusion downweights it 2:1 against the semantic leg — the
    first ORACLE check on weighted RRF (r10 shipped `weights=` under
    pytest only).  The oracle recomputes both retrievals and the
    weighted fusion in SQL; ranks are integers and weights are exact
    binary fractions, so the fused score is engine-exact."""
    from database_transportor_spark.operators.text import (
        bm25_index, bm25_index_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qs = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query"))
    idx = bm25_index(docs)
    maps = {
        "hybrid_w": {
            "original_table": "hybrid_queries",
            "columns": {"query_id": "query_id", "query": "query"},
            "post_ops": [
                {"op": "hybrid_retrieve", "index_table": "bm25_idx",
                 "stats_table": "bm25_stats",
                 "embeddings_table": "embeddings", "k": 10, "topk": 10,
                 "weights": [0.5, 1.0], "exclude_self": True},
            ],
        }
    }
    return _run(spark, sf_dir, maps, "hybrid_w",
                extra_original={"hybrid_queries": qs, "bm25_idx": idx,
                                "bm25_stats": bm25_index_stats(idx)})


SQL_HYBRID_WEIGHTED = SQL_HYBRID_RRF.replace(
    """    SELECT query_id, neighbor_id,
           round(sum(1.0 / (60 + rank)), 6) AS rrf_score
    FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)""",
    """    SELECT query_id, neighbor_id,
           round(sum(w / (60 + rank)), 6) AS rrf_score
    FROM (SELECT query_id, neighbor_id, rank, 0.5 AS w FROM lex
          UNION ALL
          SELECT query_id, neighbor_id, rank, 1.0 AS w FROM sem)""")
assert SQL_HYBRID_WEIGHTED != SQL_HYBRID_RRF  # splice must have landed


_EXTENSION_QUERIES.update({"hybrid_weighted": q_hybrid_weighted})
_EXTENSION_ORACLES.update({"hybrid_weighted": SQL_HYBRID_WEIGHTED})


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export receipt (round 11,
    `operators/corpus.py:export_shards`): the documents corpus is
    materialized as 8 one-file-per-shard parquet shards in
    `corpus_shuffle` epoch order, and the returned manifest is an
    AGGREGATE OVER THE WRITTEN FILES (`_metadata`), not the input — so
    the oracle match proves the physical export end-to-end: every row
    landed exactly once (n_rows + id_checksum per shard), shard
    assignment is the documented multiplicative hash, positions are
    contiguous 1..n (min_pos/max_pos), and each shard really is one
    file (n_files, measured from file paths).  `bytes` is physical and
    excluded from the oracle columns."""
    import tempfile
    import uuid

    from database_transportor_spark.operators.corpus import export_shards

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    work = tempfile.mkdtemp(prefix=f"shx_{uuid.uuid4().hex[:8]}_")
    man = export_shards(
        docs, f"{work}/shards", "doc_id", 8, seed=42,
        hash_fn="multiplicative", token_col="n_chars",
    )
    return man.select(
        "shard", "n_files", "n_rows", "n_tokens", "min_pos", "max_pos",
        "id_checksum",
    )


SQL_SHARD_MANIFEST = """
WITH keyed AS (
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
           (doc_id * 2654435761 + 42) % 4294967296 AS skey
    FROM documents
)
SELECT CAST(skey % 8 AS BIGINT) AS shard,
       CAST(1 AS BIGINT) AS n_files,
       COUNT(*) AS n_rows,
       CAST(SUM(n_chars) AS BIGINT) AS n_tokens,
       CAST(1 AS BIGINT) AS min_pos,
       COUNT(*) AS max_pos,
       CAST(SUM(skey) AS BIGINT) AS id_checksum
FROM keyed
GROUP BY 1
"""


_EXTENSION_QUERIES.update({"shard_manifest": q_shard_manifest})
_EXTENSION_ORACLES.update({"shard_manifest": SQL_SHARD_MANIFEST})


def q_export_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export-integrity audit (round 11,
    `operators/corpus.py:verify_export`): export the corpus, keep the
    manifest receipt, DELETE shard 0's data file, and recount — the
    audit must report exactly one `missing` row for shard 0 and
    nothing else (every other shard recounts clean against the
    receipt).  The oracle derives the expectation from the same
    multiplicative shard assignment: shard 0 is non-empty, so its
    disappearance is the one discrepancy."""
    import glob
    import os
    import tempfile
    import uuid

    from database_transportor_spark.operators.corpus import (
        export_shards, verify_export,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    work = tempfile.mkdtemp(prefix=f"xa_{uuid.uuid4().hex[:8]}_")
    dest = f"{work}/shards"
    from database_transportor_spark.operators.corpus import (
        _MANIFEST_SCHEMA,
    )

    man = spark.createDataFrame(
        export_shards(docs, dest, "doc_id", 8, seed=42,
                      hash_fn="multiplicative").collect(),
        _MANIFEST_SCHEMA)
    for f in glob.glob(f"{dest}/shard=0/*"):
        os.remove(f)
    return verify_export(spark, dest, man, "doc_id", seed=42,
                         hash_fn="multiplicative")


SQL_EXPORT_AUDIT = """
SELECT CAST(0 AS BIGINT) AS shard,
       'missing' AS status,
       CAST(NULL AS VARCHAR) AS field,
       CAST(NULL AS BIGINT) AS expected,
       CAST(NULL AS BIGINT) AS actual
WHERE EXISTS (
    SELECT 1 FROM documents
    WHERE (doc_id * 2654435761 + 42) % 4294967296 % 8 = 0
)
"""


_EXTENSION_QUERIES.update({"export_audit": q_export_audit})
_EXTENSION_ORACLES.update({"export_audit": SQL_EXPORT_AUDIT})


def q_video_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup pairs end-to-end (round 11,
    `operators/media_dedup.py:video_dup_pairs`): synthesize a REAL
    3-frame APNG per document — consecutive doc-id pairs share the
    frame content; the odd twin is +3 brightness-shifted on EVERY frame
    (dHash-invariant, so all 3 frames match at Hamming 0) — then
    per-frame dHash through the APNG chunk walk + pure-Python PNG
    decoder, banded Hamming FRAME join, per-video-pair evidence
    aggregation.  Unrelated groups are sha256-derived, so a cross-pair
    frame collision within Hamming 6 is ~1e-12 probable and the
    deterministic fixture pins the outcome.  Oracle: the closed-form
    planted pairs with matched_frames=3, min_hamming=0."""
    import hashlib

    import pandas as pd

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from database_transportor_spark.operators.media_dedup import (
        video_dup_pairs,
    )
    from database_transportor_spark.operators.multimodal import encode_apng

    # documents.parquet is ONE file ⇒ one scan partition: without the
    # repartition the whole Python synth+decode chain below runs in a
    # single task (the mjpeg_frames/_m4a_fixture discipline)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("content", BinaryType())])

    def make_apng(batches):
        import numpy as np

        h = w = 16
        for pdf in batches:
            out = []
            for d in pdf["doc_id"]:
                d = int(d)
                g = d // 2
                frames = []
                for f in range(3):
                    blocks = [
                        hashlib.sha256(f"vid:{g}:{f}:{i}".encode()).digest()
                        for i in range((h * w) // 32 + 1)
                    ]
                    raw = b"".join(blocks)[: h * w]
                    base = (np.frombuffer(raw, dtype=np.uint8) % 251) \
                        .reshape(h, w, 1)
                    if d % 2:
                        base = np.clip(base.astype(np.int64) + 3, 0, 255) \
                            .astype(np.uint8)
                    frames.append(base)
                out.append(encode_apng(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content": pd.Series(out, dtype="object")})

    media = docs.mapInPandas(make_apng, schema)
    return video_dup_pairs(media, "doc_id", "content").select(
        "id_a", "id_b", "matched_frames",
        F.col("min_hamming").cast("long").alias("min_hamming"))


SQL_VIDEO_DUPS = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(3 AS BIGINT) AS matched_frames,
       CAST(0 AS BIGINT) AS min_hamming
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
WHERE a.doc_id % 2 = 0
"""


_EXTENSION_QUERIES.update({"video_dups": q_video_dups})
_EXTENSION_ORACLES.update({"video_dups": SQL_VIDEO_DUPS})
