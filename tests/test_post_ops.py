"""post_ops planner integration: stage chaining, added-column write-through,
and error surfaces."""

import pytest

from database_transportor_spark import DBT, MemoryCatalog
from database_transportor_spark.spec import SpecError


def _docs(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again ok"),
         (2, "the quick brown fox jumps over the lazy dog again and again ok"),
         (3, "short")],
        ["doc_id", "text"],
    )


def test_post_ops_chain_and_write_columns(spark):
    maps = {
        "out": {
            "original_table": "docs",
            "columns": {"doc_id": "doc_id", "text": "text"},
            "post_ops": [
                {"op": "quality_score"},
                {"op": "exact_dedup", "keys": ["text"], "order_by": "doc_id"},
            ],
        }
    }
    eng = DBT(maps, target=MemoryCatalog(), original=MemoryCatalog({"docs": _docs(spark)}))
    out = eng.transform()["out"]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 3}  # doc 2 deduped away, min doc_id survives
    # post-op-added column is part of the written output
    assert "quality" in eng.write_columns("out")


def test_unknown_post_op_raises(spark):
    maps = {
        "out": {
            "original_table": "docs",
            "columns": {"doc_id": "doc_id"},
            "post_ops": [{"op": "no_such_op"}],
        }
    }
    eng = DBT(maps, target=MemoryCatalog(), original=MemoryCatalog({"docs": _docs(spark)}))
    with pytest.raises(SpecError, match="no_such_op"):
        eng.transform()


def test_post_op_missing_op_key_rejected(spark):
    with pytest.raises(SpecError, match="op"):
        DBT({"out": {"original_table": "d", "columns": {"x": "x"},
                     "post_ops": [{"keys": ["x"]}]}},
            target=MemoryCatalog(), original=MemoryCatalog())


def test_corpus_post_ops_compose(spark):
    """split/pack/redact stages compose declaratively on the planner."""
    from database_transportor_spark import DBT, MemoryCatalog

    src = spark.createDataFrame(
        [(i, "word " * (i % 7 + 1), (i % 7 + 1) * 5) for i in range(200)],
        ["doc_id", "text", "n_tok"],
    )
    maps = {
        "out": {
            "original_table": "docs",
            "columns": {"doc_id": "doc_id", "text": "text", "n_tok": "n_tok"},
            "post_ops": [
                {"op": "redact_pii", "text_col": "text"},
                {"op": "split_assign", "id_col": "doc_id"},
                {"op": "stratified_sample", "strata_cols": ["split"], "k": 50,
                 "id_col": "doc_id"},
                {"op": "pack_sequences", "id_col": "doc_id",
                 "tokens_col": "n_tok", "budget": 100, "group_cols": ["split"]},
            ],
        }
    }
    eng = DBT(maps, target=MemoryCatalog({}), original=MemoryCatalog({"docs": src}))
    out = eng.transform()["out"]
    assert {"split", "pack_id", "pack_offset", "n_email"} <= set(out.columns)
    assert out.count() <= 150  # ≤ 50 per split stratum
    assert out.filter("pack_offset < 0").count() == 0


def test_sketch_post_ops(spark):
    from database_transportor_spark import DBT, MemoryCatalog

    src = spark.createDataFrame(
        [(i, "g%d" % (i % 2), i % 25) for i in range(500)], ["id", "g", "u"]
    )
    maps = {
        "out": {
            "original_table": "t",
            "columns": {"id": "id", "g": "g", "u": "u"},
            "post_ops": [
                {"op": "approx_distinct", "keys": ["g"], "col": "u"},
            ],
        }
    }
    eng = DBT(maps, target=MemoryCatalog({}), original=MemoryCatalog({"t": src}))
    out = {r["g"]: r["approx_distinct"] for r in eng.transform()["out"].collect()}
    assert set(out) == {"g0", "g1"}
    for v in out.values():
        assert abs(v - 25) <= 2  # ~2% HLL error on 25 distinct


def test_training_mix_post_ops_compose(spark):
    """upsample + shuffle stages build a training mix declaratively."""
    df = spark.createDataFrame(
        [(i, "hi" if i % 2 == 0 else "lo", f"t{i}") for i in range(40)],
        ["doc_id", "dom", "text"],
    )
    maps = {
        "mix": {
            "original_table": "docs",
            "columns": {"doc_id": "doc_id", "dom": "dom", "text": "text"},
            "post_ops": [
                {"op": "upsample_domains", "domain_col": "dom",
                 "weights": {"hi": 2.0}, "id_col": "doc_id"},
                {"op": "corpus_shuffle", "id_col": "doc_id", "n_shards": 4},
            ],
        }
    }
    eng = DBT(maps, target=MemoryCatalog(),
              original=MemoryCatalog({"docs": df}))
    out = eng.transform()["mix"]
    assert out.count() == 60  # 20 hi x2 + 20 lo x1
    assert {"copy_idx", "shard", "shuffle_pos"} <= set(out.columns)


def test_quantize_post_op(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5]), (2, [0.0])], "vec_id long, embedding array<float>"
    )
    maps = {
        "q": {
            "original_table": "emb",
            "columns": {"vec_id": "vec_id", "embedding": "embedding"},
            "post_ops": [{"op": "quantize_embeddings", "vec_col": "embedding"}],
        }
    }
    eng = DBT(maps, target=MemoryCatalog(),
              original=MemoryCatalog({"emb": df}))
    out = {r["vec_id"]: r for r in eng.transform()["q"].collect()}
    assert out[1]["qvec"] == [127, -64]
    assert out[2]["qvec"] == [0]


def test_post_op_sessionize_and_check(spark):
    """New declarative stages: sessionize annotates, check gates."""
    import datetime

    import pytest

    from database_transportor_spark.operators.post_ops import apply_post_ops
    from database_transportor_spark.operators.validate import ValidationError

    ev = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 0), 5.0),
         (1, datetime.datetime(2024, 1, 1, 6), 6.0)],
        "user_id long, ts timestamp, value double",
    )
    out = apply_post_ops(
        ev,
        ({"op": "sessionize", "gap": "60 minutes"},
         {"op": "check", "rules": [{"rule": "not_null", "column": "session_id"}]}),
        "test",
    )
    assert {r["session_id"] for r in out.collect()} == {"1:0", "1:1"}

    with pytest.raises(ValidationError):
        apply_post_ops(
            ev,
            ({"op": "check",
              "rules": [{"rule": "range", "column": "value", "max": 5.5}]},),
            "test",
        )


def test_post_op_scd2(spark):
    import datetime

    from database_transportor_spark.operators.post_ops import apply_post_ops

    feed = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), "a"),
         (1, datetime.datetime(2024, 1, 2), "b")],
        "k long, ts timestamp, v string",
    )
    out = apply_post_ops(
        feed, ({"op": "scd2", "keys": ["k"], "ts_col": "ts"},), "test"
    )
    assert sorted(r["valid_to"] is None for r in out.collect()) == [False, True]


def test_round3_sampling_and_hitters_post_ops(spark):
    docs = spark.createDataFrame(
        [(i, "src%d" % (i % 2), "tok tok tok") for i in range(40)],
        ["doc_id", "source", "text"],
    )
    maps = {
        "out": {
            "original_table": "docs",
            "columns": {"doc_id": "doc_id", "source": "source"},
            "post_ops": [
                {"op": "sample_per_group", "id_col": "doc_id",
                 "group_cols": ["source"], "k": 5},
            ],
        },
        "hot": {
            "original_table": "docs",
            "columns": {"doc_id": "doc_id", "source": "source"},
            "post_ops": [
                {"op": "heavy_hitters", "value_col": "source", "k": 1},
            ],
        },
        "kept": {
            "original_table": "docs",
            "columns": {"doc_id": "doc_id"},
            "post_ops": [
                # doc_id < 20 -> p=0 dropped; >= 20 -> p=1 kept
                {"op": "weighted_sample", "id_col": "doc_id",
                 "prob": "case when doc_id >= 20 then 1.0 else 0.0 end"},
            ],
        },
    }
    eng = DBT(maps, target=MemoryCatalog(),
              original=MemoryCatalog({"docs": docs}))
    out = eng.transform()
    per_src = out["out"].groupBy("source").count().collect()
    assert {r["count"] for r in per_src} == {5}
    hot = out["hot"].collect()
    assert len(hot) == 1 and hot[0]["n"] == 20
    assert sorted(r["doc_id"] for r in out["kept"].collect()) == list(range(20, 40))


def test_gap_fill_post_op(spark):
    import datetime

    rows = [("u", datetime.datetime(2026, 1, 1), 3),
            ("u", datetime.datetime(2026, 1, 3), 9)]
    daily = spark.createDataFrame(rows, "k string, day timestamp, n long")
    maps = {
        "dense": {
            "original_table": "daily",
            "columns": {"k": "k", "day": "day", "n": "n"},
            "post_ops": [
                {"op": "gap_fill", "keys": ["k"], "ts_col": "day",
                 "value_cols": ["n"]},
            ],
        }
    }
    eng = DBT(maps, target=MemoryCatalog(),
              original=MemoryCatalog({"daily": daily}))
    out = eng.transform()["dense"]
    got = {r["day"].day: r["n"] for r in out.collect()}
    assert got == {1: 3, 2: 0, 3: 9}


def test_winsorize_and_k_anonymity_gate_post_ops(spark):
    import pytest as _pytest

    from database_transportor_spark.operators.validate import ValidationError

    docs = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(20)] + [(99, "g", 1e6)],
        ["doc_id", "grp", "score"],
    )
    maps = {
        "out": {
            "original_table": "docs",
            "columns": {"doc_id": "doc_id", "grp": "grp", "score": "score"},
            "post_ops": [
                {"op": "winsorize", "value_col": "score",
                 "group_cols": ["grp"], "p_lo": 0.05, "p_hi": 0.95},
            ],
        }
    }
    eng = DBT(maps, target=MemoryCatalog(),
              original=MemoryCatalog({"docs": docs}))
    out = eng.transform()["out"]
    assert max(r["score_wins"] for r in out.collect()) < 1e6

    gate = {
        "out": {
            "original_table": "docs",
            "columns": {"doc_id": "doc_id", "grp": "grp"},
            "post_ops": [
                {"op": "k_anonymity_gate", "quasi_cols": ["doc_id"], "k": 2},
            ],
        }
    }
    eng2 = DBT(gate, target=MemoryCatalog(),
               original=MemoryCatalog({"docs": docs}))
    with _pytest.raises(ValidationError):
        eng2.transform()  # the gate is eager: raises during planning


def test_analytics_post_ops_funnel_and_transitions(spark):
    """VERDICT r3 #6: the analytics tier runs as declarative stages."""
    import datetime

    def t(d):
        return datetime.datetime(2026, 1, d)

    ev = spark.createDataFrame(
        [(1, t(1), "view"), (1, t(2), "click"), (1, t(3), "buy"),
         (2, t(1), "view"), (2, t(2), "view")],
        "user_id long, ts timestamp, event_type string",
    )
    maps = {
        "fun": {
            "original_table": "ev",
            "columns": {"user_id": "user_id", "ts": "ts",
                        "event_type": "event_type"},
            "post_ops": [{"op": "funnel",
                          "stages": ["view", "click", "buy"]}],
        },
        "trans": {
            "original_table": "ev",
            "columns": {"user_id": "user_id", "ts": "ts",
                        "event_type": "event_type"},
            "post_ops": [{"op": "transition_matrix"}],
        },
    }
    eng = DBT(maps, target=MemoryCatalog(),
              original=MemoryCatalog({"ev": ev}))
    out = eng.transform()
    got = {r["user_id"]: r["stages_completed"] for r in out["fun"].collect()}
    assert got == {1: 3, 2: 1}
    trans = {(r["from_type"], r["to_type"]): r["n_transitions"]
             for r in out["trans"].collect()}
    assert trans == {("view", "click"): 1, ("click", "buy"): 1,
                     ("view", "view"): 1}


def test_analytics_post_ops_pagerank_and_cube(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "src long, dst long"
    )
    sales = spark.createDataFrame(
        [("a", "x", 10), ("a", "y", 5), ("b", "x", 1)],
        "r string, p string, v long",
    )
    maps = {
        "pr": {
            "original_table": "edges",
            "columns": {"src": "src", "dst": "dst"},
            "post_ops": [{"op": "pagerank", "iterations": 3}],
        },
        "cube": {
            "original_table": "sales",
            "columns": {"r": "r", "p": "p", "v": "v"},
            "post_ops": [{"op": "cube_agg", "dims": ["r", "p"],
                          "measures": ["sum(v) AS sum_v"]}],
        },
    }
    eng = DBT(maps, target=MemoryCatalog(),
              original=MemoryCatalog({"edges": edges, "sales": sales}))
    out = eng.transform()
    pr = out["pr"].collect()
    assert len(pr) == 3 and abs(sum(r["rank"] for r in pr) - 1.0) < 1e-6
    cube = {(r["r"], r["p"]): r["sum_v"] for r in out["cube"].collect()}
    assert cube[(None, None)] == 16 and cube[("a", None)] == 15
    assert cube[("a", "x")] == 10 and cube[(None, "x")] == 11


def test_post_op_dedup_paragraphs(spark):
    from database_transportor_spark.operators.post_ops import apply_post_ops

    df = spark.createDataFrame(
        [(1, "a|b"), (2, "a|c")], ["doc_id", "text"]
    )
    out = apply_post_ops(
        df, ({"op": "dedup_paragraphs", "sep": "|"},), "test"
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got == {1: "b", 2: "c"}


def test_post_op_kmeans(spark):
    from database_transportor_spark.operators.post_ops import apply_post_ops

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = apply_post_ops(df, ({"op": "kmeans", "k": 4},), "test")
    rows = out.collect()
    assert sum(r["n_points"] for r in rows) == df.count()


# ---------------------------------------------------------------------------
# Relational tier: derive / join / agg / window_rank / order_limit / distinct
# ---------------------------------------------------------------------------


def _sales_catalog(spark):
    sales = spark.createDataFrame(
        [(1, 10, 100.0), (2, 10, 50.0), (3, 20, 75.0), (4, 30, 5.0),
         (5, 20, 75.0)],
        ["sale_id", "cust_id", "amount"],
    )
    cust = spark.createDataFrame(
        [(10, "alice", "US"), (20, "bo", "DE"), (30, "cy", "US"),
         (40, "dee", "FR")],
        ["cust_id", "name", "country"],
    )
    return MemoryCatalog({"sales": sales, "customers": cust})


def test_relational_join_derive_agg_rank(spark):
    """Full scan→derive→join→agg→rank report expressed purely as spec data."""
    maps = {
        "report": {
            "original_table": "sales",
            "columns": {"sale_id": "sale_id", "cust_id": "cust_id",
                        "amount": "amount"},
            "post_ops": [
                {"op": "derive",
                 "columns": {"cents": "CAST(round(amount * 100) AS BIGINT)"}},
                {"op": "join", "table": "customers", "broadcast": True,
                 "select": ["cust_id AS c_id", "name", "country"],
                 "on": "cust_id = c_id"},
                {"op": "agg", "group_by": ["name", "country"],
                 "aggs": ["sum(cents) AS total_cents",
                          "CAST(count(*) AS BIGINT) AS n_sales"]},
                {"op": "window_rank",
                 "order_by": ["total_cents desc", "name asc"],
                 "rank_col": "rank", "top": 2},
                {"op": "derive", "columns": {"total": "total_cents / 100.0"}},
                {"op": "select",
                 "columns": ["rank", "name", "country", "total", "n_sales"]},
            ],
        }
    }
    eng = DBT(maps, target=MemoryCatalog(), original=_sales_catalog(spark))
    rows = [tuple(r) for r in eng.transform()["report"].orderBy("rank").collect()]
    assert rows == [(1, "alice", "US", 150.0, 2), (2, "bo", "DE", 150.0, 2)]


def test_relational_join_upstream_map_output(spark):
    """side='target' joins a pre-aggregated upstream map (transport_after
    orders the DAG) — the multi-map declarative pattern."""
    maps = {
        "per_cust": {
            "original_table": "sales",
            "columns": {"cust_id": "cust_id", "amount": "amount"},
            "post_ops": [
                {"op": "agg", "group_by": ["cust_id AS pc_cust"],
                 "aggs": ["sum(amount) AS spend"]},
            ],
        },
        "enriched": {
            "original_table": "customers",
            "columns": {"cust_id": "cust_id", "name": "name"},
            "transport_after": ["per_cust"],
            "post_ops": [
                {"op": "join", "table": "per_cust", "side": "target",
                 "how": "left", "on": "cust_id = pc_cust",
                 "select": ["pc_cust", "spend"]},
                {"op": "derive",
                 "columns": {"spend": "coalesce(spend, 0.0)"}},
                {"op": "select", "columns": ["cust_id", "name", "spend"]},
            ],
        },
    }
    eng = DBT(maps, target=MemoryCatalog(), original=_sales_catalog(spark))
    got = {r["cust_id"]: r["spend"] for r in eng.transform()["enriched"].collect()}
    assert got == {10: 150.0, 20: 150.0, 30: 5.0, 40: 0.0}


def test_relational_semi_cross_distinct_order_limit(spark):
    maps = {
        "active": {
            "original_table": "customers",
            "columns": {"cust_id": "cust_id", "name": "name"},
            "post_ops": [
                # semi join: customers with at least one sale >= 50
                {"op": "join", "table": "sales", "how": "left_semi",
                 "filter": "amount >= 50.0",
                 "select": ["cust_id AS s_cust"], "distinct": True,
                 "on": "cust_id = s_cust"},
                # cross join a 1-row global stat (broadcast)
                {"op": "join", "table": "sales", "how": "cross",
                 "broadcast": True,
                 "select": ["CAST(round(max(amount)*100) AS BIGINT) AS max_cp"]},
                {"op": "derive", "columns": {"max_amount": "max_cp / 100.0"}},
                {"op": "select", "columns": ["cust_id", "name", "max_amount"]},
                {"op": "order_limit", "by": ["cust_id asc"], "limit": 1},
            ],
        }
    }
    eng = DBT(maps, target=MemoryCatalog(), original=_sales_catalog(spark))
    rows = [tuple(r) for r in eng.transform()["active"].collect()]
    assert rows == [(10, "alice", 100.0)]


def test_relational_distinct_subset_and_sort_suffixes(spark):
    from database_transportor_spark.operators.post_ops import apply_post_ops

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (None, "z")], ["k", "v"]
    )
    out = apply_post_ops(
        df,
        ({"op": "distinct", "subset": ["k"]},
         {"op": "order_limit", "by": ["k desc nulls last"]}),
        "test",
    )
    ks = [r["k"] for r in out.collect()]
    assert ks == [2, 1, None]


def test_relational_join_requires_resolver_and_cross_guard(spark):
    from database_transportor_spark.operators.post_ops import apply_post_ops

    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(SpecError, match="resolver"):
        apply_post_ops(df, ({"op": "join", "table": "t", "on": "1=1"},), "w")
    maps = {
        "bad": {
            "original_table": "sales",
            "columns": {"sale_id": "sale_id"},
            "post_ops": [{"op": "join", "table": "customers", "how": "inner"}],
        }
    }
    eng = DBT(maps, target=MemoryCatalog(), original=_sales_catalog(spark))
    with pytest.raises(SpecError, match="cross"):
        eng.transform()


def test_relational_window_rank_partitioned(spark):
    from database_transportor_spark.operators.post_ops import apply_post_ops

    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 8)], ["g", "v"]
    )
    out = apply_post_ops(
        df,
        ({"op": "window_rank", "partition_by": ["g"], "order_by": ["v desc"],
          "rank_col": "rn", "top": 1},),
        "test",
    )
    got = {r["g"]: r["v"] for r in out.collect()}
    assert got == {"a": 3, "b": 9}


def test_relational_window_agg(spark):
    """count/sum OVER (PARTITION BY ...) kept on every row — the
    declarative form of the aggregate-once EXISTS rewrite."""
    from database_transportor_spark.operators.post_ops import apply_post_ops

    df = spark.createDataFrame(
        [(1, "s1", 1), (1, "s2", 0), (2, "s1", 1), (2, "s2", 1)],
        ["order_id", "supp", "late"],
    )
    out = apply_post_ops(
        df,
        ({"op": "window_agg", "partition_by": ["order_id"],
          "aggs": {"n_supp": "count(*)", "n_late": "sum(late)"}},
         {"op": "filter", "condition": "late = 1 AND n_late = 1"}),
        "test",
    )
    rows = [(r["order_id"], r["supp"]) for r in out.collect()]
    assert rows == [(1, "s1")]


def test_relational_empty_params_rejected(spark):
    from database_transportor_spark.operators.post_ops import apply_post_ops

    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(SpecError, match="derive"):
        apply_post_ops(df, ({"op": "derive", "columns": {}},), "w")
    with pytest.raises(SpecError, match="agg"):
        apply_post_ops(df, ({"op": "agg", "group_by": ["x"], "aggs": []},), "w")


def test_relational_union_pivot_unpivot(spark):
    """Multi-source union + wide pivot + melt, all as spec data."""
    maps = {
        "entities": {
            "original_table": "customers",
            "columns": {"name": "name", "country": "country"},
            "post_ops": [
                {"op": "derive", "columns": {"src": "'customer'"}},
                {"op": "union", "table": "sales",
                 "select": ["concat('sale_', sale_id) AS name",
                            "'XX' AS country", "'sale' AS src"]},
                {"op": "pivot", "group_cols": ["src"], "pivot_col": "country",
                 "values": ["US", "DE", "XX"]},
            ],
        }
    }
    eng = DBT(maps, target=MemoryCatalog(), original=_sales_catalog(spark))
    got = {r["src"]: (r["US"], r["DE"], r["XX"])
           for r in eng.transform()["entities"].collect()}
    assert got == {"customer": (2, 1, 0), "sale": (0, 0, 5)}

    from database_transportor_spark.operators.post_ops import apply_post_ops

    wide = spark.createDataFrame([(1, 10.0, 20.0)], ["id", "m1", "m2"])
    long = apply_post_ops(
        wide, ({"op": "unpivot", "id_cols": ["id"],
                "value_cols": ["m1", "m2"]},), "t")
    assert {(r["metric"], r["value"]) for r in long.collect()} == \
        {("m1", 10.0), ("m2", 20.0)}


def test_relational_union_requires_resolver(spark):
    from database_transportor_spark.operators.post_ops import apply_post_ops

    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(SpecError, match="resolver"):
        apply_post_ops(df, ({"op": "union", "table": "t"},), "w")


def test_strip_spans_stage(spark):
    # docs 1 and 2 share their entire text: the non-canonical copy (doc
    # 2) is rewritten down to nothing; doc 1 and the unique doc 3 keep
    # their (normalized) text
    maps = {
        "out": {
            "original_table": "docs",
            "columns": {"doc_id": "doc_id", "text": "text"},
            "post_ops": [
                {"op": "strip_spans", "span_words": 4},
            ],
        }
    }
    eng = DBT(maps, target=MemoryCatalog(), original=MemoryCatalog({"docs": _docs(spark)}))
    out = eng.transform()["out"]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["removed"] == 0
    assert rows[2]["removed"] > 0
    assert rows[3]["text"] == "short" and rows[3]["removed"] == 0
    # the canonical copy's text survives verbatim (already normalized)
    assert rows[1]["text"].startswith("the quick brown fox")


def test_pca_stage(spark):
    vecs = [(i, [float(i), float(i % 3), 1.0]) for i in range(10)]
    src = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    maps = {
        "out": {
            "original_table": "emb",
            "columns": {"vec_id": "vec_id", "embedding": "embedding"},
            "post_ops": [{"op": "pca", "k": 2}],
        }
    }
    eng = DBT(maps, target=MemoryCatalog(), original=MemoryCatalog({"emb": src}))
    out = eng.transform()["out"]
    rows = out.collect()
    assert len(rows) == 10 and all(len(r["pca"]) == 2 for r in rows)
    assert "pca" in eng.write_columns("out")


# ---------------------------------------------------------------------------
# Round-6 declarative stages: sketches, AQP, media, graph, linkage
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402


class TestRound6Stages:
    def _apply(self, df, ops):
        from database_transportor_spark.operators.post_ops import (
            apply_post_ops,
        )

        return apply_post_ops(df, tuple(ops), "test", resolve=None)

    def test_kmv_distinct_stage(self, spark):
        df = spark.range(0, 300).select(
            (F.col("id") % 3).alias("g"), (F.col("id") % 60).alias("v")
        )
        out = self._apply(
            df, [{"op": "kmv_distinct", "keys": ["g"], "value_col": "v"}]
        )
        assert {r["distinct_est"] for r in out.collect()} == {20}

    def test_hist_quantiles_stage(self, spark):
        df = spark.range(0, 1000).select(
            F.lit("g").alias("g"), F.col("id").cast("double").alias("x")
        )
        out = self._apply(df, [{
            "op": "hist_quantiles", "keys": ["g"], "value_col": "x",
            "lo": 0.0, "hi": 1000.0, "bins": 100, "qs": [0.5],
        }]).collect()[0]
        assert abs(out["p50"] - 500) <= 10
        assert "hist" not in out.asDict()

    def test_approx_agg_stage(self, spark):
        df = spark.range(0, 20_000).select(
            F.lit("g").alias("g"), F.lit(1.0).alias("x")
        )
        out = self._apply(df, [{
            "op": "approx_agg", "keys": ["g"], "fraction": 0.2,
            "measures": {"n": ["count"], "sx": ["sum", "x"]},
        }]).collect()[0]
        assert out["n_lo"] <= 20_000 <= out["n_hi"]
        assert out["sx_lo"] <= 20_000 <= out["sx_hi"]

    def test_graph_stages(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3)], "src long, dst long"
        )
        d = self._apply(edges, [{
            "op": "shortest_paths", "landmarks": [3], "directed": True,
        }])
        assert {(r["node"], r["dist"]) for r in d.collect()} == {
            (3, 0), (2, 1), (1, 2)
        }
        c = self._apply(edges, [{"op": "label_propagation",
                                 "iterations": 2}])
        assert c.count() == 3

    def test_edit_join_stage_self(self, spark):
        df = spark.createDataFrame(
            [(1, "acme corp"), (2, "acme corp.")], "id long, name string"
        )
        out = self._apply(df, [{
            "op": "edit_join", "id_col": "id", "text_col": "name",
            "max_distance": 1,
        }])
        got = {(r["id_a"], r["id_b"]) for r in out.collect()}
        assert (1, 2) in got and (2, 1) in got

    def test_edit_join_stage_needs_resolver_for_table(self, spark):
        import pytest

        from database_transportor_spark.spec import SpecError

        df = spark.createDataFrame([(1, "x")], "id long, name string")
        with pytest.raises(SpecError, match="catalog resolver"):
            self._apply(df, [{
                "op": "edit_join", "id_col": "id", "text_col": "name",
                "table": "other",
            }])


class TestRound6LateStages:
    def _apply(self, df, ops, resolve=None):
        from database_transportor_spark.operators.post_ops import (
            apply_post_ops,
        )

        return apply_post_ops(df, tuple(ops), "test", resolve=resolve)

    def test_quantile_bin_and_km(self, spark):
        df = spark.createDataFrame(
            [(1.0, True), (2.0, False), (3.0, True), (4.0, False)],
            "x double, e boolean",
        )
        out = self._apply(df, [{"op": "quantile_bin", "value_col": "x",
                                "n_buckets": 2}])
        assert {r["bucket"] for r in out.collect()} == {0, 1}
        km = self._apply(
            df.selectExpr("CAST(x AS LONG) AS d", "e"),
            [{"op": "kaplan_meier", "duration_col": "d", "event_col": "e"}],
        )
        assert km.count() == 2  # two event times

    def test_seasonal_stage(self, spark):
        rows = [("k", i, float(i % 3)) for i in range(9)]
        df = spark.createDataFrame(rows, "k string, t long, v double")
        out = self._apply(df, [{
            "op": "seasonal_decompose", "keys": ["k"], "ts_col": "t",
            "value_col": "v", "period": 3,
        }])
        assert {"trend", "seasonal", "residual"} <= set(out.columns)

    def test_vocab_and_asof_forward_resolve(self, spark):
        import pytest

        from database_transportor_spark.spec import SpecError

        docs = spark.createDataFrame(
            [(1, "a b")], "doc_id long, text string"
        )
        with pytest.raises(SpecError, match="resolver"):
            self._apply(docs, [{"op": "vocab_coverage",
                                "vocab_table": "v"}])
        vocab = spark.createDataFrame([("a",)], "token string")
        out = self._apply(
            docs, [{"op": "vocab_coverage", "vocab_table": "v"}],
            resolve=lambda side, t: vocab,
        ).collect()[0]
        assert out["n_tokens"] == 2 and out["n_covered"] == 1

        left = spark.createDataFrame([("k", 1)], "k string, ts long")
        right = spark.createDataFrame(
            [("k", 5, "nxt")], "k string, ts long, v string"
        )
        got = self._apply(
            left,
            [{"op": "asof_refer_forward", "table": "r", "on": ["k"],
              "left_ts": "ts"}],
            resolve=lambda side, t: right,
        ).collect()[0]
        assert got["v"] == "nxt"


def test_custom_post_op_sees_only_its_own_params(spark):
    # ADVICE r6: _resolve/_where were silently injected into EVERY
    # stage's params, breaking custom handlers that strictly validate
    # their params dict
    from database_transportor_spark.operators.post_ops import (
        POST_OPS,
        _CONTEXT_OPS,
        apply_post_ops,
        register_post_op,
    )

    seen = {}

    @register_post_op("__strict_custom")
    def _strict(df, params):
        seen.update(params)
        unexpected = [k for k in params if k.startswith("_")]
        assert not unexpected, f"reserved keys leaked: {unexpected}"
        return df

    @register_post_op("__ctx_custom", context=True)
    def _ctx(df, params):
        assert "_resolve" in params and params["_where"] == "w"
        return df

    try:
        df = spark.createDataFrame([(1,)], "a long")
        apply_post_ops(
            df,
            ({"op": "__strict_custom", "x": 1}, {"op": "__ctx_custom"}),
            "w",
            resolve=lambda side, t: df,
        )
        assert seen == {"x": 1}
        # built-ins still get their context (join needs _resolve)
        assert "join" in _CONTEXT_OPS and "derive" in _CONTEXT_OPS
    finally:
        for name in ("__strict_custom", "__ctx_custom"):
            POST_OPS.pop(name, None)
            _CONTEXT_OPS.discard(name)


def test_hybrid_retrieve_stage_matches_function_path(spark):
    """VERDICT r10 #3: the declarative hybrid_retrieve stage must equal
    the hand-composed bm25_topk + cosine_topk + rrf_fuse pipeline."""
    from pyspark.sql import functions as F

    from database_transportor_spark.operators.post_ops import apply_post_ops
    from database_transportor_spark.operators.similarity import (
        cosine_topk, rrf_fuse,
    )
    from database_transportor_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [(i, f"token{i} token{i % 3} shared word alpha") for i in range(8)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    qs = docs.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query"))

    tables = {"documents": docs, "embeddings": emb}
    got = apply_post_ops(
        qs,
        ({"op": "hybrid_retrieve", "corpus_table": "documents",
          "embeddings_table": "embeddings", "k": 5, "topk": 5,
          "exclude_self": True, "weights": [2.0, 1.0]},),
        "test",
        resolve=lambda side, t: tables[t],
    )
    lex = (
        bm25_topk(docs, qs, k=5)
        .filter(F.col("doc_id") != F.col("query_id"))
        .select("query_id", F.col("doc_id").alias("neighbor_id"), "rank")
    )
    sem = cosine_topk(
        emb, emb.filter(F.col("vec_id") < 2), "vec_id", "embedding", k=5
    ).select("query_id", "neighbor_id", "rank")
    want = rrf_fuse([lex, sem], topk=5, weights=[2.0, 1.0]).select(
        "query_id", "neighbor_id", "rrf_score",
        F.col("rank").cast("long").alias("rank"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert got.columns == ["query_id", "neighbor_id", "rrf_score", "rank"]


def test_hybrid_retrieve_stage_validation(spark):
    from database_transportor_spark.operators.post_ops import apply_post_ops
    from database_transportor_spark.spec import SpecError

    qs = spark.createDataFrame([(1, "x")], "query_id long, query string")
    with pytest.raises(SpecError, match="exactly one lexical source"):
        apply_post_ops(
            qs, ({"op": "hybrid_retrieve", "embeddings_table": "e"},),
            "w", resolve=lambda side, t: qs)
    with pytest.raises(SpecError, match="exactly one lexical source"):
        apply_post_ops(
            qs, ({"op": "hybrid_retrieve", "corpus_table": "d",
                  "index_table": "i", "embeddings_table": "e"},),
            "w", resolve=lambda side, t: qs)
    with pytest.raises(SpecError, match="catalog resolver"):
        apply_post_ops(
            qs, ({"op": "hybrid_retrieve", "corpus_table": "d",
                  "embeddings_table": "e"},), "w")


def test_hybrid_retrieve_indexed_and_ivf_legs(spark):
    """index_table + stats_table and the IVF semantic leg serve the same
    fused contract (rank-only inputs -> identical fusion when both legs
    return the same lists)."""
    from pyspark.sql import functions as F

    from database_transportor_spark.operators.post_ops import apply_post_ops
    from database_transportor_spark.operators.text import (
        bm25_index, bm25_index_stats,
    )

    docs = spark.createDataFrame(
        [(i, f"token{i} token{i % 3} shared word alpha") for i in range(8)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    qs = docs.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query"))
    idx = bm25_index(docs)
    tables = {"documents": docs, "embeddings": emb, "idx": idx,
              "idx_stats": bm25_index_stats(idx)}

    def run(stage):
        return sorted(map(tuple, apply_post_ops(
            qs, (stage,), "test",
            resolve=lambda side, t: tables[t]).collect()))

    base = {"embeddings_table": "embeddings", "k": 5, "topk": 5,
            "exclude_self": True}
    direct = run({"op": "hybrid_retrieve", "corpus_table": "documents",
                  **base})
    indexed = run({"op": "hybrid_retrieve", "index_table": "idx",
                   "stats_table": "idx_stats", **base})
    assert indexed == direct  # indexed+stats serving is score-transparent
    ivf = run({"op": "hybrid_retrieve", "corpus_table": "documents",
               "semantic": "ivf", "n_centroids": 2, "nprobe": 2, **base})
    assert len(ivf) > 0 and {r[0] for r in ivf} == {0, 1}


def test_export_shards_stage_writes_and_passes_manifest(spark, tmp_path):
    """Terminal export stage: the map's output IS the manifest, and the
    shards land at the spec-named path in epoch order."""
    import glob

    from pyspark.sql import functions as F

    docs = (
        spark.range(60).withColumnRenamed("id", "doc_id")
        .withColumn("text", F.concat(F.lit("d"), F.col("doc_id")))
    )
    dest = str(tmp_path / "shards")
    maps = {
        "manifest": {
            "original_table": "docs",
            "columns": {"doc_id": "doc_id", "text": "text"},
            "post_ops": [
                {"op": "export_shards", "path": dest, "id_col": "doc_id",
                 "n_shards": 3, "seed": 2},
            ],
        }
    }
    eng = DBT(maps, target=MemoryCatalog(),
              original=MemoryCatalog({"docs": docs}))
    man = eng.transform()["manifest"].collect()
    assert sum(r["n_rows"] for r in man) == 60
    assert all(r["n_files"] == 1 for r in man)
    assert len(glob.glob(f"{dest}/shard=*/*.parquet")) == len(man)
    with pytest.raises(KeyError):
        # required params missing -> loud, like every simple adapter
        DBT({"m": {"original_table": "docs",
                   "columns": {"doc_id": "doc_id"},
                   "post_ops": [{"op": "export_shards"}]}},
            target=MemoryCatalog(),
            original=MemoryCatalog({"docs": docs})).transform()


def test_verify_export_stage_audits_spec_export(spark, tmp_path):
    """Round-trip through the declarative tier: one spec exports, a
    second spec audits the destination against the transported
    manifest — clean diff, then a tampered destination shows up."""
    import glob
    import os

    from pyspark.sql import functions as F

    docs = (
        spark.range(80).withColumnRenamed("id", "doc_id")
        .withColumn("text", F.concat(F.lit("d"), F.col("doc_id")))
    )
    from database_transportor_spark import ParquetCatalog

    dest = str(tmp_path / "shards")
    # a REAL catalog target: the manifest must be materialized (as any
    # production receipt is) — a lazy in-memory plan would re-scan the
    # export on every read and is pinned to the pre-tamper file index
    target = ParquetCatalog(spark, str(tmp_path / "cat"))
    DBT(
        {"manifest": {
            "original_table": "docs",
            "columns": {"doc_id": "doc_id", "text": "text"},
            "post_ops": [
                {"op": "export_shards", "path": dest, "id_col": "doc_id",
                 "n_shards": 4, "seed": 3},
            ],
        }},
        target=target, original=MemoryCatalog({"docs": docs}),
    ).do_transport(mode="overwrite")

    audit_maps = {
        "audit": {
            "original_table": "manifest",
            "columns": {c: c for c in (
                "shard", "n_files", "bytes", "n_rows", "n_tokens",
                "min_pos", "max_pos", "id_checksum")},
            "post_ops": [
                {"op": "verify_export", "path": dest, "id_col": "doc_id",
                 "seed": 3},
            ],
        }
    }
    clean = DBT(audit_maps, target=MemoryCatalog(),
                original=target).transform()["audit"]
    assert clean.collect() == []
    os.remove(sorted(glob.glob(f"{dest}/shard=*/*.parquet"))[0])
    dirty = DBT(audit_maps, target=MemoryCatalog(),
                original=target).transform()["audit"]
    assert [r["status"] for r in dirty.collect()] == ["missing"]
