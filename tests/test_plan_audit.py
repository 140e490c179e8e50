"""Blanket physical-plan audit across the whole query surface.

Every ``queries()`` entry is planned at sf0.001 and scanned for the
operators that do not survive a 100× scale-up: CartesianProduct and
BroadcastNestedLoopJoin.  Ops that *deliberately* score a bounded probe
set against the corpus (brute-force ANN baselines — the probe side is a
constant handful of vectors) are listed as exceptions with the reason.
"""

import pytest

SF = "/root/testdata/sf0.001"

# query -> why a nested-loop/cartesian is acceptable THERE
ALLOWED_NESTED_LOOP = {
    # brute-force cosine baselines: probe side is O(10) rows by contract;
    # the corpus side streams once — the point of these ops is exact
    # scoring, the scale path is ann_ivf/cosine_pairs' bucketed variants
    "ann_cosine": "bounded probe set vs corpus, exact-scoring baseline",
    # hybrid fusion's semantic list IS cosine_topk — same bounded
    # 3-probe broadcast vs corpus; the fusion itself is list-sized
    "hybrid_rrf": "bounded probe set vs corpus (cosine_topk leg of RRF)",
    # the declarative hybrid_retrieve stage compiles to the SAME plan —
    # its semantic leg is the identical bounded-probe cosine_topk
    "hybrid_declarative":
        "bounded probe set vs corpus (cosine_topk leg of RRF)",
    "hybrid_weighted":
        "bounded probe set vs corpus (cosine_topk leg of RRF)",
    # the unigram-LM scalar totals (corpus token count + vocab size) are a
    # literal 1-row aggregate cross-joined onto the vocabulary — build side
    # is one row by construction, and joining it avoids a driver collect
    "lm_score": "1-row scalar-totals frame broadcast onto the vocabulary",
    # same shape: the (total rows, total keys) scalars are one broadcast
    # row joined onto the TakeOrdered top-k — never onto the key domain
    "skew_report": "1-row totals frame broadcast onto the top-k keys",
    # same shape again: the 1-row total-output scalar joins the top-k
    # contributing keys (count-table sized), never the fact side
    "join_size": "1-row join-size total broadcast onto the top-k keys",
    # data card: the 1-row lang-count + 1-row top-lang frames cross the
    # 1-row global stats — three literal single-row frames
    "corpus_report": "1-row stat frames crossed together (all single-row)",
    # Q22 shape: the positive-balance average is a literal 1-row scalar
    # broadcast onto customers (joining it avoids a driver collect)
    "idle_rich_customers": "1-row avg-balance scalar broadcast onto customers",
    # Q15 shape: the max-revenue scalar is one broadcast row joined onto
    # the supplier-revenue aggregate
    "top_supplier": "1-row max-revenue scalar broadcast onto the rev agg",
    # Q11 shape: the region-total scalar is one broadcast row joined onto
    # the per-part value aggregate (share threshold without a re-scan)
    "important_parts": "1-row total-value scalar broadcast onto the part agg",
    # bigram-LM scalar (vocab size V) is a literal 1-row aggregate
    # cross-joined onto the bigram-count table, same family as lm_score
    "bigram_lm": "1-row vocab-size scalar broadcast onto the bigram counts",
    # KL divergence grand-total scalar is a 1-row aggregate cross-joined
    # onto the (source×vocab)-sized count table
    "source_divergence": "1-row corpus-total scalar broadcast onto counts",
    # basket-total scalar (count distinct baskets) is one broadcast row
    # joined onto the pair counts — the pair generator itself is an
    # equi-join on the basket key, never a cross join
    "item_affinity": "1-row basket-total scalar broadcast onto pair counts",
    # the declarative cooccurrence_pairs post-op compiles to the SAME
    # plan as item_affinity — the only nested loop is that 1-row
    # basket-total scalar
    "cooccur_types": "1-row basket-total scalar broadcast onto pair counts",
    # variant-pair theta join runs on the per-variant aggregate — a table
    # bounded by the variant domain (single digits), never on events
    "ab_test": "variant-pair join on the variant-count-sized aggregate",
    # KMV pairwise overlap: the `group_a < group_b` theta self-join runs
    # on the SKETCH table — one row per group by construction (the
    # corpus was already collapsed to bottom-k arrays), so the build
    # side is group-count-sized and broadcastable, never the corpus
    "kmv_overlap": "theta self-join on the one-row-per-group sketch table",
}

STREAMING = {
    # availableNow streaming queries leave a running-query plan, not a
    # batch plan; their shapes are pinned in streaming-specific tests
    "events_stream_window", "events_stateful", "events_stream_dedup",
    "events_stream_join", "stream_enrich",
}


def _queries():
    import __spark_entry__ as e

    return e.queries()


@pytest.mark.parametrize("name", sorted(set(_queries()) - STREAMING))
def test_no_cartesian_or_nested_loop(spark, name):
    df = _queries()[name](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"
    if name not in ALLOWED_NESTED_LOOP:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join\n{plan}"
        )


@pytest.mark.parametrize(
    "name",
    ["upsample_domains", "quantize_embeddings", "normalize_text", "chunk_docs"],
)
def test_zero_shuffle_ops_have_no_exchange(spark, name):
    """Ops documented as zero-shuffle must compile to Exchange-free plans."""
    df = _queries()[name](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan, f"{name}: unexpected shuffle\n{plan}"


def test_corpus_shuffle_single_exchange(spark):
    """The epoch shuffle is one hash-partition exchange (the per-shard
    window) — no global sort (Sort with global=true) anywhere."""
    df = _queries()["corpus_shuffle"](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert plan.count("Exchange") == 1, plan
    import re

    assert not re.search(r"Sort \[[^\]]*\], true", plan), f"global sort:\n{plan}"


@pytest.mark.parametrize(
    "name,max_exchanges",
    [
        # one hash exchange on user_id feeds the window; AQE may add a
        # coalesce read but never a second hash partitioning
        ("rolling_agg", 1),
        # one hash exchange on user_id for the grouped pivot
        ("pivot_events", 1),
        # unpivot adds only an Expand over the pivot's single exchange
        ("unpivot_events", 1),
    ],
)
def test_single_shuffle_ops(spark, name, max_exchanges):
    """Ops documented as single-shuffle must not add hidden exchanges."""
    df = _queries()[name](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    n = plan.count("Exchange hashpartitioning")
    assert n <= max_exchanges, (
        f"{name}: {n} hash exchanges (expected <= {max_exchanges})\n{plan}"
    )


# Dimension-sized lookup joins must BROADCAST — a silent fallback to
# sort-merge (threshold/conf regression) would shuffle the fact side at
# 100 TB.  Listed per query: which joins the design says are broadcast.
BROADCAST_EXPECTED = {
    # nation dim lookup + grouped-orders count merge-joined into customer:
    # the dim join must broadcast; the refers aggregate joins on the fact
    # key and may shuffle (it is fact-sized), so require >= 1 broadcast.
    "flagship": 1,
    "refer_single": 1,     # nation lookup into customer
    "refer_rtrim": 1,
    "refer_dupkeys": 1,    # last-wins dedup'd lookup, still dim-sized
    "refer_hooks": 1,
    "refer_salted": 1,     # salted variant still broadcasts the salted dim
    "cdc_apply": 1,        # feed keys broadcast into the anti join
    # TPC-H-shaped analytics: every dimension join must broadcast
    "top_unshipped": 1,        # segment-filtered customer keys
    "revenue_by_nation": 3,    # region->nation, supplier, nation
    "returned_items": 1,       # nation dim
    "small_qty_revenue": 2,    # brand-filtered part keys + per-part stats
    "supplier_part_counts": 1, # filtered part dim into the pair scan
    "promo_revenue_share": 1,  # part dim
    "disjunctive_revenue": 1,  # part dim, ONE scan for 3 OR branches
    # round-4 TPC-H batch
    "nation_trade_volume": 1,  # pair-filtered nations into supplier
    "market_share": 2,         # filtered part + supplier-nation dims
    "product_profit": 2,       # filtered part + supplier-nation dims
    "promotable_suppliers": 2, # filtered part dim + supplier name dim
    "sole_late_supplier": 1,   # supplier name dim onto the numwait agg
}

#: queries whose FACT-side joins legitimately sort-merge at scale (the
#: dimension joins above must still broadcast)
_FACT_JOIN_OK = {"flagship", "top_unshipped", "revenue_by_nation",
                 "returned_items", "small_qty_revenue",
                 "supplier_part_counts", "promo_revenue_share",
                 "disjunctive_revenue", "nation_trade_volume",
                 "market_share", "product_profit", "promotable_suppliers",
                 "sole_late_supplier"}


@pytest.mark.parametrize("name", sorted(BROADCAST_EXPECTED))
def test_dimension_lookups_broadcast(spark, name):
    qs = _queries()
    if name not in qs:
        pytest.skip(f"{name} not registered")
    df = qs[name](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    n = plan.count("BroadcastHashJoin")
    assert n >= BROADCAST_EXPECTED[name], (
        f"{name}: expected >= {BROADCAST_EXPECTED[name]} BroadcastHashJoin, "
        f"found {n}\n{plan}"
    )
    assert "SortMergeJoin" not in plan or name in _FACT_JOIN_OK, (
        f"{name}: dimension lookup degraded to sort-merge\n{plan}"
    )


def test_pricing_summary_pushes_date_filter_to_scan(spark):
    """The Q1-shaped scan must push the shipdate predicate into the
    parquet reader — a full-table scan for a date-sliced rollup is the
    first thing that breaks at 100 TB."""
    df = _queries()["pricing_summary"](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "l_shipdate" in plan.split(
        "PushedFilters"
    )[1].split("]")[0], f"shipdate not pushed:\n{plan}"


def test_order_priority_exists_is_semi_join(spark):
    """The Q4-shaped EXISTS must plan as a LeftSemi join (no match
    fan-out materialized) with the order-date range pushed to the
    orders scan."""
    df = _queries()["order_priority_counts"](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "LeftSemi" in plan, f"EXISTS not a semi join:\n{plan}"
    assert "PushedFilters" in plan and "o_orderdate" in plan.split(
        "PushedFilters"
    )[1].split("]")[0], f"order date not pushed:\n{plan}"


def test_idle_rich_customers_anti_join_with_pushdown(spark):
    """The Q22-shaped NOT EXISTS must plan as a LeftAnti join with the
    order-date predicate pushed to the orders scan."""
    df = _queries()["idle_rich_customers"](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "LeftAnti" in plan, f"NOT EXISTS not an anti join:\n{plan}"
    assert "o_orderdate" in plan.split("PushedFilters")[-1].split("]")[0] or \
        plan.count("PushedFilters") >= 2, f"date not pushed:\n{plan}"
