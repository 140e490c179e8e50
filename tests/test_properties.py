"""Property-based tests (SURVEY §5.4, hypothesis):

1. 1:1 maps preserve row counts for any input table.
2. A refer lookup never changes driving-table cardinality — even when the
   build side has duplicate keys (the fan-out trap the engine must pin).
3. Middle explode output row count == sum of per-row CSV list lengths
   (restricted to values present in the many side).
4. Structured predicate compilation agrees with a Python reference
   evaluation, including the NULL-aware `=`/`<>` semantics.

Strategies draw small value pools with Nones and trailing spaces (to
exercise rtrim normalization) — the edge inputs that broke the reference.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from database_transportor_spark import DBT, MemoryCatalog

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small, collision-heavy pools so joins/dup-keys actually happen
_keys = st.one_of(st.none(), st.sampled_from(["a", "b", "b ", "c", "d"]))
_vals = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
_rows = st.lists(st.tuples(_keys, _vals), min_size=0, max_size=12)


def _df(spark, rows, cols=("k", "v")):
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    schema = StructType(
        [StructField(cols[0], StringType()), StructField(cols[1], IntegerType())]
    )
    return spark.createDataFrame(rows, schema)


@given(rows=_rows)
@SET
def test_one_to_one_preserves_count(spark, rows):
    src = _df(spark, rows)
    maps = {"out": {"original_table": "t", "columns": {"key": "k", "val": "v"}}}
    eng = DBT(maps, target=MemoryCatalog(), original=MemoryCatalog({"t": src}))
    assert eng.transform()["out"].count() == len(rows)


@given(fact=_rows, dim=_rows)
@SET
def test_refer_never_fans_out(spark, fact, dim):
    fdf = _df(spark, fact)
    ddf = _df(spark, dim)
    maps = {
        "out": {
            "original_table": "f",
            "columns": {
                "key": "k",
                "looked": {
                    "refer": {
                        "search_source": "original",
                        "search_table": "d",
                        "search_column": "k",
                        "according_column": "key",
                        "wanted_column": "v",
                    },
                    "default": -99,
                },
            },
        }
    }
    eng = DBT(maps, target=MemoryCatalog(),
              original=MemoryCatalog({"f": fdf, "d": ddf}))
    out = eng.transform()["out"]
    assert out.count() == len(fact)
    # miss => default, never NULL (J1 semantics)
    assert out.filter("looked IS NULL").count() == 0


@given(
    csvs=st.lists(
        st.lists(st.sampled_from(["1", "2", "3", "9"]), min_size=0, max_size=4),
        min_size=0,
        max_size=8,
    )
)
@SET
def test_middle_explode_counts(spark, csvs):
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    one_rows = [(i, ",".join(parts)) for i, parts in enumerate(csvs)]
    one = spark.createDataFrame(
        one_rows,
        StructType(
            [StructField("id", IntegerType()), StructField("csv", StringType())]
        ),
    )
    many = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")],
        StructType(
            [StructField("mid", IntegerType()), StructField("name", StringType())]
        ),
    )
    maps = {
        "junction": {
            "original_table": None,
            "columns": {"left_id": None, "right_name": None},
            "middle": {
                "one": {
                    "refer_table": "one",
                    "refer_source": "original",
                    "wanted_column": "id",
                    "fill_column": "left_id",
                    "according_column": "csv",
                },
                "many": {
                    "refer_table": "many",
                    "refer_source": "original",
                    "wanted_column": "name",
                    "fill_column": "right_name",
                    "search_column": "mid",
                    "search_method": "in",
                },
            },
        }
    }
    eng = DBT(maps, target=MemoryCatalog(),
              original=MemoryCatalog({"one": one, "many": many}))
    out = eng.transform()["junction"]
    # expected: one junction row per (row, csv element) pair whose element
    # matches a many-side id; empty CSVs contribute nothing (M2 skip).
    expected = sum(
        sum(1 for p in parts if p in ("1", "2", "3")) for parts in csvs
    )
    assert out.count() == expected


_ops = st.sampled_from(["=", "<>", "!=", ">", "<"])


@given(rows=_rows, op=_ops, val=st.one_of(st.none(), st.integers(-5, 5)))
@SET
def test_predicate_matches_reference_semantics(spark, rows, op, val):
    from database_transportor_spark.predicates import apply_conditions
    from database_transportor_spark.spec import Condition, SpecError

    df = _df(spark, rows)
    cond = Condition.parse(["v", op, val])
    if val is None and op in (">", "<"):
        # reference throws on range-compare with NULL (DBT.php:372)
        import pytest

        with pytest.raises(SpecError):
            apply_conditions(df, (cond,))
        return
    got = apply_conditions(df, (cond,)).count()

    def ref_match(v):
        if val is None:
            return (v is None) if op == "=" else (v is not None)
        if v is None:
            return False
        return {
            "=": v == val,
            "<>": v != val,
            "!=": v != val,
            ">": v > val,
            "<": v < val,
        }[op]

    assert got == sum(1 for _, v in rows if ref_match(v))


# ---------------------------------------------------------------------------
# temporal + corpus operator properties
# ---------------------------------------------------------------------------

_ts_rows = st.lists(
    st.tuples(st.sampled_from(["u1", "u2", "u3"]),
              st.integers(min_value=0, max_value=40),
              st.integers(min_value=-9, max_value=9)),
    min_size=0, max_size=14,
)


@given(left=_ts_rows, right=_ts_rows)
@SET
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    import pandas as pd

    from database_transportor_spark.operators.temporal import asof_join

    # merge_asof needs a unique right (key, ts); dedupe keeping max value —
    # mirrored on the Spark side by pre-aggregating, as the docstring advises
    rd = {}
    for k, t, v in right:
        rd[(k, t)] = max(v, rd.get((k, t), v))
    right_u = [(k, t, v) for (k, t), v in sorted(rd.items())]

    ldf = spark.createDataFrame(left or [("u1", 0, 0)], ["k", "ts", "lv"])
    rdf = spark.createDataFrame(right_u or [("zz", 0, 0)], ["k", "ts", "rv"])
    got = (
        asof_join(ldf, rdf, "k", "ts")
        .orderBy("k", "ts", "lv")
        .toPandas()[["k", "ts", "lv", "rv"]]
    )
    lp = pd.DataFrame(left or [("u1", 0, 0)], columns=["k", "ts", "lv"]).sort_values("ts", kind="stable")
    rp = pd.DataFrame(right_u or [("zz", 0, 0)], columns=["k", "ts", "rv"]).sort_values("ts", kind="stable")
    want = (
        pd.merge_asof(lp, rp, on="ts", by="k")
        .sort_values(["k", "ts", "lv"], kind="stable")
        .reset_index(drop=True)
    )
    assert list(got["rv"].fillna(-99)) == list(want["rv"].fillna(-99))


@given(rows=st.lists(st.tuples(st.integers(0, 100), st.integers(1, 30)),
                     min_size=1, max_size=20, unique_by=lambda r: r[0]))
@SET
def test_pack_sequences_invariants(spark, rows):
    from database_transportor_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    out = sorted(
        (r["doc_id"], r["pack_offset"], int(r["pack_id"]))
        for r in pack_sequences(df, "doc_id", "n_tok", budget=25).collect()
    )
    toks = dict(rows)
    # offsets are the exclusive prefix sum in id order; packs never decrease
    run = 0
    prev_pack = 0
    for doc_id, off, pack in out:
        assert off == run
        assert pack == off // 25
        assert pack >= prev_pack
        prev_pack = pack
        run += toks[doc_id]


@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=30,
                    unique=True))
@SET
def test_split_assign_total_and_stable(spark, ids):
    from database_transportor_spark.operators.corpus import split_assign

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    out = split_assign(df, "doc_id", {"a": 0.5, "b": 0.5})
    rows = out.collect()
    assert len(rows) == len(ids)                      # never drops/dups rows
    m1 = {r["doc_id"]: r["split"] for r in rows}
    m2 = {r["doc_id"]: r["split"]
          for r in split_assign(df.repartition(3), "doc_id",
                                {"a": 0.5, "b": 0.5}).collect()}
    assert m1 == m2                                   # partitioning-invariant


# --- mutation-operator properties ------------------------------------------

_mkeys = st.integers(min_value=0, max_value=5)
_mvals = st.integers(min_value=-9, max_value=9)
_mrows = st.lists(st.tuples(_mkeys, _mvals), min_size=0, max_size=10)


def _mdf(spark, rows):
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType(
        [StructField("k", IntegerType()), StructField("v", IntegerType())]
    )
    return spark.createDataFrame(rows, schema)


@given(target=_mrows, source=_mrows)
@SET
def test_merge_upsert_equals_dict_semantics(spark, target, source):
    """merge_upsert == python dict update when both sides are key-unique."""
    from database_transportor_spark.operators.mutations import merge_upsert

    tgt = {k: v for k, v in target}          # last-wins dedup for the model
    src = {k: v for k, v in source}
    t_rows = list(tgt.items())
    s_rows = list(src.items())
    out = merge_upsert(_mdf(spark, t_rows), _mdf(spark, s_rows), "k")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {**tgt, **src}


@given(target=_mrows, changes=_mrows)
@SET
def test_cdc_apply_equals_replay_property(spark, target, changes):
    """cdc_apply == sequential replay for arbitrary feeds (ops derived
    deterministically from the value: negative ⇒ delete)."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from database_transportor_spark.operators.mutations import cdc_apply

    tgt = {k: v for k, v in target}
    feed = [
        (k, v, "D" if v < 0 else "U", seq)
        for seq, (k, v) in enumerate(changes)
    ]
    state = dict(tgt)
    for k, v, op, _ in feed:                 # replay model
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    schema = StructType([
        StructField("k", IntegerType()), StructField("v", IntegerType()),
        StructField("op", StringType()), StructField("seq", IntegerType()),
    ])
    out = cdc_apply(
        _mdf(spark, list(tgt.items())),
        spark.createDataFrame(feed, schema),
        "k",
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == state


@given(feed=st.lists(st.tuples(_mkeys, st.integers(0, 20), _mvals),
                     min_size=0, max_size=12))
@SET
def test_scd2_intervals_tile_timeline(spark, feed):
    """SCD2 invariants: per key, intervals are chronologically chained
    (valid_to == next valid_from), exactly one open interval, and
    adjacent intervals never carry the same state."""
    import datetime

    from pyspark.sql.types import (
        IntegerType,
        StructField,
        StructType,
        TimestampType,
    )

    from database_transportor_spark.operators.temporal import build_scd2

    dedup = {}
    for k, day, v in feed:                   # ts unique per key
        dedup[(k, day)] = v
    rows = [
        (k, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day), v)
        for (k, day), v in dedup.items()
    ]
    schema = StructType([
        StructField("k", IntegerType()),
        StructField("ts", TimestampType()),
        StructField("v", IntegerType()),
    ])
    out = build_scd2(spark.createDataFrame(rows, schema), "k", "ts").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in ivs if r["valid_to"] is None) == 1
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"], "gap/overlap"
            assert a["v"] != b["v"], "uncollapsed no-op change"


@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=500),
                  st.floats(min_value=-2.0, max_value=3.0,
                            allow_nan=False, allow_infinity=False)),
        min_size=0, max_size=30, unique_by=lambda t: t[0],
    ),
    salt=st.integers(min_value=0, max_value=3),
)
@SET
def test_weighted_sample_monotone_in_probability(spark, rows, salt):
    """For fixed ids, raising every row's keep probability can only ADD
    rows to the sample (the uniform draw is a pure function of the id),
    and p>=1 keeps everything, p<=0 nothing."""
    from pyspark.sql import functions as F

    from database_transportor_spark.operators.corpus import weighted_sample

    if not rows:
        return
    df = spark.createDataFrame(rows, "id long, p double")
    low = {r["id"] for r in weighted_sample(
        df, "id", F.col("p"), salt=salt).collect()}
    high = {r["id"] for r in weighted_sample(
        df, "id", F.col("p") + 0.3, salt=salt).collect()}
    assert low <= high
    assert {r["id"] for r in weighted_sample(df, "id", F.lit(1.0), salt=salt)
            .collect()} == {r[0] for r in rows}
    assert weighted_sample(df, "id", F.lit(0.0), salt=salt).count() == 0


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["x", "y"]),
                  st.integers(min_value=-50, max_value=50)),
        min_size=1, max_size=25,
    )
)
@SET
def test_winsorize_bounds_and_interior_identity(spark, rows):
    """Clipped values stay inside the group's [min, max]; clipping only
    moves values toward the group median, never across it."""
    import statistics

    from database_transportor_spark.operators.corpus import winsorize

    df = spark.createDataFrame(rows, "g string, v long")
    out = winsorize(df, "v", ["g"], p_lo=0.1, p_hi=0.9).collect()
    import collections

    by_g = collections.defaultdict(list)
    for g, v in rows:
        by_g[g].append(v)
    for r in out:
        lo, hi = min(by_g[r["g"]]), max(by_g[r["g"]])
        assert lo <= r["v_wins"] <= hi
        med = statistics.median(by_g[r["g"]])
        if r["v_wins"] != r["v"]:
            # a clip moves toward the median and never overshoots it
            assert abs(r["v_wins"] - med) <= abs(r["v"] - med)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", None]),
                  st.sampled_from(["p", "q", None]),
                  st.integers(min_value=0, max_value=9)),
        min_size=1, max_size=20,
    )
)
@SET
def test_cube_totals_consistent(spark, rows):
    """CUBE invariant: summing the finest cells (gid=0) reproduces every
    coarser cell, including the grand total — for any input with NULLs
    in the dims (gid disambiguates data-NULL from aggregated-NULL)."""
    from pyspark.sql import functions as F

    from database_transportor_spark.operators.rollup import cube_agg

    df = spark.createDataFrame(rows, "d1 string, d2 string, m long")
    out = cube_agg(df, ["d1", "d2"], [F.sum("m").alias("s")]).collect()
    fine = {(r["d1"], r["d2"]): r["s"] for r in out if r["gid"] == 0}
    for r in out:
        if r["gid"] == 3:
            assert r["s"] == sum(fine.values())
        elif r["gid"] == 1:  # d2 aggregated
            assert r["s"] == sum(v for (a, _), v in fine.items() if a == r["d1"])
        elif r["gid"] == 2:  # d1 aggregated
            assert r["s"] == sum(v for (_, b), v in fine.items() if b == r["d2"])


# --- round-4 operator invariants -------------------------------------

_texts = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
             min_size=0, max_size=6).map(lambda ws: "|".join(ws)),
    min_size=1, max_size=8,
)


@given(texts=_texts)
@SET
def test_dedup_paragraphs_conservation(spark, texts):
    """Per doc: kept + removed == total paragraphs, and a paragraph
    appearing in exactly one doc is never removed."""
    from pyspark.sql import functions as F

    from database_transportor_spark.operators.text import dedup_paragraphs

    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    out = dedup_paragraphs(df, sep="|", out_col="cleaned").collect()
    docs = {r["doc_id"]: r for r in out}
    # which paragraph occurs in how many distinct docs
    from collections import defaultdict
    indocs = defaultdict(set)
    for i, t in enumerate(texts):
        for p in t.split("|"):
            indocs[p].add(i)
    for i, t in enumerate(texts):
        paras = t.split("|")
        # order of survivors preserved; paragraphs unique to one doc
        # survive (compare joined strings: "" is one empty paragraph,
        # and a doc whose every paragraph is removed also renders "")
        expect = [p for p in paras if len(indocs[p]) <= 1]
        assert docs[i]["cleaned"] == "|".join(expect)
        assert docs[i]["n_paras_removed"] == len(paras) - len(expect)


_docwords = st.lists(
    st.lists(st.sampled_from(["w1", "w2", "w3", "w4", "w5", "w6"]),
             min_size=3, max_size=8).map(" ".join),
    min_size=2, max_size=6,
)


@given(texts=_docwords)
@SET
def test_containment_bounds(spark, texts):
    """intersection <= min(size_a, size_b), sizes positive, and the pair
    list is symmetric-free (id_a < id_b)."""
    from database_transportor_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    for r in ngram_containment_pairs(
        df, "doc_id", "text", n=2, threshold=0.0
    ).collect():
        assert r["id_a"] < r["id_b"]
        assert 0 < r["intersection"] <= min(r["size_a"], r["size_b"])


@given(
    vecs=st.lists(
        st.lists(st.floats(min_value=-1, max_value=1,
                           allow_nan=False, allow_infinity=False,
                           width=32),
                 min_size=3, max_size=3),
        min_size=2, max_size=10, unique_by=tuple,
    )
)
@SET
def test_kmeans_partition(spark, vecs):
    """Every vector lands in exactly one cluster: n_points sums to N;
    inertia is non-negative."""
    from database_transportor_spark.operators.similarity import kmeans_lloyd

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    )
    out = kmeans_lloyd(df, k=min(2, len(vecs)), iters=2).collect()
    assert sum(r["n_points"] for r in out) == len(vecs)
    assert all(r["inertia"] >= 0 for r in out)


# ---------------------------------------------------------------------------
# cusum: matches a plain Python fold, never negative, flag consistent
# ---------------------------------------------------------------------------


@given(
    xs=st.lists(
        st.one_of(st.none(), st.integers(0, 30)), min_size=1, max_size=15
    ),
    target=st.integers(0, 20),
    threshold=st.integers(0, 40),
)
@SET
def test_cusum_matches_python_fold(spark, xs, target, threshold):
    from database_transportor_spark.operators.temporal import cusum

    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)],
        "k string, ts int, x int",
    )
    out = cusum(df, ["k"], "ts", "x", threshold=threshold, target=target)
    got = [
        (r.ts, r.cusum, r.is_shift) for r in out.orderBy("ts").collect()
    ]
    s, want = 0, []
    for i, x in enumerate(xs):
        if x is not None:
            s = max(0, s + x - target)
        want.append((i, s, int(s > threshold)))
    assert got == want


# ---------------------------------------------------------------------------
# cooccurrence_pairs: count bounds, symmetry of construction, support cap
# ---------------------------------------------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 5), st.sampled_from("abcdef")),
        min_size=1,
        max_size=25,
    )
)
@SET
def test_cooccurrence_invariants(spark, rows):
    from database_transportor_spark.operators.affinity import (
        cooccurrence_pairs,
    )

    df = spark.createDataFrame(rows, ["b", "i"])
    out = cooccurrence_pairs(df, "b", "i").collect()
    baskets = {}
    for b, i in set(rows):
        baskets.setdefault(b, set()).add(i)
    n_baskets = len(baskets)
    for r in out:
        assert r.item_a < r.item_b
        # pair count bounded by each item's basket count
        assert r.pair_count <= min(r.count_a, r.count_b)
        assert 0 < r.support_ppm <= 1_000_000
        # exact pair count vs brute force over the basket sets
        brute = sum(
            1 for s in baskets.values() if r.item_a in s and r.item_b in s
        )
        assert r.pair_count == brute
        assert r.support_ppm == r.pair_count * 1_000_000 // n_baskets


# ---------------------------------------------------------------------------
# inverted_index: df exact, postings a sorted prefix of the full list
# ---------------------------------------------------------------------------


@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 20),
            st.lists(st.sampled_from("xyzw"), max_size=5).map(" ".join),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    cap=st.integers(1, 4),
)
@SET
def test_inverted_index_prefix_property(spark, docs, cap):
    from database_transportor_spark.operators.text import inverted_index

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = inverted_index(df, "doc_id", "text", min_df=1, max_postings=cap)
    full = {}
    for did, text in docs:
        for tok in text.split():
            full.setdefault(tok, set()).add(did)
    got = {r.term: (r.df, r.postings) for r in out.collect()}
    assert set(got) == set(full)
    for term, (dfreq, postings) in got.items():
        ids = sorted(full[term])
        assert dfreq == len(ids)
        assert postings == ",".join(str(i) for i in ids[:cap])


@given(left=_rows, right=_rows)
@SET
def test_join_size_report_predicts_real_join(spark, left, right):
    """total_out equals the actual inner-join row count; per-key rows
    multiply exactly.  (NULL keys never match, matching SQL joins.)"""
    from database_transportor_spark.operators.skew import join_size_report

    l = _df(spark, left)
    r = _df(spark, right, cols=("kk", "u"))
    rep = join_size_report(l, r, ["k"], ["kk"], top_k=100).collect()
    real = l.join(r, l.k == r.kk).count()
    if not rep:
        assert real == 0
    else:
        assert rep[0]["total_out"] == real
        assert sum(x["out_rows"] for x in rep) == real  # top_k >= key domain
        assert [x["rank"] for x in sorted(rep, key=lambda x: x["rank"])] == \
            list(range(1, len(rep) + 1))


_url_bits = st.sampled_from([
    "HTTP://", "https://", "HTTPS://WWW.", "http://www.",
])
_hosts = st.sampled_from(["A.example.COM", "x.org", "Sub.Dom.net"])
_ports = st.sampled_from(["", ":80", ":443", ":8080"])
_paths = st.sampled_from(["", "/", "/p", "/p/", "/a/b/"])
_queries = st.sampled_from(
    ["", "?utm_source=1", "?q=2", "?utm_a=1&q=2", "?q=2&gclid=x&r=3"])
_frags = st.sampled_from(["", "#f", "#a/b?c"])


@given(scheme=_url_bits, host=_hosts, port=_ports, path=_paths,
       query=_queries, frag=_frags)
@SET
def test_normalize_urls_idempotent_property(spark, scheme, host, port, path,
                                            query, frag):
    """normalize(normalize(u)) == normalize(u) for every noise combo, and
    the output never retains fragments or tracking params."""
    from database_transportor_spark.operators.corpus import normalize_urls

    url = f"{scheme}{host}{port}{path}{query}{frag}"
    df = spark.createDataFrame([(url,)], ["url"])
    once = normalize_urls(df, "url").collect()[0]["url_norm"]
    again = normalize_urls(
        spark.createDataFrame([(once,)], ["url"]), "url"
    ).collect()[0]["url_norm"]
    assert once == again
    assert "#" not in once and "utm_" not in once and "gclid" not in once
    assert "://www." not in once.lower() or scheme.lower().startswith("http") is False


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=700),
    ch=st.integers(min_value=1, max_value=3),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    spc=st.integers(min_value=1, max_value=900),
    codec=st.sampled_from([b"sowt", b"twos"]),
    co64=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_mp4_audio_round_trip_property(n, ch, rate, spc, codec, co64, seed):
    """encode_mp4_audio ∘ decode_mp4_audio is the identity on any int16
    signal for every (channels, rate, chunking, byte order, offset
    width) combination — the pure-Python property behind the mp4_audio
    oracle (no Spark involved)."""
    import numpy as np

    from database_transportor_spark.operators.multimodal import (
        decode_mp4_audio, encode_mp4_audio,
    )

    rng = np.random.default_rng(seed)
    arr = rng.integers(-32768, 32767, size=(n, ch), dtype=np.int16)
    b = encode_mp4_audio(arr, rate, codec=codec, samples_per_chunk=spc,
                         co64=co64)
    got_rate, got = decode_mp4_audio(b)
    assert got_rate == rate
    assert got.shape == (n, ch)
    assert (got == arr).all()


@settings(max_examples=60, deadline=None)
@given(
    cut=st.integers(min_value=0, max_value=400),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_mp4_audio_truncation_raises_valueerror_only(cut, seed):
    """Truncating a valid MP4 audio file at ANY byte either still
    decodes (cut past the moov tail) or raises ValueError — never an
    IndexError/struct.error escape (same contract class the round-7
    JPEG advice pinned)."""
    import numpy as np

    from database_transportor_spark.operators.multimodal import (
        decode_mp4_audio, encode_mp4_audio,
    )

    rng = np.random.default_rng(seed)
    arr = rng.integers(-1000, 1000, size=(40, 1), dtype=np.int16)
    b = encode_mp4_audio(arr, 8000, samples_per_chunk=7)
    trunc = b[: max(0, len(b) - cut)]
    try:
        rate, got = decode_mp4_audio(trunc)
    except ValueError:
        pass
    else:
        assert rate == 8000 and got.shape == (40, 1)
