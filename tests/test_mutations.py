"""merge_upsert / cdc_apply semantics and plan shape."""

import pytest
from pyspark.sql import functions as F

from database_transportor_spark.operators.mutations import cdc_apply, merge_upsert


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, val double",
    )


def test_merge_upsert_updates_inserts_passthrough(spark):
    src = spark.createDataFrame(
        [(2, "B2", 22.0), (9, "i", 90.0)], "k long, name string, val double"
    )
    out = merge_upsert(_target(spark), src, "k")
    rows = {r["k"]: (r["name"], r["val"]) for r in out.collect()}
    assert rows == {
        1: ("a", 10.0),       # untouched target row passes through
        2: ("B2", 22.0),      # matched ⇒ source replaces
        3: ("c", 30.0),
        9: ("i", 90.0),       # unmatched source ⇒ insert
    }


def test_merge_upsert_seq_resolves_source_dups(spark):
    src = spark.createDataFrame(
        [(2, "old", 0.0, 1), (2, "new", 2.0, 5), (9, "i", 9.0, 1)],
        "k long, name string, val double, lsn long",
    )
    out = merge_upsert(_target(spark), src, "k", seq_col="lsn")
    rows = {r["k"]: r["name"] for r in out.collect()}
    assert rows[2] == "new" and rows[9] == "i" and rows[1] == "a"


def test_merge_upsert_requires_target_columns(spark):
    src = spark.createDataFrame([(1, "x")], "k long, name string")
    with pytest.raises(ValueError, match="lacks target columns"):
        merge_upsert(_target(spark), src, "k")


def test_merge_upsert_single_shuffle(spark):
    """Union + max_by agg must plan exactly one exchange (partial agg
    map-side) — no window sort, no join."""
    src = spark.createDataFrame([(2, "B", 2.0)], "k long, name string, val double")
    plan = merge_upsert(_target(spark), src, "k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "SortMergeJoin" not in plan and "Window" not in plan, plan


def _changes(spark):
    # key 2: update then delete (seq order) ⇒ gone
    # key 3: delete then re-insert ⇒ latest image wins
    # key 9: pure insert
    return spark.createDataFrame(
        [
            (2, "B2", 22.0, "U", 1),
            (2, None, None, "D", 2),
            (3, None, None, "D", 1),
            (3, "C3", 33.0, "I", 2),
            (9, "i", 90.0, "I", 1),
        ],
        "k long, name string, val double, op string, seq long",
    )


def test_cdc_apply_latest_image_wins(spark):
    out = cdc_apply(_target(spark), _changes(spark), "k")
    rows = {r["k"]: (r["name"], r["val"]) for r in out.collect()}
    assert rows == {
        1: ("a", 10.0),
        3: ("C3", 33.0),
        9: ("i", 90.0),
    }


def test_cdc_apply_rejects_unknown_op(spark):
    bad = spark.createDataFrame(
        [(1, "x", 1.0, "Z", 1)], "k long, name string, val double, op string, seq long"
    )
    with pytest.raises(Exception, match="unknown op"):
        cdc_apply(_target(spark), bad, "k").collect()


def test_cdc_apply_requires_columns(spark):
    with pytest.raises(ValueError, match="lack required column"):
        cdc_apply(
            _target(spark),
            _changes(spark).drop("seq"),
            "k",
        )


def test_cdc_apply_equals_replay(spark):
    """Applying the feed must equal naive per-key replay of ops by seq."""
    import itertools

    target = _target(spark)
    changes = _changes(spark)
    state = {r["k"]: (r["name"], r["val"]) for r in target.collect()}
    feed = sorted(changes.collect(), key=lambda r: (r["k"], r["seq"]))
    for _, ops in itertools.groupby(feed, key=lambda r: r["k"]):
        for r in ops:
            if r["op"] == "D":
                state.pop(r["k"], None)
            else:
                state[r["k"]] = (r["name"], r["val"])
    out = {r["k"]: (r["name"], r["val"]) for r in cdc_apply(target, changes, "k").collect()}
    assert out == state


def test_diff_tables_classifies(spark):
    from database_transportor_spark.operators.mutations import diff_tables

    left = _target(spark)                                   # keys 1,2,3
    right = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B!", 20.0), (9, "i", 90.0)],
        "k long, name string, val double",
    )
    out = {r["k"]: (r["change_type"], sorted(r["changed_cols"]))
           for r in diff_tables(left, right, "k").collect()}
    assert out == {
        2: ("changed", ["name"]),
        3: ("removed", []),
        9: ("added", []),
    }  # key 1 identical -> omitted


def test_diff_tables_null_safe(spark):
    from database_transportor_spark.operators.mutations import diff_tables

    left = spark.createDataFrame([(1, None)], "k long, v string")
    right_same = spark.createDataFrame([(1, None)], "k long, v string")
    right_diff = spark.createDataFrame([(1, "x")], "k long, v string")
    assert diff_tables(left, right_same, "k").count() == 0
    got = diff_tables(left, right_diff, "k").collect()[0]
    assert got["change_type"] == "changed" and got["changed_cols"] == ["v"]


def test_diff_tables_roundtrip_with_merge(spark):
    """diff(target, merge_upsert(target, src)) == exactly src's effect."""
    from database_transportor_spark.operators.mutations import (
        diff_tables,
        merge_upsert,
    )

    tgt = _target(spark)
    src = spark.createDataFrame(
        [(2, "B2", 22.0), (9, "i", 90.0)], "k long, name string, val double"
    )
    merged = merge_upsert(tgt, src, "k")
    out = {r["k"]: r["change_type"]
           for r in diff_tables(tgt, merged, "k").collect()}
    assert out == {2: "changed", 9: "added"}


def test_cdc_apply_broadcasts_feed_no_target_shuffle(spark):
    """The snapshot side must reach the result through a broadcast
    LEFT-ANTI join — never a sort-merge/full-outer shuffle of the target."""
    from pyspark.sql import functions as F

    target = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    changes = spark.createDataFrame(
        [(1, 111, "U", 1), (2, None, "D", 2)], ["k", "v", "op", "seq"]
    )
    out = cdc_apply(target, changes, "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    res = {r["k"]: r["v"] for r in out.collect()}
    assert res[1] == 111 and 2 not in res and res[3] == 6


def test_cdc_apply_unknown_op_raises_even_when_filtered(spark):
    """The op check lives in the upsert filter's CaseWhen — it must fire
    for an unknown op even though that row would be dropped by the
    filter either way (no reliance on And short-circuit)."""
    target = spark.createDataFrame([(1, "a")], ["k", "v"])
    changes = spark.createDataFrame([(2, "b", "X", 1)], ["k", "v", "op", "seq"])
    with pytest.raises(Exception, match="unknown op"):
        cdc_apply(target, changes, "k").collect()


def test_align_schemas_adds_typed_nulls_and_merges(spark):
    from database_transportor_spark.operators.mutations import (
        align_schemas,
        merge_upsert,
    )

    live = spark.createDataFrame([(1, "a")], "k long, v string")
    feed = spark.createDataFrame([(1, "a2", 9.5), (2, "b", 1.0)],
                                 "k long, v string, score double")
    t, s = align_schemas(live, feed)
    assert t.columns == s.columns == ["k", "v", "score"]
    assert dict(t.dtypes)["score"] == "double"  # typed NULL, not string
    merged = {r["k"]: r for r in merge_upsert(t, s, "k").collect()}
    assert merged[1]["v"] == "a2" and merged[1]["score"] == 9.5
    assert merged[2]["score"] == 1.0


def test_align_schemas_strict_type_clash(spark):
    import pytest as _pytest

    from database_transportor_spark.operators.mutations import align_schemas

    a = spark.createDataFrame([(1,)], "k long")
    b = spark.createDataFrame([("1",)], "k string")
    with _pytest.raises(ValueError):
        align_schemas(a, b)
    t, s = align_schemas(a, b, strict_types=False)
    assert t.columns == s.columns == ["k"]


# ---------------------------------------------------------------------------
# Incremental join-view maintenance
# ---------------------------------------------------------------------------

class TestJoinView:
    def _bases(self, spark):
        left = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, lv string"
        )
        right = spark.createDataFrame(
            [(1, 10), (2, 20), (4, 40)], "k long, rv long"
        )
        return left, right

    def test_delta_matches_full_recompute(self, spark):
        from database_transportor_spark.operators.rollup import (
            join_view_delta,
        )

        left, right = self._bases(spark)
        dl = spark.createDataFrame([(2, "B"), (4, "d")], "k long, lv string")
        dr = spark.createDataFrame([(3, 30), (2, 21)], "k long, rv long")
        delta = join_view_delta(left, right, dl, dr, ["k"])
        full_new = (
            left.unionByName(dl).join(right.unionByName(dr), ["k"])
        )
        old_view = left.join(right, ["k"])
        got = sorted(
            tuple(r) for r in old_view.unionByName(delta).collect()
        )
        want = sorted(tuple(r) for r in full_new.collect())
        assert got == want
        # bag semantics: the duplicate k=2 rows must all survive
        assert len(got) == len(want)

    def test_left_only_and_right_only_deltas(self, spark):
        from database_transportor_spark.operators.rollup import (
            join_view_delta,
        )

        left, right = self._bases(spark)
        dl = spark.createDataFrame([(4, "d")], "k long, lv string")
        got = {tuple(r) for r in join_view_delta(left, right, dl, None, ["k"]).collect()}
        assert got == {(4, "d", 40)}
        dr = spark.createDataFrame([(3, 30)], "k long, rv long")
        got = {tuple(r) for r in join_view_delta(left, right, None, dr, ["k"]).collect()}
        assert got == {(3, "c", 30)}

    def test_requires_a_delta(self, spark):
        import pytest

        from database_transportor_spark.operators.rollup import (
            join_view_delta,
        )

        left, right = self._bases(spark)
        with pytest.raises(ValueError, match="at least one delta"):
            join_view_delta(left, right, None, None, ["k"])

    def test_refresh_round_trip_equals_full_join(self, spark):
        from database_transportor_spark import MemoryCatalog
        from database_transportor_spark.operators.rollup import (
            refresh_join_view,
        )

        left, right = self._bases(spark)
        dl = spark.createDataFrame([(4, "d")], "k long, lv string")
        dr = spark.createDataFrame([(3, 30), (4, 41)], "k long, rv long")
        cat = MemoryCatalog()
        # first build: both sides arrive as their own first batch
        refresh_join_view(cat, "v", "l", "r", ["k"],
                          left_batch=left, right_batch=right)
        view = refresh_join_view(cat, "v", "l", "r", ["k"],
                                 left_batch=dl, right_batch=dr)
        want = sorted(
            tuple(r)
            for r in left.unionByName(dl)
            .join(right.unionByName(dr), ["k"])
            .collect()
        )
        assert sorted(tuple(r) for r in view.collect()) == want

    def test_first_build_with_one_side_only_is_empty_view(self, spark):
        from database_transportor_spark import MemoryCatalog
        from database_transportor_spark.operators.rollup import (
            refresh_join_view,
        )

        left, right = self._bases(spark)
        cat = MemoryCatalog()
        # no right side yet -> no join rows; the refresh returns an
        # EMPTY frame (left schema: the right side has never been seen)
        # instead of failing on the absent view table
        view = refresh_join_view(cat, "v", "l", "r", ["k"], left_batch=left)
        assert view.count() == 0
        assert view.columns == left.columns
        assert cat.exists("l") and not cat.exists("v")
        # the right side arriving later completes the view normally
        view = refresh_join_view(cat, "v", "l", "r", ["k"],
                                 right_batch=right)
        want = sorted(tuple(r) for r in left.join(right, ["k"]).collect())
        assert sorted(tuple(r) for r in view.collect()) == want
