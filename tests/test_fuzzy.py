"""Tests for trigram fuzzy joins (operators/fuzzy.py)."""

import pytest
from pyspark.sql import functions as F

from database_transportor_spark.operators.fuzzy import (
    char_ngram_hashes,
    fuzzy_join,
    fuzzy_pairs,
)


def _grams(spark, s, n=3):
    df = spark.createDataFrame([(s,)], "s string")
    return df.select(char_ngram_hashes("s", n).alias("g")).collect()[0]["g"]


def test_char_ngram_hashes_count_and_normalization(spark):
    # "abcd" -> "abc","bcd"; case/whitespace normalized away
    assert len(_grams(spark, "abcd")) == 2
    assert _grams(spark, "  ABCD ") == _grams(spark, "abcd")
    assert _grams(spark, "ab") == []  # shorter than n


def _py_jaccard(a, b, n=3):
    ga = {a[i:i + n] for i in range(len(a) - n + 1)}
    gb = {b[i:i + n] for i in range(len(b) - n + 1)}
    return len(ga & gb), len(ga | gb)


def test_fuzzy_join_matches_python_reference(spark):
    left = spark.createDataFrame(
        [(1, "Acme Corp."), (2, "Widget Works"), (3, "zz")],
        "lid long, name string",
    )
    right = spark.createDataFrame(
        [(10, "ACME corp"), (20, "widget workshop"), (30, "unrelated inc")],
        "rid long, name string",
    )
    out = fuzzy_join(left, right, "lid", "name", "rid", "name", threshold=0.3)
    got = {(r["id_a"], r["id_b"]): (r["intersection"], r["union_size"])
           for r in out.collect()}
    exp = {}
    for lid, ln in [(1, "acme corp."), (2, "widget works")]:
        for rid, rn in [(10, "acme corp"), (20, "widget workshop"),
                        (30, "unrelated inc")]:
            i, u = _py_jaccard(ln, rn)
            if u and i >= 0.3 * u:
                exp[(lid, rid)] = (i, u)
    assert got == exp
    assert (1, 10) in got and (2, 20) in got  # the intended matches
    assert all(a != 3 for a, _ in got)  # sub-n string never matches


def test_fuzzy_pairs_self_dedup(spark):
    df = spark.createDataFrame(
        [(1, "blue bolt"), (2, "blue bolts"), (3, "red gear")],
        "id long, name string",
    )
    out = fuzzy_pairs(df, "id", "name", threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(1, 2)}


def test_fuzzy_pairs_max_df_drops_universal_gram(spark):
    # every name shares "aaa…" filler; cap kills those grams so only the
    # genuinely-similar tail survives
    rows = [(i, "aaaaaa x%d" % i) for i in range(20)] + [
        (100, "aaaaaa same tail"), (101, "aaaaaa same tail!")]
    df = spark.createDataFrame(rows, "id long, name string")
    capped = fuzzy_pairs(df, "id", "name", threshold=0.5, max_df=10)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got
    assert all(a >= 100 for a, _ in got)


# ---------------------------------------------------------------------------
# Edit-distance join (blocked + thresholded-levenshtein verify)
# ---------------------------------------------------------------------------

class TestEditDistanceJoin:
    def _py_lev(self, a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    def test_matches_brute_force(self, spark):
        from database_transportor_spark.operators.fuzzy import (
            edit_distance_join,
        )

        names = [
            "aquamarine steel", "aquamarine steal", "aquamarine stele",
            "burnished copper", "burnished coppers", "chartreuse zinc",
            "completely different thing",
        ]
        rows = list(enumerate(names))
        df = spark.createDataFrame(rows, "id long, name string")
        got = {
            (r["id_a"], r["id_b"]): r["distance"]
            for r in edit_distance_join(
                df, df, "id", "name", "id", "name", max_distance=2
            ).collect()
            if r["id_a"] < r["id_b"]
        }
        want = {}
        for i, a in rows:
            for j, b in rows:
                if i < j and self._py_lev(a, b) <= 2:
                    want[(i, j)] = self._py_lev(a, b)
        assert got == want
        assert got[(0, 1)] == 1 and got[(3, 4)] == 1

    def test_normalization_matches_index(self, spark):
        from database_transportor_spark.operators.fuzzy import (
            edit_distance_join,
        )

        df = spark.createDataFrame(
            [(1, "  Acme Corp "), (2, "acme corp")], "id long, name string"
        )
        got = edit_distance_join(df, df, "id", "name", "id", "name",
                                 max_distance=0).collect()
        # lower+trim collapse them to distance 0 (all 4 ordered pairs)
        assert {(r["id_a"], r["id_b"], r["distance"]) for r in got} == {
            (1, 1, 0), (2, 2, 0), (1, 2, 0), (2, 1, 0)
        }

    def test_guard(self, spark):
        import pytest

        from database_transportor_spark.operators.fuzzy import (
            edit_distance_join,
        )

        df = spark.createDataFrame([(1, "x")], "id long, name string")
        with pytest.raises(ValueError, match="max_distance"):
            edit_distance_join(df, df, "id", "name", "id", "name",
                               max_distance=-1)


class TestResolveEntities:
    def test_transitive_chain_collapses(self, spark):
        from database_transportor_spark.operators.fuzzy import (
            resolve_entities,
        )

        rows = [
            (1, "acme corporation"),
            (2, "acme corporation."),     # dist 1 from 1
            (3, "acme corporation.."),    # dist 1 from 2, dist 2 from 1
            (4, "zenith industries"),
            (5, "zenith industried"),     # dist 1 from 4
            (6, "wholly unrelated name"),
        ]
        df = spark.createDataFrame(rows, "id long, name string")
        out = resolve_entities(df, "id", "name", max_distance=1)
        got = {r["id"]: r["entity_id"] for r in out.collect()}
        # chain 1-2-3 collapses transitively even though (1,3) is dist 2
        assert set(got) == {1, 4, 6}
        assert got[1] == 1 and got[4] == 4 and got[6] == 6

    def test_keep_best_by_order_col(self, spark):
        from database_transportor_spark.operators.fuzzy import (
            resolve_entities,
        )

        df = spark.createDataFrame(
            [(1, "acme corp", 0.2), (2, "acme corp.", 0.9)],
            "id long, name string, quality double",
        )
        out = resolve_entities(df, "id", "name", max_distance=1,
                               order_col="quality", keep="max").collect()
        assert len(out) == 1 and out[0]["id"] == 2
        assert out[0]["entity_id"] == 1  # entity key = min reachable id
