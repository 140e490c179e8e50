"""Tests for graph ops (degrees/symmetrize/pagerank), cube_agg,
boilerplate_ratio, and weighted_sample."""

import math

import pytest
from pyspark.sql import functions as F

from conftest import rows

from database_transportor_spark.operators.corpus import weighted_sample
from database_transportor_spark.operators.graph import (
    degrees,
    pagerank,
    symmetrize,
)
from database_transportor_spark.operators.rollup import cube_agg
from database_transportor_spark.operators.text import boilerplate_ratio


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


# ---------------------------------------------------------------- graph


def test_degrees_counts_both_sides(spark):
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c")])
    got = {r["node"]: (r["out_degree"], r["in_degree"]) for r in degrees(e).collect()}
    assert got == {"a": (2, 0), "b": (1, 1), "c": (0, 2)}


def test_symmetrize_doubles_edges(spark):
    e = _edges(spark, [("a", "b")])
    assert sorted(rows(symmetrize(e))) == [("a", "b"), ("b", "a")]


def test_pagerank_sums_to_one_and_ranks_hub_highest(spark):
    # star graph: everything links to hub
    e = _edges(spark, [("a", "hub"), ("b", "hub"), ("c", "hub")])
    pr = {r["node"]: r["rank"] for r in pagerank(e, iterations=5).collect()}
    assert math.isclose(sum(pr.values()), 1.0, rel_tol=1e-9)
    assert pr["hub"] == max(pr.values())
    assert pr["a"] == pr["b"] == pr["c"]


def test_pagerank_two_cycle_uniform(spark):
    # a <-> b is symmetric: ranks must stay exactly uniform
    e = _edges(spark, [("a", "b"), ("b", "a")])
    pr = {r["node"]: r["rank"] for r in pagerank(
        e, iterations=4, handle_dangling=False
    ).collect()}
    assert math.isclose(pr["a"], 0.5, rel_tol=1e-12)
    assert math.isclose(pr["b"], 0.5, rel_tol=1e-12)


def test_pagerank_dangling_mass_redistributed(spark):
    # b is dangling; with handling, total mass stays 1
    e = _edges(spark, [("a", "b")])
    pr = {r["node"]: r["rank"] for r in pagerank(e, iterations=3).collect()}
    assert math.isclose(sum(pr.values()), 1.0, rel_tol=1e-9)
    assert pr["b"] > pr["a"]


def test_pagerank_matches_numpy_power_iteration(spark):
    # directed triangle plus a chord, vs a dense reference implementation
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    nodes = ["a", "b", "c"]
    d = 0.85
    n = len(nodes)
    ranks = {v: 1.0 / n for v in nodes}
    out_deg = {"a": 2, "b": 1, "c": 1}
    for _ in range(4):
        contrib = {v: 0.0 for v in nodes}
        for s, t in pairs:
            contrib[t] += ranks[s] / out_deg[s]
        ranks = {v: (1 - d) / n + d * contrib[v] for v in nodes}
    e = _edges(spark, pairs)
    pr = {r["node"]: r["rank"] for r in pagerank(
        e, iterations=4, handle_dangling=False
    ).collect()}
    for v in nodes:
        assert math.isclose(pr[v], ranks[v], rel_tol=1e-9), v


def test_pagerank_checkpoint_every_iteration_same_answer(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]
    a = {r["node"]: r["rank"] for r in pagerank(
        _edges(spark, pairs), iterations=3, checkpoint_every=1
    ).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(
        _edges(spark, pairs), iterations=3, checkpoint_every=10
    ).collect()}
    assert a == b


# ------------------------------------------------------------- cube_agg


def _sales(spark):
    return spark.createDataFrame(
        [("us", "a", 1.0), ("us", "b", 2.0), ("eu", "a", 4.0)],
        "geo string, sku string, amt double",
    )


def test_cube_agg_cube_has_all_subsets(spark):
    out = cube_agg(
        _sales(spark), ["geo", "sku"], [F.sum("amt").alias("amt")]
    )
    got = {(r["geo"], r["sku"], r["gid"]): r["amt"] for r in out.collect()}
    assert got[("us", "a", 0)] == 1.0
    assert got[("us", None, 1)] == 3.0      # sku aggregated -> LSB set
    assert got[(None, "a", 2)] == 5.0       # geo aggregated -> MSB set
    assert got[(None, None, 3)] == 7.0
    assert len(got) == 3 + 2 + 2 + 1


def test_cube_agg_rollup_is_prefix_hierarchy(spark):
    out = cube_agg(
        _sales(spark), ["geo", "sku"], [F.count("*").alias("n")], mode="rollup"
    )
    gids = sorted({r["gid"] for r in out.collect()})
    assert gids == [0, 1, 3]  # no geo-aggregated-only set in rollup


def test_cube_agg_explicit_sets(spark):
    out = cube_agg(
        _sales(spark),
        ["geo", "sku"],
        [F.count("*").alias("n")],
        mode="sets",
        sets=[["geo"], []],
    )
    got = {(r["geo"], r["sku"], r["gid"]): r["n"] for r in out.collect()}
    assert got[("us", None, 1)] == 2
    assert got[(None, None, 3)] == 3
    assert len(got) == 3


def test_cube_agg_validation(spark):
    with pytest.raises(ValueError):
        cube_agg(_sales(spark), ["geo"], [F.count("*")], mode="sets")
    with pytest.raises(ValueError):
        cube_agg(_sales(spark), ["geo"], [F.count("*")], mode="nope")


# ----------------------------------------------------- boilerplate_ratio


def test_boilerplate_ratio_flags_shared_shingles(spark):
    docs = spark.createDataFrame(
        [
            (1, "all rights reserved worldwide today"),
            (2, "all rights reserved worldwide tomorrow"),
            (3, "completely unique text nothing shared"),
            (4, "ab"),  # shorter than n tokens -> absent
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in boilerplate_ratio(
        docs, "doc_id", "text", n=3, min_df=2
    ).collect()}
    # docs 1/2 share shingles "all rights reserved", "rights reserved worldwide"
    assert out[1]["n_shingles"] == 3 and out[1]["n_common"] == 2
    assert out[1]["boilerplate_ratio"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[3]["n_common"] == 0 and out[3]["boilerplate_ratio"] == 0.0
    assert 4 not in out


# ------------------------------------------------------- weighted_sample


def test_weighted_sample_extremes_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, float(i % 2)) for i in range(200)], "id long, w double"
    )
    all_kept = weighted_sample(df, "id", F.col("w"))
    got = sorted(r["id"] for r in all_kept.collect())
    assert got == [i for i in range(200) if i % 2 == 1]  # p=1 keeps, p=0 drops
    # determinism across repartitionings
    a = sorted(r["id"] for r in weighted_sample(df, "id", F.lit(0.3)).collect())
    b = sorted(
        r["id"]
        for r in weighted_sample(df.repartition(7), "id", F.lit(0.3)).collect()
    )
    assert a == b
    assert 0 < len(a) < 200


def test_weighted_sample_clamps_out_of_range(spark):
    df = spark.createDataFrame([(1, 7.0), (2, -3.0)], "id long, p double")
    got = sorted(r["id"] for r in weighted_sample(df, "id", F.col("p")).collect())
    assert got == [1]


def test_weighted_sample_rate_roughly_matches_p(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    kept = weighted_sample(df, "id", F.lit(0.5)).count()
    assert 0.4 < kept / 2000 < 0.6


def test_triangle_count_k4_with_noise(spark):
    from database_transportor_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),   # K4: 4 triangles
         (4, 5),                                            # pendant
         (2, 1), (3, 3), (1, 2)],                           # reverse/loop/dup
        "src long, dst long",
    )
    for orient in ("degree", "id"):
        got = triangle_count(edges, orient=orient).collect()[0]["n_triangles"]
        assert got == 4, orient


def test_triangle_count_hub_graph_orientations_agree(spark):
    """A star hub plus a ring: degree orientation and id orientation must
    count identically (the orientation only changes WHERE each triangle
    is counted, never whether)."""
    from database_transportor_spark.operators.graph import triangle_count

    ring = [(i, (i + 1) % 20) for i in range(20)]
    star = [(99, i) for i in range(20)]
    edges = spark.createDataFrame(ring + star, "src long, dst long")
    # each ring edge forms one triangle with the hub: 20 triangles
    a = triangle_count(edges, orient="degree").collect()[0]["n_triangles"]
    b = triangle_count(edges, orient="id").collect()[0]["n_triangles"]
    assert a == b == 20

    with pytest.raises(ValueError):
        triangle_count(edges, orient="random")


# ---------------------------------------------------------------------------
# BFS shortest paths + label propagation
# ---------------------------------------------------------------------------

class TestShortestPaths:
    def _chain(self, spark):
        # 1 -> 2 -> 3 -> 4, plus a shortcut 1 -> 3 and an island 9 -> 10
        return spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (1, 3), (9, 10)], "src long, dst long"
        )

    def test_directed_distances(self, spark):
        from database_transportor_spark.operators.graph import shortest_paths

        got = {
            (r["node"], r["landmark"]): r["dist"]
            for r in shortest_paths(self._chain(spark), [4]).collect()
        }
        # distance TO landmark 4 following edge direction
        assert got == {(4, 4): 0, (3, 4): 1, (2, 4): 2, (1, 4): 2}

    def test_multiple_landmarks_und_undirected(self, spark):
        from database_transportor_spark.operators.graph import shortest_paths

        got = {
            (r["node"], r["landmark"]): r["dist"]
            for r in shortest_paths(
                self._chain(spark), [1, 10], directed=False
            ).collect()
        }
        assert got[(4, 1)] == 2  # 4-3-1 via the shortcut
        assert got[(9, 10)] == 1
        assert (1, 10) not in got  # disconnected components stay absent

    def test_max_iterations_caps_radius(self, spark):
        from database_transportor_spark.operators.graph import shortest_paths

        got = {
            r["node"]
            for r in shortest_paths(
                self._chain(spark), [4], max_iterations=1
            ).collect()
        }
        assert got == {4, 3}

    def test_guards(self, spark):
        import pytest

        from database_transportor_spark.operators.graph import shortest_paths

        with pytest.raises(ValueError, match="landmark"):
            shortest_paths(self._chain(spark), [])


class TestLabelPropagation:
    def test_two_cliques_with_bridge(self, spark):
        from database_transportor_spark.operators.graph import (
            label_propagation,
        )

        clique1 = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
        clique2 = [(a, b) for a in (7, 8, 9) for b in (7, 8, 9) if a < b]
        edges = spark.createDataFrame(
            clique1 + clique2 + [(3, 7)], "src long, dst long"
        )
        got = {r["node"]: r["label"] for r in
               label_propagation(edges, iterations=4).collect()}
        # each clique collapses to one label; the two cliques differ
        assert len({got[1], got[2], got[3]}) == 1
        assert len({got[7], got[8], got[9]}) == 1
        assert got[1] != got[9]

    def test_deterministic_tiebreak(self, spark):
        from database_transportor_spark.operators.graph import (
            label_propagation,
        )

        # a single edge: both nodes see one neighbor label; min-label
        # tie-break is vacuous here but the result must be stable
        edges = spark.createDataFrame([(5, 6)], "src long, dst long")
        a = {(r["node"], r["label"]) for r in
             label_propagation(edges, iterations=3).collect()}
        b = {(r["node"], r["label"]) for r in
             label_propagation(edges, iterations=3).collect()}
        assert a == b
        # after odd/even swaps each node carries the other's start label
        # or its own — only these two labels exist
        assert {l for _, l in a} <= {5, 6}


class TestWeightedPaths:
    def test_cheapest_beats_fewest_hops(self, spark):
        from database_transportor_spark.operators.graph import weighted_paths

        # 1->3 direct costs 10; 1->2->3 costs 3
        edges = spark.createDataFrame(
            [(1, 3, 10.0), (1, 2, 1.0), (2, 3, 2.0)],
            "src long, dst long, weight double",
        )
        got = {r["node"]: r["dist"] for r in
               weighted_paths(edges, [3], hops=3).collect()}
        assert got == {3: 0.0, 2: 2.0, 1: 3.0}

    def test_hop_bound_is_the_contract(self, spark):
        from database_transportor_spark.operators.graph import weighted_paths

        edges = spark.createDataFrame(
            [(1, 3, 10.0), (1, 2, 1.0), (2, 3, 2.0)],
            "src long, dst long, weight double",
        )
        got = {r["node"]: r["dist"] for r in
               weighted_paths(edges, [3], hops=1).collect()}
        assert got == {3: 0.0, 2: 2.0, 1: 10.0}  # 2-hop shortcut not yet relaxed

    def test_parallel_edges_and_undirected(self, spark):
        from database_transportor_spark.operators.graph import weighted_paths

        edges = spark.createDataFrame(
            [(1, 2, 5.0), (1, 2, 2.0)], "src long, dst long, weight double"
        )
        got = {r["node"]: r["dist"] for r in
               weighted_paths(edges, [1], directed=False, hops=2).collect()}
        assert got == {1: 0.0, 2: 2.0}

    def test_guards(self, spark):
        import pytest

        from database_transportor_spark.operators.graph import weighted_paths

        edges = spark.createDataFrame(
            [(1, 2, 1.0)], "src long, dst long, weight double"
        )
        with pytest.raises(ValueError, match="landmark"):
            weighted_paths(edges, [])
        with pytest.raises(ValueError, match="hops"):
            weighted_paths(edges, [1], hops=0)


def test_connected_components_front_door(spark):
    from database_transportor_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "src long, dst long"
    )
    got = {r["node"]: r["cluster_id"] for r in
           connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
