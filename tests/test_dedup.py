"""dedup_clusters: the driver union-find fast path and the distributed
min-label-propagation path must produce identical clusterings."""

from database_transportor_spark.operators.dedup import dedup_clusters


def _result(df):
    return sorted(tuple(r) for r in df.collect())


def test_union_find_matches_distributed(spark):
    # Two chain components (1-2-3-4, 10-11) plus isolated vertices 20, 21.
    vertices = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20, 21]], ["doc_id"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    local = dedup_clusters(vertices, pairs, "doc_id")  # fast path
    dist = dedup_clusters(vertices, pairs, "doc_id", max_local_edges=0)
    expected = [
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 21),
    ]
    assert _result(local) == expected
    assert _result(dist) == expected


def test_union_find_long_chain_min_label(spark):
    # A long chain where the min id sits at one end — exercises path
    # compression (local) and pointer halving (distributed).
    n = 30
    vertices = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    local = dedup_clusters(vertices, pairs, "doc_id")
    dist = dedup_clusters(vertices, pairs, "doc_id", max_local_edges=0)
    expected = [(i, 0) for i in range(n)]
    assert _result(local) == expected
    assert _result(dist) == expected


def test_union_find_string_ids(spark):
    vertices = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("z",)], ["doc_id"]
    )
    pairs = spark.createDataFrame([("b", "a"), ("b", "c")], ["id_a", "id_b"])
    out = _result(dedup_clusters(vertices, pairs, "doc_id"))
    assert out == [("a", "a"), ("b", "a"), ("c", "a"), ("z", "z")]
