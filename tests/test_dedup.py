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


def test_minhash_lsh_precision_and_recall(spark):
    """LSH guarantees: every returned pair really has jaccard >= threshold
    (verification step), and recall vs the exact pair set stays high."""
    from database_transportor_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    lsh = minhash_lsh_pairs(
        docs, "doc_id", "text", n_hashes=16, bands=4, shingle_n=3, threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in lsh}
    # precision is exact by construction (verified jaccard)
    for r in lsh:
        assert r["jaccard"] >= 0.5
    assert got <= exact
    if exact:
        assert len(got) / len(exact) >= 0.7, (len(got), len(exact))


def test_resize_image_plumbing(spark):
    from database_transportor_spark.operators.multimodal import (
        attach_binary,
        resize_image,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    media = attach_binary(docs)
    out = resize_image(media, "doc_id", "content", target_width=8, target_height=4)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["content"]) <= 32
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 4
    # deterministic across runs
    again = {r["doc_id"]: bytes(r["content"]) for r in
             resize_image(media, "doc_id", "content", 8, 4).collect()}
    for r in rows:
        assert bytes(r["content"]) == again[r["doc_id"]]


def test_lsh_index_build_query_roundtrip(spark, tmp_path):
    """Index a corpus, persist it, probe a batch against the RELOADED
    index: near-dups across batch/corpus surface; exact verification
    keeps precision at 1.0 (no unsound pairs)."""
    from database_transportor_spark.operators.dedup import (
        build_lsh_index,
        query_lsh_index,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest tonight"
    )
    # doc 3 appends one token: J = 15/16 ~= 0.94, where a 16/4-banded LSH
    # collides with p ~= 0.998 (a mid-document edit at J ~= 0.67 would be
    # a coin flip at these parameters — the documented recall tradeoff)
    corpus = spark.createDataFrame(
        [(1, base), (2, "totally different text about spark shuffles and "
                        "partitions at terabyte scale for engines"),
         (3, base + " yes")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(100, base), (200, "unrelated content entirely about cooking pasta "
                            "with garlic and fresh tomato sauce")],
        ["doc_id", "text"],
    )
    index = build_lsh_index(corpus, "doc_id", "text", n_hashes=16, bands=4)
    index.write.parquet(f"{tmp_path}/lsh_index.parquet")
    reloaded = spark.read.parquet(f"{tmp_path}/lsh_index.parquet")
    pairs = query_lsh_index(
        reloaded, batch, "doc_id", "text", n_hashes=16, bands=4, threshold=0.5
    ).collect()
    got = {(r["batch_id"], r["corpus_id"]) for r in pairs}
    assert (100, 1) in got, "identical doc must be found"
    assert (100, 3) in got, "near-dup (one word changed) must be found"
    assert all(b == 100 for b, _ in got), "unrelated batch doc matched"
    assert all(r["jaccard"] > 0.5 for r in pairs)
    # incremental append: batch joins the index for the next round
    new_rows = build_lsh_index(batch, "doc_id", "text", n_hashes=16, bands=4)
    new_rows.write.mode("append").parquet(f"{tmp_path}/lsh_index.parquet")
    grown = spark.read.parquet(f"{tmp_path}/lsh_index.parquet")
    assert grown.count() == 5


def test_lsh_index_param_mismatch_raises(spark):
    from database_transportor_spark.operators.dedup import build_lsh_index

    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        build_lsh_index(df, "doc_id", "text", n_hashes=16, bands=5)


def test_dedup_keep_best(spark):
    from database_transportor_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, "a", 10), (2, "a2", 99), (3, "b", 50), (4, "c", 7)],
        ["doc_id", "text", "quality"],
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], ["doc_id", "cluster_id"]
    )
    kept = dedup_keep_best(
        docs, clusters, "doc_id", order_col="quality", keep="max"
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    # cluster {1,2}: doc 2 wins on quality; 3 is its own cluster; 4 is a
    # singleton absent from the map — survives
    assert ids == [2, 3, 4]
    assert kept.columns == docs.columns
    # keep="min" flips the winner
    worst = dedup_keep_best(
        docs, clusters, "doc_id", order_col="quality", keep="min"
    )
    assert sorted(r["doc_id"] for r in worst.collect()) == [1, 3, 4]


def test_containment_catches_subdocument_dup(spark):
    from database_transportor_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"w{i} x{i} y{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally different words here now")],
        ["doc_id", "text"],
    )
    cont = ngram_containment_pairs(df, "doc_id", "text", n=3, threshold=0.9)
    rows = cont.collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    r = rows[0]
    # every shingle of the small doc is inside the big one
    assert r["intersection"] == r["size_a"] and r["size_b"] > r["size_a"]
    # symmetric Jaccard misses the same pair at the same bar
    jac = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.9)
    assert jac.count() == 0


def test_containment_max_df_caps_postings(spark):
    from database_transportor_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    # a stop-phrase shared by every doc is dropped by max_df, so docs
    # sharing ONLY boilerplate never pair
    boiler = "all rights reserved to the site"
    df = spark.createDataFrame(
        [(i, f"unique{i} body{i} words{i} " + boiler) for i in range(6)],
        ["doc_id", "text"],
    )
    out = ngram_containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.3, max_df=3
    )
    assert out.count() == 0


def test_drop_contained_docs_keeps_longest(spark):
    from database_transportor_spark.operators.dedup import drop_contained_docs

    small = "alpha beta gamma delta epsilon zeta"
    mid = small + " eta theta iota kappa lambda mu"
    big = mid + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, small), (2, mid), (3, big), (4, "totally unrelated words here")],
        ["doc_id", "text"],
    )
    kept = sorted(r["doc_id"] for r in
                  drop_contained_docs(df, "doc_id", "text", n=3,
                                      threshold=0.9).collect())
    # chain small ⊂ mid ⊂ big: only the longest copy and the unrelated
    # doc survive, in one pass
    assert kept == [3, 4]


def test_drop_contained_docs_tie_lower_id_survives(spark):
    from database_transportor_spark.operators.dedup import drop_contained_docs

    t = "one two three four five six seven"
    df = spark.createDataFrame([(5, t), (9, t)], ["doc_id", "text"])
    kept = [r["doc_id"] for r in
            drop_contained_docs(df, "doc_id", "text", n=3,
                                threshold=0.9).collect()]
    assert kept == [5]


def test_drop_contained_docs_below_threshold_untouched(spark):
    from database_transportor_spark.operators.dedup import drop_contained_docs

    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d x y z q r s t u v w")],
        ["doc_id", "text"],
    )
    # doc 1 shares some shingles but well under 90% containment
    assert drop_contained_docs(df, "doc_id", "text", n=3,
                               threshold=0.9).count() == 2


# --- repeated_passages (span-level exact-dup detection) ---------------

def test_repeated_passages_cross_doc(spark):
    from database_transportor_spark.operators.dedup import repeated_passages

    # "alpha" md5-anchors (digest starts with '2'); the 8-token passage
    # starting at it is shared verbatim by docs 1 and 2 at DIFFERENT
    # offsets — content-defined anchoring must still pair them up.
    passage = "alpha one two three four five six seven"
    docs = spark.createDataFrame(
        [
            (1, f"{passage} tail words here"),
            (2, f"lead-in words go first {passage}"),
            (3, "nothing duplicated in this document at all right"),
        ],
        ["doc_id", "text"],
    )
    out = repeated_passages(docs, "doc_id", "text", span_words=8)
    rows = sorted(tuple(r) for r in out.collect())
    # doc 1: passage starts at token 1; doc 2: at token 5
    assert rows == [(1, 1, 2, 2, True), (2, 5, 2, 2, False)]


def test_repeated_passages_keep_first_and_intradoc_sites(spark):
    from database_transportor_spark.operators.dedup import repeated_passages

    # anchor everywhere so the test pins pure span semantics
    every = tuple("0123456789abcdef")
    docs = spark.createDataFrame(
        [
            (7, "a b c d a b c d"),   # span "a b c d" twice intra-doc
            (9, "x a b c d y z w"),
        ],
        ["doc_id", "text"],
    )
    out = repeated_passages(
        docs, "doc_id", "text", span_words=4, anchor_chars=every
    )
    rows = {(r.doc_id, r.pos): (r.n_docs, r.n_sites, r.keep) for r in out.collect()}
    # "a b c d" occurs at (7,1), (7,5), (9,2): 2 docs / 3 sites;
    # keep = lowest (doc_id, pos) only
    assert rows[(7, 1)] == (2, 3, True)
    assert rows[(7, 5)] == (2, 3, False)
    assert rows[(9, 2)] == (2, 3, False)
    # spans unique to one doc never appear
    assert all(v[0] >= 2 for v in rows.values())


def test_repeated_passages_short_and_empty_docs(spark):
    from database_transportor_spark.operators.dedup import repeated_passages

    docs = spark.createDataFrame(
        [(1, ""), (2, "too short"), (3, "   "), (4, "exactly four words here")],
        ["doc_id", "text"],
    )
    out = repeated_passages(docs, "doc_id", "text", span_words=8)
    assert out.count() == 0


def test_repeated_passages_rejects_bad_span(spark):
    import pytest
    from database_transportor_spark.operators.dedup import repeated_passages

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        repeated_passages(docs, "doc_id", "text", span_words=1)


def test_strip_repeated_passages_keeps_one_copy(spark):
    from database_transportor_spark.operators.dedup import strip_repeated_passages

    every = tuple("0123456789abcdef")
    docs = spark.createDataFrame(
        [
            (1, "a b c d tail one two"),
            (2, "x y a b c d z"),      # span "a b c d" duplicated at pos 3
            (3, "untouched words stay put"),
        ],
        ["doc_id", "text"],
    )
    out = strip_repeated_passages(
        docs, "doc_id", "text", span_words=4, anchor_chars=every
    )
    rows = {r.doc_id: (r.text, r.removed) for r in out.collect()}
    # doc 1 is the canonical site: untouched (normalized form)
    assert rows[1] == ("a b c d tail one two", 0)
    # doc 2 loses the 4 covered tokens
    assert rows[2] == ("x y z", 4)
    assert rows[3] == ("untouched words stay put", 0)


def test_strip_repeated_passages_overlapping_cuts(spark):
    from database_transportor_spark.operators.dedup import strip_repeated_passages

    every = tuple("0123456789abcdef")
    # doc 20 repeats doc 10's run "a b c d e": spans "a b c d" and
    # "b c d e" both duplicate; their cut ranges overlap in doc 20 and
    # the union of covered tokens (positions 2-6) must be excised once.
    docs = spark.createDataFrame(
        [
            (10, "a b c d e p q"),
            (20, "m a b c d e n"),
        ],
        ["doc_id", "text"],
    )
    out = strip_repeated_passages(
        docs, "doc_id", "text", span_words=4, anchor_chars=every
    )
    rows = {r.doc_id: (r.text, r.removed) for r in out.collect()}
    assert rows[10] == ("a b c d e p q", 0)
    assert rows[20] == ("m n", 5)
