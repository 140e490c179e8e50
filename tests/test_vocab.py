"""build_vocab: exact counts, deterministic ranks, min_df/max_vocab cuts."""

from pyspark.sql import functions as F

from database_transportor_spark.operators.text import build_vocab


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "  The   CAT  "),          # case/whitespace normalization
            (4, ""),                        # empty doc contributes nothing
        ],
        "doc_id long, text string",
    )


def test_vocab_counts_exact(spark):
    out = {r["token"]: (r["tf"], r["df"]) for r in build_vocab(_docs(spark)).collect()}
    assert out["the"] == (4, 3)     # docs 1 (twice), 2, 3
    assert out["cat"] == (2, 2)
    assert out["sat"] == (2, 2)
    assert out["dog"] == (1, 1)
    assert "" not in out


def test_vocab_rank_deterministic_tiebreak(spark):
    rows = build_vocab(_docs(spark)).collect()
    ids = {r["token"]: r["token_id"] for r in rows}
    assert ids["the"] == 0                       # highest tf
    # tf=2 tie between cat/sat: token string ascending
    assert ids["cat"] == 1 and ids["sat"] == 2
    assert sorted(r["token_id"] for r in rows) == list(range(len(rows)))


def test_vocab_min_df_and_max_vocab(spark):
    out = build_vocab(_docs(spark), min_df=2)
    assert {r["token"] for r in out.collect()} == {"the", "cat", "sat"}
    top2 = build_vocab(_docs(spark), max_vocab=2).collect()
    assert [r["token"] for r in top2] == ["the", "cat"]


def test_vocab_corpus_shuffle_count_invariant(spark):
    """Vocabulary is order-independent: same result from a reshuffled corpus."""
    docs = _docs(spark)
    a = {tuple(r) for r in build_vocab(docs).collect()}
    b = {tuple(r) for r in build_vocab(docs.orderBy(F.rand(7))).collect()}
    assert a == b


def test_encode_tokens_positions_and_oov(spark):
    from database_transportor_spark.operators.text import encode_tokens

    docs = _docs(spark)
    vocab = build_vocab(docs, min_df=2)          # {the, cat, sat}
    ids = {r["token"]: r["token_id"] for r in vocab.collect()}
    out = {r["doc_id"]: r["token_ids"]
           for r in encode_tokens(docs, vocab).collect()}
    # doc 1 "the cat sat on the mat": OOV drops, positions preserved
    assert out[1] == [ids["the"], ids["cat"], ids["sat"], ids["the"]]
    assert out[3] == [ids["the"], ids["cat"]]
    assert out[4] == []                           # empty doc kept, empty array

    oov = {r["doc_id"]: r["token_ids"]
           for r in encode_tokens(docs, vocab, oov_id=-1).collect()}
    assert oov[1] == [ids["the"], ids["cat"], ids["sat"], -1, ids["the"], -1]


def test_tfidf_top_terms(spark):
    from database_transportor_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana shared"),
            (2, "banana cherry shared shared"),
            (3, "cherry date shared"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, "text", "doc_id", k=2)
    rows = {(r["doc_id"], r["term_rank"]): r for r in out.collect()}
    # doc 1: apple tf=2 df=1 -> 2*ln(3) is the top term
    top1 = rows[(1, 1)]
    assert top1["token"] == "apple" and top1["tf"] == 2 and top1["df"] == 1
    import math

    assert abs(top1["tfidf"] - round(2 * math.log(3), 6)) < 1e-9
    # 'shared' appears in every doc -> idf = ln(1) = 0, never outranks
    # a distinctive term
    assert all(
        r["token"] != "shared" or r["tfidf"] == 0.0 for r in rows.values()
    )
    # k bound holds per doc
    from collections import Counter

    per_doc = Counter(d for d, _ in rows)
    assert all(v <= 2 for v in per_doc.values())


# ---------------------------------------------------------------------------
# inverted_index
# ---------------------------------------------------------------------------


def test_inverted_index_counts_and_postings(spark):
    from database_transportor_spark.operators.text import inverted_index

    docs = _docs(spark)
    out = inverted_index(docs, "doc_id", "text", min_df=2, max_postings=10)
    got = {r.term: (r.df, r.postings) for r in out.collect()}
    # "the": docs 1,2,3; "cat": 1,3; "sat": 1,2
    assert got["the"] == (3, "1,2,3")
    assert got["cat"] == (2, "1,3")
    assert got["sat"] == (2, "1,2")
    assert "dog" not in got  # df=1 < min_df


def test_inverted_index_cap_keeps_df_exact(spark):
    from database_transportor_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [(i, "common word") for i in range(1, 6)], ["doc_id", "text"]
    )
    out = inverted_index(docs, "doc_id", "text", min_df=1, max_postings=2)
    got = {r.term: (r.df, r.postings) for r in out.collect()}
    # df counts ALL docs; postings capped to the 2 smallest ids
    assert got["common"] == (5, "1,2")
    assert got["word"] == (5, "1,2")
