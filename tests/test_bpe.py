"""BPE tokenizer: training determinism, classic-corpus merges, encode
round-trip, and parity with an independent reference implementation."""

import pytest

from database_transportor_spark.operators.text import bpe_encode, train_bpe


def _corpus(spark):
    return spark.createDataFrame(
        [(1, "low low low low low lower lower"),
         (2, "newest newest newest newest newest newest"),
         (3, "widest widest widest")],
        ["doc_id", "text"],
    )


def test_train_bpe_classic_corpus_merges(spark):
    """The canonical subword-nmt example: merges must start e+s, es+t,
    est+</w> (driven by 'newest'x6 + 'widest'x3 sharing 'est')."""
    m = train_bpe(_corpus(spark), "text", num_merges=5)
    got = [(r["left"], r["right"]) for r in m.orderBy("rank").collect()]
    assert got[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    assert ("l", "o") in got and ("lo", "w") in got


def test_train_bpe_deterministic_across_partitionings(spark):
    df = _corpus(spark)
    a = [(r["rank"], r["left"], r["right"]) for r in
         train_bpe(df, "text", num_merges=8).orderBy("rank").collect()]
    b = [(r["rank"], r["left"], r["right"]) for r in
         train_bpe(df.repartition(5), "text", num_merges=8)
         .orderBy("rank").collect()]
    assert a == b and len(a) == 8


def test_bpe_encode_round_trip_reconstructs_text(spark):
    df = _corpus(spark)
    m = train_bpe(df, "text", num_merges=10)
    out = bpe_encode(df, "text", m)
    for r in out.collect():
        rebuilt = "".join(r["bpe_tokens"]).replace("</w>", " ").strip()
        assert rebuilt == r["text"].strip().lower()
        assert r["n_bpe_tokens"] == len(r["bpe_tokens"])


def _reference_encode(word, rules):
    """Independent greedy BPE encoder (same contract, written separately)."""
    rank = {(l, r): k for k, l, r in rules}
    syms = list(word) + ["</w>"]
    while True:
        cands = [(rank[(syms[i], syms[i + 1])], i)
                 for i in range(len(syms) - 1)
                 if (syms[i], syms[i + 1]) in rank]
        if not cands:
            return syms
        _, i0 = min(cands)
        l, r = syms[i0], syms[i0 + 1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                out.append(l + r); i += 2
            else:
                out.append(syms[i]); i += 1
        syms = out


def test_bpe_encode_matches_reference_on_fixture(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(30)
    m = train_bpe(docs, "text", num_merges=40)
    rules = [(r["rank"], r["left"], r["right"]) for r in m.collect()]
    out = bpe_encode(docs, "text", m).collect()
    import re

    for r in out[:10]:
        words = [w for w in re.split(r"\s+", r["text"].strip().lower()) if w]
        expect = []
        for w in words:
            expect.extend(_reference_encode(w, rules))
        assert r["bpe_tokens"] == expect


def test_bpe_unseen_characters_pass_through(spark):
    train = _corpus(spark)
    m = train_bpe(train, "text", num_merges=5)
    novel = train.sparkSession.createDataFrame(
        [(9, "zzz qq")], ["doc_id", "text"])
    r = bpe_encode(novel, "text", m).collect()[0]
    assert r["bpe_tokens"] == ["z", "z", "z", "</w>", "q", "q", "</w>"]


def test_bpe_validation_and_nulls(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError):
        train_bpe(df, "text", num_merges=0)
    with pytest.raises(ValueError):
        bpe_encode(df, "text", None)
    nul = df.sparkSession.createDataFrame(
        [(1, None)], "doc_id long, text string")
    r = bpe_encode(nul, "text", train_bpe(df, "text", 3)).collect()[0]
    assert r["bpe_tokens"] is None and r["n_bpe_tokens"] is None


def test_bpe_nbsp_word_not_split_differently_from_training(spark):
    """NBSP (U+00A0) is NOT whitespace to the JVM's ASCII \\s+ used in
    training; the encoder must agree (Python re.ASCII), keeping
    'foo\\xa0bar' one word on both sides."""
    corpus = spark.createDataFrame(
        [(1, "foo bar foo bar baz baz baz")], ["doc_id", "text"])
    m = train_bpe(corpus, "text", num_merges=6)
    r = bpe_encode(corpus, "text", m).collect()[0]
    rebuilt = "".join(r["bpe_tokens"]).replace("</w>", " ").strip()
    assert rebuilt == "foo bar foo bar baz baz baz"
