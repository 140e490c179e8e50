"""Corpus-level pipeline operators: splits, sampling, packing,
decontamination, PII redaction."""

import pytest
from pyspark.sql import functions as F

from database_transportor_spark.operators.corpus import (
    decontaminate,
    leakage_safe_split,
    pack_sequences,
    redact_pii,
    split_assign,
    stratified_sample,
)


def test_split_assign_deterministic_and_proportional(spark):
    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    a = split_assign(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    b = split_assign(df.repartition(7), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in a.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 10_000 - 0.8) < 0.02
    assert abs(counts["val"] / 10_000 - 0.1) < 0.01
    # partitioning must not change any assignment
    assert a.join(b.withColumnRenamed("split", "s2"), "doc_id") \
            .filter(F.col("split") != F.col("s2")).count() == 0


def test_split_assign_multiplicative_matches_formula(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    out = split_assign(df, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05},
                       hash_fn="multiplicative").collect()
    for r in out:
        b = ((r["doc_id"] * 2654435761) % 4294967296) % 10000
        want = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert r["split"] == want


def test_leakage_safe_split_never_splits_a_cluster(spark):
    docs = spark.range(1000).withColumnRenamed("id", "doc_id")
    # clusters of 4: cluster_id = doc_id - doc_id % 4
    clusters = docs.select(
        "doc_id", (F.col("doc_id") - F.col("doc_id") % 4).alias("cluster_id")
    )
    out = leakage_safe_split(docs, clusters, "doc_id", "cluster_id")
    spans = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert spans == 0
    # docs absent from the cluster map fall back to singleton clusters
    partial = clusters.filter(F.col("doc_id") < 500)
    out2 = leakage_safe_split(docs, partial, "doc_id", "cluster_id")
    assert out2.filter(F.col("cluster_id").isNull()).count() == 0
    assert out2.count() == 1000


def test_stratified_sample_exact_k_and_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(300)], ["doc_id", "grp"]
    )
    s1 = stratified_sample(df, ["grp"], k=7, id_col="doc_id")
    assert s1.groupBy("grp").count().filter(F.col("count") != 7).count() == 0
    s2 = stratified_sample(df.repartition(5), ["grp"], k=7, id_col="doc_id")
    assert sorted(r["doc_id"] for r in s1.collect()) == \
           sorted(r["doc_id"] for r in s2.collect())
    # k larger than the stratum keeps everything
    tiny = df.filter(F.col("doc_id") < 5)
    assert stratified_sample(tiny, ["grp"], k=100, id_col="doc_id").count() == 5


def test_pack_sequences_contiguous_fill(spark):
    df = spark.createDataFrame(
        [(1, 600), (2, 600), (3, 600), (4, 600), (5, 100)],
        ["doc_id", "n_tok"],
    )
    out = {r["doc_id"]: (r["pack_offset"], r["pack_id"])
           for r in pack_sequences(df, "doc_id", "n_tok", budget=1000).collect()}
    # offsets: 0, 600, 1200, 1800, 2400 → packs 0,0,1,1,2
    assert out == {1: (0, "0"), 2: (600, "0"), 3: (1200, "1"),
                   4: (1800, "1"), 5: (2400, "2")}


def test_pack_sequences_grouped_ids(spark):
    df = spark.createDataFrame(
        [(1, "a", 900), (2, "a", 900), (1, "b", 900)],
        ["doc_id", "g", "n_tok"],
    )
    out = pack_sequences(df, "doc_id", "n_tok", budget=1000, group_cols=["g"])
    packs = {(r["g"], r["doc_id"]): r["pack_id"] for r in out.collect()}
    assert packs == {("a", 1): "a#0", ("a", 2): "a#0", ("b", 1): "b#0"}


def test_decontaminate_flags_verbatim_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a sleeping cat"),  # shares prefix
            (2, "completely unrelated words appear in this line here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           decontaminate(corpus, bench, "doc_id", "text", n=3).collect()}
    assert out[1]["overlap_ngrams"] > 0
    assert out[2]["overlap_ngrams"] == 0
    assert 0 < out[1]["contamination"] <= 1.0
    # threshold drops the clean doc
    flagged = decontaminate(corpus, bench, "doc_id", "text", n=3, threshold=0.1)
    assert [r["doc_id"] for r in flagged.collect()] == [1]


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob@example.com or from 192.168.0.1 call +1 555 123 4567"),
            (2, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 1 and out[1]["n_phone"] == 1
    assert "<EMAIL>" in out[1]["text"] and "<IPV4>" in out[1]["text"]
    assert "bob@example.com" not in out[1]["text"]
    assert out[2]["text"] == "nothing sensitive here"
    assert out[2]["n_email"] == 0


def test_split_assign_bad_hash_fn(spark):
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        split_assign(df, "doc_id", hash_fn="md5").collect()


def test_split_assign_rejects_bad_weights(spark):
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="positive"):
        split_assign(df, "doc_id", {"a": 0.5, "b": -0.5})
    # an empty dict falls back to the documented default split
    assert split_assign(df, "doc_id", {}).count() == 5


# ---------------------------------------------------------------------------
# corpus_shuffle
# ---------------------------------------------------------------------------


def test_corpus_shuffle_partition_independent(spark):
    from database_transportor_spark.operators.corpus import corpus_shuffle

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    a = corpus_shuffle(df, "doc_id", 4, seed=1).orderBy("doc_id").collect()
    b = (
        corpus_shuffle(df.repartition(7), "doc_id", 4, seed=1)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def test_corpus_shuffle_positions_contiguous(spark):
    from database_transportor_spark.operators.corpus import corpus_shuffle

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    out = corpus_shuffle(df, "doc_id", 4, seed=3).collect()
    assert all(0 <= r["shard"] < 4 for r in out)
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["shuffle_pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    assert sum(len(p) for p in by_shard.values()) == 100


def test_corpus_shuffle_seed_changes_order(spark):
    from database_transportor_spark.operators.corpus import corpus_shuffle

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    a = corpus_shuffle(df, "doc_id", 2, seed=1).orderBy("doc_id").collect()
    b = corpus_shuffle(df, "doc_id", 2, seed=2).orderBy("doc_id").collect()
    assert a != b  # a different epoch permutation


# ---------------------------------------------------------------------------
# upsample_domains
# ---------------------------------------------------------------------------


def test_upsample_exact_integer_weights(spark):
    from database_transportor_spark.operators.corpus import upsample_domains

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(100)],
        ["doc_id", "dom"],
    )
    out = upsample_domains(df, "dom", {"a": 3.0, "b": 0.0}, "doc_id")
    assert out.filter("dom = 'b'").count() == 0
    assert out.filter("dom = 'a'").count() == 150  # 50 rows x 3
    idx = [r["copy_idx"] for r in out.filter("doc_id = 0").collect()]
    assert sorted(idx) == [0, 1, 2]


def test_upsample_fractional_weight_bounds_and_determinism(spark):
    from database_transportor_spark.operators.corpus import upsample_domains

    df = spark.createDataFrame([(i, "a") for i in range(1000)], ["doc_id", "dom"])
    out = upsample_domains(df, "dom", {"a": 1.5}, "doc_id", salt=11)
    n = out.count()
    assert 1300 <= n <= 1700  # ~1500 expected, hash-uniform
    again = upsample_domains(
        df.repartition(5), "dom", {"a": 1.5}, "doc_id", salt=11
    ).count()
    assert n == again


def test_upsample_default_weight_passthrough(spark):
    from database_transportor_spark.operators.corpus import upsample_domains

    df = spark.createDataFrame([(1, "x"), (2, "y")], ["doc_id", "dom"])
    out = upsample_domains(df, "dom", {"x": 2.0}, "doc_id").collect()
    assert len([r for r in out if r["dom"] == "y"]) == 1  # untouched domain
    assert len([r for r in out if r["dom"] == "x"]) == 2


def test_sample_to_token_budget(spark):
    from database_transportor_spark.operators.corpus import (
        sample_to_token_budget,
    )

    df = spark.createDataFrame(
        [(i, "a" if i < 600 else "b", 100) for i in range(1000)],
        ["id", "dom", "toks"],
    )
    # domain a: 600*100=60k tokens capped to 15k => rate 0.25;
    # domain b: no budget => kept whole
    out = sample_to_token_budget(df, "dom", "toks", {"a": 15_000}, "id")
    a_tokens = out.filter("dom = 'a'").count() * 100
    assert out.filter("dom = 'b'").count() == 400
    assert 10_000 <= a_tokens <= 20_000, f"expected ~15k, got {a_tokens}"
    # deterministic: identical rerun keeps the identical set
    again = sample_to_token_budget(df, "dom", "toks", {"a": 15_000}, "id")
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in again.collect()
    )
    # subset property: halving the budget keeps a subset
    half = sample_to_token_budget(df, "dom", "toks", {"a": 7_500}, "id")
    ids_full = {r["id"] for r in out.filter("dom = 'a'").collect()}
    ids_half = {r["id"] for r in half.filter("dom = 'a'").collect()}
    assert ids_half <= ids_full and len(ids_half) < len(ids_full)
    # over-budget domain is untouched (rate clamps to 1)
    rich = sample_to_token_budget(df, "dom", "toks", {"a": 10_000_000}, "id")
    assert rich.filter("dom = 'a'").count() == 600


def test_json_extract_columns(spark):
    from database_transportor_spark.functions.json_cols import (
        infer_json_schema,
        json_extract_columns,
    )

    df = spark.createDataFrame(
        [
            (1, '{"k": 5, "meta": {"os": "linux", "v": 2.5}}'),
            (2, '{"k": 7}'),
            (3, '{"k": "not-a-number", "meta": {"os": "mac"}}'),
            (4, None),
        ],
        ["id", "props"],
    )
    out = json_extract_columns(
        df, "props",
        {"k": "long", "os": ("meta.os", "string"), "v": ("meta.v", "double")},
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["k"] == 5 and rows[1]["os"] == "linux" and rows[1]["v"] == 2.5
    assert rows[2]["k"] == 7 and rows[2]["os"] is None
    assert rows[3]["k"] is None, "type mismatch must yield NULL, not error"
    assert rows[3]["os"] == "mac"
    assert rows[4]["k"] is None
    # original columns preserved, one parse (single from_json in the plan)
    assert out.columns == ["id", "props", "k", "os", "v"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("from_json") <= out.columns.count("k") + 3  # parsed once, projected thrice

    ddl = infer_json_schema(df, "props")
    assert "k" in ddl and "meta" in ddl

    import pytest

    with pytest.raises(ValueError, match="descends through|collides"):
        json_extract_columns(df, "props", {"a": ("k.x", "long"), "b": ("k", "long")})


def test_zscore_filter(spark):
    from database_transportor_spark.operators.corpus import zscore_filter

    rows = [(i, "g", 10.0) for i in range(20)] + [
        (100, "g", 1000.0),          # extreme outlier
        (101, "h", 5.0), (102, "h", 5.0),  # zero-variance group: all pass
        (103, "g", None),            # NULL passes
    ]
    df = spark.createDataFrame(rows, ["id", "grp", "v"])
    out = zscore_filter(df, "v", ["grp"], max_z=3.0)
    ids = {r["id"] for r in out.collect()}
    assert 100 not in ids, "outlier must be dropped"
    assert {101, 102, 103} <= ids
    assert len(ids) == 23
    # out_col keeps the score
    scored = zscore_filter(df, "v", ["grp"], max_z=3.0, out_col="z")
    assert "z" in scored.columns
    z101 = [r["z"] for r in scored.collect() if r["id"] == 101][0]
    assert z101 is None, "zero-variance group has no defined z"


def test_json_extract_rejects_conflicts(spark):
    from database_transportor_spark.functions.json_cols import (
        json_extract_columns,
    )

    df = spark.createDataFrame([(1, '{"k": 5}')], ["id", "props"])
    with pytest.raises(ValueError, match="conflicting types"):
        json_extract_columns(
            df, "props", {"a": ("k", "long"), "b": ("k", "string")}
        )
    with pytest.raises(ValueError, match="already exist"):
        json_extract_columns(df, "props", {"id": "long"})
    # same path, same type twice is fine (two aliases)
    out = json_extract_columns(
        df, "props", {"a": ("k", "long"), "b": ("k", "long")}
    )
    r = out.collect()[0]
    assert r["a"] == 5 and r["b"] == 5


def test_rank_normalize_null_scores_stay_null(spark):
    from database_transportor_spark.operators.corpus import rank_normalize

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", None), (4, "a", 30)],
        "id long, g string, v int",
    )
    out = {r["id"]: r["pct_rank"] for r in
           rank_normalize(df, "v", ["g"]).collect()}
    assert out[3] is None
    # non-null ranks computed over the 3 scored rows only
    assert out[1] == 0.0 and out[4] == 1.0 and out[2] == 0.5


def test_detect_pii_single_pass_report(spark):
    from database_transportor_spark.operators.corpus import detect_pii

    df = spark.createDataFrame(
        [("contact bob@x.io now", "clean"),
         ("nothing here", "call +1 (555) 123-4567"),
         (None, "also clean")],
        "a string, b string",
    )
    got = {(r["column"], r["pattern"]): r for r in detect_pii(df).collect()}
    assert got[("a", "email")]["n_hits"] == 1
    assert got[("a", "email")]["hit_rate"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[("b", "phone")]["n_hits"] == 1
    assert got[("a", "phone")]["n_hits"] == 0  # zero-hit pairs reported
    assert all(r["n_rows"] == 3 for r in got.values())


def test_detect_pii_validation(spark):
    import pytest as _pytest

    from database_transportor_spark.operators.corpus import detect_pii

    df = spark.createDataFrame([(1,)], "n long")
    with _pytest.raises(ValueError):
        detect_pii(df)  # no string columns
    df2 = spark.createDataFrame([("x", 1)], "s string, n long")
    with _pytest.raises(ValueError):
        detect_pii(df2, columns=["n"])


def test_temperature_weights_limits_and_composition(spark):
    from database_transportor_spark.operators.corpus import (
        temperature_weights, upsample_domains)

    df = spark.createDataFrame(
        [("a", i) for i in range(80)] + [("b", i + 100) for i in range(19)]
        + [("c", 200)], ["d", "id"])
    # T=1: natural shares, all weights exactly 1
    t1 = {r["domain"]: r["weight"] for r in
          temperature_weights(df, "d", 1.0).collect()}
    assert t1 == {"a": 1.0, "b": 1.0, "c": 1.0}
    # T large: q approaches uniform -> tail upsampled, head downsampled
    t100 = {r["domain"]: r for r in
            temperature_weights(df, "d", 100.0).collect()}
    assert t100["c"]["weight"] > 10 and t100["a"]["weight"] < 1
    assert abs(sum(r["q"] for r in t100.values()) - 1.0) < 1e-4
    # weights feed upsample_domains: post-mix counts track q
    w = {r["domain"]: r["weight"] for r in
         temperature_weights(df, "d", 2.0).collect()}
    mixed = upsample_domains(df, "d", w, "id")
    counts = {r["d"]: r["n"] for r in
              mixed.groupBy("d").agg(F.count("*").alias("n")).collect()}
    q = {r["domain"]: r["q"] for r in
         temperature_weights(df, "d", 2.0).collect()}
    total = sum(counts.values())
    for dom in counts:
        assert abs(counts[dom] / total - q[dom]) < 0.05, (dom, counts, q)

    import pytest as _p
    with _p.raises(ValueError):
        temperature_weights(df, "d", 0.0)


def test_source_divergence_flags_outlier_source(spark):
    from database_transportor_spark.operators.corpus import source_divergence

    rows = []
    for i in range(8):
        rows.append((i, "srcA", "the quick brown fox jumps over the dog"))
        rows.append((100 + i, "srcB", "the quick brown fox leaps over the dog"))
    for i in range(8):
        rows.append((200 + i, "spam", "buy buy buy cheap cheap pills pills"))
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {r["source"]: r["kl_divergence"]
           for r in source_divergence(df).collect()}
    # the spam farm diverges far more than either normal source (the
    # normal sources also diverge a little — the corpus mix includes
    # the spam — so assert a clear multiple, not near-zero)
    assert got["spam"] > 2 * max(got["srcA"], got["srcB"])
    assert all(v >= 0 for v in got.values())


def test_source_divergence_deterministic_across_partitionings(spark):
    from database_transportor_spark.operators.corpus import source_divergence

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, source_divergence(df).collect()))
    b = sorted(map(tuple, source_divergence(df.repartition(13)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# quantile_bins
# ---------------------------------------------------------------------------


def test_quantile_bins_equal_depth_and_order(spark):
    from database_transportor_spark.operators.corpus import quantile_bins

    df = spark.createDataFrame(
        [(i, "g") for i in range(20)], ["v", "grp"]
    )
    out = quantile_bins(df, "v", 4, group_cols=["grp"],
                        tiebreak_cols=["v"])
    got = sorted((r.v, r.bin) for r in out.collect())
    # 20 rows / 4 bins = 5 each, monotone in v
    from collections import Counter

    assert Counter(b for _, b in got) == {1: 5, 2: 5, 3: 5, 4: 5}
    assert [b for _, b in got] == sorted(b for _, b in got)


def test_quantile_bins_nulls_sort_last(spark):
    from database_transportor_spark.operators.corpus import quantile_bins

    df = spark.createDataFrame(
        [(1, 1), (2, 2), (3, None), (4, None)], "id int, v int"
    )
    out = quantile_bins(df, "v", 2, tiebreak_cols=["id"])
    got = {r.id: r.bin for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2}  # NULLs fill the top bin
    import pytest as _pytest

    with _pytest.raises(ValueError):
        quantile_bins(df, "v", 0)


def test_normalize_urls_noise_classes(spark):
    from database_transportor_spark.operators.corpus import normalize_urls

    df = spark.createDataFrame(
        [
            (1, "HTTPS://WWW.Example.COM:443/Docs/A/?utm_source=x&ref=y#f"),
            (2, "https://example.com/Docs/A"),
            (3, "http://Sub.Site.org:80/p?id=3&utm_campaign=z&q=1"),
            (4, "not a url"),
            (5, "https://example.com/?gclid=abc"),
            (6, "http://example.com:8080/keep-port"),
        ],
        ["id", "url"],
    )
    got = {r["id"]: (r["url_norm"], r["url_host"], r["url_domain"])
           for r in normalize_urls(df, "url").collect()}
    # recrawl noise collapses onto the clean form (case/port/www/params/slash)
    assert got[1][0] == got[2][0] == "https://example.com/Docs/A"
    # non-tracking params survive, tracking param removed mid-query
    assert got[3] == ("http://sub.site.org/p?id=3&q=1", "sub.site.org", "site.org")
    # non-URLs pass through untouched (empty host/domain)
    assert got[4] == ("not a url", "", "")
    # tracking-only query drops entirely (and the trailing slash with it)
    assert got[5][0] == "https://example.com"
    # non-default ports are preserved
    assert got[6][0] == "http://example.com:8080/keep-port"


def test_normalize_urls_idempotent(spark):
    from database_transportor_spark.operators.corpus import normalize_urls

    df = spark.createDataFrame(
        [(1, "HTTPS://WWW.A.B:443/x/?utm_a=1&q=2&fbclid=3#z")], ["id", "url"]
    )
    once = normalize_urls(df, "url").select(
        "id", F.col("url_norm").alias("url"))
    twice = normalize_urls(once, "url")
    row = twice.collect()[0]
    assert row["url"] == row["url_norm"] == "https://a.b/x?q=2"


def test_corpus_report_card(spark):
    from database_transportor_spark.operators.corpus import corpus_report

    df = spark.createDataFrame(
        [
            (1, "hello world", "en", 11),
            (2, "hello world", "en", 11),        # exact dup text
            (3, "bonjour", "fr", 7),
            (4, "", "fr", 0),                     # blank: 0 tokens
            (5, "one two three four", "de", 18),
        ],
        ["doc_id", "text", "lang", "n_chars"],
    )
    r = corpus_report(df, short_chars=10).collect()[0]
    assert r["n_docs"] == 5 and r["n_dup_texts"] == 1
    assert abs(r["dup_pct"] - 0.2) < 1e-9
    assert r["total_tokens"] == 2 + 2 + 1 + 0 + 4
    assert r["n_langs"] == 3
    # en and fr both have 2 docs: tie breaks to the smaller lang, 'en'
    assert r["top_lang"] == "en" and abs(r["top_lang_pct"] - 0.4) < 1e-9
    assert abs(r["pct_short"] - 0.4) < 1e-9  # 7 and 0 chars are short


def test_corpus_report_no_lang(spark):
    from database_transportor_spark.operators.corpus import corpus_report

    df = spark.createDataFrame([(1, "a b", 3)], ["doc_id", "text", "n_chars"])
    r = corpus_report(df, lang_col=None).collect()[0]
    assert "top_lang" not in r.asDict() and r["total_tokens"] == 2


class TestQuantileBin:
    def test_value_based_buckets_and_ties(self, spark):
        from pyspark.sql import functions as F

        from database_transportor_spark.operators.corpus import (
            quantile_bin,
        )

        df = spark.range(0, 100).select(
            F.col("id").cast("double").alias("x")
        )
        out = quantile_bin(df, "x", 4)
        got = {r["x"]: r["bucket"] for r in out.collect()}
        # exact interpolated quartiles of 0..99: 24.75 / 49.5 / 74.25
        assert got[0.0] == 0 and got[24.0] == 0
        assert got[25.0] == 1 and got[49.0] == 1
        assert got[50.0] == 2 and got[74.0] == 2
        assert got[75.0] == 3 and got[99.0] == 3

    def test_grouped_and_nulls(self, spark):
        from database_transportor_spark.operators.corpus import (
            quantile_bin,
        )

        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
                ("b", 100.0), ("b", 200.0), (None, 5.0), ("a", None)]
        df = spark.createDataFrame(rows, "g string, x double")
        out = quantile_bin(df, "x", 2, group_cols=["g"])
        assert out.count() == 8  # NULL group + NULL value rows survive
        got = {(r["g"], r["x"]): r["bucket"] for r in out.collect()}
        assert got[("a", 1.0)] == 0 and got[("a", 4.0)] == 1
        assert got[("b", 100.0)] == 0 and got[("b", 200.0)] == 1
        assert got[("a", None)] is None

    def test_guard(self, spark):
        import pytest

        from database_transportor_spark.operators.corpus import (
            quantile_bin,
        )

        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError, match="n_buckets"):
            quantile_bin(df, "x", 1)


class TestCorpusDiff:
    def test_added_removed_changed(self, spark):
        from database_transportor_spark.operators.corpus import corpus_diff

        old = spark.createDataFrame(
            [(1, "same"), (2, "before"), (3, "gone"), (4, None)],
            "doc_id long, text string")
        new = spark.createDataFrame(
            [(1, "same"), (2, "after"), (5, "fresh"), (4, None)],
            "doc_id long, text string")
        got = {r["doc_id"]: r["status"]
               for r in corpus_diff(old, new).collect()}
        # 1 unchanged (excluded), 4 NULL==NULL unchanged (excluded)
        assert got == {2: "changed", 3: "removed", 5: "added"}

    def test_multi_column_and_validation(self, spark):
        import pytest

        from database_transportor_spark.operators.corpus import corpus_diff

        old = spark.createDataFrame([(1, "a", 1.0)],
                                    "doc_id long, text string, q double")
        new = spark.createDataFrame([(1, "a", 2.0)],
                                    "doc_id long, text string, q double")
        # q changed -> changed when q participates; unchanged when not
        assert corpus_diff(old, new).collect()[0]["status"] == "changed"
        assert corpus_diff(old, new,
                           content_cols=["text"]).count() == 0
        with pytest.raises(ValueError, match="missing on a side"):
            corpus_diff(old, new, content_cols=["nope"])
        with pytest.raises(ValueError, match="shared content"):
            corpus_diff(old.select("doc_id"), new.select("doc_id"))


# ---------------------------------------------------------------------------
# export_shards
# ---------------------------------------------------------------------------


class TestExportShards:
    def _docs(self, spark, n=200):
        return (
            spark.range(n)
            .withColumnRenamed("id", "doc_id")
            .withColumn("text", F.concat(F.lit("doc "), F.col("doc_id")))
            .withColumn("n_tok", (F.col("doc_id") % 7 + 1).cast("long"))
        )

    def test_manifest_matches_physical_layout(self, spark, tmp_path):
        from database_transportor_spark.operators.corpus import export_shards

        out = str(tmp_path / "epoch0")
        man = export_shards(
            self._docs(spark), out, "doc_id", 4, seed=3,
            token_col="n_tok",
        ).collect()
        assert [r["shard"] for r in man] == sorted(r["shard"] for r in man)
        assert sum(r["n_rows"] for r in man) == 200
        for r in man:
            # the one-file-per-shard contract is MEASURED, not assumed
            assert r["n_files"] == 1
            assert r["bytes"] > 0
            assert r["min_pos"] == 1
            assert r["max_pos"] == r["n_rows"]

    def test_in_file_rows_are_in_epoch_order(self, spark, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from database_transportor_spark.operators.corpus import export_shards

        out = str(tmp_path / "epoch0")
        export_shards(self._docs(spark), out, "doc_id", 4, seed=3)
        files = glob.glob(f"{out}/shard=*/*.parquet")
        assert len(files) == 4
        for f in files:
            # pyarrow preserves physical row order: a sequential reader
            # must replay the permutation with zero seeking
            pos = pq.read_table(f, columns=["shuffle_pos"])[
                "shuffle_pos"].to_pylist()
            assert pos == list(range(1, len(pos) + 1)), f

    def test_tokens_and_checksum_match_source_side(self, spark, tmp_path):
        from database_transportor_spark.operators.corpus import (
            M32,
            bucket_column,
            export_shards,
        )

        docs = self._docs(spark)
        out = str(tmp_path / "epoch0")
        man = {
            r["shard"]: r
            for r in export_shards(
                docs, out, "doc_id", 4, seed=3, token_col="n_tok"
            ).collect()
        }
        expected = (
            docs.withColumn(
                "shard",
                F.pmod(bucket_column("doc_id", M32, 3), F.lit(4)),
            )
            .groupBy("shard")
            .agg(
                F.sum("n_tok").alias("n_tokens"),
                F.sum(bucket_column("doc_id", M32, 3)).alias("ck"),
            )
            .collect()
        )
        for r in expected:
            got = man[r["shard"]]
            assert got["n_tokens"] == r["n_tokens"]
            assert got["id_checksum"] == r["ck"]

    def test_no_token_col_yields_null_tokens(self, spark, tmp_path):
        from database_transportor_spark.operators.corpus import export_shards

        man = export_shards(
            self._docs(spark), str(tmp_path / "e"), "doc_id", 2, seed=1
        ).collect()
        assert all(r["n_tokens"] is None for r in man)

    def test_deterministic_across_exports(self, spark, tmp_path):
        from database_transportor_spark.operators.corpus import export_shards

        docs = self._docs(spark)
        a = export_shards(
            docs, str(tmp_path / "a"), "doc_id", 4, seed=9,
            token_col="n_tok",
        ).drop("bytes").collect()
        b = export_shards(
            docs.repartition(13), str(tmp_path / "b"), "doc_id", 4,
            seed=9, token_col="n_tok",
        ).drop("bytes").collect()
        assert a == b

    def test_mode_and_validation(self, spark, tmp_path):
        from database_transportor_spark.operators.corpus import export_shards

        docs = self._docs(spark, n=20)
        out = str(tmp_path / "e")
        export_shards(docs, out, "doc_id", 2)
        with pytest.raises(Exception):  # Spark's path-exists refusal
            export_shards(docs, out, "doc_id", 2)
        # overwrite replaces cleanly
        man = export_shards(docs, out, "doc_id", 2, mode="overwrite")
        assert sum(r["n_rows"] for r in man.collect()) == 20
        with pytest.raises(ValueError, match="n_shards"):
            export_shards(docs, out, "doc_id", 0)
        with pytest.raises(ValueError, match="mode"):
            export_shards(docs, out, "doc_id", 2, mode="append")
        with pytest.raises(ValueError, match="token_col"):
            export_shards(docs, out, "doc_id", 2, token_col="nope")

    def test_empty_corpus_yields_empty_manifest(self, spark, tmp_path):
        from database_transportor_spark.operators.corpus import export_shards

        man = export_shards(
            self._docs(spark).filter(F.col("doc_id") < 0),
            str(tmp_path / "e"), "doc_id", 4,
        )
        assert man.collect() == []
        assert man.columns == [
            "shard", "n_files", "bytes", "n_rows", "n_tokens",
            "min_pos", "max_pos", "id_checksum",
        ]


class TestVerifyExport:
    def _export(self, spark, tmp_path, **kw):
        from database_transportor_spark.operators.corpus import export_shards

        docs = (
            spark.range(120).withColumnRenamed("id", "doc_id")
            .withColumn("text", F.concat(F.lit("d"), F.col("doc_id")))
            .withColumn("n_tok", (F.col("doc_id") % 5 + 1).cast("long"))
        )
        dest = str(tmp_path / "shards")
        man = export_shards(docs, dest, "doc_id", 4, seed=6,
                            token_col="n_tok", **kw)
        return dest, man

    def test_intact_export_audits_clean(self, spark, tmp_path):
        from database_transportor_spark.operators.corpus import verify_export

        dest, man = self._export(spark, tmp_path)
        diff = verify_export(spark, dest, man, "doc_id", seed=6,
                             token_col="n_tok")
        assert diff.collect() == []

    def test_deleted_file_is_caught(self, spark, tmp_path):
        import glob
        import os

        from database_transportor_spark.operators.corpus import verify_export

        dest, man = self._export(spark, tmp_path)
        stored = man.collect()  # materialize BEFORE mutating the files
        victim = sorted(glob.glob(f"{dest}/shard=*/*.parquet"))[0]
        os.remove(victim)
        exp = spark.createDataFrame(stored)
        rows = verify_export(spark, dest, exp, "doc_id", seed=6,
                             token_col="n_tok").collect()
        assert any(r["status"] == "missing" for r in rows)
        # only the victim's shard is implicated
        assert len({r["shard"] for r in rows}) == 1

    def test_corrupted_content_is_caught_by_checksum(self, spark, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from database_transportor_spark.operators.corpus import verify_export

        dest, man = self._export(spark, tmp_path)
        stored = spark.createDataFrame(man.collect())
        victim = sorted(glob.glob(f"{dest}/shard=*/*.parquet"))[0]
        import pyarrow as pa

        t = pq.read_table(victim)
        i = t.schema.get_field_index("doc_id")
        ids = t["doc_id"].to_pylist()
        ids[0] += 1_000_000  # silent id flip, schema untouched
        t = t.set_column(i, t.schema.field(i),
                         pa.array(ids, type=t.schema.field(i).type))
        pq.write_table(t, victim)
        # drop Hadoop's local-FS CRC sidecar: on object stores there is
        # no such net — the manifest checksum is what catches the flip
        import os

        d, b = os.path.split(victim)
        crc = os.path.join(d, f".{b}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        rows = verify_export(spark, dest, stored, "doc_id", seed=6,
                             token_col="n_tok").collect()
        fields = {r["field"] for r in rows if r["status"] == "mismatch"}
        assert "id_checksum" in fields
        # row counts unchanged: the checksum is what catches it
        assert "n_rows" not in fields

    def test_unexpected_shard_is_caught(self, spark, tmp_path):
        from database_transportor_spark.operators.corpus import verify_export

        dest, man = self._export(spark, tmp_path)
        stored = spark.createDataFrame(
            [r for r in man.collect() if r["shard"] != 2])
        rows = verify_export(spark, dest, stored, "doc_id", seed=6,
                             token_col="n_tok").collect()
        assert [r["status"] for r in rows if r["shard"] == 2] == ["unexpected"]


def _export_docs(spark, n=200):
    return (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .withColumn("text", F.concat(F.lit("doc "), F.col("doc_id")))
        .withColumn("n_tok", (F.col("doc_id") % 7 + 1).cast("long"))
    )


def test_export_plan_has_exactly_one_exchange(spark):
    from database_transportor_spark.operators.corpus import corpus_shuffle

    plan = (
        corpus_shuffle(_export_docs(spark), "doc_id", 4, seed=3,
                       layout_partitions=4)
        .sortWithinPartitions("shard", "shuffle_pos")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the range repartition feeds the position window directly: the
    # corpus crosses the wire ONCE (the round-11 review caught a
    # second full exchange here)
    assert plan.count("Exchange") == 1, plan


def test_audit_reports_missing_when_destination_gone(spark, tmp_path):
    import shutil

    from database_transportor_spark.operators.corpus import (
        _MANIFEST_SCHEMA,
        export_shards,
        verify_export,
    )

    docs = _export_docs(spark, n=40)
    dest = str(tmp_path / "gone")
    man = spark.createDataFrame(
        export_shards(docs, dest, "doc_id", 4).collect(),
        _MANIFEST_SCHEMA,
    )
    shutil.rmtree(dest)
    rows = verify_export(spark, dest, man, "doc_id").collect()
    assert rows and all(r["status"] == "missing" for r in rows)
    assert {r["shard"] for r in rows} == {r["shard"] for r in man.collect()}
