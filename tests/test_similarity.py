"""Similarity-search tests: brute-force correctness and IVF recall with
both centroid methods (stride sample and trained KMeans)."""

from pyspark.sql import functions as F

from database_transportor_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
)

SF = "/root/testdata/sf0.01"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _recall(exact, approx):
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    return len(e & a) / len(e)


def test_brute_force_self_nearest(spark):
    emb = _emb(spark)
    probes = emb.filter(F.col("vec_id") < 5)
    # probe against corpus including itself minus self-match: top-1 must be
    # a different vector with cos <= 1
    out = cosine_topk(emb, probes, k=3)
    rows = out.collect()
    assert len(rows) == 15
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)


def test_ivf_kmeans_recall_beats_floor(spark):
    emb = _emb(spark)
    probes = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, probes, k=10)
    approx = ivf_topk(
        emb, probes, k=10, method="kmeans", n_centroids=8, nprobe=3
    )
    # 3 of 8 cells probed; a sane index keeps a solid share of true
    # neighbors (brute-force equivalence is not the contract)
    assert _recall(exact, approx) >= 0.5


def test_ivf_stride_and_kmeans_agree_on_shape(spark):
    emb = _emb(spark)
    probes = emb.filter(F.col("vec_id") < 5)
    for kwargs in ({"method": "stride", "stride": 37},
                   {"method": "kmeans", "n_centroids": 8}):
        out = ivf_topk(emb, probes, k=5, nprobe=2, **kwargs)
        rows = out.collect()
        assert {r["query_id"] for r in rows} == {0, 1, 2, 3, 4}
        assert all(1 <= r["rank"] <= 5 for r in rows)


# ---------------------------------------------------------------------------
# quantize_embeddings
# ---------------------------------------------------------------------------


def test_quantize_codes_and_dequant_error(spark):
    from database_transportor_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [2.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df, "embedding").collect()}
    assert out[2]["qscale"] == 0.0 and out[2]["qvec"] == [0, 0, 0]
    assert out[3]["qvec"] == [127]  # max element quantizes to exactly 127
    r1 = out[1]
    assert r1["qscale"] == 1.0
    for code, v in zip(r1["qvec"], [0.5, -1.0, 0.25]):
        assert -128 <= code <= 127
        # floor quantizer: error in [0, 1) LSB
        deq = code * r1["qscale"] / 127.0
        assert 0.0 <= v - deq < r1["qscale"] / 127.0 + 1e-12


def test_quantize_half_up_mode_and_bad_rounding(spark):
    import pytest

    from database_transportor_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -0.5])], "vec_id long, embedding array<float>"
    )
    r = quantize_embeddings(df, "embedding", rounding="half_up").first()
    assert r["qvec"] == [127, -64]  # Spark HALF_UP rounds .5 away from zero
    with pytest.raises(ValueError, match="rounding"):
        quantize_embeddings(df, "embedding", rounding="stochastic")


def test_quantize_keeps_columns(spark):
    from database_transportor_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [1.0], "x")], "vec_id long, embedding array<float>, tag string"
    )
    full = quantize_embeddings(df, "embedding")
    assert full.columns == ["vec_id", "embedding", "tag", "qscale", "qvec"]
    slim = quantize_embeddings(df, "embedding", id_col="vec_id")
    assert slim.columns == ["vec_id", "qscale", "qvec"]


def test_ivf_table_to_table_join(spark):
    """ANN join with a query TABLE (not a bounded probe list): every query
    gets <= k ranked neighbors, results match brute force on recall@k for
    the probed buckets, and the plan joins on the bucket id."""
    from database_transportor_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 5 == 0)
    out = ivf_topk(emb, queries, "vec_id", "embedding", k=3, stride=11, nprobe=4)
    rows = out.collect()
    n_queries = queries.count()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert len(per_q) == n_queries, "every query must get neighbors"
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    # exhaustive-probe contract: with nprobe >= #centroids every bucket is
    # probed, the candidate set is the whole corpus, and the IVF join must
    # EQUAL brute force row-for-row (synthetic random vectors make partial-
    # probe recall a geometry question, not a correctness one — the harness
    # oracle pins the partial-probe case cross-engine instead)
    exhaustive = ivf_topk(
        emb, queries, "vec_id", "embedding", k=3, stride=11, nprobe=1000
    )
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=3)
    a = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in exhaustive.collect()}
    b = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in exact.collect()}
    assert a == b, "exhaustive IVF must equal brute force"


def test_random_projection_deterministic_and_angle_preserving(spark):
    import numpy as np

    from database_transportor_spark.operators.similarity import (
        random_projection,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = random_projection(emb, "embedding", out_dim=32, seed=3)
    rows = {r["vec_id"]: (np.array(r["embedding"], dtype=np.float64),
                          np.array(r["proj"], dtype=np.float64))
            for r in out.collect()}
    # determinism under different partitioning
    again = {r["vec_id"]: list(r["proj"]) for r in
             random_projection(emb.repartition(7), "embedding",
                               out_dim=32, seed=3).collect()}
    for vid, (_, p) in rows.items():
        assert list(p.astype(np.int64)) == again[vid]

    # JL: projected cosine tracks original cosine over ALL pairs of a
    # sample (32-dim projection → per-pair cosine error std ≈ 1/√32)
    ids = sorted(rows)[:24]
    orig, proj = [], []
    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = rows[ids[i]], rows[ids[j]]
            orig.append(cos(a[0], b[0]))
            proj.append(cos(a[1], b[1]))
    err = np.abs(np.array(orig) - np.array(proj))
    assert err.mean() < 0.2, f"mean cosine distortion {err.mean():.3f}"
    r = np.corrcoef(orig, proj)[0, 1]
    assert r > 0.5, f"projection destroyed angular structure (corr={r})"


def test_random_projection_zero_shuffle_plan(spark):
    from database_transportor_spark.operators.similarity import (
        random_projection,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = random_projection(emb, "embedding", out_dim=4)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan

    import pytest as _pytest
    with _pytest.raises(ValueError):
        random_projection(emb, "embedding", out_dim=0)
    with _pytest.raises(ValueError, match="seed"):
        random_projection(emb, "embedding", out_dim=4, seed=-3)


def test_kmeans_lloyd_deterministic_across_partitionings(spark):
    from database_transportor_spark.operators.similarity import kmeans_lloyd

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {r["cluster"]: tuple(r)[1:] for r in kmeans_lloyd(df, k=4, iters=2).collect()}
    b = {r["cluster"]: tuple(r)[1:]
         for r in kmeans_lloyd(df.repartition(7), k=4, iters=2).collect()}
    assert a == b and len(a) >= 1


def test_kmeans_lloyd_converges_on_separated_blobs(spark):
    from database_transportor_spark.operators.similarity import kmeans_lloyd

    # two well-separated 1-hot-ish blobs in 4d: k=2 must split them
    rows = []
    for i in range(10):
        rows.append((i, [1.0 + 0.01 * i, 0.0, 0.0, 0.0]))
    for i in range(10, 20):
        rows.append((i, [0.0, 0.0, 0.0, 1.0 + 0.01 * i]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["cluster"]: r["n_points"]
           for r in kmeans_lloyd(df, k=2, iters=3).collect()}
    assert sorted(got.values()) == [10, 10]


def test_kmeans_lloyd_empty_cluster_carries_centroid(spark):
    from database_transportor_spark.operators.similarity import kmeans_lloyd

    # both seed vectors sit inside one tight blob -> after the update
    # one centroid may lose all members; the fit must still return rows
    # and never crash or NaN
    rows = [(i, [0.5, 0.5]) for i in range(6)] + [(99, [0.50001, 0.5])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = kmeans_lloyd(df, k=2, iters=3).collect()
    assert sum(r["n_points"] for r in out) == 7
    assert all(r["inertia"] >= 0 for r in out)


def test_kmeans_lloyd_invalid_vector_handling(spark):
    """NULL/ragged vectors: on_invalid='raise' (default) surfaces an
    actionable error from WITHIN the quantize pass (no extra validation
    job on clean inputs), 'skip' drops them; dim inference skips NULLs."""
    import pytest

    from database_transportor_spark.operators.similarity import kmeans_lloyd

    # leading NULL must not poison dim inference (size(NULL) is not -1/NULL)
    df = spark.createDataFrame(
        [(0, None), (1, [1.0, 2.0]), (2, [3.0, 4.0]), (3, [9.0, 9.0])],
        "vec_id long, embedding array<double>",
    )
    out = kmeans_lloyd(df, k=2, iters=2, on_invalid="skip")
    assert sum(r["n_points"] for r in out.collect()) == 3

    with pytest.raises(Exception, match="vec_id=0 has a NULL embedding"):
        kmeans_lloyd(df, k=2, iters=2).collect()

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0]), (3, [5.0, 6.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="1-element embedding but dim=2"):
        kmeans_lloyd(ragged, k=2, iters=2).collect()

    all_null = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="pass dim= explicitly"):
        kmeans_lloyd(all_null, k=1, iters=2)

    with pytest.raises(ValueError, match="on_invalid"):
        kmeans_lloyd(ragged, k=2, iters=2, on_invalid="bogus")


# --- embedding_covariance / pca_project -------------------------------

def test_embedding_covariance_exact_small(spark):
    import numpy as np
    from database_transportor_spark.operators.similarity import embedding_covariance

    vecs = [(1, [1.0, 2.0]), (2, [3.0, 4.0]), (3, [5.0, 6.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {(r.i, r.j): (r.sum_prod, r.cov) for r in
           embedding_covariance(df, scale=10).collect()}
    X = np.array([[10, 20], [30, 40], [50, 60]], dtype=np.int64)
    P = X.T @ X
    C = np.cov(np.array([v for _, v in vecs]).T, bias=True)
    for i in range(2):
        for j in range(2):
            sp, cov = out[(i, j)]
            assert sp == P[i, j]
            assert abs(cov - C[i, j]) < 1e-6


def test_embedding_covariance_partition_invariant(spark):
    from database_transportor_spark.operators.similarity import embedding_covariance

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(tuple(r) for r in embedding_covariance(emb).collect())
    b = sorted(
        tuple(r)
        for r in embedding_covariance(emb.repartition(13)).collect()
    )
    assert a == b  # exact integers: repartitioning cannot change them


def test_embedding_covariance_invalid_rows(spark):
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from database_transportor_spark.operators.similarity import embedding_covariance

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(SparkRuntimeException, match="on_invalid"):
        embedding_covariance(df).collect()
    out = embedding_covariance(df, on_invalid="skip")
    assert out.count() == 4  # 2x2 from the two valid rows


def test_pca_project_model_and_determinism(spark):
    import numpy as np
    from database_transportor_spark.operators.similarity import pca_project

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    p1 = pca_project(emb, k=4)
    p2 = pca_project(emb.repartition(7), k=4)
    # exact integer partials -> identical model regardless of layout
    assert np.array_equal(p1.pca_components, p2.pca_components)
    assert np.array_equal(p1.pca_eigenvalues, p2.pca_eigenvalues)
    W, lam = p1.pca_components, p1.pca_eigenvalues
    assert W.shape == (4, 64)
    assert np.all(np.diff(lam) <= 1e-12) and np.all(lam >= -1e-9)
    assert np.allclose(W @ W.T, np.eye(4), atol=1e-9)
    # sign convention: each component's largest-|loading| coord positive
    for r in range(4):
        assert W[r, np.abs(W[r]).argmax()] > 0
    row = p1.select("pca").first()
    assert len(row["pca"]) == 4


def test_pca_project_rejects_bad_k(spark):
    import pytest
    from database_transportor_spark.operators.similarity import pca_project

    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="k must be"):
        pca_project(df, k=3)


def test_pca_project_skip_emits_null_for_invalid_rows(spark):
    # ADVICE r6: the projection pass used to np.stack the raw column, so
    # a NULL/ragged vector sharing an Arrow batch with valid rows crashed
    # with "all input arrays must have the same shape"
    from database_transportor_spark.operators.similarity import pca_project

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0]),
            (2, None),
            (3, [4.0, 5.0, 6.0]),
            (4, [7.0, 8.0]),          # ragged
            (5, [9.0, 1.0, 2.0]),
        ],
        "vec_id long, embedding array<double>",
    ).coalesce(1)  # force all rows into ONE Arrow batch
    out = pca_project(df, k=2, on_invalid="skip")
    rows = {r["vec_id"]: r["pca"] for r in out.collect()}
    assert len(rows) == 5  # skip keeps every input row
    assert rows[2] is None and rows[4] is None
    for vid in (1, 3, 5):
        assert rows[vid] is not None and len(rows[vid]) == 2


def test_pca_project_raise_names_bad_row_in_projection(spark):
    from py4j.protocol import Py4JJavaError

    from database_transportor_spark.operators.similarity import pca_project

    clean = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0]), (3, [5.0, 7.0])],
        "vec_id long, embedding array<double>",
    )
    # fit on clean data, then project a frame with a ragged row: the
    # projection pass itself must raise the per-row actionable error
    model = pca_project(clean, k=1)
    import pytest

    dirty = clean.unionByName(
        spark.createDataFrame([(9, [1.0, 2.0, 3.0])],
                              "vec_id long, embedding array<double>")
    )
    with pytest.raises(Exception, match="vec_id=9"):
        pca_project(dirty, k=1, dim=2).collect()
    assert model is not None


class TestRRFFuse:
    """Reciprocal-rank fusion (round 10)."""

    def test_fuses_two_lists_with_known_scores(self, spark):
        from database_transportor_spark.operators.similarity import rrf_fuse

        lex = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            ["query_id", "neighbor_id", "rank"])
        sem = spark.createDataFrame(
            [(1, 11, 1), (1, 13, 2)],
            ["query_id", "neighbor_id", "rank"])
        got = {r["neighbor_id"]: (r["rrf_score"], r["rank"])
               for r in rrf_fuse([lex, sem], topk=10).collect()}
        # doc 11: 1/62 + 1/61; doc 10: 1/61; doc 13: 1/62; doc 12: 1/63
        assert got[11] == (round(1 / 62 + 1 / 61, 6), 1)
        assert got[10] == (round(1 / 61, 6), 2)
        assert got[13] == (round(1 / 62, 6), 3)
        assert got[12] == (round(1 / 63, 6), 4)

    def test_tiebreak_topk_and_validation(self, spark):
        import pytest as _pytest

        from database_transportor_spark.operators.similarity import rrf_fuse

        a = spark.createDataFrame(
            [(1, 20, 1), (1, 21, 1)], ["query_id", "neighbor_id", "rank"])
        out = rrf_fuse([a], topk=1).collect()
        assert len(out) == 1 and out[0]["neighbor_id"] == 20  # id asc tie
        with _pytest.raises(ValueError, match="at least one"):
            rrf_fuse([])
        with _pytest.raises(ValueError, match=">= 1"):
            rrf_fuse([a], k=0)

    def test_weighted_fusion(self, spark):
        import pytest as _pytest

        from database_transportor_spark.operators.similarity import rrf_fuse

        lex = spark.createDataFrame(
            [(1, 10, 1)], ["query_id", "neighbor_id", "rank"])
        sem = spark.createDataFrame(
            [(1, 11, 1)], ["query_id", "neighbor_id", "rank"])
        got = {r["neighbor_id"]: r["rrf_score"] for r in rrf_fuse(
            [lex, sem], weights=[2.0, 0.5]).collect()}
        assert got[10] == round(2.0 / 61, 6)
        assert got[11] == round(0.5 / 61, 6)
        with _pytest.raises(ValueError, match="one per list"):
            rrf_fuse([lex, sem], weights=[1.0])
