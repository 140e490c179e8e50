"""Declarative streaming specs: batch parity, stateful stages, guards."""

import uuid

import pytest
from pyspark.sql import functions as F

from database_transportor_spark.spec import SpecError
from database_transportor_spark.streaming.declarative import run_stream_spec

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _batch_events(spark):
    from database_transportor_spark.functions.timecols import normalize_event_time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        return normalize_event_time(spark.read.parquet(EVENTS), "ts").cache()
    finally:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")


def test_stream_spec_window_matches_batch(spark):
    spec = {
        "source": {"path": EVENTS, "ts_col": "ts"},
        "watermark": "2 hours",
        "stages": [
            {"op": "filter", "condition": "value > 0"},
            {"op": "derive", "columns": {"v2": "value * 2"}},
            {"op": "stream_window", "window": "1 hour", "keys": ["event_type"],
             "aggs": ["count(*) AS n_events", "round(sum(v2), 2) AS sum_v2"]},
        ],
        "sink": {"name": f"t_{uuid.uuid4().hex[:8]}"},
    }
    out = run_stream_spec(spark, spec, state_partitions=4)
    b = _batch_events(spark)
    batch = (
        b.filter("value > 0").withColumn("v2", F.expr("value * 2"))
        .groupBy(F.window("ts", "1 hour").alias("__w"), "event_type")
        .agg(F.expr("count(*) AS n_events"), F.expr("round(sum(v2), 2) AS sum_v2"))
        .withColumn("window_start", F.col("__w.start")).drop("__w")
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in batch.collect()}


def test_stream_spec_static_join_and_dedup(spark):
    from database_transportor_spark.sources.catalog import ParquetCatalog

    spec = {
        "source": {"path": EVENTS, "ts_col": "ts"},
        "watermark": "10 hours",
        "stages": [
            {"op": "join", "table": "nation", "broadcast": True,
             "select": ["n_nationkey", "n_name"],
             "on": "user_id % 5 = n_nationkey"},
            {"op": "stream_dedup", "keys": ["n_name"]},
        ],
        "sink": {"name": f"t_{uuid.uuid4().hex[:8]}"},
    }
    out = run_stream_spec(
        spark, spec, catalog=ParquetCatalog(spark, "/root/testdata/sf0.001"),
        state_partitions=4,
    )
    rows = out.collect()
    # one surviving row per joined nation name (which row is arrival-order
    # dependent; the per-key cardinality is the deterministic contract)
    names = [r["n_name"] for r in rows]
    assert len(names) == len(set(names)) > 0
    b = _batch_events(spark)
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    expected_keys = (
        b.join(n, F.expr("user_id % 5 = n_nationkey"))
        .select("n_name").distinct().count()
    )
    assert len(names) == expected_keys


def test_stream_spec_guards(spark):
    base = {"source": {"path": EVENTS, "ts_col": "ts"}}
    with pytest.raises(SpecError, match="source.path"):
        run_stream_spec(spark, {"stages": []})
    with pytest.raises(SpecError, match="watermark"):
        run_stream_spec(spark, {**base, "stages": [
            {"op": "stream_window", "window": "1 hour", "aggs": ["count(*) AS n"]}]})
    with pytest.raises(SpecError, match="not stream-safe"):
        run_stream_spec(spark, {**base, "stages": [{"op": "exact_dedup"}]})
    with pytest.raises(SpecError, match="op"):
        run_stream_spec(spark, {**base, "stages": [{"condition": "1=1"}]})


def test_stream_spec_merge_sink(spark, tmp_path):
    """Declarative CDC ingestion: stateless stages + merge sink; target
    equals the batch computation, and a replayed run is idempotent."""
    import os

    from database_transportor_spark import MemoryCatalog

    src = str(tmp_path / "feed")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], ["id", "seq", "v"]
    ).write.parquet(src, mode="append")
    target = MemoryCatalog()
    spec = {
        "source": {"path": src, "ts_col": "ts"},
        "stages": [
            {"op": "filter", "condition": "id <> 3"},
            {"op": "derive", "columns": {"v": "upper(v)"}},
        ],
        "sink": {"merge": {"table": "t", "keys": ["id"], "seq_col": "seq",
                           "checkpoint": str(tmp_path / "ckpt")}},
    }
    out = run_stream_spec(spark, spec, target=target)
    assert {(r["id"], r["v"]) for r in out.collect()} == {(1, "A"), (2, "B")}
    # a newer change for id=1 merges in; the old row loses
    spark.createDataFrame([(1, 99, "z")], ["id", "seq", "v"]).write.parquet(
        src, mode="append")
    out2 = run_stream_spec(spark, spec, target=target)
    assert {(r["id"], r["v"]) for r in out2.collect()} == {(1, "Z"), (2, "B")}


def test_stream_spec_merge_rejects_stateful_stages(spark, tmp_path):
    from database_transportor_spark import MemoryCatalog

    spec = {
        "source": {"path": str(tmp_path), "ts_col": "ts"},
        "watermark": "1 hour",
        "stages": [{"op": "stream_dedup", "keys": ["id"]}],
        "sink": {"merge": {"table": "t", "keys": ["id"]}},
    }
    with pytest.raises(SpecError, match="stateless"):
        run_stream_spec(spark, spec, target=MemoryCatalog())


def test_stream_spec_sliding_window_matches_batch(spark):
    spec = {
        "source": {"path": EVENTS, "ts_col": "ts"},
        "watermark": "4 hours",
        "stages": [
            {"op": "stream_window", "window": "2 hours", "slide": "1 hour",
             "keys": ["event_type"],
             "aggs": ["count(*) AS n_events"]},
        ],
        "sink": {"name": f"t_{uuid.uuid4().hex[:8]}"},
    }
    out = run_stream_spec(spark, spec, state_partitions=4)
    b = _batch_events(spark)
    batch = (
        b.groupBy(F.window("ts", "2 hours", "1 hour").alias("__w"), "event_type")
        .agg(F.expr("count(*) AS n_events"))
        .withColumn("window_start", F.col("__w.start")).drop("__w")
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in batch.collect()}


def test_join_view_sink_spec(spark, tmp_path):
    """Declarative incremental view: a stream spec with a join_view sink
    appends batch-joined-dim deltas; the view equals the batch join of
    everything streamed so far, and a filter stage applies pre-join."""
    from pyspark.sql import functions as F

    from database_transportor_spark import ParquetCatalog
    from database_transportor_spark.streaming.declarative import (
        run_stream_spec,
    )

    src = str(tmp_path / "facts")
    cat = ParquetCatalog(spark, str(tmp_path / "cat"))
    cat.write(
        spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string"),
        "dim", mode="overwrite",
    )
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10), (2, "2024-01-01 00:00:00", -5),
         (2, "2024-01-01 01:00:00", 20)],
        "k long, ts string, v long",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v") \
        .coalesce(1).write.parquet(src)

    spec = {
        "source": {"path": src, "ts_col": "ts"},
        "stages": [{"op": "filter", "condition": "v > 0"}],
        "sink": {"join_view": {"view": "v", "dim": "dim", "on": ["k"],
                               "checkpoint": str(tmp_path / "ck")}},
    }
    out = run_stream_spec(spark, spec, target=cat)
    got = sorted((r["k"], r["v"], r["name"]) for r in out.collect())
    assert got == [(1, 10, "one"), (2, 20, "two")]  # v=-5 filtered pre-join


def test_join_view_sink_rejects_stateful_stages(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from database_transportor_spark import ParquetCatalog
    from database_transportor_spark.spec import SpecError
    from database_transportor_spark.streaming.declarative import (
        run_stream_spec,
    )

    src = str(tmp_path / "facts")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "k long, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts")) \
        .write.parquet(src)
    cat = ParquetCatalog(spark, str(tmp_path / "cat"))
    spec = {
        "source": {"path": src},
        "watermark": "1 hour",
        "stages": [{"op": "stream_window", "window": "1 hour",
                    "keys": ["k"], "aggs": {"n": "count(*)"}}],
        "sink": {"join_view": {"view": "v", "dim": "dim", "on": ["k"]}},
    }
    with pytest.raises(SpecError, match="stateless"):
        run_stream_spec(spark, spec, target=cat)


def test_dedup_gate_sink_spec(spark, tmp_path):
    """Declarative ingest dedup: a stream spec with a dedup_gate sink
    rejects near-dups of already-accepted docs; a filter stage applies
    before gating (filtered-out docs are neither kept nor indexed)."""
    from pyspark.sql import functions as F

    from database_transportor_spark import ParquetCatalog
    from database_transportor_spark.streaming.declarative import (
        run_stream_spec,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    src = str(tmp_path / "docs")
    cat = ParquetCatalog(spark, str(tmp_path / "cat"))
    spark.createDataFrame(
        [(1, base, 1), (2, base + " ok", 1), (3, "entirely different "
          "content about shuffle partitions", 1), (4, base, 0)],
        "doc_id long, text string, keep long",
    ).coalesce(1).write.parquet(src)

    spec = {
        "source": {"path": src, "ts_col": "ts"},
        "stages": [{"op": "filter", "condition": "keep = 1"}],
        "sink": {"dedup_gate": {"clean": "clean", "index": "idx",
                                "id": "doc_id", "text": "text",
                                "checkpoint": str(tmp_path / "ck")}},
    }
    out = run_stream_spec(spark, spec, target=cat)
    kept = sorted(r["doc_id"] for r in out.collect())
    # 2 near-dups 1 (rejected); 4 is filtered OUT before gating — it
    # neither survives nor rejects anyone
    assert kept == [1, 3]
    idx_ids = {r["__id"] for r in
               cat.read("idx").select("__id").distinct().collect()}
    assert idx_ids == {1, 3}


def test_semantic_gate_sink_spec_and_validation(spark, tmp_path):
    import pytest

    from database_transportor_spark import ParquetCatalog
    from database_transportor_spark.spec import SpecError
    from database_transportor_spark.streaming.declarative import (
        run_stream_spec,
    )

    src = str(tmp_path / "vecs")
    cat = ParquetCatalog(spark, str(tmp_path / "cat"))
    cat.write(
        spark.createDataFrame(
            [(0, [1.0, 0.0]), (100, [0.0, 1.0])], "cid long, ce array<double>"
        ),
        "cent", mode="overwrite",
    )
    spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.99, 0.05]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.parquet(src)

    # missing required key -> actionable SpecError
    bad = {
        "source": {"path": src},
        "sink": {"semantic_gate": {"clean": "c", "index": "i",
                                   "id": "vec_id", "vec": "embedding"}},
    }
    with pytest.raises(SpecError, match="centroids"):
        run_stream_spec(spark, bad, target=cat)

    spec = {
        "source": {"path": src},
        "sink": {"semantic_gate": {"clean": "clean", "index": "idx",
                                   "id": "vec_id", "vec": "embedding",
                                   "centroids": "cent", "threshold": 0.9,
                                   "checkpoint": str(tmp_path / "ck")}},
    }
    out = run_stream_spec(spark, spec, target=cat)
    assert sorted(r["vec_id"] for r in out.collect()) == [1, 3]


def test_bm25_index_sink_spec(spark, tmp_path):
    """Declarative streaming retrieval index: a bm25_index sink appends
    each batch's postings; a filter stage applies before indexing, and
    required keys are validated."""
    from database_transportor_spark import ParquetCatalog
    from database_transportor_spark.streaming.declarative import (
        run_stream_spec,
    )

    src = str(tmp_path / "bdocs")
    cat = ParquetCatalog(spark, str(tmp_path / "bcat"))
    spark.createDataFrame(
        [(1, "apple banana", 1), (2, "cherry fig", 1),
         (3, "dropped words", 0)],
        "doc_id long, text string, keep long",
    ).coalesce(1).write.parquet(src)
    spec = {
        "source": {"path": src, "ts_col": "ts"},
        "stages": [{"op": "filter", "condition": "keep = 1"}],
        "sink": {"bm25_index": {"index": "idx", "id": "doc_id",
                                "text": "text",
                                "checkpoint": str(tmp_path / "bck")}},
    }
    out = run_stream_spec(spark, spec, target=cat)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["token"])
    assert by_doc == {1: {"apple", "banana"}, 2: {"cherry", "fig"}}
    with pytest.raises(SpecError, match="bm25_index sink needs"):
        run_stream_spec(spark, {
            "source": {"path": src},
            "sink": {"bm25_index": {"index": "idx"}},
        }, target=cat)
    with pytest.raises(SpecError, match="target="):
        run_stream_spec(spark, {
            "source": {"path": src},
            "sink": {"bm25_index": {"index": "idx", "id": "doc_id",
                                    "text": "text"}},
        })


def test_gate_sink_spec_passes_operational_knobs(spark, tmp_path):
    """The round-8/9 gate knobs pass through the declarative sinks:
    maintenance='external' refuses inline milestone params the same way
    the imperative surface does, and nprobe/compact_files reach the
    semantic gate."""
    from database_transportor_spark import ParquetCatalog

    src = str(tmp_path / "gdocs")
    cat = ParquetCatalog(spark, str(tmp_path / "gcat"))
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", 1)],
        "doc_id long, text string, keep long",
    ).coalesce(1).write.parquet(src)
    base = {
        "source": {"path": src},
        "sink": {"dedup_gate": {"clean": "clean", "index": "idx",
                                "id": "doc_id", "text": "text",
                                "maintenance": "external",
                                "compact_files": 4,
                                "checkpoint": str(tmp_path / "gck")}},
    }
    with pytest.raises(ValueError, match="gate_maintain"):
        run_stream_spec(spark, base, target=cat)
    del base["sink"]["dedup_gate"]["compact_files"]
    out = run_stream_spec(spark, base, target=cat)
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_bm25_index_sink_spec_with_stats(spark, tmp_path):
    """Round 10: `stats` on the declarative bm25_index sink keeps a
    bm25_index_stats table fresh in the same committed batch; the served
    stats= path passes its staleness guard."""
    from database_transportor_spark import ParquetCatalog
    from database_transportor_spark.operators.text import (
        bm25_index_stats, bm25_topk_indexed,
    )
    from database_transportor_spark.streaming.declarative import (
        run_stream_spec,
    )

    src = str(tmp_path / "sdocs")
    cat = ParquetCatalog(spark, str(tmp_path / "scat"))
    spark.createDataFrame(
        [(1, "apple banana", 1), (2, "cherry fig apple", 1)],
        "doc_id long, text string, keep long",
    ).coalesce(1).write.parquet(src)
    out = run_stream_spec(spark, {
        "source": {"path": src},
        "sink": {"bm25_index": {"index": "idx", "id": "doc_id",
                                "text": "text", "stats": "idx_stats",
                                "checkpoint": str(tmp_path / "sck")}},
    }, target=cat)
    want = sorted(map(tuple, bm25_index_stats(
        out.drop("__commit")).collect()))
    assert sorted(map(tuple, cat.read("idx_stats").collect())) == want
    q = spark.createDataFrame([(1, "apple")], ["query_id", "query"])
    got = bm25_topk_indexed(cat.read("idx"), q,
                            stats=cat.read("idx_stats")).count()
    assert got == 2
