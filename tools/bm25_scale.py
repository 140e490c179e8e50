"""BM25 indexed-serve scaling + incremental maintenance cost.

Round 8 shipped the posting-table serve path (`bm25_index` /
`bm25_topk_indexed`); round 9 adds `bm25_index_update` (append /
delete / upsert by posting-table surgery).  This harness measures the
two claims behind them at sf0.1::

    PYTHONPATH=/root/repo python tools/bm25_scale.py

1. **Serve wall vs index size** (x1 = the 5k-doc fixture corpus, x10 =
   ten salted replicas sharing the vocabulary — df and N grow 10×, the
   realistic growth shape): a fixed 20-query batch served from the
   STORED posting table, 2 runs per cell.  The serve path's work is
   posting/vocab-sized re-aggregation plus a Σdf(query-terms)-bounded
   match join, so wall should grow far slower than 10×.
2. **Incremental update vs rebuild at x10**: a 1% corpus delta (500
   adds + 500 deletes) applied via `bm25_index_update` (one
   posting-sized anti-join + tokenizing ONLY the delta) vs a full
   `bm25_index` rebuild of the mutated corpus — both written back to
   parquet (the real maintenance job shape).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gate_probe_scale import SF_DIR, build_spark  # noqa: E402


def replicate(docs, mult: int):
    from pyspark.sql import functions as F

    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            "text",
        )
        for r in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from database_transportor_spark.operators.text import (
        bm25_index, bm25_index_update, bm25_topk_indexed,
    )

    spark = build_spark()
    work = tempfile.mkdtemp(prefix="bm25s_", dir="/dev/shm/sparktmp")
    out = {}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    # 20 fixed queries from mid-frequency fixture terms
    queries = spark.createDataFrame(
        [(i, q) for i, q in enumerate(
            ["spark shuffle", "parquet files", "training data",
             "document corpus", "stream state", "quality filter",
             "token count", "join strategy", "partition key",
             "memory spill", "broadcast small", "skew salt",
             "window agg", "schema merge", "text dedup",
             "vector index", "hash bucket", "scan prune",
             "codegen stage", "arrow batch"])],
        ["query_id", "query"])

    from database_transportor_spark.operators.text import bm25_index_stats

    for label, mult in (("x1", 1), ("x10", 10)):
        corpus = docs if mult == 1 else replicate(docs, mult)
        path = f"{work}/idx_{label}"
        t0 = time.perf_counter()
        bm25_index(corpus).write.mode("overwrite").parquet(path)
        out[f"build_{label}_s"] = round(time.perf_counter() - t0, 3)
        idx = spark.read.parquet(path)
        out[f"postings_{label}"] = idx.count()
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            bm25_topk_indexed(idx, queries, k=10).write.format(
                "noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[f"serve_{label}_walls"] = walls
        # stats-served mode (round 9): stats materialized once, every
        # batch then reads only query-term postings
        t0 = time.perf_counter()
        bm25_index_stats(idx).write.mode("overwrite").parquet(
            f"{work}/stats_{label}")
        out[f"stats_build_{label}_s"] = round(time.perf_counter() - t0, 3)
        st = spark.read.parquet(f"{work}/stats_{label}")
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            bm25_topk_indexed(idx, queries, k=10, stats=st).write.format(
                "noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[f"serve_stats_{label}_walls"] = walls

    # ---- round 10: turnkey token-range layout (bm25_index_layout) ----
    # the round-9 file-skip measurement assumed a hand-sorted layout;
    # this is the shipped helper doing the same staged rewrite, plus the
    # count of files the 20-query term set actually lands in
    from database_transportor_spark import ParquetCatalog
    from database_transportor_spark.operators.text import (
        bm25_index_layout, tokens,
    )

    cat = ParquetCatalog(spark, f"{work}/cat")
    cat.write(spark.read.parquet(f"{work}/idx_x10"), "idx",
              mode="overwrite")
    t0 = time.perf_counter()
    out["layout_files"] = bm25_index_layout(cat, "idx", files=16)
    out["layout_rewrite_s"] = round(time.perf_counter() - t0, 3)
    laid = cat.read("idx")
    qtok = [r["t"] for r in queries.select(
        F.explode(tokens("query")).alias("t")).distinct().collect()]
    out["layout_files_touched"] = (
        laid.filter(F.col("token").isin(qtok))
        .select(F.input_file_name()).distinct().count()
    )
    # per-QUERY touch count (the serving-time unit of work): each fixed
    # query has 2 terms, so a token-range layout should land it in <= 2
    # files; report the worst query
    per_q = []
    for row in queries.collect():
        ts = [t for t in row["query"].lower().split() if t]
        per_q.append(
            laid.filter(F.col("token").isin(ts))
            .select(F.input_file_name()).distinct().count())
    out["layout_files_touched_per_query_max"] = max(per_q)
    st10 = spark.read.parquet(f"{work}/stats_x10")
    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        bm25_topk_indexed(laid, queries, k=10, stats=st10).write.format(
            "noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    out["serve_stats_layout_walls"] = walls

    # ---- 1% delta at x10: update vs rebuild ----
    corpus10 = replicate(docs, 10)
    # deterministic delta sets: an unordered limit() re-executes
    # differently across the update job and the rebuild job, which
    # would make the parity canary compare different row sets
    adds = docs.filter("doc_id % 10 = 3").select(
        (F.col("doc_id") + F.lit(990_000_000)).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"))
    del_ids = corpus10.filter("doc_id % 2000 = 7").select("doc_id")
    idx10 = spark.read.parquet(f"{work}/idx_x10")
    t0 = time.perf_counter()
    bm25_index_update(idx10, add_docs=adds, delete_ids=del_ids).write.mode(
        "overwrite").parquet(f"{work}/idx_upd")
    out["update_1pct_s"] = round(time.perf_counter() - t0, 3)
    mutated = corpus10.join(del_ids, "doc_id", "left_anti").unionByName(adds)
    t0 = time.perf_counter()
    bm25_index(mutated).write.mode("overwrite").parquet(f"{work}/idx_reb")
    out["rebuild_s"] = round(time.perf_counter() - t0, 3)
    # parity canary: same served results from both
    a = sorted(map(tuple, bm25_topk_indexed(
        spark.read.parquet(f"{work}/idx_upd"), queries, k=10).collect()))
    b = sorted(map(tuple, bm25_topk_indexed(
        spark.read.parquet(f"{work}/idx_reb"), queries, k=10).collect()))
    out["update_equals_rebuild"] = a == b
    print(json.dumps(out), flush=True)
    assert out["update_equals_rebuild"], "update/rebuild parity broke"
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
