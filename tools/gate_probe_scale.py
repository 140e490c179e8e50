"""Streaming ingest gates: probe cost vs ACCEPTED-INDEX size.

The round-6 SCALE rows measured `stream_dedup_gate` / `stream_semantic_gate`
growing the BATCH (x1/x2/x10 data through a 2-batch sink); the open online
question is the other axis: a fixed probe batch arriving after the gate has
already accepted 10x / 50x more documents.  This harness measures exactly
that — the single 100 TB claim the repo had no number behind (round-6
verdict, next-round #2)::

    PYTHONPATH=/root/repo python tools/gate_probe_scale.py [x1 x10 x50]

For each scale S the accepted state is CONSTRUCTED directly (the same rows
the gate itself appends: shingle postings ``(__id, __h, __n, __commit)`` /
vector rows ``(__id, __v, __bucket, __commit)``), with replica shingle
hashes salted per copy so the posting-key distribution stays realistic
instead of creating artificial hot shingles.  A fixed probe batch — half
exact copies of indexed documents (must be rejected), half fresh content
(must be accepted) — is then streamed through the REAL gate (fresh
checkpoint, real foreachBatch, real appends) and timed.  Each (gate, S)
cell runs twice against ITS OWN COPY of the seed state (a run's
appends must not grow the index the other run probes, and both runs
must accept/reject the same docs), so the pair is two true repeat
samples; run 1 still carries session first-touch/codegen.

Output: one JSON line per (gate, scale) with wall seconds, index rows,
rejected/accepted counts — the reject/accept split doubles as a
correctness canary (a probe that stops rejecting its planted copies as
the index grows would be a recall bug, not a speedup).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = {"x1": 1, "x10": 10, "x50": 50, "x200": 200}
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBE_N = 500  # fixed probe batch: PROBE_N/2 planted dups + PROBE_N/2 fresh


def build_spark():
    from pyspark.sql import SparkSession

    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("gate-probe-scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.ui.enabled", "false")
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.driver.extraJavaOptions",
                "-Djava.io.tmpdir=/dev/shm/sparktmp")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def lexical_state(spark, cat, mult: int):
    """Construct the accepted state for the lexical gate at ``mult``×
    the fixture corpus: replica 0 is the real postings; replicas >0 salt
    the shingle hash (distinct shingle space — they contribute scan/join
    volume, as 100 TB of mostly-unrelated accepted content would, without
    manufacturing hot keys)."""
    from pyspark.sql import functions as F

    from database_transportor_spark.operators.dedup import (
        ngram_shingle_hashes,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    posting = docs.select(
        F.col("doc_id").alias("__id"),
        F.explode(ngram_shingle_hashes("text", 3)).alias("__h"),
    )
    posting = posting.join(
        posting.groupBy("__id").agg(F.count("*").alias("__n")), "__id"
    )
    parts = []
    for r in range(mult):
        h = F.col("__h") if r == 0 else F.xxhash64(F.col("__h"), F.lit(r))
        parts.append(
            posting.select(
                (F.col("__id") + F.lit(r * 10_000_000)).alias("__id"),
                h.alias("__h"),
                "__n",
            )
        )
    idx = parts[0]
    for p in parts[1:]:
        idx = idx.unionByName(p)
    cat.write(idx.withColumn("__commit", F.lit("seed:0")), "idx",
              mode="overwrite")
    clean = docs.select(
        F.col("doc_id"), F.col("text"), F.lit("seed:0").alias("__commit")
    )
    cat.write(clean, "clean", mode="overwrite")
    return docs


def lexical_probe(spark, docs, src: str):
    """PROBE_N/2 exact copies of indexed docs (reject) + PROBE_N/2
    reversed-text docs (accept)."""
    from pyspark.sql import functions as F

    base = docs.orderBy("doc_id").limit(PROBE_N // 2)
    dup = base.select(
        (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"), "text"
    )
    fresh = base.select(
        (F.col("doc_id") + F.lit(910_000_000)).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"),
    )
    dup.unionByName(fresh).coalesce(1).write.mode("overwrite").parquet(src)


def semantic_state(spark, cat, mult: int):
    """Accepted state for the semantic gate: replica vectors reuse the
    fixture embeddings (same bucket distribution per copy — exactly what
    a grown accepted corpus does to an IVF index: buckets deepen)."""
    import numpy as np
    from pyspark.sql import functions as F

    from database_transportor_spark.operators.similarity import (
        _bucket_assigner,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cent = (
        emb.filter(F.col("vec_id") % 7 == 0).orderBy("vec_id").limit(64)
        .select(F.col("vec_id").alias("cid"),
                F.col("embedding").alias("ce"))
    )
    cat.write(cent, "cent", mode="overwrite")
    crows = sorted((r["cid"], r["ce"]) for r in cent.collect())
    ids = np.array([c for c, _ in crows], dtype=np.int64)
    cmat = np.stack([np.asarray(v, dtype=np.float64) for _, v in crows])
    norms = np.linalg.norm(cmat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    cmat = cmat / norms
    assigned = emb.select(
        F.col("vec_id").alias("__id"),
        F.col("embedding").alias("__v"),
        _bucket_assigner(ids, cmat, 1)(F.col("embedding")).getItem(0)
        .alias("__bucket"),
    )
    parts = [
        assigned.select(
            (F.col("__id") + F.lit(r * 10_000_000)).alias("__id"),
            "__v", "__bucket",
        )
        for r in range(mult)
    ]
    idx = parts[0]
    for p in parts[1:]:
        idx = idx.unionByName(p)
    cat.write(idx.withColumn("__commit", F.lit("seed:0")), "idx",
              mode="overwrite")
    cat.write(
        emb.withColumn("__commit", F.lit("seed:0")), "clean",
        mode="overwrite",
    )
    return emb


def semantic_probe(spark, emb, src: str):
    """PROBE_N/2 exact copies (cosine 1.0 vs their indexed source —
    reject) + PROBE_N/2 deterministic pseudo-random unit vectors
    (accept at threshold 0.9)."""
    from pyspark.sql import functions as F

    base = emb.orderBy("vec_id").limit(PROBE_N // 2)
    dup = base.select(
        (F.col("vec_id") + F.lit(900_000_000)).alias("vec_id"), "embedding"
    )
    dim = len(base.first()["embedding"])
    fresh = base.select(
        (F.col("vec_id") + F.lit(910_000_000)).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(2001))
                .cast("double") / 1000.0 - 1.0
            ).cast("float"),
        ).alias("embedding"),
    )
    dup.unionByName(fresh).coalesce(1).write.mode("overwrite").parquet(src)


def run_gate(spark, kind: str, work: str, cat, src: str) -> dict:
    from database_transportor_spark.streaming.dedup_gate import (
        stream_dedup_gate,
        stream_semantic_gate,
    )

    before = cat.read("clean").count()
    ckpt = f"{work}/ckpt_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    if kind == "lexical":
        stream_dedup_gate(spark, src, cat, "clean", "idx", "doc_id",
                          "text", shingle_n=3, threshold=0.5,
                          checkpoint=ckpt)
    else:
        stream_semantic_gate(spark, src, cat, "clean", "idx", "vec_id",
                             "embedding", "cent", threshold=0.9,
                             checkpoint=ckpt)
    wall = time.perf_counter() - t0
    accepted = cat.read("clean").count() - before
    return {"wall": round(wall, 3), "accepted": accepted,
            "rejected": PROBE_N - accepted}


def main(scales: list[str]) -> None:
    from database_transportor_spark import ParquetCatalog

    spark = build_spark()
    for kind in ("lexical", "semantic"):
        for s in scales:
            mult = SCALES[s]
            work = tempfile.mkdtemp(prefix=f"gps_{kind}_{s}_",
                                    dir="/dev/shm/sparktmp")
            try:
                cat = ParquetCatalog(spark, f"{work}/cat")
                src = f"{work}/feed"
                if kind == "lexical":
                    base = lexical_state(spark, cat, mult)
                    lexical_probe(spark, base, src)
                else:
                    base = semantic_state(spark, cat, mult)
                    semantic_probe(spark, base, src)
                idx_rows = cat.read("idx").count()
                runs = []
                for i in range(2):
                    # each run probes a COPY of the seed state: run 1's
                    # accepted appends must not change run 2's workload
                    rdir = f"{work}/cat_run{i}"
                    shutil.copytree(f"{work}/cat", rdir)
                    from database_transportor_spark import ParquetCatalog

                    runs.append(run_gate(spark, kind, work,
                                         ParquetCatalog(spark, rdir), src))
                print(json.dumps({
                    "gate": kind, "scale": s, "index_rows": idx_rows,
                    "probe_docs": PROBE_N,
                    "walls": [r["wall"] for r in runs],
                    "accepted_run1": runs[0]["accepted"],
                    "rejected_run1": runs[0]["rejected"],
                }), flush=True)
            finally:
                shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:] or list(SCALES))
