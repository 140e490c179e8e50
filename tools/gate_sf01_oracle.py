"""sf0.1 semantic-gate oracle with ALL round-8/9 features engaged.

The gates' correctness evidence at sf0.1 (round 6) predates
``compact_files`` / ``retrain_at`` / ``nprobe`` / external maintenance;
this harness re-establishes it with all of them on at once::

    PYTHONPATH=/root/repo python tools/gate_sf01_oracle.py

Protocol: the 2 000 sf0.1 embeddings stream through
``stream_semantic_gate`` in four 500-vector batches with
``partition_index=True``, ``compact_files=64``, ``nprobe=2``, and
``retrain_at=2.0`` (trainmeta baselines after batch 1, so the milestone
fires MID-RUN around batch 2 — later batches probe the retrained
codebook).  Then a fixed probe batch arrives: 250 exact copies of
accepted vectors drawn from BOTH sides of the retrain boundary (must
all be rejected — exact copies are bucket-stable under any codebook)
plus 250 fresh deterministic vectors.

Checks recorded:

1. **recall** — 250/250 planted copies rejected, fresh vectors'
   acceptance count reported;
2. **oracle hash** — the whole run executes TWICE in private catalogs;
   the sha256 over the sorted accepted id set must be identical (every
   step is deterministic by construction: stride sampling by id hash,
   Lloyd from strided init, tie-broken bucket assignment);
3. **milestone engagement** — the codebook grew (k > 64) and
   ``__trainmeta`` advanced mid-run, and the index file count stayed
   under the compaction bound.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gate_probe_scale import SF_DIR, build_spark  # noqa: E402


def one_run(spark, work: str, tag: str) -> dict:
    from pyspark.sql import functions as F

    from database_transportor_spark import ParquetCatalog
    from database_transportor_spark.streaming.dedup_gate import (
        _count_data_files, stream_semantic_gate,
    )

    src = f"{work}/feed_{tag}"
    ckpt = f"{work}/ckpt_{tag}"
    cat = ParquetCatalog(spark, f"{work}/cat_{tag}")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding")
    cat.write(
        emb.filter(F.col("vec_id") % 37 == 0).orderBy("vec_id").limit(64)
        .select(F.col("vec_id").alias("cid"),
                F.col("embedding").alias("ce")),
        "cent", mode="overwrite",
    )

    def gate():
        return stream_semantic_gate(
            spark, src, cat, "clean", "idx", "vec_id", "embedding",
            "cent", threshold=0.9, checkpoint=ckpt,
            partition_index=True, compact_files=64, nprobe=2,
            retrain_at=2.0, retrain_target_rows=4)

    t0 = time.perf_counter()
    k_mid = None
    for b in range(4):
        emb.filter(F.col("vec_id") % 4 == b).write.mode("append").parquet(src)
        gate()
        if b == 1:
            k_mid = cat.read("cent").count()
    ingest_wall = round(time.perf_counter() - t0, 3)
    accepted = [r["vec_id"] for r in cat.read("clean").collect()]
    # planted copies straddle the retrain boundary: every 8th accepted id
    pool = sorted(accepted)
    planted = pool[:: max(1, len(pool) // 250)][:250]
    dup = emb.filter(F.col("vec_id").isin(planted)).select(
        (F.col("vec_id") + F.lit(900_000_000)).alias("vec_id"), "embedding")
    dim = 64
    fresh = spark.range(250).select(
        (F.col("id") + F.lit(910_000_000)).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001))
                .cast("double") / 1000.0 - 1.0
            ).cast("float"),
        ).alias("embedding"),
    )
    dup.unionByName(fresh).write.mode("append").parquet(src)
    t0 = time.perf_counter()
    gate()
    probe_wall = round(time.perf_counter() - t0, 3)
    final = sorted(r["vec_id"] for r in cat.read("clean").collect())
    rejected_copies = sum(1 for p in planted
                          if p + 900_000_000 not in final)
    h = hashlib.sha256(",".join(map(str, final)).encode()).hexdigest()[:16]
    return {
        "ingest_wall": ingest_wall, "probe_wall": probe_wall,
        "accepted_corpus": len(pool), "planted": len(planted),
        "rejected_copies": rejected_copies,
        "fresh_accepted": sum(1 for v in final if v >= 910_000_000),
        "k_start": 64, "k_mid_run": int(k_mid),
        "k_final": cat.read("cent").count(),
        "trainmeta_rows": int(cat.read("idx__trainmeta")
                              .first()["rows_at_train"]),
        "index_files": _count_data_files(cat, "idx"),
        "hash": h,
    }


def main() -> None:
    spark = build_spark()
    work = tempfile.mkdtemp(prefix=f"gso_{uuid.uuid4().hex[:6]}_",
                            dir="/dev/shm/sparktmp")
    try:
        a = one_run(spark, work, "a")
        print(json.dumps({"run": "a", **a}), flush=True)
        b = one_run(spark, work, "b")
        print(json.dumps({"run": "b", **b}), flush=True)
        assert a["rejected_copies"] == a["planted"], "recall broke (a)"
        assert b["rejected_copies"] == b["planted"], "recall broke (b)"
        assert a["hash"] == b["hash"], "determinism oracle broke"
        assert a["k_mid_run"] > 64, "retrain did not fire mid-run"
        # compaction restores <=1 file per __bucket= dir; without it the
        # 5 per-batch appends would leave a multiple of the bucket count
        assert a["index_files"] <= a["k_final"], "compaction not engaged"
        print(json.dumps({"oracle": "OK", "hash": a["hash"]}), flush=True)
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
