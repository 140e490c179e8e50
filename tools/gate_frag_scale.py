"""Streaming ingest gates: probe cost vs INDEX FRAGMENTATION.

`tools/gate_probe_scale.py` measured probe wall vs accepted-index SIZE
against a cleanly-written index (one file per shard).  A real gate
appends one file set per micro-batch: after B batches each shard
directory holds ~B small files, and the probe's index scan pays file
OPEN/footers, not bytes — the one operational axis of the gates' 100 TB
claim without a number (round-7 verdict, next-round #1).  This harness
measures exactly that::

    PYTHONPATH=/root/repo python tools/gate_frag_scale.py

For each files-per-shard level F the SAME index rows (the x10
gate_probe_scale seed state, 16 shards) are laid out as F files per
shard directory — byte-for-byte the layout B=F micro-batch appends
leave behind (each append clusters by shard, so it lands ≤1 file per
shard) — and the fixed 500-doc probe batch from gate_probe_scale runs
through the REAL gate twice against its own copy.  The shard count is
adopted from the ``__shardmeta`` table (the round-8 adoption path, so
the run also exercises it).  After the worst level, ``compact_table``
rewrites the index under its partition spec and the probe re-runs: the
recovery number `compact_files` buys.

Output: one JSON line per (gate, F) with wall seconds, total data
files, accept/reject counts (recall canary), plus a final line with the
compaction wall and the post-compaction probe.
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gate_probe_scale as gps  # noqa: E402  (shared state builders)

SHARDS = 16
LEVELS = {"lexical": [1, 64, 256, 1024], "semantic": [1, 256]}
MULT = 10  # x10 accepted state: big enough that bytes aren't trivial


def count_files(root: str) -> int:
    n = 0
    for dirpath, _, files in os.walk(root):
        for f in files:
            if not f.startswith(("_", ".")):
                n += 1
    return n


def fragment(spark, cat, kind: str, files_per_shard: int) -> None:
    """Rewrite the flat seed index into the Hive-sharded layout with
    ``files_per_shard`` files per partition dir: round-robin
    repartition(F) then partitionBy — every task holds rows of every
    shard, so each dir gets exactly F files, the layout F clustered
    micro-batch appends produce."""
    from pyspark.sql import functions as F

    idx = cat.read("idx")
    part_col = "__shard" if kind == "lexical" else "__bucket"
    if kind == "lexical":
        idx = idx.withColumn(
            "__shard", F.pmod(F.col("__h"), F.lit(SHARDS)))
    out = f"{cat.root}/idx_sharded.parquet"
    (idx.repartition(files_per_shard)
        .write.mode("overwrite").partitionBy(part_col).parquet(out))
    shutil.rmtree(cat.path("idx"))
    os.replace(out, cat.path("idx"))
    if kind == "lexical":
        cat.write(spark.createDataFrame([(SHARDS,)], "shards int"),
                  "idx__shardmeta", mode="overwrite")


def run_probe(spark, kind: str, work: str, cat, src: str,
              compact_files: int | None = None) -> dict:
    from database_transportor_spark.streaming.dedup_gate import (
        stream_dedup_gate,
        stream_semantic_gate,
    )

    before = cat.read("clean").count()
    ckpt = f"{work}/ckpt_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    if kind == "lexical":
        # index_shards omitted: adopted from __shardmeta (round-8 path)
        stream_dedup_gate(spark, src, cat, "clean", "idx", "doc_id",
                          "text", shingle_n=3, threshold=0.5,
                          checkpoint=ckpt, compact_files=compact_files)
    else:
        stream_semantic_gate(spark, src, cat, "clean", "idx", "vec_id",
                             "embedding", "cent", threshold=0.9,
                             checkpoint=ckpt,
                             compact_files=compact_files)
    wall = time.perf_counter() - t0
    accepted = cat.read("clean").count() - before
    return {"wall": round(wall, 3), "accepted": accepted,
            "rejected": gps.PROBE_N - accepted}


def main() -> None:
    from database_transportor_spark import ParquetCatalog
    from database_transportor_spark.operators.maintenance import (
        compact_table,
    )

    spark = gps.build_spark()
    for kind in ("lexical", "semantic"):
        # seed state once per gate; re-laid-out per fragmentation level
        seed = tempfile.mkdtemp(prefix=f"gfs_{kind}_seed_",
                                dir="/dev/shm/sparktmp")
        cat0 = ParquetCatalog(spark, f"{seed}/cat")
        src = f"{seed}/feed"
        if kind == "lexical":
            base = gps.lexical_state(spark, cat0, MULT)
            gps.lexical_probe(spark, base, src)
        else:
            base = gps.semantic_state(spark, cat0, MULT)
            gps.semantic_probe(spark, base, src)
        idx_rows = cat0.read("idx").count()
        for fps in LEVELS[kind]:
            work = tempfile.mkdtemp(prefix=f"gfs_{kind}_{fps}_",
                                    dir="/dev/shm/sparktmp")
            try:
                shutil.copytree(f"{seed}/cat", f"{work}/cat")
                cat = ParquetCatalog(spark, f"{work}/cat")
                fragment(spark, cat, kind, fps)
                n_files = count_files(cat.path("idx"))
                runs = []
                for i in range(2):
                    rdir = f"{work}/cat_run{i}"
                    shutil.copytree(f"{work}/cat", rdir)
                    runs.append(run_probe(spark, kind, work,
                                          ParquetCatalog(spark, rdir), src))
                rec = {"gate": kind, "files_per_shard": fps,
                       "index_files": n_files, "index_rows": idx_rows,
                       "walls": [r["wall"] for r in runs],
                       "accepted_run1": runs[0]["accepted"],
                       "rejected_run1": runs[0]["rejected"]}
                if fps == LEVELS[kind][-1]:
                    # the lever: compact the worst layout, probe again
                    rdir = f"{work}/cat_compact"
                    shutil.copytree(f"{work}/cat", rdir)
                    ccat = ParquetCatalog(spark, rdir)
                    ccat.partition_spec["idx"] = (
                        ["__shard"] if kind == "lexical" else ["__bucket"])
                    t0 = time.perf_counter()
                    compact_table(ccat, "idx")
                    rec["compact_wall"] = round(time.perf_counter() - t0, 3)
                    rec["files_after_compact"] = count_files(ccat.path("idx"))
                    rec["probe_after_compact"] = run_probe(
                        spark, kind, work, ccat, src)["wall"]
                print(json.dumps(rec), flush=True)
            finally:
                shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(seed, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
