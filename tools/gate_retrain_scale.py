"""Semantic gate: does codebook RETRAIN actually flatten the x200 probe?

The round-7 grown-index sweep (tools/gate_probe_scale.py, SCALE.md)
measured the semantic gate's steady probe at 3.2x for a 200x index and
attributed it to bucket densening under a FIXED 64-centroid codebook;
round 8 shipped `stream_semantic_gate(retrain_at=...)` as the lever.
This harness puts a number behind the lever::

    PYTHONPATH=/root/repo python tools/gate_retrain_scale.py

Protocol: construct the x200 accepted state exactly as gate_probe_scale
does (same replica rule, same 64-seed codebook), then measure three
cells with the SAME fixed 500-doc probe (250 planted copies that must
be rejected + 250 fresh vectors that must be accepted), two runs per
cell, each run against its own copy of the state:

1. ``x1 fixed``      — in-session baseline (64 centroids, 2k rows);
2. ``x200 fixed``    — the round-7 cost model (64 centroids, 400k rows);
3. ``x200 retrained``— the x200 state after ONE retrain milestone fires
   through the real gate (`__trainmeta` seeded with the x1 row count, so
   the gate sees "trained at x1, now 200x bigger" — the honest history),
   then the steady probe against the re-bucketed index + new codebook.

The retrain milestone's own wall (sample + Lloyd + one distributed
re-bucket pass + staged swaps) is reported separately: it is a
once-per-growth-decade cost, not a per-batch cost.  Recall is asserted
at every cell (250/250 planted copies rejected) — a retrain that
loses planted-copy recall is a bug, not a speedup.
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

from tools.gate_probe_scale import (  # noqa: E402
    PROBE_N,
    SF_DIR,
    build_spark,
    semantic_probe,
    semantic_state,
)


def probe_once(spark, cat, src, work, retrain_at=None):
    from database_transportor_spark.streaming.dedup_gate import (
        stream_semantic_gate,
    )

    before = cat.read("clean").count()
    ckpt = f"{work}/ckpt_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    stream_semantic_gate(spark, src, cat, "clean", "idx", "vec_id",
                         "embedding", "cent", threshold=0.9,
                         checkpoint=ckpt, retrain_at=retrain_at)
    wall = time.perf_counter() - t0
    accepted = cat.read("clean").count() - before
    return wall, accepted


def cell(spark, base_cat_dir, src, work, label, retrain_at=None):
    from database_transportor_spark import ParquetCatalog

    walls, accepted = [], None
    for i in range(2):
        rdir = f"{work}/run_{label}_{i}"
        shutil.copytree(base_cat_dir, rdir)
        w, a = probe_once(spark, ParquetCatalog(spark, rdir), src, work,
                          retrain_at=retrain_at)
        walls.append(round(w, 3))
        accepted = a
        shutil.rmtree(rdir, ignore_errors=True)
    rej = PROBE_N - accepted
    print(json.dumps({"cell": label, "walls": walls,
                      "accepted": accepted, "rejected": rej}), flush=True)
    assert rej == PROBE_N // 2, f"{label}: recall canary broke ({rej})"
    return walls


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from database_transportor_spark import ParquetCatalog

    spark = build_spark()
    work = tempfile.mkdtemp(prefix="grs_", dir="/dev/shm/sparktmp")
    try:
        # ---- x1 fixed (in-session reference) ----
        cat1 = ParquetCatalog(spark, f"{work}/cat_x1")
        emb = semantic_state(spark, cat1, 1)
        src = f"{work}/feed"
        semantic_probe(spark, emb, src)
        cell(spark, f"{work}/cat_x1", src, work, "x1_fixed")

        # ---- x200 fixed (the round-7 cost model) ----
        cat200 = ParquetCatalog(spark, f"{work}/cat_x200")
        semantic_state(spark, cat200, 200)
        n200 = cat200.read("idx").count()
        n1 = cat1.read("idx").count()
        print(json.dumps({"index_rows": {"x1": n1, "x200": n200}}),
              flush=True)
        cell(spark, f"{work}/cat_x200", src, work, "x200_fixed")

        # ---- retrain milestone: seed trainmeta with the x1 history,
        # run the gate once with retrain_at=2 (200x growth >> 2x), and
        # keep the retrained state for the steady cells ----
        rdir = f"{work}/cat_x200_rt"
        shutil.copytree(f"{work}/cat_x200", rdir)
        rcat = ParquetCatalog(spark, rdir)
        rcat.write(spark.createDataFrame([(int(n1),)], "rows_at_train long"),
                   "idx__trainmeta", mode="overwrite")
        t0 = time.perf_counter()
        _, acc = probe_once(spark, rcat, src, work, retrain_at=2.0)
        retrain_wall = time.perf_counter() - t0
        k_new = rcat.read("cent").count()
        print(json.dumps({
            "cell": "retrain_milestone",
            "wall_probe_plus_retrain": round(retrain_wall, 3),
            "k_old": 64, "k_new": int(k_new),
            "accepted": acc, "rejected": PROBE_N - acc,
        }), flush=True)
        assert PROBE_N - acc == PROBE_N // 2, "milestone run recall broke"
        # strip the milestone run's accepted probe rows so the steady
        # cells probe the SAME corpus as the fixed cells — only the
        # codebook/bucket layout differs; without this the fresh probe
        # vectors would match their own indexed copies and the recall
        # canary would (correctly) scream.  Keyed on __commit, NOT id:
        # at x200 the replica id space (r*10M) overlaps the probe id
        # space (9e8), so an id cut would delete replicas 90+
        rcat.write_staged(
            rcat.read("idx").filter("__commit = 'seed:0'"), "idx")
        rcat.commit_staged("idx")
        rcat.write_staged(
            rcat.read("clean").filter("__commit = 'seed:0'"), "clean")
        rcat.commit_staged("clean")
        assert rcat.read("idx").count() == n200
        cell(spark, rdir, src, work, "x200_retrained", retrain_at=2.0)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
