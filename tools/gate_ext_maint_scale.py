"""Semantic gate: does maintenance="external" keep the MILESTONE batch
wall flat?

Round-8 measured the inline retrain milestone as a ~60 s stall inside
the triggering micro-batch at the x200 index (SCALE.md "codebook
retrain"); round 9 ships :func:`gate_maintain` so the ingest path never
pays it.  This harness puts a number behind the decoupling::

    PYTHONPATH=/root/repo python tools/gate_ext_maint_scale.py

Protocol (x200 accepted state, same construction as
tools/gate_retrain_scale.py: 400k-vector index, 64-centroid codebook,
``__trainmeta`` seeded with the x1 row count so the gate sees "trained
at x1, now 200x bigger" — a due milestone):

1. ``inline_milestone`` — the round-8 path: the probe batch that
   crosses the milestone pays probe + retrain inside ``foreachBatch``.
2. ``external_milestone`` — the SAME probe batch through
   ``maintenance="external"``: batch wall must be ~the x200 fixed-probe
   cost (no stall), with accept/reject decisions IDENTICAL to cell 1
   (both probe the pre-retrain codebook; inline retrains post-batch).
3. ``gate_maintain`` — the out-of-band retrain against cell 2's state,
   timed separately: this is the cost that moved off the ingest path.
4. ``steady_after_external`` — the fixed probe against the externally
   retrained state: must be back at x1-level, proving the external
   path delivers the same probe-cost reset as inline.

Each probe cell runs twice against its own copy of the state; recall is
asserted everywhere (250/250 planted copies rejected).
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
    build_spark,
    semantic_probe,
    semantic_state,
)


def probe_once(spark, cat, src, work, retrain_at=None, external=False):
    from database_transportor_spark.streaming.dedup_gate import (
        stream_semantic_gate,
    )

    before = cat.read("clean").count()
    ckpt = f"{work}/ckpt_{uuid.uuid4().hex[:8]}"
    kw = {"maintenance": "external"} if external else (
        {"retrain_at": retrain_at} if retrain_at is not None else {})
    t0 = time.perf_counter()
    stream_semantic_gate(spark, src, cat, "clean", "idx", "vec_id",
                         "embedding", "cent", threshold=0.9,
                         checkpoint=ckpt, **kw)
    wall = time.perf_counter() - t0
    accepted = cat.read("clean").count() - before
    return wall, accepted


def seed_meta(spark, cat, n1: int) -> None:
    cat.write(spark.createDataFrame([(int(n1),)], "rows_at_train long"),
              "idx__trainmeta", mode="overwrite")


def main() -> None:
    from database_transportor_spark import ParquetCatalog
    from database_transportor_spark.streaming.dedup_gate import gate_maintain

    spark = build_spark()
    work = tempfile.mkdtemp(prefix="gem_", dir="/dev/shm/sparktmp")
    out = {}
    try:
        cat1 = ParquetCatalog(spark, f"{work}/cat_x1")
        emb = semantic_state(spark, cat1, 1)
        n1 = cat1.read("idx").count()
        src = f"{work}/feed"
        semantic_probe(spark, emb, src)
        base = f"{work}/cat_x200"
        semantic_state(spark, ParquetCatalog(spark, base), 200)

        # ---- cell 1: inline milestone (probe + retrain in-batch) ----
        walls = []
        for i in range(2):
            rdir = f"{work}/run_inline_{i}"
            shutil.copytree(base, rdir)
            rcat = ParquetCatalog(spark, rdir)
            seed_meta(spark, rcat, n1)
            w, acc = probe_once(spark, rcat, src, work, retrain_at=2.0)
            assert PROBE_N - acc == PROBE_N // 2, "inline recall broke"
            walls.append(round(w, 3))
            out["inline_accepted"] = acc
            if i:
                shutil.rmtree(rdir, ignore_errors=True)
        out["inline_milestone_walls"] = walls

        # ---- cell 2+3: external — flat batch, then gate_maintain ----
        walls, mwalls = [], []
        keep = None
        for i in range(2):
            rdir = f"{work}/run_ext_{i}"
            shutil.copytree(base, rdir)
            rcat = ParquetCatalog(spark, rdir)
            seed_meta(spark, rcat, n1)
            w, acc = probe_once(spark, rcat, src, work, external=True)
            assert PROBE_N - acc == PROBE_N // 2, "external recall broke"
            assert acc == out["inline_accepted"], (
                "external decisions diverged from inline")
            walls.append(round(w, 3))
            t0 = time.perf_counter()
            rep = gate_maintain(spark, rcat, "idx", centroid_table="cent",
                                clean_table="clean", retrain_at=2.0)
            mwalls.append(round(time.perf_counter() - t0, 3))
            assert rep["retrained"], rep
            out["k_after"] = rep["k_after"]
            keep = rdir
        out["external_milestone_walls"] = walls
        out["gate_maintain_walls"] = mwalls
        print(json.dumps({k: v for k, v in out.items()}), flush=True)

        # ---- cell 4: steady probe after the external retrain ----
        # strip the milestone probe's accepted rows (same __commit cut
        # as gate_retrain_scale) so the steady probe sees the original
        # corpus under the NEW codebook
        rcat = ParquetCatalog(spark, keep)
        rcat.write_staged(rcat.read("idx").filter("__commit = 'seed:0'"),
                          "idx")
        rcat.commit_staged("idx")
        rcat.write_staged(rcat.read("clean").filter("__commit = 'seed:0'"),
                          "clean")
        rcat.commit_staged("clean")
        walls = []
        for i in range(2):
            rdir = f"{work}/run_steady_{i}"
            shutil.copytree(keep, rdir)
            w, acc = probe_once(spark, ParquetCatalog(spark, rdir), src,
                                work, external=True)
            assert PROBE_N - acc == PROBE_N // 2, "steady recall broke"
            walls.append(round(w, 3))
            shutil.rmtree(rdir, ignore_errors=True)
        out["steady_after_external_walls"] = walls
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
