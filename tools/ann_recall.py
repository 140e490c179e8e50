"""ANN recall-at-scale harness: measure recall@k of the IVF family
(`ivf_topk`, and the `ann_join` configuration = same operator with a
large query table) against the exact brute-force baseline
(`cosine_topk`) on the synthetic x2..x100 embedding blow-ups that
`tools/scale_check.py` builds.

Usage::

    PYTHONPATH=/root/repo python tools/ann_recall.py [x1 x20 x50]

Sweeps ``nprobe`` (1, 2, 4, 8) for both centroid methods (the bounded
deterministic ``stride`` rule the oracle queries use, and trained
``kmeans`` centroids) and prints one JSON line per (scale, method,
nprobe) with recall@k + wall time, then a summary table.  Recall is
computed over a fixed 32-probe set: |approx ∩ exact| / (|probes|·k).

Why this exists: wall-time scaling of the IVF family was already in
SCALE.md, but a bucketed index can be fast AND useless — recall is the
other axis of the 100 TB claim.  The scaled corpora are adversarial in
a useful way: each replica is a cyclic shift of the base corpus (intra-
replica cosines preserved, cross-replica decorrelated), so the true
neighbor structure stays as dense as production embeddings while the
corpus grows 50×.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(os.environ.get("SPARK_GRAFT_ANN_K", "10"))
N_PROBES = int(os.environ.get("SPARK_GRAFT_ANN_QUERIES", "32"))
NPROBE_SWEEP = tuple(
    int(x) for x in os.environ.get(
        "SPARK_GRAFT_ANN_NPROBES", "1,2,4,8"
    ).split(",")
)
METHODS = tuple(
    os.environ.get("SPARK_GRAFT_ANN_METHODS", "stride,kmeans").split(",")
)


def main(scales: list[int]) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from scale_check import build_scale

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dbt-spark-ann-recall")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from database_transportor_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    rows_out = []
    for k_scale in scales:
        sf_dir = SF_DIR if k_scale == 1 else build_scale(spark, k_scale)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_corpus = emb.count()
        # deterministic spread of probes across the id range (hits every
        # replica of the scaled corpus, not just replica 0)
        step = max(1, n_corpus // N_PROBES)
        probes = (
            emb.filter(F.col("vec_id") % step == 0)
            .orderBy("vec_id")
            .limit(N_PROBES)
            .cache()
        )
        nq = probes.count()

        t0 = time.perf_counter()
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(emb, probes, k=K).collect()
        }
        brute_s = round(time.perf_counter() - t0, 3)

        for method in METHODS:
            for nprobe in NPROBE_SWEEP:
                t0 = time.perf_counter()
                approx = {
                    (r["query_id"], r["neighbor_id"])
                    for r in ivf_topk(
                        emb, probes, k=K, stride=37, nprobe=nprobe,
                        method=method, n_centroids=64,
                    ).collect()
                }
                ivf_s = round(time.perf_counter() - t0, 3)
                recall = round(len(approx & exact) / max(len(exact), 1), 4)
                rec = {
                    "scale": k_scale, "n_corpus": n_corpus,
                    "n_queries": nq, "k": K, "method": method,
                    "nprobe": nprobe, "recall_at_k": recall,
                    "ivf_sec": ivf_s, "brute_sec": brute_s,
                }
                rows_out.append(rec)
                print(json.dumps(rec), flush=True)
        probes.unpersist()

    # summary: recall curve per scale/method
    print("\n# recall@%d summary (rows=scale, cols=nprobe)" % K)
    for method in METHODS:
        print(f"# method={method}")
        hdr = "# scale    " + "".join(f"np={n:<8d}" for n in NPROBE_SWEEP)
        print(hdr)
        for k_scale in scales:
            vals = [
                r["recall_at_k"] for r in rows_out
                if r["scale"] == k_scale and r["method"] == method
            ]
            print(
                f"# x{k_scale:<7d} "
                + "".join(f"{v:<11.4f}" for v in vals)
            )
    spark.stop()


if __name__ == "__main__":
    args = [int(a.lstrip("x")) for a in sys.argv[1:]] or [1, 20, 50]
    main(args)
