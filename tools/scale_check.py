"""Scale-linearity harness: measure how headline operators scale from
sf0.1 (x1) to x2/x5/x10 (and beyond) synthetic blow-ups.

Usage::

    PYTHONPATH=/root/repo python tools/scale_check.py [x2 x5 x10 ...]

``SPARK_GRAFT_SCALE_QUERIES=q1,q2`` restricts the timed slice — used for
the deep x20/x50 sweep of the pair generators, whose 100 TB story rests
on the posting-cap/banding math holding past the fixed-overhead floor.

Builds scaled copies of the sf0.1 fixtures under ``.scale_data/x{K}`` (one
time; ~100 MB for x10), then times a representative query slice at each
scale and prints one JSON line per scale plus a final summary with the
x10/x1 time ratio per query (1.0 = perfectly amortized overhead, 10.0 =
linear work at fixed parallelism; super-linear output-bound ops are noted).

Scaling rules (so the WORKLOAD scales, not just the bytes):

- ``documents``: K replicas; every token in replica k>0 gets a ``_k``
  suffix, so replicas share no shingles — the near-dup graph is K disjoint
  copies of the original (edge count exactly K×, density constant).  A
  naive text copy would instead make every doc a 10-way near-dup and blow
  the pair output up quadratically — a different workload, not a scale-up.
- fact tables (``lineitem``, ``orders``, ``customer``, ``part``,
  ``supplier``, ``events``, ``embeddings``): K replicas with all keys
  offset by k·(max_key+1) — join fan-in per key stays constant.
- dimensions (``region``, ``nation``): fixed, as in TPC-H — dims don't
  grow with corpus size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        ".scale_data")

# representative slice: scan+filter pushdown, multi-map DAG with joins,
# window agg, shuffle-heavy near-dup, aggregation dedup, zero-shuffle split,
# window packing
QUERIES = [
    "filter_conditions",
    "flagship",
    "events_window",
    "ngram_jaccard",
    "minhash_lsh",
    "dedup_exact",
    "split_assign",
    "pack_sequences",
    "asof_join",
    "decontaminate",
    "dedup_clusters",
    "corpus_shuffle",
    "upsample_domains",
    "quantize_embeddings",
    "events_stream_join",
    "merge_upsert",
    "cdc_apply",
    "funnel",
    "cohort_retention",
    "sessionize",
    "scd2",
    "build_vocab",
    "validate_rules",
    "diff_tables",
    "chunk_docs",
    "lm_score",
    "rolling_agg",
    "transitions",
    "pivot_events",
    "growth",
    "mad_gate",
    "rank_norm",
    "events_cube",
    "pagerank",
    "boilerplate",
    "weighted_sample",
    "pricing_summary",
    "top_unshipped",
    "revenue_by_nation",
    "heavy_hitters",
    "gap_fill",
    "sample_group",
    "winsorize",
    "zorder",
    "semantic_clusters",
    "rollup_distinct",
    "k_anonymity",
    "fuzzy_parts",
    "psi_drift",
    "top_paths",
    "ewma",
    "attribution",
    "skew_report",
    "key_discovery",
    "quarantine",
    "pii_scan",
    "evolve_merge",
    "rollup_refresh",
    "corr_matrix",
    "image_decode",
    "audio_decode",
    "returned_items",
    "small_qty_revenue",
    "supplier_part_counts",
    "order_priority_counts",
    "audio_frames",
    "triangle_count",
    "random_projection",
    "bpe_tokens",
    "video_frames",
    "dedup_lines",
    "temperature_mix",
    "char_entropy",
    "customer_distribution",
    "promo_revenue_share",
    "disjunctive_revenue",
    "idle_rich_customers",
    "graph_degrees",
    "grouped_percentiles",
    "image_resize",
    "top_supplier",
    "cheapest_supplier",
    "nation_trade_volume",
    "market_share",
    "product_profit",
    "late_priority_counts",
    "large_volume_customers",
    "important_parts",
    "promotable_suppliers",
    "sole_late_supplier",
    "forecast_revenue",
    "dedup_paragraphs",
    "kmeans_clusters",
    "containment_pairs",
    "bigram_lm",
    "stream_enrich",
    "source_divergence",
    "contained_dedup",
    "item_affinity",
    "ref_integrity",
    "inverted_index",
    "cusum",
    "rolling_active",
    "ab_test",
]

_subset = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
if _subset:
    QUERIES = [q.strip() for q in _subset.split(",") if q.strip()]

KEY_OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}
COPY_ONLY = ["region", "nation"]


def build_scale(spark, k: int) -> str:
    from pyspark.sql import functions as F

    out_dir = os.path.join(OUT_ROOT, f"x{k}")
    done_flag = os.path.join(out_dir, "_DONE")
    if os.path.exists(done_flag):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for t in COPY_ONLY:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    for t, keys in KEY_OFFSETS.items():
        if t == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        offsets = {c: df.agg(F.max(F.col(c))).first()[0] + 1 for c in keys}
        parts = []
        for rep in range(k):
            p = df
            for c, off in offsets.items():
                p = p.withColumn(c, F.col(c) + F.lit(rep * off))
            if t == "documents" and rep > 0:
                # replica-salt every token: replicas share no shingles
                p = p.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", r"$1_" + str(rep))
                )
            if t == "embeddings" and rep > 0:
                # cyclic-shift each replica's vector by `rep` positions:
                # intra-replica cosines are EXACTLY preserved (both sides
                # shift), cross-replica cosines decorrelate — without this,
                # replicas are identical copies and every near-dup group
                # gains k² duplicate pairs (a quadratic workload, not a
                # scale-up; same reason documents are token-salted)
                # modular shift: rep >= dim would hand slice() a negative
                # length (hit at x100 on 64-dim vectors)
                p = p.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {rep} % size(embedding) + 1, "
                        f"size(embedding) - {rep} % size(embedding)), "
                        f"slice(embedding, 1, {rep} % size(embedding)))"
                    ),
                )
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    open(done_flag, "w").close()
    return out_dir


def main(scales: list[int]) -> None:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # spill experiments: raise partition count past core count so each
    # sort run fits memory (SPARK_GRAFT_SHUFFLE_PARTITIONS=128), and/or
    # enable AQE skew-join splitting (SPARK_GRAFT_SKEWJOIN=1)
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    skew = os.environ.get("SPARK_GRAFT_SKEWJOIN", "false")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dbt-spark-scale-check")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled",
                "true" if skew in ("1", "true") else "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    # untimed warmup at the smallest scale: JVM/codegen/Arrow spin-up and
    # parquet footer caching otherwise land entirely on the first scale's
    # numbers and corrupt every ratio
    warm_dir = SF_DIR if scales[0] == 1 else build_scale(spark, scales[0])
    for name in QUERIES:
        qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    for k in scales:
        sf_dir = SF_DIR if k == 1 else build_scale(spark, k)
        timings: dict[str, float] = {}
        for name in QUERIES:
            # drop persisted intermediates: Spark's cache manager matches by
            # analyzed plan, so a later identical query would silently reuse
            # the warmup's (or previous scale's) cached data
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        results[f"x{k}"] = timings
        print(json.dumps({"scale": k, "queries": timings}), flush=True)

    if len(scales) > 1:
        base = results[f"x{scales[0]}"]
        top = results[f"x{scales[-1]}"]
        ratio = {q: round(top[q] / max(base[q], 1e-9), 2) for q in QUERIES}
        print(json.dumps({"summary": f"x{scales[-1]}/x{scales[0]} time ratio",
                          "ratios": ratio}), flush=True)
    spark.stop()


if __name__ == "__main__":
    args = [int(a.lstrip("x")) for a in sys.argv[1:]] or [1, 2, 5, 10]
    main(args)
