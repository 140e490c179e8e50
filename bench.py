"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full execution,
no driver collect — the same shape a cluster write would have).

Variance-aware: every query is timed $SPARK_GRAFT_BENCH_RUNS times
(default 3) and reported as the MEDIAN; the full per-query samples and
spread (max-min) land in BENCH_local.json, plus a delta table against the
previous BENCH_local.json that classifies each round-over-round change as
signal or noise BY THE MEASURED SPREAD — so a 0.2 s wobble on a query
whose own samples span 0.3 s is never misread as a regression.  The
classification rule: a delta is ``signal`` only if it exceeds all of
(a) 15% of the previous median, (b) 3× this round's spread, (c) 0.1 s.

Session-robust confirmation (round 9 — replaces the round-8
fresh-session re-measure, which was ANTI-SIGNAL on this host: isolated
medians landed far from suite medians — lsh_index 17.04 s isolated vs
4.03 s suite — because a fresh JVM re-pays first-touch/JIT per query;
SCALE.md's own rule says cross-session deltas under ~2× need an
INTERLEAVED in-session A/B, the protocol that refuted the round-7
video_frames attribution).  Every signal-classed delta now gets exactly
that: additional interleaved runs of the flagged query alternating with
a FIXED reference workload ruler, all inside the SAME session that
produced the suite numbers.  ``confirmed: true/false`` is then derived
from (a) the A/B median of the flagged query, (b) the A/B spread — the
signal rule's 3× bar means a confirmation's spread is always smaller
than the delta it judges — and (c) the previous round's median scaled
by the reference ruler's drift (``host_factor = ref_now / ref_prev``),
which cancels session/host-level effects out of the cross-round
comparison.  The ruler is defined IN THIS FILE and never changes, so
its drift measures the host, not the code.  The artifact records
``ab_median``/``ab_spread``/``host_factor`` per confirmation and
``confirm_ref_median`` for the next round.
``SPARK_GRAFT_BENCH_CONFIRM=0`` disables the pass.  ``--isolated``
remains as a manual subcommand (fresh-session numbers are still useful
evidence — just not as the confirm referee).

Round 10 — the artifact defends itself (VERDICT r9: the r9 artifact
shipped a phantom 1.39× suite regression from a degraded host, with its
largest absolute deltas spread-classed "noise" and never adjudicated):

- **Pre-suite host-health gate**: the ruler runs BEFORE the suite and is
  compared to the previous artifact's ``confirm_ref_median``; outside
  the calibrated 0.80–1.25× band the artifact records
  ``host_degraded: true`` (and
  ``SPARK_GRAFT_BENCH_REQUIRE_HEALTHY=1`` aborts with exit 2 instead of
  publishing poisoned numbers).
- **Large deltas are A/B'd regardless of class**: any
  ``|delta| > max(1 s, 50% of prev)`` joins the interleaved confirm pass
  even when spread-classed noise (``ab_reason: "large_delta"``), cap 12
  total by ``|delta|`` — "noise, unexamined" never ships again.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: a delta is SIGNAL only if it exceeds all three bars vs the previous
#: median: relative, spread-scaled, absolute
def _is_signal(delta: float, prev: float, spread: float) -> bool:
    return abs(delta) > 0.15 * prev and abs(delta) > 3 * spread and abs(delta) > 0.1


#: round 10 — a delta this LARGE gets the interleaved A/B regardless of
#: its noise/signal class: the r9 artifact shipped quantile_bins +9.4 s
#: as spread-classed "noise, unexamined" on a degraded host; "noise" is
#: a statistical call, not evidence, once the absolute move is this big
def _needs_ab(delta: float, prev: float) -> bool:
    return abs(delta) > max(1.0, 0.5 * prev)


def _make_session(cpus: str):
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dbt-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.ui.enabled", "false")
        # ContextCleaner reclaims dead shuffle files / broadcast blocks
        # only when a driver GC runs; the default periodic-GC interval
        # (30 min) exceeds the whole suite, so debris accumulated until
        # the registry TAIL read 2-3x its isolated time (27 s vs 7 s on
        # stream_semantic_gate, measured).  A 2-minute periodic GC keeps
        # the cleaner draining; a forced System.gc() every 20 queries
        # was measured WORSE (full-GC jitter landing inside timed runs).
        .config("spark.cleaner.periodicGC.interval", "2min")
    )
    # streaming queries write temp checkpoints under java.io.tmpdir; pointing
    # it at tmpfs halves cold streaming-query latency (state + offset logs
    # are scratch here — production sets a durable checkpointLocation)
    shm = "/dev/shm/sparktmp"
    try:
        os.makedirs(shm, exist_ok=True)
        builder = builder.config(
            "spark.driver.extraJavaOptions", f"-Djava.io.tmpdir={shm}"
        )
    except OSError:
        pass
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # Steady-state warmup: first-job JVM/codegen spin-up and Python-UDF
    # worker fork otherwise land on whichever query happens to run first
    # and dominate its number.  One trivial JVM job + one trivial Arrow
    # batch warm both paths; no fixture data is touched.
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(x):
        return x * 1.0

    spark.range(1000).select(F.sum(_warm(F.col("id").cast("double")))).collect()
    # higher-order-function / window / join interpreter+JIT paths
    w = spark.range(2000).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.transform(
            F.sequence(F.lit(1), F.lit(5)), lambda i: F.xxhash64(i + F.col("id"))
        ).alias("arr"),
    )
    from pyspark.sql import Window

    ranked = w.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    small = spark.range(7).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    ranked.join(F.broadcast(small), "k").select(
        F.max(
            F.aggregate("arr", F.lit(0).cast("long"), lambda a, b: a.bitwiseXOR(b))
        )
    ).collect()
    return spark


def _ref_query(spark, sf_dir: str):
    """The confirm pass's reference RULER: a fixed scan + shuffle + agg
    workload over the fixture lineitem.  NEVER change this function —
    its round-over-round drift is the measure of session/host effects
    (GC phase, JIT state, filesystem cache), and that only works if the
    code under the ruler is identical every round."""
    from pyspark.sql import functions as F

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        l.groupBy(
            "l_returnflag", "l_linestatus",
            F.pmod(F.col("l_orderkey"), F.lit(512)).alias("b"),
        )
        .agg(
            F.sum("l_quantity").alias("q"),
            F.avg("l_extendedprice").alias("p"),
            F.count("*").alias("n"),
        )
    )


def _run_once(spark, sf_dir: str, fn) -> float:
    from database_transportor_spark.operators.pins import release_pins

    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    release_pins()
    return dt


def _measure(spark, sf_dir: str, names, runs: int) -> dict[str, list[float]]:
    """Median-of-runs wall per query; each run is a full noop write with
    a pin drain after (so run N+1 repeats the FULL work instead of
    reading run N's cache)."""
    import __spark_entry__ as e

    registry = e.queries()
    samples: dict[str, list[float]] = {}
    for name in names:
        samples[name] = [
            round(_run_once(spark, sf_dir, registry[name]), 3)
            for _ in range(runs)
        ]
    return samples


def _isolated_main(names) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    spark = _make_session(cpus)
    samples = _measure(spark, sf_dir, names, runs)
    spark.stop()
    print(json.dumps({
        "queries": {n: round(statistics.median(s), 3)
                    for n, s in samples.items()},
        "spread": {n: round(max(s) - min(s), 3) for n, s in samples.items()},
        "samples": samples,
    }))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    confirm = os.environ.get("SPARK_GRAFT_BENCH_CONFIRM", "1") != "0"
    here = os.path.dirname(os.path.abspath(__file__))
    artifact = os.path.join(here, "BENCH_local.json")

    # previous round's medians, read BEFORE overwriting the artifact;
    # only comparable if the previous run used the SAME scale factor (a
    # local sf0.001 iteration must not be "compared" against the driver's
    # sf0.1 numbers)
    prev_queries: dict[str, float] = {}
    prev_sf = None
    prev_protocol = None
    prev_ref = None
    try:
        with open(artifact) as f:
            prev = json.load(f)
        prev_queries = prev.get("queries", {})
        prev_sf = prev.get("sf")
        prev_protocol = prev.get("protocol")
        prev_ref = prev.get("confirm_ref_median")
    except (OSError, ValueError):
        pass

    spark = _make_session(cpus)

    import __spark_entry__ as e

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # the ruler reads the fixture lineitem, so its medians are only
    # comparable across sessions at the SAME scale factor — a local
    # sf0.001 iteration must not "fail" the health gate against the
    # driver's sf0.1 ruler
    _sf_now = float(sf) if sf.replace(".", "").isdigit() else sf
    if prev_sf != _sf_now:
        prev_ref = None
    # ---- host-health gate (round 10) ----
    # The ruler runs BEFORE the suite: if the fixed reference workload
    # already sits far off the previous session's recording, the host is
    # degraded and every suite number this session produces would be
    # poisoned (the r9 artifact shipped a phantom 1.39x suite regression
    # exactly this way).  The artifact records the pre-suite ruler and a
    # host_degraded verdict; SPARK_GRAFT_BENCH_REQUIRE_HEALTHY=1 aborts
    # instead of publishing (exit 2) for runs whose only purpose is a
    # trustworthy artifact.
    # one DISCARDED ruler run first: the previous session's
    # confirm_ref_median was measured deep into a warm session, while
    # this one runs seconds after startup — without the throwaway, the
    # fixture's first-touch (file cache, codegen) lands in the gate
    # samples and reads as phantom host degradation
    _run_once(spark, sf_dir, _ref_query)
    ruler_pre_samples = [
        round(_run_once(spark, sf_dir, _ref_query), 3) for _ in range(runs)
    ]
    ruler_pre = round(statistics.median(ruler_pre_samples), 3)
    host_degraded = None
    if prev_ref:
        drift = ruler_pre / prev_ref
        # band calibrated to the ruler's MEASURED same-box session
        # spread: three same-day round-10 sessions recorded medians
        # 0.405-0.462 s (±13%), so 0.85-1.15 would misfire on ordinary
        # session phase; the r9-class poisoning this gate exists for
        # showed 1.70x (0.573 vs 0.338) and stays well outside 1.25
        host_degraded = not (0.80 <= drift <= 1.25)
        if host_degraded:
            print(
                f"# HOST DEGRADED: pre-suite ruler {ruler_pre:.3f}s is "
                f"{drift:.2f}x the previous session's {prev_ref:.3f}s "
                "(healthy band 0.80-1.25x) — suite numbers this session "
                "are not comparable round-over-round",
                file=sys.stderr,
            )
            if os.environ.get("SPARK_GRAFT_BENCH_REQUIRE_HEALTHY") == "1":
                spark.stop()
                print(json.dumps({
                    "metric": "headline_queries_total", "value": None,
                    "unit": "sec", "error": "host_degraded",
                    "ruler_pre": ruler_pre, "prev_ref": prev_ref,
                }))
                sys.exit(2)
    # consecutive samples: every query callable is self-contained
    # (streaming variants use fresh UUID sinks), so each run repeats
    # the full end-to-end work
    samples = _measure(spark, sf_dir, list(e.queries()), runs)
    # the reference ruler is measured EVERY round (cheap) so the next
    # round always has a same-session host baseline to normalize against;
    # the pre-suite gate samples count toward the session median too
    ref_samples = ruler_pre_samples + [
        round(_run_once(spark, sf_dir, _ref_query), 3) for _ in range(runs)
    ]

    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    spread = {n: round(max(s) - min(s), 3) for n, s in samples.items()}

    protocol = (
        "isolated: per-query pin drain + median of runs; "
        "2min periodic driver GC keeps the ContextCleaner "
        "draining shuffle/broadcast debris across the suite"
    )
    # round-over-round deltas, classified signal-or-noise by the spread —
    # only against a previous artifact recorded at the SAME scale factor
    # AND the SAME protocol (the round-6 dedup_best "+1.96 s signal" was a
    # shared-vs-isolated protocol comparison, attributed in SCALE.md, not
    # a regression; never let that class of misread recur)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    if prev_sf != sf_val or (prev_protocol is not None
                             and prev_protocol != protocol):
        prev_queries = {}
    delta: dict[str, dict] = {}
    for n, med in timings.items():
        if n not in prev_queries:
            continue
        prev = prev_queries[n]
        d = round(med - prev, 3)
        delta[n] = {
            "prev": prev,
            "median": med,
            "delta": d,
            "spread": spread[n],
            "class": "signal" if _is_signal(d, prev, spread[n]) else "noise",
        }
    signals = {n: v for n, v in delta.items() if v["class"] == "signal"}

    # ---- interleaved in-session A/B confirmation (round 9; widened
    # round 10) ----
    # Every signal-classed delta PLUS every |delta| > max(1 s, 50%)
    # regardless of class (cap 12 by |delta|) gets `runs` more samples
    # ALTERNATING with the reference ruler in THIS session; confirmed
    # iff the A/B median still passes the signal rule against the
    # previous median scaled by the ruler's cross-round drift.  The
    # round-10 widening is the r9 lesson: a +9.4 s move whose own
    # spread classes it "noise" must still be adjudicated, not shipped
    # unexamined.
    need_ab = {
        n: ("signal" if v["class"] == "signal" else "large_delta")
        for n, v in delta.items()
        if v["class"] == "signal" or _needs_ab(v["delta"], v["prev"])
    }
    registry = e.queries()
    if confirm and need_ab:
        to_confirm = sorted(
            need_ab, key=lambda n: -abs(delta[n]["delta"]))[:12]
        if len(need_ab) > len(to_confirm):
            print(f"# confirming top {len(to_confirm)} of {len(need_ab)} "
                  "flagged deltas (cap 12)", file=sys.stderr)
        ab: dict[str, list[float]] = {n: [] for n in to_confirm}
        for _ in range(runs):
            ref_samples.append(
                round(_run_once(spark, sf_dir, _ref_query), 3))
            for n in to_confirm:
                ab[n].append(
                    round(_run_once(spark, sf_dir, registry[n]), 3))
        ref_med = round(statistics.median(ref_samples), 3)
        host = round(ref_med / prev_ref, 3) if prev_ref else 1.0
        for n in to_confirm:
            v = delta[n]
            med_ab = round(statistics.median(ab[n]), 3)
            spread_ab = round(max(ab[n]) - min(ab[n]), 3)
            adj_prev = round(v["prev"] * host, 3)
            v["ab_median"] = med_ab
            v["ab_spread"] = spread_ab
            v["host_factor"] = host
            v["ab_reason"] = need_ab[n]
            v["confirmed"] = _is_signal(
                round(med_ab - adj_prev, 3), adj_prev, spread_ab)
    spark.stop()

    # human-readable delta table → stderr (stdout stays the one JSON line)
    if delta:
        abd = [v for v in delta.values() if "confirmed" in v]
        n_conf = sum(1 for v in abd if v["confirmed"] is True)
        n_large = sum(1 for v in abd if v.get("ab_reason") == "large_delta")
        print(
            f"# round-over-round deltas ({len(signals)} signal / "
            f"{len(delta) - len(signals)} noise; {len(abd)} A/B-adjudicated"
            f" [{n_conf} confirmed, {n_large} large-delta tier]; "
            f"runs={runs})",
            file=sys.stderr,
        )
        for n, v in sorted(
            delta.items(), key=lambda kv: -abs(kv[1]["delta"])
        )[:15]:
            conf = ""
            if "confirmed" in v:
                conf = (" CONFIRMED" if v["confirmed"]
                        else " UNCONFIRMED" if v["confirmed"] is False
                        else " UNVERIFIED")
                if "ab_median" in v:
                    conf += (f" (A/B {v['ab_median']:.3f}"
                             f"±{v['ab_spread']:.3f}"
                             f", host×{v['host_factor']})")
            print(
                f"#   {n:28s} {v['prev']:7.3f} -> {v['median']:7.3f} "
                f"(d={v['delta']:+.3f}, spread={v['spread']:.3f}) "
                f"{v['class'].upper()}{conf}",
                file=sys.stderr,
            )

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "runs": runs,
        # Protocol note for round-over-round reads: since the round-6
        # bench, every run drains operator cache pins after its terminal
        # action (release_pins above), so each query pays its OWN cache
        # builds.  Pre-round-6 artifacts let later queries ride caches
        # built by earlier ones (ngram_jaccard timed 0.38 s only because
        # the dedup family had already built its posting caches) — so
        # totals across that boundary measure different protocols, not a
        # code regression.
        "protocol": protocol,
        # the fixed _ref_query ruler's median this session — next round's
        # confirm pass normalizes cross-session host drift with it
        "confirm_ref_median": round(statistics.median(ref_samples), 3),
        # round 10: pre-suite host-health gate — the ruler measured
        # BEFORE any suite query, vs the previous session's ruler;
        # host_degraded=true marks every number in this artifact as
        # not-comparable (null = no previous ruler to compare against)
        "ruler_pre": ruler_pre,
        "host_degraded": host_degraded,
    }
    print(json.dumps(payload))
    # The driver's capture keeps only the TAIL of stdout, which truncates
    # the first ~26 per-query timings out of BENCH_r{N}.json — persist the
    # full artifact in-repo (with samples/spread/deltas) so round-over-round
    # comparisons never depend on the driver's window (VERDICT r3 #7).
    try:
        with open(artifact, "w") as f:
            json.dump(
                {**payload, "samples": samples, "spread": spread,
                 "delta_vs_prev": delta},
                f, indent=1, sort_keys=True,
            )
            f.write("\n")
    except OSError:
        pass


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--isolated":
        _isolated_main(sys.argv[2:])
    else:
        main()
