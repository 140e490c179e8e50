"""Streaming ingest dedup gate: greedy arrival-order near-dup rejection.

The batch dedup family (``operators/dedup.py``) answers "which documents
in this CORPUS duplicate each other"; an ingest pipeline asks the online
question instead: *a batch of new documents just arrived — which are
near-dups of anything already accepted?*  This sink answers it without
ever re-scanning the accepted corpus: it maintains a persisted inverted
shingle-posting index (the incremental sibling of
``_shingle_index_intersections``, reference dedup semantics per
SURVEY §2 extensions), probes each micro-batch against it, and appends
only the survivors — to the clean table AND to the index, so the next
batch dedups against everything accepted so far.

Semantics (deterministic, one pass per batch): a document is REJECTED
iff its exact n-gram Jaccard reaches ``threshold`` against (a) any
previously ACCEPTED document, or (b) any batch-mate with a smaller id —
whether or not that mate itself survives.  (b) is deliberately the
one-pass parallel policy, not sequential greedy ("smaller-id SURVIVING
mate"): true greedy is order-sequential within a batch, while this rule
is a single self-join.  The two coincide exactly when near-dup groups
are CLIQUES at the threshold — the shape near-identical copies actually
produce, and the shape of the test fixtures (verified) — and the
conservative rule never accepts a document greedy would reject.
Arrival order is the contract either way: you cannot reject a document
you already accepted, and the whole run is exactly reproducible by a
batch computation, which is what the oracle does.

Exactness: the probe is the same inverted-index + exact-Jaccard verify
as :func:`~..operators.dedup.ngram_jaccard_pairs` — no LSH banding, so
no recall loss; the trade is that hot shingles keep full posting lists.
At 100 TB apply the same ``max_df`` stop-phrase cap the batch operators
expose (drop postings with df > cap at INDEX time, using a static
stoplist snapshot so batch and index agree on the shingle space).

Plan shape per batch: one shingle pass over the BATCH only (pinned),
one shuffle keyed on 8-byte shingle hashes joining batch postings to
index postings (Catalyst prunes nothing from the index scan here — at
scale, partition the index table by a shard of the hash so the probe
join co-locates), one (batch_id, corpus_id) count shuffle, and map-only
appends.  The accepted corpus's TEXT is never read again — the index
rows (hash, id, size) are the only state.

Exactly-once: checkpointed file stream + commit-marker columns on BOTH
output tables, namespaced by checkpoint (same contract as
``join_view_sink``).  The index is appended FIRST: a crash between the
two appends leaves marker rows in the index but none in the clean
table; the replay excludes current-marker index rows from its probe
(so batch-mates planted by the crashed attempt cannot shadow the
within-batch ordering), recomputes the identical survivor set, skips
the already-present posting append, and lands the clean rows.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import ngram_shingle_hashes
from ..operators.pins import pin_scope
from ..sources.catalog import Catalog

__all__ = ["stream_dedup_gate"]


def stream_dedup_gate(
    spark: SparkSession,
    source_dir: str,
    target: Catalog,
    clean_table: str,
    index_table: str,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    schema=None,
    checkpoint: str | None = None,
) -> int:
    """Stream document files from ``source_dir``; per micro-batch, keep
    only documents that near-dup neither the accepted corpus nor a
    smaller-id batch-mate, appending survivors to
    ``target``/``clean_table`` and their shingle postings to
    ``index_table``.  Returns the number of micro-batches applied
    (replayed batches drain but append nothing).

    Zero-shingle documents (shorter than ``shingle_n`` tokens) have an
    empty posting set, match nothing, and are always accepted.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if schema is None:
        try:
            schema = spark.read.parquet(source_dir).schema
        except Exception as exc:
            raise ValueError(
                "stream_dedup_gate: cannot infer schema from an empty "
                f"source dir {source_dir!r}; pass schema= explicitly"
            ) from exc
    if checkpoint is None:
        ident = hashlib.sha256(
            "\x00".join(
                [os.path.abspath(source_dir), target.identity(),
                 clean_table, index_table]
            ).encode()
        ).hexdigest()[:16]
        checkpoint = os.path.join(
            tempfile.gettempdir(), f"dedup_gate_ckpt_{clean_table}_{ident}"
        )
    ckpt_ns = hashlib.sha256(checkpoint.encode()).hexdigest()[:12]
    applied = {"n": 0}

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        marker = f"{ckpt_ns}:{batch_id}"
        from contextlib import nullcontext

        lock = (
            target.writer_lock(clean_table)
            if hasattr(target, "writer_lock")
            else nullcontext()
        )
        with lock, pin_scope():
            if target.exists(clean_table):
                replayed = (
                    target.read(clean_table)
                    .filter(F.col("__commit") == marker)
                    .limit(1)
                    .isEmpty()
                    is False
                )
                if replayed:
                    return
            batch = batch.dropDuplicates([id_col])
            # batch postings: (__id, __h) + per-doc capped set size __n —
            # pinned: feeds the size agg, the probe join, the self-join,
            # and the survivor posting append
            from ..operators.pins import pin

            posting = pin(
                batch.select(
                    F.col(id_col).alias("__id"),
                    F.explode(
                        ngram_shingle_hashes(text_col, shingle_n)
                    ).alias("__h"),
                )
            )
            sizes = posting.groupBy("__id").agg(F.count("*").alias("__n"))
            posting = posting.join(sizes, "__id")

            jac = lambda i, na, nb: i / (na + nb - i)  # noqa: E731
            rejected_cols = []
            if target.exists(index_table):
                # exclude THIS marker's rows: a crashed prior attempt of
                # this batch must not count as "previously accepted"
                idx = target.read(index_table).filter(
                    F.col("__commit") != marker
                )
                hits = (
                    posting.join(
                        idx.select(
                            "__h",
                            F.col("__id").alias("__cid"),
                            F.col("__n").alias("__cn"),
                        ),
                        "__h",
                    )
                    .groupBy("__id", "__cid")
                    .agg(
                        F.count("*").alias("__i"),
                        F.first("__n").alias("__bn"),
                        F.first("__cn").alias("__cn2"),
                    )
                    .filter(
                        jac(F.col("__i"), F.col("__bn"), F.col("__cn2"))
                        >= threshold
                    )
                    .select("__id")
                    .distinct()
                )
                rejected_cols.append(hits)
            a, b = posting.alias("a"), posting.alias("b")
            mates = (
                a.join(
                    b,
                    (F.col("a.__h") == F.col("b.__h"))
                    & (F.col("b.__id") < F.col("a.__id")),
                )
                .groupBy(
                    F.col("a.__id").alias("__id"),
                    F.col("b.__id").alias("__mate"),
                )
                .agg(
                    F.count("*").alias("__i"),
                    F.first("a.__n").alias("__na"),
                    F.first("b.__n").alias("__nb"),
                )
                .filter(
                    jac(F.col("__i"), F.col("__na"), F.col("__nb"))
                    >= threshold
                )
                .select("__id")
                .distinct()
            )
            rejected_cols.append(mates)
            rejected = rejected_cols[0]
            for r in rejected_cols[1:]:
                rejected = rejected.unionByName(r)
            kept = batch.join(
                rejected.withColumnRenamed("__id", id_col).distinct(),
                id_col,
                "left_anti",
            )

            # index first (see module docstring for the crash contract);
            # skip if a crashed attempt already landed these postings
            index_has_marker = target.exists(index_table) and not (
                target.read(index_table)
                .filter(F.col("__commit") == marker)
                .limit(1)
                .isEmpty()
            )
            if not index_has_marker:
                kept_postings = (
                    posting.join(
                        kept.select(F.col(id_col).alias("__id")), "__id"
                    )
                    .select("__id", "__h", "__n")
                    .withColumn("__commit", F.lit(marker))
                )
                target.write(kept_postings, index_table, mode="append")
            target.write(
                kept.withColumn("__commit", F.lit(marker)),
                clean_table,
                mode="append",
            )
            applied["n"] += 1

    stream = spark.readStream.schema(schema).parquet(source_dir)
    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return applied["n"]
