"""Streaming BM25 posting-index sink: continuous retrieval-index
maintenance via ``foreachBatch``.

Batch-side, :func:`~..operators.text.bm25_index` tokenizes a corpus
once and :func:`~..operators.text.bm25_topk_indexed` serves every later
query from the stored posting table; this is the always-on sibling for
an ingest pipeline (typically BEHIND a dedup gate): each arriving
micro-batch of documents is tokenized — the only corpus-pass work, paid
exactly once per document ever — and its posting rows are APPENDED to
the index table.  Because the serve path derives N / avgdl / df from
the posting table itself, an appended index IS a fresh index: queries
served mid-stream always reflect exactly the documents indexed so far,
with no stats side-channel to go stale (the same property
:func:`~..operators.text.bm25_index_update` exploits for batch deltas;
use that, out-of-band, for deletes when the dedup pipeline retires
documents).

Semantics: FIRST ARRIVAL WINS — a document id already present in the
index is skipped (one posting-sized anti-join per batch), and within a
batch duplicate ids collapse to the lexicographically-smallest text
(deterministic, so replays and the oracle agree).  Re-crawled documents
that must replace their text are an out-of-band
``bm25_index_update(add_docs=...)`` upsert, not an ingest concern.

Exactly-once: checkpointed file stream + the checkpoint-namespaced
``__commit`` marker column (same contract as ``join_view_sink``) — a
crash between the append and the checkpoint commit replays the batch,
sees its marker, and skips, so postings never double-count.

Plan shape per batch: one tokenize/aggregate pass over the BATCH only
(two batch-sized shuffles: tf, dl), one anti-join against the stored
ids (posting-table-sized, column-pruned to the id), one map-only
append.  The accepted corpus' text is never re-read.

Operations: the sink accrues one file set per micro-batch — the same
fragmentation curve the gates measured (SCALE.md) — so compact the
index out-of-band with :func:`~.dedup_gate.gate_maintain`
(``compact_files=``, works on any catalog table) or CLI
``gate-maintain`` / ``compact``; deletes/upserts for retired documents
go through :func:`~..operators.text.bm25_index_update` + a staged
swap.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import bm25_index
from ..sources.catalog import Catalog

__all__ = ["stream_bm25_sink"]


def stream_bm25_sink(
    spark: SparkSession,
    source_dir: str,
    target: Catalog,
    index_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    schema=None,
    checkpoint: str | None = None,
    transform=None,
) -> int:
    """Stream document files from ``source_dir``; per micro-batch,
    tokenize the batch and append its ``(token, id, tf, dl)`` posting
    rows to ``target``/``index_table`` (first arrival wins; see module
    docstring).  Returns the number of micro-batches applied (replayed
    batches drain but append nothing).

    ``transform``: optional stateless ``DataFrame -> DataFrame`` hook
    applied to the stream before indexing (filter/derive stages).
    """
    if schema is None:
        try:
            schema = spark.read.parquet(source_dir).schema
        except Exception as exc:
            raise ValueError(
                "stream_bm25_sink: cannot infer schema from an empty "
                f"source dir {source_dir!r}; pass schema= explicitly"
            ) from exc
    if checkpoint is None:
        ident = hashlib.sha256(
            "\x00".join(
                [os.path.abspath(source_dir), target.identity(),
                 index_table]
            ).encode()
        ).hexdigest()[:16]
        checkpoint = os.path.join(
            tempfile.gettempdir(), f"bm25_ckpt_{index_table}_{ident}"
        )
    ckpt_ns = hashlib.sha256(checkpoint.encode()).hexdigest()[:12]
    applied = {"n": 0}

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        marker = f"{ckpt_ns}:{batch_id}"
        from contextlib import nullcontext

        lock = (
            target.writer_lock(index_table)
            if hasattr(target, "writer_lock")
            else nullcontext()
        )
        with lock:
            if target.exists(index_table):
                stored = target.read(index_table)
                if "__commit" not in stored.columns:
                    raise ValueError(
                        f"stream_bm25_sink: index table {index_table!r} "
                        "exists without the __commit replay-marker column "
                        "(a batch bm25_index() write?) — appending "
                        "mixed-schema files would break later reads; "
                        "seed it once with a staged rewrite: "
                        "write_staged(read(idx).withColumn('__commit', "
                        "lit('seed:0')), idx) + commit_staged"
                    )
                replayed = (
                    stored
                    .filter(F.col("__commit") == marker)
                    .limit(1)
                    .isEmpty()
                    is False
                )
                if replayed:
                    return
            # within-batch id collapse: smallest text wins (deterministic)
            docs = batch.groupBy(id_col).agg(
                F.min(text_col).alias(text_col))
            if target.exists(index_table):
                seen = target.read(index_table).select(id_col).distinct()
                docs = docs.join(seen, id_col, "left_anti")
            rows = bm25_index(docs, id_col, text_col).withColumn(
                "__commit", F.lit(marker))
            target.write(rows, index_table, mode="append")
            applied["n"] += 1

    stream = spark.readStream.schema(schema).parquet(source_dir)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return applied["n"]
