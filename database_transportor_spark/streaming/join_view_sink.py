"""Streaming incremental join-view sink: continuous fact-enrichment
materialization via ``foreachBatch``.

Batch-side :func:`~..operators.rollup.refresh_join_view` maintains a
stored ``fact ⋈ dim`` view on a schedule; this is its always-on
sibling: a file stream over the FACT source feeds micro-batches, each
batch's view delta — ``Δbatch ⋈ dim``, a broadcast small-big join —
is APPENDED to the stored view.  The big shuffle a full re-join would
pay never happens, per batch or ever; each appended file is view rows
only.

Exactly-once: the checkpoint makes each source file process once, and a
crash between the view append and the checkpoint commit is covered by a
commit-marker column (``__commit`` = checkpoint-hash:batch-id) — a
replayed batch sees its marker already present and skips, so the
append-only view never double-counts.  The marker is namespaced by
checkpoint so a FRESH checkpoint over the same view (a deliberate
reprocess) is not mistaken for a replay.

Dimension freshness: the dim table is re-read from the catalog at every
micro-batch, so dim updates enrich all FUTURE batches; rows already in
the view keep the dim values of their batch time (the standard
streaming-enrichment contract — rebuild the view for retroactive dim
corrections).  Late-arriving facts enrich whenever they arrive: the
delta formula has no watermark because append-only inner joins need no
state at all.

This module and ``merge_sink`` are the two ends of the materialization
spectrum: MERGE rewrites the target per batch (keyed upsert semantics);
the join-view sink only ever appends (bag semantics) — at 100 TB,
appends are the shape object stores love.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import Catalog

__all__ = ["stream_join_view_sink"]


def stream_join_view_sink(
    spark: SparkSession,
    source_dir: str,
    target: Catalog,
    view_table: str,
    dim_table: str,
    on: str | list[str],
    schema=None,
    checkpoint: str | None = None,
    available_now: bool = True,
    broadcast_dim: bool = True,
    transform=None,
) -> int:
    """Stream fact files from ``source_dir``; append each micro-batch's
    ``batch ⋈ dim`` rows (inner equi-join on ``on``) to
    ``target``/``view_table``, reading ``dim_table`` from the same
    catalog each batch.  Returns the number of micro-batches applied
    (replayed batches count as drained but append nothing).

    ``transform``: optional stateless ``DataFrame -> DataFrame`` hook
    applied to the fact stream before joining (filter/derive stages).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if schema is None:
        try:
            schema = spark.read.parquet(source_dir).schema
        except Exception as exc:
            raise ValueError(
                "stream_join_view_sink: cannot infer schema from an empty "
                f"source dir {source_dir!r}; pass schema= explicitly"
            ) from exc
    stream = spark.readStream.schema(schema).parquet(source_dir)
    if transform is not None:
        stream = transform(stream)
    if checkpoint is None:
        ident = hashlib.sha256(
            "\x00".join(
                [os.path.abspath(source_dir), target.identity(),
                 view_table, dim_table]
            ).encode()
        ).hexdigest()[:16]
        checkpoint = os.path.join(
            tempfile.gettempdir(), f"join_view_ckpt_{view_table}_{ident}"
        )
    ckpt_ns = hashlib.sha256(checkpoint.encode()).hexdigest()[:12]
    applied = {"n": 0}

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        marker = f"{ckpt_ns}:{batch_id}"
        from contextlib import nullcontext

        lock = (
            target.writer_lock(view_table)
            if hasattr(target, "writer_lock")
            else nullcontext()
        )
        with lock:
            if target.exists(view_table):
                replayed = (
                    target.read(view_table)
                    .filter(F.col("__commit") == marker)
                    .limit(1)
                    .isEmpty()
                    is False
                )
                if replayed:
                    return
            dim = target.read(dim_table)
            if broadcast_dim:
                dim = F.broadcast(dim)
            delta = batch.join(dim, keys, "inner").withColumn(
                "__commit", F.lit(marker)
            )
            target.write(delta, view_table, mode="append")
            applied["n"] += 1

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        if available_now
        else stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    if available_now:
        q.awaitTermination()
    return applied["n"]
