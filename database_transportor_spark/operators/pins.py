"""Persist bookkeeping for multi-consumer operator intermediates.

Several operators ``persist()`` an intermediate that feeds multiple
downstream branches of the *returned* (lazy) DataFrame — the posting
list behind ``ngram_jaccard_pairs``, the exploded paragraph table in
``dedup_paragraphs``, the capped basket set in ``cooccurrence_pairs``.
The operator itself has no safe place to ``unpersist()``: the result has
not been consumed yet when the function returns, and unpinning early
would defeat the persist entirely.

Left alone, those cached blocks accumulate: a long-lived session running
many pipelines (the declarative ``post_ops`` tier, a notebook, the CLI
``transport`` loop) stacks up storage until eviction pressure degrades
the job — memory blocks are LRU-evicted but disk spill of
``MEMORY_AND_DISK`` persists until an explicit unpersist.

So operators register their persists here via :func:`pin` instead of
calling ``persist()`` directly, and *consuming* layers — the engine after
``do_transport``'s writes land, a harness after collecting a query, any
caller after its terminal action — call :func:`release_pins`.  Releasing
is always correctness-safe: an unpersisted DataFrame recomputes its
lineage if re-consumed; only the caching is dropped.

``pin`` is deliberately NOT used for caches whose lifetime a function
manages itself (e.g. ``dedup_clusters``' edge list, unpersisted after
its internal iteration) — those need no external release hook.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

__all__ = ["pin", "release_pins", "pinned_count"]

_LOCK = threading.Lock()
_PINNED: list[DataFrame] = []


def pin(df: DataFrame, level=None) -> DataFrame:
    """Persist ``df`` (optionally at ``level``, a ``StorageLevel``) and
    register it for a later :func:`release_pins`.  Returns ``df``."""
    out = df.persist(level) if level is not None else df.persist()
    with _LOCK:
        _PINNED.append(out)
    return out


def release_pins() -> int:
    """Unpersist every DataFrame registered since the last release.

    Call after the consuming action (writes committed, results
    collected).  Safe to call at any time — an unpersisted intermediate
    recomputes if a still-live result frame is re-consumed.  Returns the
    number of frames released.
    """
    with _LOCK:
        pinned = _PINNED[:]
        del _PINNED[:]
    n = 0
    for df in pinned:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session torn down; nothing to free
            pass
    return n


def pinned_count() -> int:
    """Number of currently registered (not yet released) pins."""
    with _LOCK:
        return len(_PINNED)
