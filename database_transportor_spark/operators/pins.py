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
calling ``persist()`` directly, and *consuming* layers release them:

- **Scoped** (preferred): a consuming layer wraps its work in
  ``with pin_scope():`` — every pin created *inside the block, on the
  same thread/context* is unpersisted at block exit, and ONLY those.
  ``DBT.do_transport`` does this, so two pipelines running concurrently
  (or a caller still consuming a previously pinned frame) never have
  their caches yanked by an unrelated transport finishing.  Scopes use
  ``contextvars``, so a fresh thread starts with no scope — worker
  threads an engine spawns for *actions* (writes) don't create pins;
  pins are created while *building* the plan on the owning thread.
- **Unscoped fallback**: pins created outside any scope land in a
  process-global registry drained by :func:`release_pins` — the hook
  long-lived harness loops (bench, oracle checker) call after each
  query's terminal action.

Releasing is always correctness-safe: an unpersisted DataFrame
recomputes its lineage if re-consumed; only the caching is dropped.

Why the registries hold STRONG references (deliberate): a DataFrame
``persist()`` registers the plan in Spark's ``CacheManager``, which
keeps the cached ``InMemoryRelation`` alive *independently of the
Python object* — dropping the last Python reference does NOT free the
cache (unlike ``RDD.persist``, there is no ContextCleaner reclamation
path for it short of ``spark.catalog.clearCache()``).  A weak registry
would therefore turn a forgotten pin into an *unfreeable* cache; the
strong registry keeps it releasable forever.  Library users who call
operators directly should use ``pin_scope()`` (or call
``release_pins()`` periodically) — that is the documented contract.

``pin`` is deliberately NOT used for caches whose lifetime a function
manages itself (e.g. ``dedup_clusters``' edge list, unpersisted after
its internal iteration) — those need no external release hook.
"""

from __future__ import annotations

import contextvars
import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

__all__ = ["pin", "pin_scope", "release_pins", "pinned_count"]

_LOCK = threading.Lock()
# unscoped pins (no pin_scope active on the creating thread/context)
_GLOBAL: list[DataFrame] = []
# stack of open scopes for the current context; contextvars gives each
# thread (and each asyncio task) an independent default-empty stack, so
# concurrent pipelines on different threads cannot see each other's
# scopes — the isolation property do_transport's release relies on
_SCOPES: contextvars.ContextVar[tuple[list[DataFrame], ...]] = (
    contextvars.ContextVar("dbt_pin_scopes", default=())
)


def pin(df: DataFrame, level=None) -> DataFrame:
    """Persist ``df`` (optionally at ``level``, a ``StorageLevel``) and
    register it for release — into the innermost open :func:`pin_scope`
    of the calling context, else the global :func:`release_pins`
    registry.  Returns ``df``."""
    out = df.persist(level) if level is not None else df.persist()
    scopes = _SCOPES.get()
    if scopes:
        scopes[-1].append(out)  # list append is atomic; scope owner drains
    else:
        with _LOCK:
            _GLOBAL.append(out)
    return out


def _unpersist_all(pinned: list[DataFrame]) -> int:
    n = 0
    for df in pinned:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session torn down; nothing to free
            pass
    return n


@contextmanager
def pin_scope():
    """Scope pins to a block: every :func:`pin` on this thread/context
    inside the block is unpersisted at exit — and only those, so
    concurrent pipelines and caller-held frames are untouched.  Nests:
    an inner scope captures pins away from the outer one."""
    mine: list[DataFrame] = []
    token = _SCOPES.set(_SCOPES.get() + (mine,))
    try:
        yield mine
    finally:
        _SCOPES.reset(token)
        _unpersist_all(mine)


def release_pins() -> int:
    """Unpersist every UNSCOPED pin registered since the last release.

    Call after the consuming action (writes committed, results
    collected) in long-lived loops that invoke operators without a
    :func:`pin_scope`.  Safe to call at any time — an unpersisted
    intermediate recomputes if a still-live result frame is re-consumed.
    Never touches pins inside an open ``pin_scope`` (those belong to the
    scope's owner).  Returns the number of frames released.
    """
    with _LOCK:
        pinned = _GLOBAL[:]
        del _GLOBAL[:]
    return _unpersist_all(pinned)


def pinned_count() -> int:
    """Pins not yet released: global registry + any scopes open in the
    calling context."""
    with _LOCK:
        n = len(_GLOBAL)
    return n + sum(len(s) for s in _SCOPES.get())
