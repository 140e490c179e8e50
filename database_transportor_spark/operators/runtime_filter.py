"""Runtime Bloom-filter join pruning — shrink the fact side *before* the
shuffle.

The classic big-big join at 100 TB: ``fact ⋈ dim`` where ``dim`` is
selective (a filtered dimension, a deduped key list) but too large — or
arriving too late in the plan — for Spark's static broadcast threshold,
so both sides pay a full shuffle and most shuffled fact rows die in the
join anyway.  The fix every warehouse engine ships (Spark's own
``spark.sql.optimizer.runtime.bloomFilter.*``, "sideways information
passing" in the literature) is a **runtime filter**: build a compact
Bloom bitmap of the dim keys, apply it to the fact as a plain
``filter()`` that sits *below* the exchange, and let the exact join
clean up the false positives.  Output is **identical** to the plain
join for any bitmap size — false positives only let extra rows reach
the (exact) join; false negatives are impossible — which is what makes
the operator oracle-checkable against the unfiltered join.

Spark-first shape (everything JVM-side, no Python in the row path):

- :func:`bloom_bitmap` builds the ``m``-bit bitmap with one narrow
  Spark aggregation — ``explode`` the ``num_hashes`` xxhash64 positions,
  ``bit_or`` the one-hot words — and collects **≤ m/64 long rows**
  (128 KiB of longs for the default 2²⁰ bits), bounded by the bitmap
  size *by construction*, never by the key count.  A billion-key dim
  still collects 16 Ki rows.
- :func:`bloom_might_contain` embeds the bitmap as a single
  ``array<bigint>`` literal and tests membership with ``element_at`` +
  ``shiftleft``/bitwise-AND — whole-stage-codegen-able, pushed below
  the join like any other filter.

Sizing: with ``num_hashes=3``, ~10 bits/key gives ≈1.7 % false
positives; the default 2²⁰ bits is sized for ~100 k distinct keys.
At 100 TB scale, grow ``num_bits`` with the dim key count (2²⁷ bits =
16 MiB of literal covers ~13 M keys) — the bitmap travels once per
executor with the task binary, orders of magnitude cheaper than
shuffling the non-matching fact rows it removes.

Reference parity: the reference engine (src/DBT.php:144-505) has no
runtime filters — this is part of the scale-first extension surface.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_bitmap", "bloom_might_contain", "bloom_prune_join"]


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The ``num_hashes`` bit positions for a key: xxhash64 with seed i,
    mod m.  Build and probe MUST use this same function — any drift
    would create false negatives and break join equivalence."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_bitmap(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> list[int]:
    """Build an ``num_bits``-bit Bloom bitmap of ``df[key_col]`` as a
    Python list of ``num_bits/64`` longs.

    One narrow Spark job: project the hash positions, explode, bit-or
    the one-hot words per word index (map-side combinable — duplicates
    collapse before the shuffle), collect the ≤ ``num_bits/64`` non-zero
    words.  Driver memory is bitmap-sized by construction, independent
    of the dim's row or key count.
    """
    if num_bits % 64:
        raise ValueError("bloom_bitmap: num_bits must be a multiple of 64")
    words = num_bits // 64
    pos = _positions(F.col(key_col), num_bits, num_hashes)
    rows = (
        df.select(F.explode(F.array(*pos)).alias("pos"))
        .select(
            (F.col("pos") / F.lit(64)).cast("int").alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("bigint"),
                F.pmod(F.col("pos"), F.lit(64)).cast("int"),
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bitmap = [0] * words
    for r in rows:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_might_contain(
    key: Column | str,
    bitmap: list[int],
    num_hashes: int = 3,
) -> Column:
    """Membership predicate against a :func:`bloom_bitmap` result.

    The bitmap rides as ONE ``array<bigint>`` literal (a single Literal
    node, not per-element expressions); each probe is ``element_at`` on
    the word index + a bitwise AND against the shifted mask — all
    builtin JVM expressions inside whole-stage codegen.
    """
    key = F.col(key) if isinstance(key, str) else key
    num_bits = len(bitmap) * 64
    bf = F.lit(bitmap)
    preds = []
    for pos in _positions(key, num_bits, num_hashes):
        word = F.element_at(bf, (pos / F.lit(64)).cast("int") + F.lit(1))
        mask = F.call_function(
            "shiftleft",
            F.lit(1).cast("bigint"),
            F.pmod(pos, F.lit(64)).cast("int"),
        )
        preds.append(word.bitwiseAND(mask) != F.lit(0))
    return reduce(lambda a, b: a & b, preds)


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    how: str = "inner",
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """``fact ⋈ dim`` with a runtime Bloom filter pruning the fact side
    before the join's exchange.

    Result is row-identical to ``fact.join(dim, fact[fact_key] ==
    dim[dim_key], how)`` — the bitmap admits false positives (removed by
    the exact join) and never false negatives.  ``how`` must be a join
    type where dropping non-matching FACT rows early is semantics-
    preserving: ``inner``, ``semi``, ``right`` — a left/full outer join
    must keep unmatched fact rows, so pruning would be wrong and raises.
    """
    if how not in ("inner", "semi", "left_semi", "leftsemi", "right"):
        raise ValueError(
            f"bloom_prune_join: how={how!r} would drop unmatched fact rows "
            "that an outer join must keep; use inner/semi/right"
        )
    dkey = dim_key or fact_key
    bitmap = bloom_bitmap(dim, dkey, num_bits=num_bits, num_hashes=num_hashes)
    pruned = fact.filter(bloom_might_contain(fact_key, bitmap, num_hashes))
    return pruned.join(dim, pruned[fact_key] == dim[dkey], how)
