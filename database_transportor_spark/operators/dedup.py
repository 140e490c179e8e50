"""Deduplication operators for training-data pipelines, Spark-first.

All operators are DataFrame-native (no Python in the hot path) and designed
around *blocking* so nothing is O(N²) at 100 TB:

- :func:`exact_dedup` — hash-groupBy exact dedup; one shuffle on the key.
- :func:`ngram_shingles` — word n-gram shingle sets (distinct).
- :func:`ngram_jaccard_pairs` — **exact** pairwise n-gram Jaccard via an
  inverted shingle index (explode → self-join on shingle → count): only
  documents sharing ≥1 shingle ever meet, so cost is Σ posting-list² per
  shingle, not N².  The classic scalable exact-similarity-join shape.
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — MinHash + banded
  LSH: candidates meet only within a band bucket (shuffle on band hash),
  then exact-Jaccard verification.  The 100 TB near-dup path.
- :func:`simhash` / :func:`simhash_pairs` — 32-bit SimHash over token
  hashes, banded by byte for candidate generation, verified by Hamming
  distance (``bit_count(xor)``).

Hash functions are Spark's ``xxhash64`` with fixed literal salts —
deterministic across runs, executors, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

__all__ = [
    "exact_dedup",
    "ngram_shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
]


def exact_dedup(
    df: DataFrame,
    keys: list[str],
    order_by: str,
    keep: str = "min",
) -> DataFrame:
    """Exact dedup: keep one row per ``keys`` group — the one with the
    min/max ``order_by`` value (deterministic winner).

    Single shuffle on ``keys``.  For very wide keys (full document text),
    group on the text itself: Spark hash-partitions internally, so this is
    already the hash-groupBy pattern; pre-hashing to ``xxhash64(text)`` only
    changes collision semantics, not the shuffle.
    """
    if keep not in ("min", "max"):
        raise ValueError("keep must be 'min' or 'max'")
    oc = F.col(order_by).asc() if keep == "min" else F.col(order_by).desc()
    w = Window.partitionBy(*keys).orderBy(oc)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def ngram_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word ``n``-gram shingles of a text column (array<string>)."""
    toks = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    # guard: sequence(1, x) with x < 1 would count DOWN; short docs get [].
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(grams)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join via inverted shingle index.

    Returns ``(id_a, id_b, intersection, union_size, jaccard)`` for every
    pair with ``jaccard >= threshold`` and ``id_a < id_b``.

    Plan shape at scale: one explode (narrow), one shuffle on shingle for
    the self-join, one shuffle on (id_a, id_b) for the count — no cross
    join anywhere.  ``max_df`` is the knob that keeps it from degenerating:
    shingles appearing in more than ``max_df`` documents (stop-phrases) are
    dropped before the self-join, bounding every posting list — the same
    df-capping every production near-dup pipeline applies.  Jaccard is then
    computed over the capped shingle space on BOTH numerator and
    denominator, so the measure stays a true Jaccard of the filtered sets.
    """
    sh = df.select(
        F.col(id_col).alias("__id"),
        ngram_shingles(text_col, n).alias("__shingles"),
    )
    posting = sh.select("__id", F.explode("__shingles").alias("__s"))
    if max_df is not None:
        dfreq = posting.groupBy("__s").agg(F.count("*").alias("__df"))
        posting = posting.join(
            F.broadcast(dfreq.filter(F.col("__df") > max_df).select("__s")),
            "__s",
            "left_anti",
        )
    sizes = posting.groupBy("__id").agg(F.count("*").alias("__n"))
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(b, (F.col("a.__s") == F.col("b.__s")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count("*").alias("intersection"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__n", "__na"), "id_a")
        .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__n", "__nb"), "id_b")
        .withColumn("union_size", F.col("__na") + F.col("__nb") - F.col("intersection"))
        .withColumn("jaccard", F.col("intersection") / F.col("union_size"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "intersection", "union_size", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures: ``sig[i] = min over shingles of xxhash64(salt_i, s)``.

    Pure expression — ``n_hashes`` array-min folds per row, no shuffle.
    Documents with no shingles get NULL signatures (filtered by callers).
    """
    sh = F.array_distinct(ngram_shingles(text_col, shingle_n))
    sigs = F.array(
        *[
            F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(F.lit(f"mh{i}"), s)))
            for i in range(n_hashes)
        ]
    )
    return df.select(
        F.col(id_col).alias("__id"),
        sh.alias("__shingles"),
        sigs.alias("__sig"),
    ).filter(F.size("__shingles") > 0)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Banded-LSH near-duplicate pairs with exact-Jaccard verification.

    Candidates: documents whose signature agrees on ALL rows of ≥1 band
    (band hash join — shuffle on (band_idx, band_hash), never N²).
    Verification: exact Jaccard over the true shingle sets; pairs below
    ``threshold`` are dropped, so false-positive band collisions never
    surface.  (False negatives — high-Jaccard pairs colliding in no band —
    are the documented LSH tradeoff; raise ``bands`` to trade compute for
    recall.)
    """
    if n_hashes % bands != 0:
        raise ValueError("n_hashes must be divisible by bands")
    rows = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)

    band_entries = sig.select(
        "__id",
        "__shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("__sig").getItem(bi * rows + r) for r in range(rows)]
                        ).alias("bhash"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("__id", "__shingles", "b.band", "b.bhash")

    a, b = band_entries.alias("a"), band_entries.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__shingles").alias("__sa"),
            F.col("b.__shingles").alias("__sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size(F.array_union("__sa", "__sb"))
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    out_col: str = "simhash",
) -> DataFrame:
    """SimHash over token hashes, pure expressions.

    ``bit_j = sign(Σ_tokens (2*bit_j(xxhash64(tok)) - 1))``; the per-bit
    fold is an ``aggregate`` over the token-hash array — JVM-side, no
    shuffle, no UDF."""
    toks = tokens(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def bit_sum(j: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )

    sim = F.lit(0).cast("long")
    for j in range(bits):
        sim = sim + F.when(bit_sum(j) > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col).alias("__id"), sim.alias(out_col))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: if two hashes differ in ≤ ``max_hamming`` bits and
    we cut into ``bands`` > max_hamming byte-bands, at least one band is
    identical — so candidates meet on an equi-join of (band, band_bits),
    and the exact ``bit_count(xor)`` check never runs on unrelated rows.
    """
    if bands <= max_hamming:
        raise ValueError("bands must exceed max_hamming for pigeonhole recall")
    width = bits // bands
    s = simhash(df, id_col, text_col, bits)
    mask = (1 << width) - 1
    entries = s.select(
        "__id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright("simhash", bi * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bval"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("__id", "simhash", "b.band", "b.bval")
    a, b = entries.alias("a"), entries.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.simhash").alias("__ha"),
            F.col("b.simhash").alias("__hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
