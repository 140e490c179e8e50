"""Runtime Bloom-filter join pruning (`operators/runtime_filter.py`).

Contract under test: `bloom_prune_join(fact, dim, k)` is row-identical to
the plain `fact.join(dim, k)` for ANY bitmap size — false positives only
pass extra rows to the exact join; false negatives are impossible because
build and probe share one `_positions` hash family.  Plus the scale
properties the 100 TB story rests on: the collected bitmap is bounded by
`num_bits`, never by the dim key count, and the probe predicate actually
removes non-matching fact rows before the join.
"""

import pytest
from pyspark.sql import functions as F

from database_transportor_spark.operators.runtime_filter import (
    bloom_bitmap,
    bloom_might_contain,
    bloom_prune_join,
)

from conftest import rows


@pytest.fixture(scope="module")
def fact_dim(spark):
    fact = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    # dim keeps 1 in 50 keys -> most fact rows should be pruned pre-join
    dim = spark.range(0, 5000, 50).select(
        F.col("id").alias("dk"), F.lit("dim").alias("tag")
    )
    return fact, dim


def test_no_false_negatives(spark, fact_dim):
    """Every dim key must pass the probe — the property join equivalence
    rests on.  Checked exhaustively over the dim, at a deliberately tiny
    bitmap (high false-positive rate) to stress the hash-family match."""
    _, dim = fact_dim
    bitmap = bloom_bitmap(dim, "dk", num_bits=256)
    missed = dim.filter(~bloom_might_contain("dk", bitmap)).count()
    assert missed == 0


def test_join_equivalent_inner(spark, fact_dim):
    fact, dim = fact_dim
    pruned = bloom_prune_join(fact, dim, "k", "dk", num_bits=1 << 12)
    plain = fact.join(dim, fact["k"] == dim["dk"], "inner")
    assert rows(pruned, "k") == rows(plain, "k")


def test_join_equivalent_tiny_bitmap(spark, fact_dim):
    """64 bits for 100 keys: the bitmap is near-saturated, the filter
    passes almost everything — the join must still be exact."""
    fact, dim = fact_dim
    pruned = bloom_prune_join(fact, dim, "k", "dk", num_bits=64)
    plain = fact.join(dim, fact["k"] == dim["dk"], "inner")
    assert rows(pruned, "k") == rows(plain, "k")


def test_join_equivalent_semi(spark, fact_dim):
    fact, dim = fact_dim
    pruned = bloom_prune_join(fact, dim, "k", "dk", how="semi")
    plain = fact.join(dim, fact["k"] == dim["dk"], "semi")
    assert rows(pruned, "k") == rows(plain, "k")


def test_prunes_before_join(spark, fact_dim):
    """The probe must actually shrink the fact side: with 1/50 keys kept
    and a well-sized bitmap, the pruned fact is far below the original."""
    fact, dim = fact_dim
    bitmap = bloom_bitmap(dim, "dk", num_bits=1 << 12)
    kept = fact.filter(bloom_might_contain("k", bitmap)).count()
    assert kept < 500  # 100 true + bounded false positives (of 5000)


def test_bitmap_bounded_by_num_bits(spark):
    """Driver state is bitmap-sized by construction: 50k distinct keys
    into 1024 bits still yields exactly 16 longs."""
    big = spark.range(0, 50_000).select(F.col("id").alias("k"))
    bitmap = bloom_bitmap(big, "k", num_bits=1024)
    assert len(bitmap) == 1024 // 64


def test_outer_join_rejected(spark, fact_dim):
    fact, dim = fact_dim
    with pytest.raises(ValueError, match="outer"):
        bloom_prune_join(fact, dim, "k", "dk", how="left")


def test_bad_num_bits_rejected(spark, fact_dim):
    _, dim = fact_dim
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_bitmap(dim, "dk", num_bits=100)


def test_null_keys_equivalent(spark):
    """NULL fact keys can't equi-join.  Whether the probe drops them
    (NULL predicate is falsy in filter) or passes them as a false
    positive (xxhash64 hashes the seed alone), the exact join removes
    them — equivalence must hold either way."""
    fact = spark.createDataFrame(
        [(1,), (None,), (2,)], "k: bigint"
    )
    dim = spark.createDataFrame([(1,), (2,)], "dk: bigint")
    pruned = bloom_prune_join(fact, dim, "k", "dk")
    plain = fact.join(dim, fact["k"] == dim["dk"], "inner")
    assert rows(pruned, "k") == rows(plain, "k")
