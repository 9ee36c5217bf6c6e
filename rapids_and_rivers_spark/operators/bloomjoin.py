"""Bloom-filter runtime join pruning.

The classic 100 TB pattern Spark applies internally for shuffle joins
(InjectRuntimeFilter): build a Bloom filter over the join keys of the
SMALL (already-filtered) side, ship it to the big side, and drop
non-matching rows BEFORE they pay the shuffle. Spark 4's
``bloom_filter_agg`` / ``might_contain`` expressions are not exposed in
the public function registry, so this module builds the same thing from
registered primitives — and stays exact, because the real join still runs
afterwards and removes the Bloom's false positives.

Shape at scale:
- **build**: one partial-aggregated pass over the small side's keys.
  ``k`` hash positions per key (``xxhash64(key, seed)``), OR-ed into a
  word-chunked bitmap via ``bit_or`` groupBy on the word index — the
  shuffle moves at most ``num_bits/64`` longs per partition (a 256 Kbit
  filter = 4096 longs ≈ 32 KB), then the dense bitmap is collected to the
  driver. This mirrors Spark's own BloomFilterAggregate driver-side
  result; like the IVF codebook, the collect is a sketch (KBs), never
  data.
- **probe**: the bitmap becomes an array LITERAL in the plan (constant
  broadcast with the serialized plan, no join, no shuffle): each probe
  row tests ``k`` bit positions with ``element_at`` + bit masks — pure
  codegen arithmetic fused into the scan. False-negative-free by
  construction; false positives are killed by the exact join that
  follows.

Sizing uses the standard formulas m = -n·ln(p)/ln(2)^2, k = (m/n)·ln(2).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["bloom_params", "bloom_build", "bloom_might_contain", "bloom_filter_join"]


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(num_bits, num_hashes) for a target false-positive rate.

    ``num_bits`` is rounded up to a multiple of 64 (whole words).
    """
    if expected_items <= 0:
        raise ValueError(f"expected_items must be positive, got {expected_items}")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = max(64, math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    # independent hash functions by salting the seed column; pmod keeps the
    # signed xxhash64 in [0, num_bits)
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame, key: str | Column, num_bits: int, num_hashes: int
) -> list[int]:
    """Aggregate the build side into a dense ``num_bits // 64``-word bitmap.

    Distributed: explode each key into its ``k`` bit positions, OR bits
    per 64-bit word with ``bit_or`` (map-side partial agg), collect the
    sparse words and densify. Only the word table (≤ ``num_bits/64``
    rows) reaches the driver.
    """
    key = F.col(key) if isinstance(key, str) else key
    pos = F.explode(F.array(*_positions(key, num_bits, num_hashes))).alias("pos")
    # bounded-collect: word_idx domain is num_bits/64 (a constant bitmap
    # size) — the bit_or rollup reaches the driver at <= that many rows
    words = (
        df.select(pos)
        .select(
            F.shiftright("pos", 6).alias("word_idx"),
            # F.shiftleft's numBits param is int-only in the Python API;
            # call_function passes the per-row Column through to the SQL fn
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    dense = [0] * (num_bits // 64)
    for row in words:
        dense[row["word_idx"]] = row["word"]
    return dense


def bloom_might_contain(
    words: list[int], key: Column, num_bits: int, num_hashes: int
) -> Column:
    """Membership-test Column over the built bitmap (no false negatives).

    The bitmap rides in the plan as an array literal — the test is ``k``
    ``element_at`` + mask operations, codegen-fused, zero shuffle.
    """
    arr = F.lit(words)
    cond = F.lit(True)
    for pos in _positions(key, num_bits, num_hashes):
        word = F.element_at(arr, (F.shiftright(pos, 6) + 1).cast("int"))
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_filter_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    *,
    expected_items: int,
    fpp: float = 0.01,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with Bloom pre-pruning of the big side.

    Exact: the Bloom pass only *removes* rows that cannot match (no false
    negatives), and the equi-join that follows removes the false
    positives. At 100 TB this is the difference between shuffling the
    whole fact table and shuffling the ~selectivity fraction that can
    join — precisely Spark's InjectRuntimeFilter, but usable when the
    optimizer doesn't fire it (non-broadcastable dims, pre-filtered
    builds, repeated probes against a saved filter).
    """
    num_bits, num_hashes = bloom_params(expected_items, fpp)
    words = bloom_build(small, small_key, num_bits, num_hashes)
    pruned = big.filter(
        bloom_might_contain(words, F.col(big_key), num_bits, num_hashes)
    )
    return pruned.join(small, pruned[big_key] == small[small_key], how)
