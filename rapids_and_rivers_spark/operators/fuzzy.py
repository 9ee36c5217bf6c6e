"""Approximate string-match join via SymSpell deletion neighborhoods.

The scale problem: a fuzzy join (edit distance ≤ 1) is O(n·m) if done
naively — a non-starter at corpus scale. The SymSpell observation
(symmetric delete spelling correction): two strings within edit
distance 1 ALWAYS share at least one member of their 1-deletion
neighborhoods (the string itself plus every single-character deletion) —
a substitution at position i means deleting position i from both sides
yields the same string; an insertion/deletion means one side IS a
deletion variant of the other. So:

  explode each side into its ≤(len+1) variants → equi-join on the
  variant → verify the candidate pairs with the exact ``levenshtein``.

Candidate space is O(Σ len) join keys instead of O(n·m) pairs; the
verify step touches only candidates. This is the same
bucket-then-verify shape as MinHash-LSH (operators/dedup.py) applied to
edit distance. Generalizes to distance k with k-deletion neighborhoods
(variant count grows combinatorially — k ≤ 2 in practice).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def deletion_variants(col: Column) -> Column:
    """The string plus every single-character deletion, deduplicated.

    Pure Column composition (sequence + transform + substr) — JVM-side,
    no UDF; empty strings yield just themselves.
    """
    n = F.length(col)
    idx = F.sequence(F.lit(1), n)
    dels = F.when(
        n > 0,
        F.transform(
            idx,
            lambda i: F.concat(
                col.substr(F.lit(1), i - 1), col.substr(i + 1, n - i)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.concat(F.array(col), dels))


def symspell_join(
    df: DataFrame, col: str, max_dist: int = 1
) -> DataFrame:
    """All distinct value pairs of ``df[col]`` within edit distance
    ``max_dist`` (currently 1): ``(s_a, s_b, dist)`` with ``s_a < s_b``.

    Plan: distinct (one shuffle) → variant explode (linear) → self
    equi-join on the variant (shuffle on variant hash — candidate pairs
    only, never the cross product) → exact levenshtein verify. The
    explain audit confirms no BroadcastNestedLoopJoin/cartesian appears.
    """
    if max_dist != 1:
        raise ValueError("1-deletion neighborhoods verify edit distance 1 only")
    vals = df.select(F.col(col).alias("s")).where(F.col("s").isNotNull()).distinct()
    ex = vals.select("s", F.explode(deletion_variants(F.col("s"))).alias("v"))
    cand = (
        ex.alias("x")
        .join(ex.alias("y"), "v")
        .select(F.col("x.s").alias("s_a"), F.col("y.s").alias("s_b"))
        .filter(F.col("s_a") < F.col("s_b"))
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("s_a", "s_b").cast("int")
    ).filter(F.col("dist") <= max_dist)
