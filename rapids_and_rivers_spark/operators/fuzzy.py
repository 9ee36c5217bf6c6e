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

from pyspark.sql import Column, DataFrame, Window, functions as F


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


def sorted_neighborhood_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    block_chars: int = 8,
    key_chars: int = 80,
    window: int = 2,
    max_distance: int = 10,
) -> DataFrame:
    """Sorted-neighborhood method (Hernández & Stolfo, SIGMOD 1995):
    candidate pairs are rows within ``window`` positions of each other
    in a sort order, verified with exact ``levenshtein``.

    The complementary blocking strategy to deletion neighborhoods
    (:func:`symspell_join`, distance-bounded) and LSH (similarity-
    bounded): SNM catches near-dups whose edits cluster AFTER a shared
    prefix — typical of boilerplate-prefixed or template text — at
    O(n·window) candidates, independent of any distance bound.

    Scale shape: the sort is WITHIN blocks of the first ``block_chars``
    normalized characters (Window partitioned by block — a keyed
    shuffle, never a global single-partition sort; the classic
    multi-pass SNM with a second sort key is a second call with a
    different ``block_chars``/key). ``lead()`` over the block window
    generates each rank's next ``window`` neighbors without a
    self-join; levenshtein runs on ``key_chars``-char prefixes so the
    verify cost is bounded per pair regardless of document length.

    Output: (id_a, id_b, lev) — pairs with prefix edit distance
    ``<= max_distance``, id order = sort order (a before b).
    """
    norm = F.lower(F.trim(F.col(col)))
    base = (
        df.filter(norm != "")
        .select(
            F.col(id_col).alias("id"),
            norm.alias("norm_key"),
            F.substring(norm, 1, block_chars).alias("blk"),
        )
        .withColumn("pfx", F.substring(F.col("norm_key"), 1, key_chars))
    )
    w = Window.partitionBy("blk").orderBy("norm_key", "id")
    neighbors = base.select(
        "id",
        "pfx",
        *[F.lead("id", i).over(w).alias(f"nid_{i}") for i in range(1, window + 1)],
        *[F.lead("pfx", i).over(w).alias(f"npfx_{i}") for i in range(1, window + 1)],
    )
    pairs = neighbors.select(
        "id",
        "pfx",
        F.explode_outer(
            F.array(
                *[
                    F.struct(
                        F.col(f"nid_{i}").alias("id_b"),
                        F.col(f"npfx_{i}").alias("pfx_b"),
                    )
                    for i in range(1, window + 1)
                ]
            )
        ).alias("nb"),
    ).filter(F.col("nb.id_b").isNotNull())
    lev = F.levenshtein(F.col("pfx"), F.col("nb.pfx_b"))
    return (
        pairs.withColumn("lev", lev)
        .filter(F.col("lev") <= max_distance)
        .select(
            F.col("id").alias("id_a"),
            F.col("nb.id_b").alias("id_b"),
            F.col("lev").cast("long").alias("lev"),
        )
    )
