"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting (enabled in build_session) handles most skew at
runtime; these helpers cover the two cases AQE does not re-plan:

- aggregations with a dominant key (one reducer gets the whole key), and
- joins where the hot side must be pre-split deterministically (e.g. a
  streaming stateful op keyed on a skewed column).

Salting is deterministic here (hash of a tiebreaker column, not rand()),
so results are reproducible and retries are safe at-least-once.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, tiebreak: str, buckets: int = 16) -> DataFrame:
    """Add a deterministic ``__salt`` column in [0, buckets)."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(tiebreak)), F.lit(buckets))
    )


def skew_safe_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    tiebreak: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 aggregates by (keys, salt) — the hot key's rows spread over
    ``buckets`` reducers; phase 2 merges the per-salt partials by the real
    keys. ``aggs`` maps output name -> (merge_fn_name, partial_expr):
    e.g. ``{"n": ("sum", F.count(F.lit(1))), "mx": ("max", F.max("x"))}``
    — the merge function must be decomposable (sum/min/max/count-as-sum).

    At 100 TB: phase 1 is map-side-combinable like any groupBy; the extra
    shuffle is tiny (buckets × |keys| rows per key).
    """
    salted = with_salt(df, tiebreak, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    merge = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    return partial.groupBy(*keys).agg(
        *[
            merge[fn](f"__p_{name}").alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )
