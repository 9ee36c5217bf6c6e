"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded range join.

Both are composed from existing DataFrame primitives (SURVEY.md §7 design
stance: composition first, Pandas UDF only when semantics demand it):

- :func:`asof_join` uses the union-and-carry-forward trick: both inputs
  become one stream, ONE shuffle on the entity key sorts it, and a
  ``last(ignorenulls)`` window carries the most recent right-side payload
  onto each left row. Cost is O(n log n) per key group with zero
  candidate-pair explosion — the shape that survives 100 TB, where the
  naive range-condition join (Spark falls back to broadcast-nested-loop
  or a sort-merge with per-row rescans) dies.
- :func:`range_join` buckets the time axis so the range condition becomes
  an EQUI join on (key, bucket): with bucket width >= window width each
  left row probes at most ``ceil(window/width)+1`` buckets, so work is
  O(pairs in adjacent buckets), never O(|left| x |right|).
- :func:`asof_join_sliced` is the hot-key variant: the same as-of
  semantics with the per-key sort decomposed along time slices (salting
  cannot preserve carry-forward; time-slicing can) — use it when one
  entity dominates the key distribution.

No reference parity claim: navikt/rapids-and-rivers has no join operators
at all (SURVEY.md §2.6) — these are extension surface for the
training-data pipeline (sessionized features, point-in-time-correct
feature lookups, dedup windows).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window as W, functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_time: str,
    right_time: str,
    tolerance_seconds: float | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: enrich each ``left`` row with the most recent
    ``right`` row for the same ``by`` key whose time is <= (or < when
    ``strict``) the left row's time.

    Output: all ``left`` columns plus every non-key ``right`` column
    (null when no prior right row exists, or the match is farther back
    than ``tolerance_seconds``). Right columns must not collide with left
    column names — alias them before calling.

    Implementation: union both sides into one stream ordered by
    (time, side) per key — right rows sort before left rows at equal
    times, so inclusive semantics fall out of the sort order rather than
    a self-join; ``strict`` flips the side order. One shuffle total.

    Determinism: when several right rows share the same (by, time), the
    one with the GREATEST payload struct wins (the payload — right_time
    plus all carried columns — is the final sort key), so the result is
    stable across runs and partitionings. When a right payload column has
    a non-orderable type (map), the tiebreak is skipped and duplicate
    (by, time) right rows pick an arbitrary winner — documented caveat.

    Skew: the window partitions on ``by`` alone, so ONE task sorts each
    key; fine up to ~10^6 rows/key, beyond that use
    :func:`asof_join_sliced` (same semantics, time-decomposed sort).
    """
    prep = _asof_prep(left, right, by, left_time, right_time, strict)
    frame = (
        W.partitionBy(by)
        .orderBy(*prep.order_keys)
        .rowsBetween(W.unboundedPreceding, -1 if strict else 0)
    )
    carried = prep.unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(frame)
    ).filter(F.col(_SIDE) == prep.l_side)
    return _asof_output(carried, left, by, left_time, right_time,
                        prep.r_payload_cols, tolerance_seconds)


class _AsofPrep:
    def __init__(self, unioned, r_payload_cols, r_side, l_side, order_keys):
        self.unioned = unioned
        self.r_payload_cols = r_payload_cols
        self.r_side = r_side
        self.l_side = l_side
        self.order_keys = order_keys


def _asof_prep(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_time: str,
    right_time: str,
    strict: bool,
) -> _AsofPrep:
    """Validate and build the union-and-carry stream shared by the asof
    variants: both sides as (by, __t, __side, __payload, left cols)."""
    if left_time == right_time:
        raise ValueError(
            f"left_time and right_time are both {left_time!r}: the output "
            "carries each under its own name — alias one side first"
        )
    r_payload_cols = [c for c in right.columns if c != by and c != right_time]
    overlap = set(r_payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right columns collide with left: {sorted(overlap)}")

    # right rows must be visible to an equal-time left row (inclusive) =>
    # right sorts first; strict => right at time t visible only to later rows
    r_side, l_side = (0, 1) if not strict else (1, 0)
    r = right.select(
        F.col(by).alias(by),
        F.col(right_time).alias("__t"),
        F.lit(r_side).alias(_SIDE),
        F.struct(
            F.col(right_time).alias("__rt"), *[F.col(c) for c in r_payload_cols]
        ).alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != by],
    )
    l = left.select(
        F.col(by).alias(by),
        F.col(left_time).alias("__t"),
        F.lit(l_side).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c) for c in left.columns if c != by],
    )
    unioned = r.unionByName(l)
    # deterministic duplicate-(by, time) tiebreak: order by the payload
    # struct last, so last(ignorenulls) picks the max payload among ties.
    # Maps are not orderable in Spark — skip the tiebreak if present.
    orderable = all("map<" not in right.schema[c].simpleString() for c in r_payload_cols)
    order_keys = ["__t", _SIDE] + ([_PAYLOAD] if orderable else [])
    return _AsofPrep(unioned, r_payload_cols, r_side, l_side, order_keys)


def _asof_output(
    carried: DataFrame,
    left: DataFrame,
    by: str,
    left_time: str,
    right_time: str,
    r_payload_cols: list[str],
    tolerance_seconds: float | None,
) -> DataFrame:
    if tolerance_seconds is not None:
        in_range = (
            F.col(_PAYLOAD).isNotNull()
            & (
                F.expr(f"timestampdiff(MICROSECOND, {_PAYLOAD}.__rt, __t)")
                <= int(tolerance_seconds * 1_000_000)
            )
        )
        carried = carried.withColumn(_PAYLOAD, F.when(in_range, F.col(_PAYLOAD)))
    out_cols = [F.col(by)] + [
        F.col("__t").alias(left_time) if c == left_time else F.col(c)
        for c in left.columns
        if c != by
    ]
    out_cols += [F.col(_PAYLOAD)[c].alias(c) for c in r_payload_cols]
    out_cols += [F.col(_PAYLOAD)["__rt"].alias(right_time)]
    return carried.select(*out_cols)


def asof_join_sliced(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_time: str,
    right_time: str,
    slice_seconds: float,
    tolerance_seconds: float | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join for HOT keys: identical semantics to
    :func:`asof_join`, but the per-key window is decomposed so no single
    task ever sorts a whole hot entity.

    Why not salting: :func:`~rapids_and_rivers_spark.operators.skew.with_salt`
    composition is semantically INVALID for as-of — carry-forward crosses
    any hash-salt boundary, so splitting a key's rows by salt loses
    matches. The valid decomposition is along TIME:

    1. rows partition into (key, time-slice) groups; the carry-forward
       window runs per slice — a hot key with N rows over S slices costs
       S sorts of ~N/S rows instead of one N-row sort;
    2. per (key, slice) the LAST right payload is aggregated (map-side
       combinable groupBy), and a per-key prefix scan over those slice
       summaries — S rows per key, not N — yields each slice's carry-in;
    3. carry-in joins back on (key, slice) and fills left rows whose
       slice has no earlier right row.

    Slice boundaries never split equal timestamps (equal times share a
    slice), so inclusive/strict semantics and the duplicate-(key, time)
    payload tiebreak match :func:`asof_join` exactly. Pick
    ``slice_seconds`` so a hot key's densest slice fits an executor
    (e.g. hourly slices for a key emitting ~10k rows/hour).
    """
    if slice_seconds <= 0:
        raise ValueError(f"slice_seconds must be positive, got {slice_seconds}")
    prep = _asof_prep(left, right, by, left_time, right_time, strict)
    epoch_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', __t)"
    )
    sliced = prep.unioned.withColumn(
        "__slice", F.floor(epoch_us / F.lit(int(slice_seconds * 1_000_000)))
    )
    # (1) within-slice carry-forward
    frame = (
        W.partitionBy(by, "__slice")
        .orderBy(*prep.order_keys)
        .rowsBetween(W.unboundedPreceding, -1 if strict else 0)
    )
    within = sliced.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(frame)
    )
    # (2) per-slice last right payload (max over (__t, payload) of right
    # rows — same winner as the window's (__t, side, payload) order since
    # only right rows carry payloads), then per-key prefix over slices
    # max_by keeps the ordering key free of the payload when the payload
    # contains a non-orderable type (map) — mirroring _asof_prep's
    # order_keys tiebreak skip, so map payloads work here exactly as in
    # the plain variant
    tiebreak = _PAYLOAD in prep.order_keys
    last_order = (
        F.struct(F.col("__t"), F.col(_PAYLOAD)) if tiebreak else F.col("__t")
    )
    slice_last = (
        sliced.filter(F.col(_SIDE) == prep.r_side)
        .groupBy(by, "__slice")
        .agg(F.max_by(F.col(_PAYLOAD), last_order).alias("__slice_payload"))
    )
    # spine of ALL (key, slice) groups present — a slice with no right
    # rows still inherits carry-in from earlier slices
    spine = sliced.select(by, "__slice").distinct()
    prefix_frame = (
        W.partitionBy(by).orderBy("__slice").rowsBetween(W.unboundedPreceding, -1)
    )
    carry_in = (
        spine.join(slice_last, [by, "__slice"], "left")
        .withColumn(
            "__carry_in",
            F.last("__slice_payload", ignorenulls=True).over(prefix_frame),
        )
        .select(by, "__slice", "__carry_in")
    )
    # (3) fill: carry-in is strictly older than every row in the slice
    carried = (
        within.join(carry_in, [by, "__slice"], "left")
        .withColumn(_PAYLOAD, F.coalesce(F.col(_PAYLOAD), F.col("__carry_in")))
        .filter(F.col(_SIDE) == prep.l_side)
    )
    return _asof_output(carried, left, by, left_time, right_time,
                        prep.r_payload_cols, tolerance_seconds)


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_time: str,
    right_time: str,
    lower_seconds: float,
    upper_seconds: float,
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Inner join of ``left`` x ``right`` on ``by`` where
    ``left_time + lower <= right_time <= left_time + upper``.

    The time axis is bucketed (default width = window width) and each left
    row explodes to the handful of candidate buckets its window spans;
    the join is EQUI on (key, bucket) with the exact range applied after.
    Output: all left columns + all right columns (they must not collide).
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds < lower_seconds")
    if bucket_seconds is not None and bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    overlap = (set(right.columns) & set(left.columns)) - {by}
    if overlap:
        raise ValueError(f"column collision: {sorted(overlap)}")
    width = (
        bucket_seconds
        if bucket_seconds is not None
        else max(upper_seconds - lower_seconds, 1e-6)
    )
    n_buckets = math.ceil((upper_seconds - lower_seconds) / width) + 1

    def _q(name: str) -> str:
        """Backtick-quote an identifier for F.expr interpolation."""
        return "`" + name.replace("`", "``") + "`"

    def epoch(col: str) -> Column:
        return F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            f"{_q(col)}) / 1e6"
        )

    r = right.withColumn("__bucket", F.floor(epoch(right_time) / width))
    first_bucket = F.floor((epoch(left_time) + lower_seconds) / width)
    l = left.withColumn(
        "__bucket",
        F.explode(
            F.array_distinct(
                F.array(*[first_bucket + i for i in range(n_buckets)])
            )
        ),
    )
    lo_us = int(lower_seconds * 1_000_000)
    hi_us = int(upper_seconds * 1_000_000)
    gap = F.expr(f"timestampdiff(MICROSECOND, {_q(left_time)}, {_q(right_time)})")
    r2 = r.withColumnRenamed(by, "__rkey").withColumnRenamed("__bucket", "__rbucket")
    return (
        l.join(
            r2,
            (F.col("__rkey") == F.col(by)) & (F.col("__rbucket") == F.col("__bucket")),
        )
        .filter((gap >= lo_us) & (gap <= hi_us))
        .drop("__bucket", "__rbucket", "__rkey")
    )
