"""Time-series smoothing: per-key simple exponential smoothing (SES)
with one-step-ahead backtest error, as a single ordered fold.

Reference parity note: extension surface (the reference has no data
operators); this is the forecasting companion to the repo's
decayed_user_activity / gap_filled_daily_counts time-series family.

Exactness design — the ordered-fold discipline (the linreg/q1 rule
applied to a sequential recurrence): SES is inherently order-dependent
(``s_t = α·x_t + (1-α)·s_{t-1}``), so instead of any engine-ordered
float aggregation the series is materialized per key as a SORTED array
of exact integer observations (cents) and folded with ``F.aggregate``
— ONE deterministic left-to-right walk whose float ops an oracle
engine replays verbatim as a recursive CTE in the same order. Every
step is two IEEE multiplies + one add on bit-identical inputs, so the
final level and the backtest error are bit-identical cross-engine; no
rounding tricks needed until the output boundary.

Scale: the fold is per-KEY and the array holds one element per
aggregation bucket (e.g. days), not per raw row — daily rollup of 100
TB of events is the usual keyed integer-sum shuffle, and the fold then
touches |keys| x |days| tiny structs. Keys fold independently
(embarrassingly parallel); a series too long for one array (decades of
seconds-granularity buckets) re-buckets coarser first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["ses_backtest", "cusum_alarms"]


def ses_backtest(
    daily: DataFrame,
    key_col: str = "key",
    order_col: str = "day",
    value_col: str = "cents",
    alpha: float = 0.5,
) -> DataFrame:
    """Fold each key's series (ordered by ``order_col``) through SES.

    ``daily`` must carry ONE row per (key, order) with an exact-integer
    ``value_col`` (the money-sum idiom: pre-aggregate to cents). The
    level initializes at the first observation; for every later
    observation the one-step-ahead forecast is the running level, so
    ``abs_err_sum = Σ_t |x_t - s_{t-1}|`` is the backtest residual mass.

    Output: (key, n_obs, level, mae) where level/mae are the folded
    doubles rounded at the boundary (4 digits, /100 back to currency
    units) — deterministic because the entire float path is a single
    ordered walk (module docstring).
    """
    a = float(alpha)
    series = (
        daily.groupBy(F.col(key_col).alias("key"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(order_col).alias("o"),
                        F.col(value_col).cast("long").alias("v"),
                    )
                )
            ).alias("xs")
        )
    )
    init = F.struct(
        F.lit(0.0).alias("s"), F.lit(0.0).alias("err"), F.lit(0).cast("long").alias("k")
    )
    step = lambda acc, x: F.when(  # noqa: E731
        acc["k"] == 0,
        F.struct(
            x["v"].cast("double").alias("s"),
            F.lit(0.0).alias("err"),
            F.lit(1).cast("long").alias("k"),
        ),
    ).otherwise(
        F.struct(
            (F.lit(a) * x["v"].cast("double") + F.lit(1.0 - a) * acc["s"]).alias("s"),
            (acc["err"] + F.abs(x["v"].cast("double") - acc["s"])).alias("err"),
            (acc["k"] + F.lit(1).cast("long")).alias("k"),
        )
    )
    folded = series.select("key", F.aggregate("xs", init, step).alias("acc"))
    return folded.select(
        "key",
        F.col("acc.k").alias("n_obs"),
        F.round(F.col("acc.s") / F.lit(100.0), 4).alias("level"),
        F.when(
            F.col("acc.k") >= 2,
            F.round(
                F.col("acc.err") / ((F.col("acc.k") - F.lit(1)).cast("double") * F.lit(100.0)),
                4,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("mae"),
    )


def cusum_alarms(
    daily: DataFrame,
    key_col: str = "key",
    order_col: str = "day",
    value_col: str = "cents",
    threshold_den: int = 8,
) -> DataFrame:
    """Two-sided CUSUM change-point detection (Page 1954) per key over
    an exact-integer daily series — the sequential-monitoring companion
    to the z-score/PSI drift operators: alarms fire when the cumulative
    deviation from the series mean crosses the threshold, then the
    accumulator resets (classic alarm-and-restart).

    Exactness — division-free integer CUSUM: with n observations and
    integer total T, the scaled deviation ``d_t = n·x_t − T`` keeps the
    mean subtraction exact (Σd = 0 identically); the accumulators
    ``S⁺ = max(0, S⁺ + d)`` / ``S⁻ = max(0, S⁻ − d)`` and the alarm
    test ``threshold_den·S > |T|`` (threshold |T|/threshold_den without
    dividing; default |T|/8) are all int64,
    so every alarm decision is engine-invariant — the SES ordered-fold
    discipline with zero float ops anywhere. The threshold is the
    ABSOLUTE series total: a refund-heavy key whose cents sum to zero
    or negative must not get a non-positive threshold (which would fire
    both directions on every observation — an alarm storm); with
    |T| = 0 the accumulators themselves stay 0 for constant-zero
    series, and a mean-zero series alarms on any sustained drift,
    which is the correct degenerate CUSUM behavior.

    Scale: same shape as :func:`ses_backtest` — daily rollup is the
    keyed integer-sum shuffle, the fold walks |keys| × |days| structs.

    Output: one row per alarm (key, day, direction, s_scaled) where
    s_scaled is the n-scaled cumulative excess at the alarm."""
    series = (
        daily.groupBy(F.col(key_col).alias("key"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(order_col).alias("o"),
                        F.col(value_col).cast("long").alias("v"),
                    )
                )
            ).alias("xs"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(value_col).cast("long")).alias("total"),
        )
    )
    # the empty-alarm array must carry the caller's order-column type
    # (date in the catalog, plain int in tests) or concat type-mismatches
    o_type = daily.schema[order_col].dataType.simpleString()
    empty_alarms = F.array().cast(
        f"array<struct<o:{o_type},dir:string,s:bigint>>"
    )
    init = F.struct(
        F.lit(0).cast("long").alias("s_up"),
        F.lit(0).cast("long").alias("s_dn"),
        empty_alarms.alias("al"),
    )

    def step(acc, x):
        d = F.col("n") * x["v"] - F.col("total")
        su = F.greatest(F.lit(0).cast("long"), acc["s_up"] + d)
        sd = F.greatest(F.lit(0).cast("long"), acc["s_dn"] - d)
        den = F.lit(int(threshold_den)).cast("long")
        # abs(): a zero/negative-total series must not make the
        # threshold non-positive (ADVICE r8 — alarm storm otherwise)
        alarm_up = (den * su) > F.abs(F.col("total"))
        alarm_dn = (den * sd) > F.abs(F.col("total"))
        up_row = F.when(
            alarm_up,
            F.array(F.struct(x["o"].alias("o"), F.lit("up").alias("dir"), su.alias("s"))),
        ).otherwise(empty_alarms)
        dn_row = F.when(
            alarm_dn,
            F.array(
                F.struct(x["o"].alias("o"), F.lit("down").alias("dir"), sd.alias("s"))
            ),
        ).otherwise(empty_alarms)
        return F.struct(
            F.when(alarm_up, F.lit(0).cast("long")).otherwise(su).alias("s_up"),
            F.when(alarm_dn, F.lit(0).cast("long")).otherwise(sd).alias("s_dn"),
            F.concat(acc["al"], up_row, dn_row).alias("al"),
        )

    folded = series.select(
        "key", F.aggregate("xs", init, step).alias("acc")
    )
    return folded.select("key", F.explode(F.col("acc.al")).alias("a")).select(
        "key",
        F.col("a.o").alias("day"),
        F.col("a.dir").alias("direction"),
        F.col("a.s").alias("s_scaled"),
    )
