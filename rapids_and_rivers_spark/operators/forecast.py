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

__all__ = ["ses_backtest"]


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
    ).orderBy("key")
