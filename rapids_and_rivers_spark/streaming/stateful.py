"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's ONLY cross-record mutable state is ``PingPong.lastPing``
(PingPong.kt:29-35): a wall-clock rate limiter. Its faithful streaming
generalization needs state that survives micro-batch boundaries — a batch
window/row_number can dedup *within* a batch but forgets between triggers.

:func:`rate_limit_by_key` keeps one ``last_emit`` timestamp per key in the
Spark state store: at-most-one emission per key per ``interval_seconds``
of event time, across batches and restarts (state is checkpointed).

Scale design: state is partitioned by key across executors (the state
store shuffles on the grouping key exactly once per batch); per-key state
is a single double, so state size is O(distinct keys), not O(events).
Python cost is one Arrow batch per key-group per trigger, not per record.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    StructField,
    StructType,
)

#: state carried per key: epoch-seconds of the last emitted record
_STATE_SCHEMA = StructType([StructField("last_emit", DoubleType())])


def rate_limit_by_key(
    df: DataFrame,
    key_col: str,
    time_col: str,
    interval_seconds: float,
    output_mode: str = "append",
) -> DataFrame:
    """Emit at most one record per ``key_col`` per ``interval_seconds``.

    Works on streaming AND batch DataFrames: streaming runs
    ``applyInPandasWithState`` (checkpointed state store); batch runs the
    identical per-group limiter through ``applyInPandas`` (Spark forbids
    the stateful API on batch queries), so tests and backfills share the
    operator. Records are considered in ``time_col`` order within each
    key-group; a record is emitted when its event time is at least
    ``interval_seconds`` after the last emission.

    Mirrors PingPong.kt:29-35 (``lastPing`` + 5 s limit) with per-key
    instead of global state; pass a constant key column for the global
    behavior.
    """
    out_schema = df.schema

    def _limit(pdf: pd.DataFrame, last_emit: float | None):
        pdf = pdf.sort_values(time_col)
        keep = []
        for i, ts in enumerate(pdf[time_col]):
            epoch = ts.timestamp()
            if last_emit is None or epoch - last_emit >= interval_seconds:
                keep.append(i)
                last_emit = epoch
        return pdf.iloc[keep], last_emit

    if not df.isStreaming:
        def batch_limiter(pdf: pd.DataFrame) -> pd.DataFrame:
            out, _ = _limit(pdf, None)
            return out

        return df.groupBy(key_col).applyInPandas(batch_limiter, out_schema)

    def limiter(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (last_emit,) = state.get if state.exists else (None,)
        for pdf in pdfs:
            out, last_emit = _limit(pdf, last_emit)
            if len(out):
                yield out
        if last_emit is not None:
            state.update((last_emit,))

    return df.groupBy(key_col).applyInPandasWithState(
        limiter,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sequence_by_key(
    df: "DataFrame",
    key_col: str,
    ts_col: str,
) -> "DataFrame":
    """Per-key monotonic sequence numbers that survive restarts: every
    record gets ``seq`` = how many records of its key came before it
    (within-batch ordered by ``ts_col``; the running offset lives in the
    checkpointed state store).

    The per-entity ordering audit a keyed bus enables: with the
    reference's one-partition-per-key ordering contract, seq
    gaps/regressions downstream pinpoint reordering or loss.

    Streaming runs ``applyInPandasWithState``; batch takes the identical
    window-function fallback. (Spark 4's successor API,
    ``transformWithStateInPandas``, is the drop-in upgrade — its worker
    needs the ``protobuf`` package, absent in this environment.)

    Scale: state is one BIGINT per key; rows arrive grouped per key per
    micro-batch (one Arrow batch each).
    """
    from pyspark.sql import Window as W

    out_schema = f"{key_col} string, ts timestamp, seq bigint"
    if not df.isStreaming:
        w = W.partitionBy(key_col).orderBy(ts_col)
        return df.select(
            F.col(key_col),
            F.col(ts_col).alias("ts"),
            (F.row_number().over(w) - 1).cast("long").alias("seq"),
        )

    def number(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (start,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            n = len(pdf)
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    "ts": pdf["ts"],
                    "seq": range(start, start + n),
                }
            )
            start += n
        state.update((start,))

    return (
        df.select(F.col(key_col), F.col(ts_col).alias("ts"))
        .groupBy(key_col)
        .applyInPandasWithState(
            number,
            outputStructType=out_schema,
            stateStructType="start bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
