"""Pipeline metrics — the reference's Micrometer surface as observations.

Reference metrics (River.kt:79-102,126-140): ``message_counter`` (tags:
river, validated, event_name), ``message_keys_counter`` (per recognized
key), ``on_packet_seconds`` timer. Spark mapping: ``DataFrame.observe``
aggregates ride the existing action — zero extra passes, collected on the
driver after each batch/action (streaming: per micro-batch via
``QueryProgressEvent.observedMetrics``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

from rapids_and_rivers_spark.river import VARIANT_COL, VERDICT_COL, Verdict


def observe_verdicts(
    evaluated: DataFrame, name: str = "river_metrics"
) -> tuple[DataFrame, Observation | str]:
    """Attach message_counter-equivalent metrics to an evaluated river DF.

    Returns ``(df, observation)``; after an action runs on ``df``,
    ``observation.get`` yields ``{messages, passed, precondition_failed,
    validation_failed, unparseable}``. On streaming DFs a named observe is
    used (read the same metrics from ``QueryProgressEvent.observedMetrics``)
    and the name is returned instead of an Observation handle.
    """
    counters = [
        F.count(F.lit(1)).alias("messages"),
        F.count(F.when(F.col(VERDICT_COL) == Verdict.PASS, 1)).alias("passed"),
        F.count(
            F.when(F.col(VERDICT_COL) == Verdict.PRECONDITION_FAILED, 1)
        ).alias("precondition_failed"),
        F.count(
            F.when(F.col(VERDICT_COL) == Verdict.VALIDATION_FAILED, 1)
        ).alias("validation_failed"),
        F.count(F.when(F.col(VERDICT_COL) == Verdict.UNPARSEABLE, 1)).alias(
            "unparseable"
        ),
    ]
    if evaluated.isStreaming:
        return evaluated.observe(name, *counters), name
    obs = Observation(name)
    return evaluated.observe(obs, *counters), obs


class PacketTimer:
    """``on_packet_seconds`` parity (River.kt:74-88): per-(river, listener)
    wall-time totals and call counts for Python packet handlers.

    The reference wraps every ``packetListener.onPacket`` in a Micrometer
    timer tagged (rapid, river, event_name). Spark mapping: a pair of
    accumulators per (river, listener) — updated executor-side inside the
    ``mapInPandas`` handler loop (`perf_counter` around each call, ~ns
    overhead), merged into driver-readable totals with each task result.
    Accumulators are created lazily on the DRIVER (they cannot be created
    inside a serialized closure) before the batch is planned.
    """

    def __init__(self, spark):
        self._spark = spark
        self._acc: dict[str, tuple] = {}

    def pair(self, name: str) -> tuple:
        """(count_acc, seconds_acc) for a listener label, created on demand."""
        if name not in self._acc:
            sc = self._spark.sparkContext
            self._acc[name] = (sc.accumulator(0), sc.accumulator(0.0))
        return self._acc[name]

    def snapshot(self) -> dict[str, dict[str, float]]:
        """{label: {count, total_seconds}} — the timer readout."""
        return {
            n: {"count": c.value, "total_seconds": s.value}
            for n, (c, s) in self._acc.items()
        }


def recognized_key_counts(evaluated: DataFrame, river) -> DataFrame:
    """``message_keys_counter`` parity (P3, River.kt:91-102): for each key
    the river declared, how many PASSING packets carried it non-null.

    One aggregation pass (a conditional count per key), unpivoted to
    ``(key, n)`` rows — no per-key scans.
    """
    from rapids_and_rivers_spark.functions import json_ops as J

    v = F.col(VARIANT_COL)
    counts = [
        F.count(F.when(~J.is_missing_or_null(v, k), 1)).alias(k)
        for k in river.declared_keys
    ]
    agg = evaluated.filter(F.col(VERDICT_COL) == Verdict.PASS).agg(*counts)
    return agg.unpivot([], list(river.declared_keys), "key", "n")


def event_name_counts(evaluated: DataFrame, variant_col: str = "__variant") -> DataFrame:
    """Per-event-name message counts (the event_name metric tag,
    River.kt:195-233) as a groupBy — for dashboards/sinks rather than
    inline observation."""
    return evaluated.groupBy(
        F.coalesce(
            F.try_variant_get(F.col(variant_col), "$['@event_name']", "string"),
            F.lit("ukjent"),
        ).alias("event_name"),
        VERDICT_COL,
    ).agg(F.count(F.lit(1)).alias("n"))
