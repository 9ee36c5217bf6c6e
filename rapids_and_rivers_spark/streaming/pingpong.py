"""The built-in ping->pong responder river (PingPong.kt:23-43).

Reference behavior: on ``@event_name == "ping"`` with a parseable
``ping_time``, reply ``pong`` carrying ``ping_time`` through plus
``pong_time`` / ``app_name`` / ``instance_id``; drop pings older than
``max_age`` (1 h); rate-limit replies (≤1 per 5 s wall clock — here one
per rate-limit bucket of event time, the deterministic generalization).

Implemented as an expression responder: the whole reply plan is Catalyst
(merge over the parsed message map + envelope stamp), no Python per
message.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from rapids_and_rivers_spark.functions import envelope as E
from rapids_and_rivers_spark.functions import predicates as P
from rapids_and_rivers_spark.river import River


def pingpong_river(
    app_name: str,
    instance_id: str,
    max_age_seconds: int = 3600,
    rate_limit_seconds: int = 5,
    now: F.Column | None = None,
) -> River:
    """Build the pingpong river with its expression responder attached."""

    river = (
        River("pingpong")
        .precondition(P.require_value("@event_name", "ping"))
        .validate(P.require_parseable("ping_time", "localdatetime"))
    )

    def responder(passing: DataFrame) -> DataFrame:
        ping_ts = F.to_timestamp(
            F.try_variant_get(F.col("__variant"), "$['ping_time']", "string")
        )
        df = passing.withColumn("ping_ts", ping_ts)
        clock = now if now is not None else F.current_timestamp()
        df = df.filter(
            F.col("ping_ts")
            >= clock.cast("timestamp") - F.expr(f"INTERVAL {max_age_seconds} SECOND")
        )
        # rate limit: one pong per bucket (reference: lastPing var,
        # PingPong.kt:29-35; here per event-time bucket => deterministic
        # and partition-parallel)
        bucket = F.floor(F.unix_timestamp("ping_ts") / rate_limit_seconds)
        df = (
            df.withColumn("bucket", bucket)
            .withColumn(
                "rn",
                F.row_number().over(W.partitionBy("bucket").orderBy("ping_ts", "value")),
            )
            .filter(F.col("rn") == 1)
        )
        m = E.to_message_map(F.col("value"))
        pong_time = F.date_format(F.col("ping_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        reply = E.merge(
            m,
            {
                "@event_name": E.vlit("pong"),
                "pong_time": E.variant_of(pong_time),
                "app_name": E.vlit(app_name),
                "instance_id": E.vlit(instance_id),
            },
        )
        stamped = E.stamp_reply(reply, m)
        return df.select(E.to_json_message(stamped).alias("value"), "key")

    return river.respond(responder)
