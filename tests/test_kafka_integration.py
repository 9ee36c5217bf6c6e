"""GUARDED real-Kafka integration test — RapidIntegrationTest.kt:144-276
parity (consume -> enrich -> republish; restart resumes after committed
offsets, no redelivery of processed records).

Runs ONLY when both are available, and skips cleanly otherwise:

1. a reachable broker — set ``KAFKA_BROKERS`` (default ``localhost:9092``);
2. the Spark Kafka connector on the classpath.

Runbook (no broker ships in the test container):

    # 1. start a broker (KRaft, auto-create topics on)
    docker run -d --name kafka -p 9092:9092 apache/kafka:3.8.0
    # 2. put the connector on the classpath
    export PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0 pyspark-shell"
    # 3. run
    KAFKA_BROKERS=localhost:9092 python -m pytest tests/test_kafka_integration.py -v

The same option builders (consumer_options / producer_options) are already
unit-tested without a broker in test_streaming.py; this module is the
end-to-end path that actually moves records through them.
"""

from __future__ import annotations

import json
import os
import socket
import uuid

import pytest

BROKERS = os.environ.get("KAFKA_BROKERS", "localhost:9092")


def _broker_reachable() -> bool:
    host, _, port = BROKERS.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=2):
            return True
    except OSError:
        return False


def _connector_available(spark) -> bool:
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BROKERS
        ).option("subscribe", "__probe").option("startingOffsets", "earliest").load()
        return True
    except Exception as exc:  # noqa: BLE001 - classify, don't mask
        return "Failed to find" not in str(exc) and "kafka" not in str(exc).lower()


pytestmark = pytest.mark.skipif(
    not _broker_reachable(), reason=f"no Kafka broker reachable at {BROKERS}"
)


@pytest.fixture()
def kafka_ready(spark):
    if not _connector_available(spark):
        pytest.skip("spark-sql-kafka connector not on the classpath")
    return spark


def _seed(spark, topic: str, messages: list[tuple[str, str]]) -> None:
    df = spark.createDataFrame(messages, "key string, value string")
    (
        df.selectExpr("CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("topic", topic)
        .save()
    )


def _read_all(spark, topic: str) -> list[dict]:
    rows = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
        .collect()
    )
    return [json.loads(r.value) for r in rows]


def test_consume_enrich_republish_and_restart_no_redelivery(kafka_ready, tmp_path):
    """RapidIntegrationTest.kt:144-276: a river reads pings from the rapid
    topic, replies with pongs; after a graceful stop and restart with the
    same checkpoint, previously processed records are NOT reprocessed."""
    from pyspark.sql import functions as F
    from rapids_and_rivers_spark.functions import predicates as P
    from rapids_and_rivers_spark.river import River
    from rapids_and_rivers_spark.streaming.kafka import KafkaConfig, KafkaRapid

    spark = kafka_ready
    suffix = uuid.uuid4().hex[:8]
    in_topic, out_topic = f"rapid-in-{suffix}", f"rapid-out-{suffix}"
    ckpt = str(tmp_path / "ckpt")

    def build() -> KafkaRapid:
        cfg = KafkaConfig(
            brokers=BROKERS,
            rapid_topic=in_topic,
            reset_policy="earliest",
            group_id=f"g-{suffix}",
        )
        rapid = KafkaRapid(spark, cfg, service_name="it", instance_id="i-1")
        # replies go to a separate topic so assertions don't re-consume input
        rapid.config_out = KafkaConfig(brokers=BROKERS, rapid_topic=out_topic)

        def sink(replies):
            from rapids_and_rivers_spark.streaming.kafka import producer_options

            (
                replies.select(
                    F.col("key").cast("binary").alias("key"),
                    F.col("value").cast("binary").alias("value"),
                )
                .write.format("kafka")
                .options(**producer_options(rapid.config_out))
                .save()
            )

        rapid.set_sink(sink)
        rapid.register(
            River("pong")
            .validate(P.require_value("@event_name", "ping"))
            .respond(
                lambda passing: passing.select(
                    F.to_json(
                        F.named_struct(
                            F.lit("@event_name"), F.lit("pong"),
                            F.lit("ping_id"),
                            F.get_json_object("value", "$.ping_id"),
                        )
                    ).alias("value"),
                    "key",
                )
            )
        )
        return rapid

    _seed(spark, in_topic, [("k1", json.dumps({"@event_name": "ping", "ping_id": str(i)}))
                            for i in range(3)])
    rapid = build()
    q = rapid.start(ckpt, available_now=True, query_name=f"it_{suffix}")
    q.awaitTermination()
    pongs = [m for m in _read_all(spark, out_topic) if m.get("@event_name") == "pong"]
    assert sorted(m["ping_id"] for m in pongs) == ["0", "1", "2"]

    # restart with the SAME checkpoint after new input: only the new
    # record is processed (committed offsets survive the stop)
    _seed(spark, in_topic, [("k2", json.dumps({"@event_name": "ping", "ping_id": "9"}))])
    rapid2 = build()
    q2 = rapid2.start(ckpt, available_now=True, query_name=f"it2_{suffix}")
    q2.awaitTermination()
    pongs = [m for m in _read_all(spark, out_topic) if m.get("@event_name") == "pong"]
    assert sorted(m["ping_id"] for m in pongs) == ["0", "1", "2", "9"]
