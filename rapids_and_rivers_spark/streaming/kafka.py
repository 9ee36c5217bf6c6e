"""Kafka source/sink configuration — the reference's env contract on Spark.

Mirrors (SURVEY.md §2.1): S1 multi-topic subscribe, S4 offset reset, S5
backpressure, S7 single-topic publish with durability, S9 producer config,
S10 SSL/env config (Defaults.kt:47-61, AivenConfig.kt:11-66,
ConsumerProducerFactory.kt).

No broker runs in the test container, so this module is the *config
surface*: option-dict builders (unit-tested) plus a :class:`KafkaRapid`
that wires them into :class:`StreamingRapid`. Offset-commit semantics
(S6, KafkaRapid.kt:132-158) are carried by Structured Streaming
checkpointing — the driver-side WAL replaces consumer-group commits, so
``group_id`` maps to the checkpoint location identity.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession, functions as F

from rapids_and_rivers_spark.streaming.runtime import StreamingRapid


@dataclass
class KafkaConfig:
    """Connection + consumption config (env contract of Defaults.kt:47-61)."""

    brokers: str
    rapid_topic: str
    extra_topics: list[str] = field(default_factory=list)
    group_id: str = "rapids-spark"
    reset_policy: str = "latest"  # KAFKA_RESET_POLICY (Defaults.kt:20,48)
    max_records: int | None = None  # KAFKA_MAX_RECORDS -> maxOffsetsPerTrigger
    #: S12 admin offsets-for-time (Consumer.kt:12-34): start from the first
    #: offset at/after this epoch-millis timestamp instead of reset_policy
    starting_timestamp_ms: int | None = None
    ssl: dict[str, str] = field(default_factory=dict)  # kafka.ssl.* passthrough
    extra_options: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "KafkaConfig":
        """Build from the reference's environment variable contract
        (Defaults.kt:47-61, README.md:92-96)."""
        env = env if env is not None else dict(os.environ)
        extra = env.get("KAFKA_EXTRA_TOPIC", "")
        return cls(
            brokers=env.get("KAFKA_BROKERS", "localhost:9092"),
            rapid_topic=env["KAFKA_RAPID_TOPIC"],
            extra_topics=[t for t in extra.split(",") if t],
            group_id=env.get("KAFKA_CONSUMER_GROUP_ID", "rapids-spark"),
            reset_policy=env.get("KAFKA_RESET_POLICY", "latest"),
            max_records=int(env["KAFKA_MAX_RECORDS"])
            if env.get("KAFKA_MAX_RECORDS")
            else None,
        )


def consumer_options(cfg: KafkaConfig) -> dict[str, str]:
    """readStream options: multi-topic subscribe (S1), reset policy (S4),
    backpressure (S5)."""
    topics = ",".join([cfg.rapid_topic, *cfg.extra_topics])
    opts = {
        "kafka.bootstrap.servers": cfg.brokers,
        "subscribe": topics,
        "startingOffsets": "earliest" if cfg.reset_policy == "earliest" else "latest",
        # at-least-once across restarts: resume from checkpoint, tolerate
        # compacted/expired offsets explicitly rather than silently
        "failOnDataLoss": "false",
    }
    if cfg.starting_timestamp_ms is not None:
        # seek-by-time supersedes the reset policy (Consumer.kt:12-34)
        opts.pop("startingOffsets")
        opts["startingTimestamp"] = str(cfg.starting_timestamp_ms)
    if cfg.max_records is not None:
        opts["maxOffsetsPerTrigger"] = str(cfg.max_records)
    for k, v in cfg.ssl.items():
        opts[f"kafka.{k}"] = v
    opts.update(cfg.extra_options)
    return opts


def producer_options(cfg: KafkaConfig) -> dict[str, str]:
    """writeStream options with the reference's durability/ordering choices
    (acks=all, max.in.flight=1, linger=0 — AivenConfig.kt:37-39); all
    writes go to the rapid topic (S7, KafkaRapid.kt:56-99)."""
    opts = {
        "kafka.bootstrap.servers": cfg.brokers,
        "topic": cfg.rapid_topic,
        "kafka.acks": "all",
        "kafka.max.in.flight.requests.per.connection": "1",
        "kafka.linger.ms": "0",
    }
    for k, v in cfg.ssl.items():
        opts[f"kafka.{k}"] = v
    return opts


class KafkaRapid(StreamingRapid):
    """A StreamingRapid reading from / writing to Kafka.

    The source exposes the full MessageMetadata surface (topic, partition,
    offset, timestamp, headers — MessageMetadata.kt:3-9) alongside the
    string-decoded key/value (StringDeserializer parity,
    ConsumerProducerFactory.kt:11-20).
    """

    def __init__(
        self,
        spark: SparkSession,
        config: KafkaConfig,
        service_name: str | None = None,
        instance_id: str | None = None,
    ):
        super().__init__(spark, service_name, instance_id)
        self.config = config
        src = (
            spark.readStream.format("kafka")
            .options(**consumer_options(config))
            .load()
            .select(
                F.col("value").cast("string").alias("value"),
                F.col("key").cast("string").alias("key"),
                "topic",
                "partition",
                "offset",
                "timestamp",
                "headers",
            )
        )
        self.set_source(src)
        self.set_sink(self._kafka_sink)

    def _kafka_sink(self, replies) -> None:
        """Per-batch publish to the rapid topic. Any write failure raises,
        failing the batch before its checkpoint commit — the crash-stop +
        redeliver-on-restart policy of the reference (KafkaRapid.kt:92-96):
        the batch re-runs from the last committed offset after restart."""
        (
            replies.select(
                F.col("key").cast("binary").alias("key"),
                F.col("value").cast("binary").alias("value"),
            )
            .write.format("kafka")
            .options(**producer_options(self.config))
            .save()
        )
