"""Structured Streaming runtime: the rapid as a streaming pipeline.

- runtime:   source-agnostic dispatch (foreachBatch -> rivers -> sinks)
- kafka:     Kafka source/sink config surface (reference env contract)
- pingpong:  the built-in ping->pong responder river
- lifecycle: application lifecycle events via StreamingQueryListener
- state:     state-store backend selection (RocksDB default)
"""

from rapids_and_rivers_spark.streaming.runtime import StreamingRapid
from rapids_and_rivers_spark.streaming.state import (
    ROCKSDB_PROVIDER,
    current_provider,
    enable_hdfs_state,
    enable_rocksdb_state,
)

__all__ = [
    "StreamingRapid",
    "ROCKSDB_PROVIDER",
    "current_provider",
    "enable_hdfs_state",
    "enable_rocksdb_state",
]
