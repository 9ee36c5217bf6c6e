"""Structured Streaming runtime: the rapid as a streaming pipeline.

- runtime:   source-agnostic dispatch (foreachBatch -> rivers -> sinks)
- kafka:     Kafka source/sink config surface (reference env contract)
- pingpong:  the built-in ping->pong responder river
- lifecycle: application lifecycle events via StreamingQueryListener
"""

from rapids_and_rivers_spark.streaming.runtime import StreamingRapid

__all__ = ["StreamingRapid"]
