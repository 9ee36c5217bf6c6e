"""rapids_and_rivers_spark — a PySpark-native event-stream analytics engine.

A ground-up Spark re-expression of the capabilities of
``navikt/rapids-and-rivers`` (reference: Kotlin/Kafka microservice library,
see SURVEY.md): a *rapid* is one stream of JSON messages; a *river* is a
declaratively-filtered view of it (preconditions + validations compiled to
Catalyst Column expressions over a once-parsed variant column); handlers
enrich packets and republish with a standard envelope.

Design stance (SURVEY.md §7.1):
- compile, don't interpret: predicates become JVM-side Column expressions;
- verdict column, not bare filter: pass / precondition_failed /
  validation_failed / unparseable with ordered, accumulated error strings;
- batch/stream duality: the same expression tree runs on batch DataFrames
  (tests, TestRapid analog) and Structured Streaming (Kafka);
- envelope as an expression library applied at the publish select.

Beyond reference parity, ``operators/`` adds the large-scale pipeline
operators a 100 TB training-data pipeline needs: dedup (exact, MinHash-LSH,
SimHash, n-gram Jaccard), similarity search, and text analysis.
"""

from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark.river import River, Verdict
from rapids_and_rivers_spark.packet import Packet
from rapids_and_rivers_spark.problems import MessageProblems, MessageProblemsException

__all__ = [
    "build_session",
    "River",
    "Verdict",
    "Packet",
    "MessageProblems",
    "MessageProblemsException",
]

__version__ = "0.1.0"
