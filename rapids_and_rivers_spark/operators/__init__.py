"""Large-scale training-data pipeline operators (SURVEY.md §7.2 M5).

Beyond reference parity: the operations a 100 TB training-data pipeline
needs, designed Spark-first — deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding cosine), similarity search (brute-force top-k,
LSH-bucketed ANN), text analysis (language id, quality scoring, token
counting, fingerprinting), and multimodal column plumbing.
"""

from rapids_and_rivers_spark.operators import (
    bloomjoin,
    cdc,
    dedup,
    forecast,
    fuzzy,
    graph,
    joins,
    mining,
    multimodal,
    retrieval,
    selection,
    similarity,
    sketch,
    skew,
    text,
    validation,
)

__all__ = [
    "bloomjoin",
    "cdc",
    "dedup",
    "forecast",
    "fuzzy",
    "graph",
    "joins",
    "mining",
    "multimodal",
    "retrieval",
    "selection",
    "similarity",
    "sketch",
    "skew",
    "text",
    "validation",
]
