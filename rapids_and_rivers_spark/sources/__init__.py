"""Sources: batch table loaders, ingest/egress utilities, and (see
streaming/) stream sources."""

from rapids_and_rivers_spark.sources.ingest import (
    bucketed_table,
    compact_parquet,
    morton_key,
    read_jsonl,
    write_bucketed,
    write_sorted,
    write_partitioned,
    write_zordered,
)
from rapids_and_rivers_spark.sources.tables import load_table, load_tables, spread, TABLES

__all__ = [
    "load_table",
    "load_tables",
    "spread",
    "TABLES",
    "read_jsonl",
    "compact_parquet",
    "write_partitioned",
    "write_bucketed",
    "write_sorted",
    "write_zordered",
    "morton_key",
    "bucketed_table",
]
