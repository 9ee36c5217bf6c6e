"""Sources: batch table loaders and (see streaming/) stream sources."""

from rapids_and_rivers_spark.sources.tables import load_table, load_tables, spread, TABLES

__all__ = ["load_table", "load_tables", "spread", "TABLES"]
