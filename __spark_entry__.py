"""Driver contract for the spark-graft builder (PySpark target).

The implementations live in ``rapids_and_rivers_spark.catalog``; each
catalog entry pairs a Spark DataFrame query with a DuckDB oracle SQL
string (where SQL-expressible). See SURVEY.md §2 for the operator
inventory these cover.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rapids_and_rivers_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's ping->pong golden query (PingPong.kt:23-43)
    run end-to-end through the river + envelope engine on sf0.001."""
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    return catalog.queries()["pingpong"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # envelope merge semantics need LAST_WIN regardless of which
            # session the driver hands us
            spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in catalog.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return catalog.oracle_sql()
