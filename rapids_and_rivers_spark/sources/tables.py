"""Batch parquet loaders for the test star schema (TESTDATA.md).

Quirk: the driver-generated parquet stores timestamps as
``INT64 (TIMESTAMP(NANOS))``, which Spark's vectorized reader rejects
([PARQUET_TYPE_ILLEGAL]). With ``spark.sql.legacy.parquet.nanosAsLong=true``
Spark reads them as LongType nanoseconds; we detect the affected columns
from the parquet footer (pyarrow) and restore proper ``timestamp_ntz``
columns JVM-side (``timestamp_micros(ns div 1000)``), so downstream
operators see real temporal types.

At scale this is a metadata-only fix: the footer probe reads one file's
schema, and the ns→ts conversion is a vectorized projection fused into the
scan stage — no extra pass, no Python on the data path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

_NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"

# First-read metadata memos, keyed by table path (guide §7.3: driver-side
# planning overhead). The star-schema tables are immutable for a session's
# lifetime, so the arrow footer probe and Spark's schema-inference job —
# paid on EVERY load_table call otherwise, i.e. 1-4 single-task jobs per
# catalog query across a 231-query sweep — are metadata that can be read
# once per path. ROWS are always re-read from parquet at action time;
# only the StructType/footer units are memoized (the duals.read_store
# first-read schema-cache pattern applied to the base tables). Invariant
# (shared with _BAND_SHAPE_CACHE): a path's files must not be rewritten
# with a DIFFERENT schema mid-process — scale tiers live in separate dirs.
_TS_COLS_CACHE: dict[str, dict[str, str]] = {}
_SCHEMA_CACHE: dict[str, "object"] = {}


def _timestamp_columns(path: str) -> dict[str, str]:
    """column -> arrow time unit ('ns'/'us'/'ms'/'s') from the parquet footer."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    cached = _TS_COLS_CACHE.get(path)
    if cached is not None:
        return cached
    schema = pq.read_schema(_first_parquet_file(path))
    out = {
        f.name: f.type.unit
        for f in schema
        if pa.types.is_timestamp(f.type)
    }
    _TS_COLS_CACHE[path] = out
    return out


def _first_parquet_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    for root, _, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    return path


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table, restoring nano-timestamp columns to timestamp_ntz."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    ts_cols = _timestamp_columns(path)
    needs_legacy = any(unit == "ns" for unit in ts_cols.values())
    if needs_legacy:
        spark.conf.set(_NANOS_AS_LONG, "true")
    known = _SCHEMA_CACHE.get(path)
    if known is not None:
        # schema METADATA only — skips the per-call single-task
        # inference job; the scan itself is untouched
        df = spark.read.schema(known).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    for col, unit in ts_cols.items():
        if unit == "ns" and dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(
                col,
                F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp_ntz"),
            )
    return df


def spread(df: DataFrame, by: str) -> DataFrame:
    """Repartition iff the scan is under-partitioned for this cluster.

    Local/small parquet often arrives as ONE split, serializing per-row
    compute onto one core. At 100 TB inputs already carry thousands of
    splits, so this is a no-op there — the guard avoids paying an
    unnecessary full-corpus shuffle at scale.
    """
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        underpartitioned = df.rdd.getNumPartitions() < max(2, target // 2)
    except Exception:
        # Spark Connect sessions expose neither sparkContext nor .rdd;
        # skip the optimization rather than guess (a blind repartition
        # would be a full shuffle on well-partitioned cluster inputs)
        return df
    if underpartitioned:
        return df.repartition(target, by)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the star schema and register each table as a temp view."""
    out = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
