#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every catalog query in
Spark AND its DuckDB oracle on the same parquet tables, compare row count,
column names, and the order-insensitive value multiset.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark import catalog


def normalize(df):
    """pandas DF -> sorted list of row tuples with canonical value forms."""
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(f"{v:.6f}")
            elif hasattr(v, "isoformat"):
                vals.append(v.isoformat())
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session("check_oracle")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_df)} rows (no oracle — rows-only check)")
            if len(spark_df) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            failures.append(name)
            print(f"FAIL  {name}: columns differ: spark={s_cols} duck={d_cols}")
            continue
        if len(spark_df) != len(duck_df):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(spark_df)} duck={len(duck_df)}")
            continue
        s_rows, d_rows = normalize(spark_df), normalize(duck_df)
        if s_rows != d_rows:
            failures.append(name)
            diffs = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b][:3]
            print(f"FAIL  {name}: values differ at sorted rows {diffs}")
            for i in diffs:
                print(f"      spark: {s_rows[i]}")
                print(f"      duck : {d_rows[i]}")
            continue
        print(f"OK    {name}: {len(spark_df)} rows")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
