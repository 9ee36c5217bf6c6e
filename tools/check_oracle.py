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


def _dump(json_out: str, results: dict) -> None:
    import json

    with open(json_out, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    # ordered, deduped: the caller's order IS the sweep order
    only = list(dict.fromkeys(args[1:]))
    # fail fast on typo'd names BEFORE the session builds — a KeyError
    # at row 150 of a multi-hour sweep wastes the whole budget (ADVICE r7)
    unknown = [n for n in only if n not in catalog.queries()]
    if unknown:
        print(f"unknown query names (not in catalog.queries()): {unknown}")
        sys.exit(2)
    results: dict[str, dict] = {}
    spark = build_session("check_oracle")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        # partial table sets are legitimate (the synthesized .scale dirs
        # carry only the 5 fact tables); a query touching a missing view
        # still fails loudly at its own row
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )

    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    failures = []
    # iterate in the CALLER'S order (long sweeps put never-verified
    # queries first; the incremental dump below makes a partial run a
    # usable artifact)
    for name in (only or list(qs)):
        if json_out and results:
            _dump(json_out, results)  # partial artifact survives a kill
        fn = qs[name]
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": str(exc).splitlines()[0][:300],
            }
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_df)} rows (no oracle — rows-only check)")
            results[name] = {
                "rows_match": len(spark_df) > 0, "schema_match": None,
                "hash_match": None, "spark_rows": len(spark_df),
                "oracle_rows": None, "err": None, "check": "rows_only",
            }
            if len(spark_df) == 0:
                failures.append(name)
                results[name]["err"] = "zero rows from rows-only query"
                print(f"WARN  {name}: zero rows")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as exc:
            failures.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": len(spark_df), "oracle_rows": None,
                "err": "duckdb: " + str(exc).splitlines()[0][:300],
            }
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        rec = {
            "rows_match": len(spark_df) == len(duck_df),
            "schema_match": s_cols == d_cols,
            "hash_match": False,
            "spark_rows": len(spark_df),
            "oracle_rows": len(duck_df),
            "err": None,
        }
        results[name] = rec
        if not rec["schema_match"]:
            failures.append(name)
            print(f"FAIL  {name}: columns differ: spark={s_cols} duck={d_cols}")
            continue
        if not rec["rows_match"]:
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(spark_df)} duck={len(duck_df)}")
            continue
        s_rows, d_rows = normalize(spark_df), normalize(duck_df)
        rec["hash_match"] = s_rows == d_rows
        if not rec["hash_match"]:
            failures.append(name)
            diffs = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b][:3]
            print(f"FAIL  {name}: values differ at sorted rows {diffs}")
            for i in diffs:
                print(f"      spark: {s_rows[i]}")
                print(f"      duck : {d_rows[i]}")
            continue
        print(f"OK    {name}: {len(spark_df)} rows")

    if json_out:
        _dump(json_out, results)
        print(f"\nwrote {len(results)} rows to {json_out}")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
