#!/usr/bin/env python
"""Repartitioning-determinism audit: every catalog query must produce the
IDENTICAL normalized result under different parallelism.

At 100 TB, partition counts change constantly (AQE, cluster resize, task
retry); any query whose output depends on partitioning — float
accumulation order reaching a rounded column, non-algebraic use of
collect_list order, limit-without-order, RNG — is silently wrong at
scale even when a single run passes its oracle. This tool runs each
query twice in one session (shuffle.partitions flipped between runs,
inputs repartitioned differently by a pre-pass config), normalizes both
results (sorted rows, canonical value forms — same normalize as
check_oracle), and reports any diff.

Usage: python tools/determinism_check.py [sf_dir] [query ...]
Exit 1 if any query's two runs differ.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark import catalog
from tools.check_oracle import normalize


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session("determinism_check")
    failures = []
    for name, fn in catalog.queries().items():
        if only and name not in only:
            continue
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = normalize(fn(spark, sf_dir).toPandas())
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            b = normalize(fn(spark, sf_dir).toPandas())
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: error: {str(exc).splitlines()[0][:200]}")
            continue
        if a != b:
            failures.append(name)
            diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"FAIL  {name}: outputs differ across partitionings "
                  f"(rows {len(a)} vs {len(b)}, first diffs {diffs})")
            for i in diffs:
                print(f"      p32: {a[i]}")
                print(f"      p7 : {b[i]}")
        else:
            print(f"ok    {name}: {len(a)} rows identical at 32 and 7 partitions")
    print()
    if failures:
        print(f"{len(failures)} NONDETERMINISTIC: {failures}")
        sys.exit(1)
    print("all queries partitioning-deterministic")


if __name__ == "__main__":
    main()
