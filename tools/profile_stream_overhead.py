#!/usr/bin/env python
"""Where does the fixed epoch cost of the heavy streaming duals go?
(VERDICT r8 #4: stream_triangles 39 s / stream_assoc_rules 30 s /
stream_er 28.5 s at sf0.1 are epoch-overhead-dominated by their own
scale curves — alphas 0.04-0.14 — so the constant, not the data term,
is the optimization surface.)

Instruments the actual catalog queries by monkeypatching the two
action sites every foreachBatch stage funnels through — parquet writes
and driver collects — and prints a per-action wall-time table plus the
store's resulting file counts (small-file commit overhead is the prime
suspect: a partitionBy write from T tasks over B bucket values commits
up to T x B files per epoch).

Usage: python tools/profile_stream_overhead.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.readwriter as rw
from pyspark.sql import DataFrame

from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark import catalog

EVENTS: list[tuple[str, str, float]] = []

_orig_parquet = rw.DataFrameWriter.parquet
_orig_collect = DataFrame.collect


def _tag(path: str) -> str:
    parts = [p for p in path.split(os.sep) if p]
    return "/".join(parts[-3:])


def _timed_parquet(self, path, **kw):
    t0 = time.time()
    r = _orig_parquet(self, path, **kw)
    EVENTS.append(("write", _tag(path), time.time() - t0))
    return r


def _timed_collect(self):
    t0 = time.time()
    r = _orig_collect(self)
    EVENTS.append(("collect", f"{len(r)} rows", time.time() - t0))
    return r


def count_files(root: str) -> tuple[int, int]:
    n, total = 0, 0
    for r, _d, files in os.walk(root):
        for f in files:
            if not f.startswith(("_", ".")):
                n += 1
                total += os.path.getsize(os.path.join(r, f))
    return n, total


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [
        "stream_triangles_copurchase",
        "stream_assoc_rules",
        "stream_er_entities",
    ]
    spark = build_session("profile_stream_overhead")
    rw.DataFrameWriter.parquet = _timed_parquet
    DataFrame.collect = _timed_collect

    import tempfile

    for name in names:
        EVENTS.clear()
        spark.catalog.clearCache()
        tmp_before = set(os.listdir(tempfile.gettempdir()))
        t0 = time.time()
        df = catalog.queries()[name](spark, sf_dir)
        t_build = time.time() - t0
        t1 = time.time()
        n_rows = len(_orig_collect(df))
        t_read = time.time() - t1
        total = time.time() - t0
        print(f"\n=== {name}: total {total:.1f}s "
              f"(build+epochs {t_build:.1f}s, final read {t_read:.1f}s, "
              f"{n_rows} rows)")
        acc: dict[str, tuple[int, float]] = {}
        for kind, tag, dt in EVENTS:
            key = f"{kind:7s} {tag}"
            c, s = acc.get(key, (0, 0.0))
            acc[key] = (c + 1, s + dt)
        for key, (c, s) in sorted(acc.items(), key=lambda kv: -kv[1][1]):
            print(f"  {s:6.2f}s  x{c:<3d} {key}")
        instrumented = sum(s for _c, s in acc.values())
        print(f"  {instrumented:6.2f}s  instrumented "
              f"({100 * instrumented / total:.0f}% of total)")
        # store shape: file counts of the state dirs this query created
        for d in sorted(set(os.listdir(tempfile.gettempdir())) - tmp_before):
            full = os.path.join(tempfile.gettempdir(), d)
            if os.path.isdir(full) and d.startswith("rars_"):
                nf, size = count_files(full)
                print(f"  store {d}: {nf} files, {size / 1e6:.1f} MB "
                      f"({size / max(nf, 1) / 1e3:.0f} KB/file)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
