#!/usr/bin/env python
"""Interleaved A/B matched-pair bench for cross-revision comparisons.

Sequential per-round benches (BENCH_full.json) carry box-state bias:
back-to-back runs of the SAME commit swing 1.5× on this box from page
cache, CPU frequency, and competing I/O that load averages don't see
(measured round 7 — the r5→r6 "1.21× regression" vanished under this
design). This tool alternates SIDE_A/SIDE_B subprocess runs and compares
per-query MINIMA, which cancels drift a sequential design cannot.

Usage:
    python tools/ab_bench.py <repo_root_a> <repo_root_b> \
        [--rounds N] [--queries q1,q2,...]

Each side gets a fresh SparkSession per round (subprocess), one timed
run per query per round; output is one JSON object with per-side
per-query minima and totals. Check out the comparison revision with
`git worktree add` so both sides read the same testdata.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

DEFAULT_QUERIES = [
    "river_require_value",
    "river_require_any",
    "river_dsl_v2",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q8_market_share",
    "q10_returned_items",
    "text_repetition_signals",
    "quality_deciles",
    "heavy_hitters_cms",
]

_CHILD = r"""
import json, sys, time
root, names = sys.argv[1], sys.argv[2].split(",")
sys.path.insert(0, root)
from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark import catalog
sf_dir = "/root/testdata/sf0.1"
spark = build_session("ab_bench")
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.createDataFrame([(1,)], "x int").mapInPandas(lambda it: it, "x int").count()
catalog.events_rapid(spark, sf_dir).count()
qs = catalog.queries()
out = {}
for name in names:
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = round(time.perf_counter() - t0, 3)
print(json.dumps(out))
spark.stop()
"""


def run_side(root: str, queries: list[str]) -> dict[str, float]:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_CHILD)
        script = f.name
    # PYTHONPATH (not just the child's sys.path) so PySpark WORKER
    # processes also import this side's revision — otherwise any
    # mapInPandas/pandas-UDF stage silently executes the other side's
    # executor-side code and contaminates the A/B (ADVICE r7)
    env = {**os.environ, "PYTHONPATH": root}
    r = subprocess.run(
        [sys.executable, script, root, ",".join(queries)],
        capture_output=True,
        text=True,
        timeout=1800,
        env=env,
    )
    if r.returncode != 0:
        raise RuntimeError(f"{root}: {r.stderr[-500:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("root_a")
    ap.add_argument("root_b")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = ap.parse_args()
    queries = args.queries.split(",")
    sides = {"a": args.root_a, "b": args.root_b}
    raw: dict[str, dict[str, list[float]]] = {s: {} for s in sides}
    for rnd in range(args.rounds):
        for tag, root in sides.items():
            got = run_side(root, queries)
            for q, t in got.items():
                raw[tag].setdefault(q, []).append(t)
            print(
                f"round {rnd} {tag}({root}): {round(sum(got.values()), 3)}",
                file=sys.stderr,
                flush=True,
            )
    mins = {s: {q: min(ts) for q, ts in raw[s].items()} for s in sides}
    print(
        json.dumps(
            {
                "roots": sides,
                "mins": mins,
                "totals": {
                    s: round(sum(v.values()), 3) for s, v in mins.items()
                },
                "raw": raw,
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
