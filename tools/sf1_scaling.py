#!/usr/bin/env python
"""SF1 parallel-scaling evidence (VERDICT r11 #1).

At sf0.1 the whole catalog is fixed-overhead-bound: the r11 driver
measured 0/231 queries gaining >=2x from 4x the cores (median 8c/32c
ratio 0.84). That bench cannot demonstrate that the heavy family
PARALLELIZES — the work units are too small relative to 32 cores. This
tool runs the heaviest queries at sf1 (10x rows, synthesized
deterministically by tools/gen_scale_data.py) at 8 and at 32 cores —
fresh subprocess sessions so `local[N]` is honored exactly like the
driver's own scaling probe — and records the ratio
``t_8c / t_32c`` per query (2 runs each, min).

Writes SF1_SCALING_r12.json. Interpretation: ratio >= 2 at 4x cores
demonstrates real parallel speedup; ratio ~1 means the query is still
driver/latency-bound even at sf1 (each such query needs a per-query
note, not a silent pass).

Usage: python tools/sf1_scaling.py [sf1_dir] [out_json] [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the 20 heaviest catalog queries by the r11 driver bench (BENCH_r11):
# the streaming lifecycle family + semdedup/ER/graph + the heavy batch tier
HEAVY = [
    "stream_er_compacted",
    "stream_triangles_compacted",
    "stream_kcore_purchase",
    "stream_triangles_copurchase",
    "stream_er_entities",
    "stream_pagerank_purchase",
    "stream_assoc_compacted",
    "stream_assoc_rules",
    "stream_semdedup_compacted",
    "stream_bt_strength",
    "stream_semantic_dedup_clustered",
    "semdedup_prune_stats",
    "stream_communities_labelprop",
    "semantic_dedup_clustered",
    "stream_ivf_compacted",
    "cluster_safe_splits",
    "bt_supplier_strength",
    "communities_purchase_graph",
    "sim_ann_ivf_codebook",
    "dedup_cluster_sizes",
]

_CHILD = r"""
import json, sys, time
root, sf_dir, names, nruns = sys.argv[1], sys.argv[2], sys.argv[3].split(","), int(sys.argv[4])
sys.path.insert(0, root)
from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark import catalog
spark = build_session("sf1_scaling")
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.createDataFrame([(1,)], "x int").mapInPandas(lambda it: it, "x int").count()
out = {}
for name in names:
    ts = []
    for _ in range(nruns):
        t0 = time.perf_counter()
        try:
            catalog.queries()[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            out[name] = {"err": str(exc).splitlines()[0][:200]}
            break
        ts.append(round(time.perf_counter() - t0, 3))
    else:
        out[name] = {"runs": ts, "min": min(ts)}
print("SFRESULT" + json.dumps(out))
"""


def run_arm(cpus: int, sf_dir: str, names: list, nruns: int = 2) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_CHILD)
        child = f.name
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    p = subprocess.run(
        [sys.executable, child, _REPO, sf_dir, ",".join(names), str(nruns)],
        capture_output=True,
        text=True,
        env=env,
        cwd=_REPO,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("SFRESULT")]
    if not lines:
        raise SystemExit(
            f"child (cpus={cpus}) failed:\n{p.stdout[-500:]}\n{p.stderr[-3000:]}"
        )
    return json.loads(lines[0][8:])


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else os.path.join(_REPO, ".scale/sf1")
    out_json = args[1] if len(args) > 1 else os.path.join(_REPO, "SF1_SCALING_r12.json")
    names = args[2:] if len(args) > 2 else HEAVY
    # 32c first (the headline), then 8c — page cache is warm for both
    # after the first 32c pass, so the ratio is not biased by cold I/O
    res32 = run_arm(32, sf_dir, names)
    res8 = run_arm(8, sf_dir, names)
    per_query = {}
    for n in names:
        a, b = res32.get(n, {}), res8.get(n, {})
        entry = {"t_32c": a.get("min"), "t_8c": b.get("min"),
                 "runs_32c": a.get("runs"), "runs_8c": b.get("runs")}
        if a.get("err") or b.get("err"):
            entry["err"] = a.get("err") or b.get("err")
        elif a.get("min"):
            entry["ratio_8c_over_32c"] = round(b["min"] / a["min"], 2)
        per_query[n] = entry
    ratios = [
        v["ratio_8c_over_32c"]
        for v in per_query.values()
        if "ratio_8c_over_32c" in v
    ]
    payload = {
        "sf_dir": sf_dir,
        "cpus": [32, 8],
        "per_query": per_query,
        "n_ratio_ge_2": sum(1 for r in ratios if r >= 2.0),
        "n_ratio_ge_1_5": sum(1 for r in ratios if r >= 1.5),
        "median_ratio": sorted(ratios)[len(ratios) // 2] if ratios else None,
        "load_avg_end": list(os.getloadavg()),
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
