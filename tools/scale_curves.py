#!/usr/bin/env python
"""Runtime scale curves for the heaviest operators: sf0.1 -> sf0.3 -> sf1.

Runs each selected catalog query at three scale factors (the driver's
sf0.1 plus the locally synthesized sf0.3/sf1 from gen_scale_data.py),
records wall-clock medians, and fits the effective scaling exponent
``alpha = log(t_hi/t_lo) / log(n_hi/n_lo)`` between the smallest and
largest SF. alpha <= ~1.1 is linear / n·log n territory; anything
materially above that names a super-linear operator.

Writes SCALING.json; SCALING.md is authored from it.

Usage: python tools/scale_curves.py [out_json] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark import catalog

HEAVIEST = [
    "communities_purchase_graph",
    "pagerank_purchase_graph",
    "ppr_supplier_recs",
    "graph_triangles",
    "entity_resolution",
    "dedup_minhash",
    "dedup_clusters_star",
    "ssjoin_prefix",
    "dedup_shared_spans",
    "sim_ann_ivf",
    "sim_ann_pq",
    # round-5 additions: the bounded kNN family and the new sketch/audio
    "label_noise_knn",
    "knn_graph_probe",
    "sketch_quantile_sample",
    "audio_pcm_features",
]

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = [
    ("sf0.1", "/root/testdata/sf0.1", 1.0),
    ("sf0.3", os.path.join(_REPO, ".scale/sf0.3"), 3.0),
    ("sf1", os.path.join(_REPO, ".scale/sf1"), 10.0),
]
# --sf3 appends the 30x tier (VERDICT r9 #1: probe the steepest curves
# past sf1 to see whether blocked-pair growth bends super-linear where
# fixed epoch/JVM overheads stop masking it) and records the TOP-END
# alpha sf1->sf3 alongside the usual sf0.1->sf1 fit.
SF3 = ("sf3", os.path.join(_REPO, ".scale/sf3"), 30.0)

REPS = 3


def main() -> int:
    argv = sys.argv[1:]
    sfs = list(SFS)
    if "--sf3" in argv:
        argv.remove("--sf3")
        sfs = sfs + [SF3]
    out_json = argv[0] if argv else "SCALING.json"
    only = argv[1:] or HEAVIEST
    spark = build_session("scale_curves")
    qs = catalog.queries()
    results: dict = {}
    for name in only:
        fn = qs[name]
        results[name] = {}
        for sf_name, sf_dir, _mult in sfs:
            times = []
            for _ in range(REPS):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                fn(spark, sf_dir).count()
                times.append(time.monotonic() - t0)
            times.sort()
            med = times[len(times) // 2]
            results[name][sf_name] = {
                "median_s": round(med, 3),
                "min_s": round(times[0], 3),
            }
            print(f"{name} @ {sf_name}: median {med:.2f}s  min {times[0]:.2f}s", flush=True)
        lo = results[name]["sf0.1"]["median_s"]
        hi = results[name]["sf1"]["median_s"]
        alpha = math.log(max(hi, 1e-9) / max(lo, 1e-9)) / math.log(10.0)
        results[name]["alpha_sf0.1_to_sf1"] = round(alpha, 3)
        print(f"{name}: alpha = {alpha:.2f}", flush=True)
        if "sf3" in results[name]:
            top = results[name]["sf3"]["median_s"]
            a3 = math.log(max(top, 1e-9) / max(hi, 1e-9)) / math.log(3.0)
            results[name]["alpha_sf1_to_sf3"] = round(a3, 3)
            print(f"{name}: top-end alpha (sf1->sf3) = {a3:.2f}", flush=True)
    payload = {
        "reps": REPS,
        "load_avg": os.getloadavg()[0],
        "queries": results,
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
