#!/usr/bin/env python
"""Scale curves for the PROBED kNN tiers (round-10 label_noise_knn cap
evidence) — two shapes, because they are different promises:

- ``fraction`` (nprobe = cells/4): the shape the ANN recall floors were
  pinned under (tests/test_ann_recall.py). Scanning a constant FRACTION
  of the corpus per item is still Θ(n²) work — it divides the constant
  by 4, it does not change the exponent. Measured here so the repo
  never mistakes it for the scale path.
- ``fixed`` (nprobe = 8, cells ~ n / 48): constant candidates per item
  (nprobe x cell rows), i.e. O(n) total scoring — the true 100 TB
  shape. Its recall is the honest cost: this tool measures
  neighbor-pair recall vs EXACT kNN at sf1 alongside the runtime, so
  the linear tier ships with its quality number, not prose.

The catalog's label_noise_knn stays pinned to the EXACT tier (full
DuckDB value oracle; Θ(n²) by definition — top-end alpha 2.17 measured
in SCALING_r10_sf3.json). This tool is the documented cap's evidence.

Usage: python tools/knn_probed_scale.py [out_json]
Writes KNN_PROBED_SCALE.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark.sources import load_table
from rapids_and_rivers_spark.operators.similarity import knn_self_join

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIERS = [
    ("sf0.1", "/root/testdata/sf0.1", 1.0),
    ("sf1", os.path.join(_REPO, ".scale/sf1"), 10.0),
    ("sf3", os.path.join(_REPO, ".scale/sf3"), 30.0),
]
REPS = 2
TARGET_CELL_ROWS = 48
FIXED_NPROBE = 8


def n_cells_for(n: int) -> int:
    # exact corpus-proportional cells, NOT pow2-rounded: the rounding
    # swung rows-per-cell 34..68 between tiers (sf1 read 39, sf3 59),
    # aliasing a spurious 1.5x into the 2-point scoring term — the
    # r10 1.32 and the first r11 1.62 top-end fits both carried it.
    # Constant cluster rows is the controlled variable that lets the
    # fit measure the ALGORITHM's n-dependence.
    return max(4, math.ceil(n / TARGET_CELL_ROWS))


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("long").alias("label"), "embedding"
    )


def _time_knn(spark, emb, n_cells, nprobe):
    times = []
    for _ in range(REPS):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        knn_self_join(
            emb, dim=64, k=5, n_cells=n_cells, nprobe=nprobe,
            payload="label",
        ).count()
        times.append(time.monotonic() - t0)
    times.sort()
    return round(times[len(times) // 2], 3), round(times[0], 3)


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "KNN_PROBED_SCALE.json"
    spark = build_session("knn_probed_scale")
    results: dict = {
        "reps": REPS,
        "target_cell_rows": TARGET_CELL_ROWS,
        "fixed_nprobe": FIXED_NPROBE,
        "shapes": {"fixed": {}, "fraction": {}},
    }
    for name, sf_dir, mult in TIERS:
        emb = _emb(spark, sf_dir)
        n = emb.count()
        cells = n_cells_for(n)
        shapes = [("fixed", min(FIXED_NPROBE, cells))]
        # the fraction shape is Θ(n²)/4 BY CONSTRUCTION — measuring it
        # at sf3 costs ~20 min to confirm arithmetic; two tiers pin the
        # exponent (1.04 measured sf0.1->sf1) and the sf3 point is
        # extrapolation the reader can do
        if name != "sf3":
            shapes.append(("fraction", max(1, cells // 4)))
        for shape, nprobe in shapes:
            med, mn = _time_knn(spark, emb, cells, nprobe)
            results["shapes"][shape][name] = {
                "n": n, "n_cells": cells, "nprobe": nprobe,
                "median_s": med, "min_s": mn, "mult": mult,
            }
            print(
                f"{shape} @ {name}: n={n} cells={cells} nprobe={nprobe} "
                f"median {med}s", flush=True,
            )
    for shape, t in results["shapes"].items():
        for lo, hi, span in (("sf0.1", "sf1", 10.0), ("sf1", "sf3", 3.0)):
            if lo not in t or hi not in t:
                continue
            a = math.log(
                max(t[hi]["median_s"], 1e-9) / max(t[lo]["median_s"], 1e-9)
            ) / math.log(span)
            t[f"alpha_{lo}_to_{hi}"] = round(a, 3)
            print(f"{shape}: alpha {lo}->{hi} = {a:.2f}", flush=True)

    # recall of the FIXED (linear) shape vs exact kNN at sf1: fraction
    # of exact (t, c) neighbor pairs the probed tier reproduces
    emb1 = _emb(spark, TIERS[1][1])
    n1 = emb1.count()
    cells1 = n_cells_for(n1)
    exact = {
        (r.t, r.c)
        for r in knn_self_join(
            emb1, dim=64, k=5, n_cells=cells1, nprobe=None, payload="label"
        ).select("t", "c").collect()
    }
    fixed = {
        (r.t, r.c)
        for r in knn_self_join(
            emb1, dim=64, k=5, n_cells=cells1, nprobe=FIXED_NPROBE,
            payload="label",
        ).select("t", "c").collect()
    }
    results["fixed_shape_recall_sf1"] = round(
        len(exact & fixed) / max(1, len(exact)), 4
    )
    print(
        f"fixed-shape neighbor recall vs exact @ sf1: "
        f"{results['fixed_shape_recall_sf1']}", flush=True,
    )
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
