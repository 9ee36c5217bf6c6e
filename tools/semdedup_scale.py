#!/usr/bin/env python
"""Asymptotic scale curve for cluster-blocked SemDeDup (round 11).

The catalog queries' curve (SCALING_r11_semdedup.json) straddles the
oracle-stability KNEE by design: ``adaptive_cell_count`` clamps to the
static oracles' 16 cells below 32k rows, so between sf1 (20k rows,
1250-row clusters) and sf3 (60k rows, 2000-row clusters) the per-item
pair work grows 1.6x and the measured sf1->sf3 exponent reads ~1.2-1.4
— the knee, not the algorithm. This tool measures the ASYMPTOTIC
regime the operator is in past the knee (and at 100 TB): cells =
n / target at EVERY tier (no clamp), so cluster size is a constant
2000 rows everywhere and the only growth is O(n · cluster) candidate
work + O(n · k) assignment.

alpha <= ~1.1 here is the honest exponent claim for the family; the
catalog curve documents the knee. Writes SEMDEDUP_SCALE.json.

Usage: python tools/semdedup_scale.py [out_json]
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
from rapids_and_rivers_spark.operators.dedup import semantic_dedup_clustered

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIERS = [
    ("sf0.3", os.path.join(_REPO, ".scale/sf0.3"), 3.0),
    ("sf1", os.path.join(_REPO, ".scale/sf1"), 10.0),
    ("sf3", os.path.join(_REPO, ".scale/sf3"), 30.0),
]
TARGET = 2000
REPS = 3


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SEMDEDUP_SCALE.json"
    spark = build_session("semdedup_scale")
    results: dict = {"target_cluster_rows": TARGET, "reps": REPS, "tiers": {}}
    for name, sf_dir, mult in TIERS:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        n = emb.count()
        # UNCLAMPED corpus-proportional cells: constant 2000-row clusters
        n_cells = max(2, math.ceil(n / TARGET))
        times = []
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            kept = (
                semantic_dedup_clustered(
                    emb, dim=64, threshold=0.4, n_cells=n_cells
                )
                .filter(F.col("is_kept"))
                .count()
            )
            times.append(time.monotonic() - t0)
        times.sort()
        results["tiers"][name] = {
            "n": n,
            "n_cells": n_cells,
            "cluster_rows": round(n / n_cells, 1),
            "median_s": round(times[len(times) // 2], 3),
            "min_s": round(times[0], 3),
            "kept": kept,
            "mult": mult,
        }
        print(
            f"{name}: n={n} cells={n_cells} median "
            f"{times[len(times)//2]:.2f}s kept={kept}",
            flush=True,
        )
    t = results["tiers"]
    for lo, hi, span in (("sf0.3", "sf1", 10 / 3), ("sf1", "sf3", 3.0)):
        a = math.log(
            max(t[hi]["median_s"], 1e-9) / max(t[lo]["median_s"], 1e-9)
        ) / math.log(span)
        results[f"alpha_{lo}_to_{hi}"] = round(a, 3)
        print(f"alpha {lo}->{hi} = {a:.2f}", flush=True)
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
