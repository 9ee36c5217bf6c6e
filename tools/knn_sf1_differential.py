#!/usr/bin/env python
"""sf1 differential for the exact-kNN family (closes the last sf1
exclusion, VERDICT r7 #4): `label_noise_knn`'s DuckDB oracle chain is
all-pairs over 20k vectors x 64 dims in SQL (infeasible), but the
ground truth itself is not — this tool recomputes the ENTIRE query
independently in numpy (blocked exact GEMM over the same
floor(x*1000) quantization, the same ``(sim DESC, id ASC)`` total
order, the same disagreement aggregates) and compares the catalog
query's sf1 output row-for-row.

Why this is value-level evidence of the same strength as a DuckDB
oracle: every quantity on both sides is exact integer arithmetic until
the final ratios — quantized dots <= 64e6 and norm products <= 4e15
are exactly representable, so the blocked float64 GEMM sums integers
below 2^53 (no rounding anywhere) and the similarity is ONE IEEE
division of identical operands in both engines. The only float
compares are therefore bit-identical, including ties (broken on the
neighbor id in both implementations).

Usage: python tools/knn_sf1_differential.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import math
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark.sources import load_table
from rapids_and_rivers_spark import catalog

K = 5
SCALE = 1000


def _half_up(x: float, nd: int) -> float:
    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP)
    )


def numpy_reference(sf_dir: str):
    import duckdb

    rows = duckdb.query(
        f"SELECT vec_id, label, embedding "
        f"FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    labs = np.array([r[1] for r in rows], dtype=np.int64)
    X = np.stack([np.asarray(r[2], dtype=np.float64) for r in rows])
    Q = np.floor(X * SCALE)  # exact integers in float64
    n2 = (Q * Q).sum(axis=1)  # exact, <= 64e6
    n = len(ids)
    # integer-exact per-target stats (m disagreeing of kk neighbors) —
    # the same exactness contract the catalog query carries after the
    # r8 fix: the label mean is ONE division of exact integer sums and
    # the suspect cut is 5m >= 4kk, so no float sum can tie-flip the
    # round-4 digit (this differential CAUGHT exactly that: label 9's
    # pooled mean at sf1 is exactly 0.89625)
    mk_by_label: dict[int, list[tuple[int, int]]] = {}
    blk = 2000
    for i0 in range(0, n, blk):
        dots = Q[i0 : i0 + blk] @ Q.T  # exact integer sums < 2^53
        for ii in range(dots.shape[0]):
            gi = i0 + ii
            sims = dots[ii] / np.sqrt(n2[gi] * n2)  # one IEEE div each
            sims[gi] = -np.inf  # exclude self
            # total order (sim DESC, id ASC); ids are sorted ascending,
            # so a stable argsort on -sims breaks ties on id ASC
            top = np.argsort(-sims, kind="stable")[:K]
            m = int((labs[top] != labs[gi]).sum())
            mk_by_label.setdefault(int(labs[gi]), []).append((m, len(top)))
    out = {}
    for lab, mks in mk_by_label.items():
        sm = sum(m for m, _ in mks)
        sk = sum(k for _, k in mks)
        out[lab] = (
            len(mks),
            _half_up(sm / sk, 4),
            sum(1 for m, k in mks if 5 * m >= 4 * k),
        )
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/sf1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "KNN_SF1_DIFF.json"
    ref = numpy_reference(sf_dir)
    spark = build_session("knn_sf1_diff")
    got = {
        int(r.label): (int(r.n_vecs), float(r.avg_disagreement), int(r.n_suspects))
        for r in catalog.queries()["label_noise_knn"](spark, sf_dir).collect()
    }
    mismatches = {
        lab: {"spark": got.get(lab), "numpy": ref.get(lab)}
        for lab in set(ref) | set(got)
        if got.get(lab) != ref.get(lab)
    }
    res = {
        "sf_dir": sf_dir,
        "labels": len(ref),
        "rows_match": len(got) == len(ref),
        "value_match": not mismatches,
        "mismatches": mismatches,
        "check": "independent numpy exact-GEMM reference (not DuckDB); "
        "same quantization, total order, and aggregates",
    }
    with open(out_json, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res)[:400])
    return 0 if res["value_match"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
