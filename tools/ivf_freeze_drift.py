#!/usr/bin/env python
"""Quantizer-freeze drift of the streaming IVF index (VERDICT r8 #3).

``duals.ivf_index_foreach_batch`` trains its coarse quantizer ONCE, on
epoch 0, and freezes it for the stream's lifetime (the faiss
train-offline-then-add contract). The r8 sf1 sweep verified the frozen
index is COMPUTED right (hash-equal to batch IVF sharing the same
codebook); this tool measures whether the freeze is still a GOOD
quantizer once the corpus has grown 10x past the training epoch, and —
the adversarial case — when the distribution DRIFTS after the freeze.

Three streaming scenarios, all at the at-scale cell rule
(``ann_recall_scale.ivf_params``), each probed with the same query set
against exact brute-force ground truth:

- ``frozen-unbiased``: epoch 0 is a uniform 1/8 sample of the corpus
  (hash split), 7 more epochs stream the rest. Freeze cost with NO
  drift — pure early-subsample effect.
- ``frozen-drifted``: epoch 0 carries only HALF the label space
  (labels 0..4); later epochs stream the unseen labels. The quantizer
  has never seen the late distribution — worst case for a freeze.
- ``batch-full``: batch ``ivf_topk`` whose codebook samples the FULL
  corpus — the no-freeze upper reference.

Reading rule: if frozen-drifted holds within a few recall points of
batch-full, the freeze contract stands even under drift; if it
collapses, the contract must gain a re-train trigger (e.g. codebook
refresh when cell-occupancy skew crosses a bound) — either way the
number, not the assertion, decides (the round-8 PQ lesson).

Usage: python tools/ivf_freeze_drift.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark.sources import load_table
from rapids_and_rivers_spark.operators import similarity as S
from rapids_and_rivers_spark.streaming.duals import (
    ivf_index_foreach_batch,
    ivf_query_from_index,
)

K = 5
N_EPOCHS = 8


def ivf_params(n: int) -> tuple[int, int]:
    cells = 1 << max(2, int(round(math.log2(n / 48))))
    return cells, max(1, cells // 4)


def stream_recall(cands, qs, exact, n_cells, nprobe, epoch_col) -> float:
    """Build a frozen-codebook streaming index with epoch 0 = rows where
    epoch_col == 0, then epochs 1..N-1, and measure recall@K."""
    spark = cands.sparkSession
    index_dir = tempfile.mkdtemp(prefix="ivf_drift_")
    try:
        stage = ivf_index_foreach_batch(index_dir, 64, n_cells=n_cells)
        for e in range(N_EPOCHS):
            batch = cands.filter(epoch_col == e)
            stage(batch, e)
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_query_from_index(
                spark, index_dir, qs, k=K, nprobe=nprobe
            ).collect()
        }
        return round(len(exact & got) / len(exact), 4)
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "IVF_FREEZE_DRIFT.json"
    spark = build_session("ivf_freeze_drift")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    n_labels = emb.select("label").distinct().count()
    n_cells, nprobe = ivf_params(n)
    res: dict = {
        "sf_dir": sf_dir,
        "corpus": n,
        "k": K,
        "n_cells": n_cells,
        "nprobe": nprobe,
        "epochs": N_EPOCHS,
    }

    cands = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        S.as_double_array(F.col("embedding")).alias("c_emb"),
        F.col("label"),
    ).persist()
    qs = emb.filter(F.col("vec_id") % 199 == 0).select(
        F.col("vec_id").alias("query_id"),
        S.as_double_array(F.col("embedding")).alias("q_emb"),
    ).persist()
    res["n_queries"] = qs.count()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(qs, cands, k=K).collect()
    }

    # batch reference: codebook sampled from the whole corpus
    batch = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(
            qs, cands, 64, k=K, n_cells=n_cells, nprobe=nprobe
        ).collect()
    }
    res["batch_full"] = round(len(exact & batch) / len(exact), 4)
    print(f"batch-full codebook: recall@{K} {res['batch_full']}", flush=True)

    # frozen, unbiased epoch 0: uniform hash split into N_EPOCHS parts
    uni_epoch = F.pmod(F.xxhash64(F.col("neighbor_id").cast("string")),
                       F.lit(N_EPOCHS))
    res["frozen_unbiased"] = stream_recall(
        cands, qs, exact, n_cells, nprobe, uni_epoch
    )
    print(f"frozen-unbiased epoch0: recall@{K} {res['frozen_unbiased']}",
          flush=True)

    # frozen, drifted epoch 0: first half of the label space only;
    # the second half streams in later epochs the quantizer never saw
    half = n_labels // 2
    drift_epoch = F.when(
        F.col("label") < half,
        F.pmod(F.xxhash64(F.col("neighbor_id").cast("string")),
               F.lit(N_EPOCHS // 2)),
    ).otherwise(
        F.lit(N_EPOCHS // 2)
        + F.pmod(F.xxhash64(F.col("neighbor_id").cast("string")),
                 F.lit(N_EPOCHS - N_EPOCHS // 2))
    )
    res["frozen_drifted"] = stream_recall(
        cands, qs, exact, n_cells, nprobe, drift_epoch
    )
    print(f"frozen-drifted epoch0: recall@{K} {res['frozen_drifted']}",
          flush=True)

    res["drift_cost_vs_batch"] = round(
        res["batch_full"] - res["frozen_drifted"], 4
    )
    with open(out_json, "w") as f:
        json.dump(res, f, indent=2, sort_keys=True)
    print(f"wrote {out_json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
