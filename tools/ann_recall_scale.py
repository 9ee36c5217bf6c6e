#!/usr/bin/env python
"""ANN retrieval QUALITY at scale (VERDICT r7 #5): recall-vs-exact at
sf1 for the IVF and PQ tiers and the banded embedding near-dup, under
their documented at-scale parameter rules.

The sf1 correctness sweep verifies hash-equality of each tier against
its oracle — i.e. the approximation is COMPUTED right — but says
nothing about whether the approximation is still a GOOD one at 10x
cardinality: recall at fixed (n_cells, nprobe) falls as cells fill,
and sign-LSH band survival p^r falls as r grows with the corpus. This
tool measures the numbers the floors actually claim.

At-scale parameter derivations (the rules under test):

- IVF: ``n_cells ~ corpus / target_cell_rows`` (pow2, target 32-64
  rows/cell — similarity.py ivf_topk: a cell must fit an executor and
  the probe set must stay a constant FRACTION of the corpus), with
  ``nprobe = n_cells / 4`` holding the 25% probe fraction the sf0.001
  floors were pinned at. Random-direction embeddings give recall ~
  probe fraction, so the floor should HOLD if the codebook stays
  balanced at 10x.
- PQ: the sf0.001 code shape (m=4, k_cells=8 -> 12 code bits, 4096
  distinct codes) is UNDER-CODED for a 20k corpus (~5 vectors/code):
  measured ADC recall collapses 0.35 -> 0.09 at sf1. The re-derivation
  rule this tool pins: total code bits ``m * log2(k_cells)`` must
  exceed ``~2 * log2(corpus)`` (code collisions stay rare), and the
  exact-rerank shortlist grows to ``10 * topk`` — m=8, k_cells=16,
  rerank=50 (4 B/vector) re-holds the 0.35 floor at sf1; m=16 (8
  B/vector) shows the RAM-for-recall headroom. ADC scans the whole
  corpus either way; this is purely quantization confusion as
  neighbors densify.
- banded near-dup (dedup.banded_blocks): per-band block rows are held
  ~64 by ``r = ceil(log2(corpus / (labels * 64)))``; band survival at
  the threshold cosine is ``p^r`` with ``p = 1 - acos(c)/pi``, so the
  band count is RE-DERIVED from the documented 0.75 floor:
  ``B = ceil(ln(1 - 0.75) / ln(1 - p^r))``. At sf1 (corpus 20k,
  labels 10): r=5, p(0.4)=0.6315, p^5=0.1004 -> B=14 (16 used, pow2
  margin). The measured number is recall over the operator's contract
  (within-label true pairs); the cross-label fraction is reported
  separately, since label blocking excludes those BY DESIGN.

Usage: python tools/ann_recall_scale.py [sf_dir] [out_json]
Writes a JSON recall table (consumed into SCALING.md).
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark.sql import functions as F

from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark.sources import load_table
from rapids_and_rivers_spark.operators import similarity as S
from rapids_and_rivers_spark.operators import dedup as D

K = 5
NEARDUP_T = 0.4
RECALL_FLOOR_BANDS = 0.75


def ivf_params(n: int) -> tuple[int, int]:
    cells = 1 << max(2, int(round(math.log2(n / 48))))
    return cells, max(1, cells // 4)


def band_params(n: int, labels: int, cos_t: float) -> tuple[int, int]:
    r = max(1, math.ceil(math.log2(n / (labels * 64))))
    p = 1.0 - math.acos(cos_t) / math.pi
    b = math.ceil(math.log(1.0 - RECALL_FLOOR_BANDS) / math.log(1.0 - p**r))
    b = 1 << math.ceil(math.log2(b))  # pow2 margin
    return r, b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/sf1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "ANN_RECALL_SF1.json"
    spark = build_session("ann_recall_scale")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    labels = emb.select("label").distinct().count()
    res: dict = {"sf_dir": sf_dir, "corpus": n, "labels": labels, "k": K}

    cands = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        S.as_double_array(F.col("embedding")).alias("c_emb"),
    )
    qs = emb.filter(F.col("vec_id") % 199 == 0).select(
        F.col("vec_id").alias("query_id"),
        S.as_double_array(F.col("embedding")).alias("q_emb"),
    )
    nq = qs.count()
    res["n_queries"] = nq
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(qs, cands, k=K).collect()
    }

    # --- IVF at the at-scale cell rule -----------------------------------
    n_cells, nprobe = ivf_params(n)
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(
            qs, cands, 64, k=K, n_cells=n_cells, nprobe=nprobe
        ).collect()
    }
    res["ivf"] = {
        "n_cells": n_cells,
        "nprobe": nprobe,
        "probe_fraction": nprobe / n_cells,
        "recall": round(len(exact & ivf) / len(exact), 4),
    }
    print(f"IVF n_cells={n_cells} nprobe={nprobe}: recall@{K} "
          f"{res['ivf']['recall']}", flush=True)

    # --- PQ: the fixed small-sf shape (shows the honest degradation) vs
    # the bit-rule re-derivation (shows the floor re-holds) ---------------
    res["pq"] = {"configs": []}
    for tag, m, kc, rr, sn in [
        ("sf0.001-shape", 4, 8, 0, 512),
        ("sf0.001-shape+rerank", 4, 8, 4 * K, 512),
        ("rederived-4B", 8, 16, 10 * K, 1024),
        ("rederived-8B", 16, 16, 10 * K, 1024),
    ]:
        got = {
            (r.query_id, r.neighbor_id)
            for r in S.pq_topk(
                qs, cands, 64, m=m, k_cells=kc, topk=K, sample_n=sn,
                rerank=rr, corpus_n=n,
            ).collect()
        }
        rec = round(len(exact & got) / len(exact), 4)
        res["pq"]["configs"].append(
            {"tag": tag, "m": m, "k_cells": kc, "rerank": rr,
             "code_bits": m * (kc.bit_length() - 1), "recall": rec}
        )
        print(f"PQ {tag} m={m} k={kc} rr={rr}: recall {rec}", flush=True)

    # --- banded near-dup: exact ground truth via blocked numpy ------------
    rows = emb.select("vec_id", "embedding", "label").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    labs = np.array([r.label for r in rows], dtype=np.int64)
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    true_within, true_cross = set(), 0
    blk = 4000
    for i0 in range(0, len(ids), blk):
        sims = Xn[i0 : i0 + blk] @ Xn.T
        for ii, row in enumerate(sims):
            gi = i0 + ii
            hits = np.nonzero(row >= NEARDUP_T)[0]
            for j in hits:
                if ids[gi] < ids[j]:
                    if labs[gi] == labs[j]:
                        true_within.add((int(ids[gi]), int(ids[j])))
                    else:
                        true_cross += 1
    r_planes, n_bands = band_params(n, labels, NEARDUP_T)
    blocked = emb.withColumn(
        "blk",
        D.banded_blocks(
            S.as_double_array(F.col("embedding")),
            F.col("label"),
            64,
            n_planes=r_planes,
            n_bands=n_bands,
            seed=7,
        ),
    )
    got = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in D.embedding_neardup_pairs(
            blocked, emb_col="embedding", id_col="vec_id",
            block_col="blk", threshold=NEARDUP_T,
        ).collect()
    }
    recall = len(got & true_within) / max(1, len(true_within))
    res["neardup"] = {
        "threshold": NEARDUP_T,
        "n_planes": r_planes,
        "n_bands": n_bands,
        "true_within_label_pairs": len(true_within),
        "true_cross_label_pairs": true_cross,
        "found_pairs": len(got),
        "recall_within_label": round(recall, 4),
        "theory_floor_at_threshold": RECALL_FLOOR_BANDS,
    }
    print(
        f"near-dup r={r_planes} B={n_bands}: recall {recall:.4f} over "
        f"{len(true_within)} within-label true pairs "
        f"({true_cross} cross-label excluded by the label prior)",
        flush=True,
    )

    with open(out_json, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {out_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
