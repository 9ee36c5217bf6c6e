#!/usr/bin/env python
"""Deterministic scale-up synthesis for SCALING.md runtime curves.

Extends the driver's sf0.1 tables to larger scale factors WITHOUT
touching /root/testdata: each output row set is the base table
replicated ``mult`` times with per-replica key offsets and
deterministic decorrelating mutations, so row counts scale linearly
while the per-operator work shape stays representative:

- ``orders``/``lineitem``: order keys and customer keys offset per
  replica (the customer population scales with the data, as in TPC-H);
  SUPPLIER keys are shared across replicas — supplier degree grows with
  scale, which keeps the purchase graph connected and adds the hub skew
  a real marketplace graph develops as it grows.
- ``documents``: doc_ids offset; for replicas > 0 a deterministic
  md5-keyed substitution rewrites ~35% of tokens, pushing cross-replica
  Jaccard well below every dedup threshold. Each replica keeps the
  base's INTERNAL near-duplicate structure, so true-pair counts (and
  candidate counts) scale linearly — the regime the blocked dedup
  operators are designed for. (Replicating text verbatim instead would
  create mult-sized duplicate clusters and quadratic pair growth — a
  data-construction artifact, not an operator property.)
- ``embeddings``: vec_ids offset; each replica applies a seeded
  dimension permutation + sign flips (norm-preserving), so
  cross-replica cosines look like fresh random directions while each
  replica retains the base's neighborhood structure.

Determinism: every mutation keys off md5/seeded-PRNG of (replica, id) —
two runs produce byte-identical tables.

Usage: python tools/gen_scale_data.py <mult> <out_dir> [base_dir]
e.g.   python tools/gen_scale_data.py 3 /tmp/scale/sf0.3
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


KEY_SPAN = 10_000_000  # > any base key; replica r offsets keys by r*span


def _base(table: str, base_dir: str) -> pa.Table:
    return pq.read_table(os.path.join(base_dir, f"{table}.parquet"))


def gen_orders_lineitem(mult: int, out_dir: str, base_dir: str) -> None:
    orders = _base("orders", base_dir)
    lineitem = _base("lineitem", base_dir)
    o_parts, l_parts = [], []
    for r in range(mult):
        off = r * KEY_SPAN
        o = orders.to_pandas()
        o["o_orderkey"] = o["o_orderkey"] + off
        o["o_custkey"] = o["o_custkey"] + off  # customers scale with data
        o_parts.append(o)
        li = lineitem.to_pandas()
        li["l_orderkey"] = li["l_orderkey"] + off
        # l_suppkey UNCHANGED: suppliers shared across replicas -> degree
        # (and skew) grows with scale, graph stays connected
        l_parts.append(li)
    import pandas as pd

    pq.write_table(
        pa.Table.from_pandas(pd.concat(o_parts, ignore_index=True), schema=orders.schema),
        os.path.join(out_dir, "orders.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(pd.concat(l_parts, ignore_index=True), schema=lineitem.schema),
        os.path.join(out_dir, "lineitem.parquet"),
    )


def _mutate_text(text: str, r: int, doc_id: int) -> str:
    if r == 0:
        return text
    toks = text.split(" ")
    out = []
    for i, t in enumerate(toks):
        h = hashlib.md5(f"{r}:{doc_id}:{i}:{t}".encode()).digest()
        if h[0] < 90:  # ~35% of tokens rewritten deterministically
            out.append("x" + h[1:5].hex())
        else:
            out.append(t)
    return " ".join(out)


def gen_events(mult: int, out_dir: str, base_dir: str) -> None:
    import pandas as pd

    events = _base("events", base_dir)
    parts = []
    for r in range(mult):
        d = events.to_pandas()
        d["event_id"] = d["event_id"] + r * KEY_SPAN
        d["user_id"] = d["user_id"] + r * KEY_SPAN  # user population scales
        parts.append(d)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True), schema=events.schema),
        os.path.join(out_dir, "events.parquet"),
    )


def gen_documents(mult: int, out_dir: str, base_dir: str) -> None:
    import pandas as pd

    docs = _base("documents", base_dir)
    parts = []
    for r in range(mult):
        d = docs.to_pandas()
        d["doc_id"] = d["doc_id"] + r * KEY_SPAN
        if r:
            d["text"] = [
                _mutate_text(t, r, int(i))
                for t, i in zip(d["text"], d["doc_id"])
            ]
            d["n_chars"] = d["text"].str.len().astype("int64")
        parts.append(d)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True), schema=docs.schema),
        os.path.join(out_dir, "documents.parquet"),
    )


def gen_embeddings(mult: int, out_dir: str, base_dir: str) -> None:
    import pandas as pd

    emb = _base("embeddings", base_dir)
    base = emb.to_pandas()
    dim = len(base["embedding"].iloc[0])
    parts = []
    for r in range(mult):
        d = base.copy()
        d["vec_id"] = d["vec_id"] + r * KEY_SPAN
        if r:
            rng = np.random.RandomState(1000 + r)
            perm = rng.permutation(dim)
            signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
            X = np.stack(d["embedding"].to_numpy()).astype(np.float32)
            X = X[:, perm] * signs  # norm-preserving decorrelation
            d["embedding"] = list(X)
        parts.append(d)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True), schema=emb.schema),
        os.path.join(out_dir, "embeddings.parquet"),
    )


def gen_dims(mult: int, out_dir: str, base_dir: str) -> None:
    """Dimension tables, FK-consistent with the scaled facts: customer
    replicates with the SAME per-replica key offset orders applies to
    o_custkey (the customer population scales with the data);
    region/nation/supplier/part copy verbatim (suppliers and parts are
    shared across replicas — their degree grows with scale, matching
    gen_orders_lineitem). This is what lets the relational TPC-H family
    run at the synthesized SFs, not just the document/graph operators."""
    import pandas as pd

    cust = _base("customer", base_dir)
    parts = []
    for r in range(mult):
        d = cust.to_pandas()
        d["c_custkey"] = d["c_custkey"] + r * KEY_SPAN
        parts.append(d)
    pq.write_table(
        pa.Table.from_pandas(pd.concat(parts, ignore_index=True), schema=cust.schema),
        os.path.join(out_dir, "customer.parquet"),
    )
    for t in ("region", "nation", "supplier", "part"):
        pq.write_table(_base(t, base_dir), os.path.join(out_dir, f"{t}.parquet"))


def main() -> int:
    dims_only = "--dims-only" in sys.argv
    argv = [a for a in sys.argv if a != "--dims-only"]
    mult = int(argv[1])
    out_dir = argv[2]
    base_dir = argv[3] if len(argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    if not dims_only:
        gen_orders_lineitem(mult, out_dir, base_dir)
        gen_events(mult, out_dir, base_dir)
        gen_documents(mult, out_dir, base_dir)
        gen_embeddings(mult, out_dir, base_dir)
    gen_dims(mult, out_dir, base_dir)
    tables = ("customer", "supplier", "part") if dims_only else (
        "orders", "lineitem", "events", "documents", "embeddings", "customer"
    )
    for t in tables:
        n = pq.read_metadata(os.path.join(out_dir, f"{t}.parquet")).num_rows
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
