#!/usr/bin/env python
"""State-cardinality scale curve: executor state memory + throughput of
a keyed stateful dual vs number of distinct keys, heap-backed
(HDFSBackedStateStoreProvider) vs RocksDB.

The round-5 verdict's remaining scale defect: the keyed stateful duals
hold per-key state in executor memory under the default provider —
invisible at sf0.1, an OOM at 100 TB key cardinalities. This tool turns
that claim into a measurement (the SCALING.md methodology): for key
counts K in a sweep, run `first_seen_stream` (state = one boolean per
key — the purest "state rows = keys" operator) over K-key synthetic
input under each provider and record

  - wall seconds + rows/s (availableNow drain),
  - the operator's reported state memory (stateOperators[0]
    .memoryUsedBytes — the JVM-object estimate under the heap provider,
    RocksDB's in-RAM usage under RocksDB) plus, for RocksDB,
    customMetrics.rocksdbSstFileSize (local DISK — the part that
    scales with K instead of executor RAM) and
    rocksdbPinnedBlocksMemoryUsage.

Expected shape (and what round 6 measured — SCALING.md): heap state
memory grows LINEARLY with K; RocksDB in-RAM usage stays ~flat under
the configured budget while SST bytes absorb the growth — i.e. key
cardinality prices as local disk, not executor heap. Throughput stays
within a small constant across providers (the stateful path is
Arrow/Python-bound, not store-bound).

Usage: python tools/state_scale.py OUT.json [K ...]   (default sweep
100_000 1_000_000 4_000_000)

SCD2 A/B mode (VERDICT r6 task 2 — the committed bench showed SCD2
dropping 54.0k -> 40.5k rows/s in the round that made RocksDB the
default, measured under different box states in different rounds; this
mode measures both providers under the SAME load): `python
tools/state_scale.py OUT.json --scd2 [n_keys [rows_per_key [rounds]]]`
runs scd2_stream (fat per-key open-interval state, the heaviest state
payload in the engine) under heap and RocksDB in INTERLEAVED rounds
(A/B/A/B — sequential designs carry box drift, see tools/ab_bench.py)
and records per-provider median + min rows/s.
"""

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rapids_and_rivers_spark import build_session  # noqa: E402
from rapids_and_rivers_spark.streaming.duals import first_seen_stream  # noqa: E402
from rapids_and_rivers_spark.streaming.state import (  # noqa: E402
    enable_hdfs_state,
    enable_rocksdb_state,
)


def gen_input(spark, base: str, n_keys: int) -> str:
    """K distinct keys, 2 rows per key (forces a state lookup + an
    update path per key), written once as parquet."""
    path = os.path.join(base, f"in_{n_keys}")
    if not os.path.exists(path):
        (
            spark.range(2 * n_keys)
            .select(
                F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string")).alias(
                    "fp"
                ),
                F.col("id").alias("doc_id"),
                F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias(
                    "ts"
                ),
            )
            .repartition(32)
            .write.parquet(path)
        )
    return path


def run_arm(spark, in_path: str, provider: str, work: str) -> dict:
    if provider == "rocksdb":
        enable_rocksdb_state(spark)
    else:
        enable_hdfs_state(spark)
    ckpt = os.path.join(work, f"ck_{provider}_{os.path.basename(in_path)}")
    shutil.rmtree(ckpt, ignore_errors=True)
    src = (
        spark.readStream.schema("fp string, doc_id long, ts timestamp")
        .parquet(in_path)
    )
    out = first_seen_stream(src, "fp", "ts")
    t0 = time.time()
    q = (
        out.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    prog = q.lastProgress
    op = (prog or {}).get("stateOperators", [{}])[0]
    custom = op.get("customMetrics", {})
    rows_in = 2 * int(op.get("numRowsTotal", 0) or 0)
    res = {
        "provider": provider,
        "wall_sec": round(wall, 2),
        "state_rows": int(op.get("numRowsTotal", 0) or 0),
        "rows_per_sec": round(rows_in / wall) if wall else None,
        "state_mem_bytes": int(op.get("memoryUsedBytes", 0) or 0),
    }
    if provider == "rocksdb":
        res["rocksdb_sst_bytes"] = int(custom.get("rocksdbSstFileSize", 0) or 0)
        res["rocksdb_pinned_bytes"] = int(
            custom.get("rocksdbPinnedBlocksMemoryUsage", 0) or 0
        )
    return res


def gen_scd2_input(spark, base: str, n_keys: int, rows_per_key: int) -> str:
    """K users x R events each, alternating event types so every row
    either opens or closes an interval — the state payload is the OPEN
    interval struct per key (state string + timestamp), the fattest
    per-key state in the engine's stateful family."""
    path = os.path.join(base, f"scd2_in_{n_keys}_{rows_per_key}")
    if not os.path.exists(path):
        (
            spark.range(rows_per_key * n_keys)
            .select(
                (F.col("id") % n_keys).alias("user_id"),
                F.concat(
                    F.lit("state_"),
                    ((F.col("id") / n_keys).cast("long") % 3).cast("string"),
                ).alias("event_type"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.col("id")
                ).alias("ts"),
                F.col("id").alias("event_id"),
            )
            .repartition(32)
            .write.parquet(path)
        )
    return path


def run_scd2_arm(spark, in_path: str, provider: str, work: str, tag: str) -> dict:
    from rapids_and_rivers_spark.streaming.duals import scd2_stream

    if provider == "rocksdb":
        enable_rocksdb_state(spark)
    else:
        enable_hdfs_state(spark)
    ckpt = os.path.join(work, f"scd2_ck_{provider}_{tag}")
    shutil.rmtree(ckpt, ignore_errors=True)
    src = spark.readStream.schema(
        "user_id bigint, event_type string, ts timestamp, event_id bigint"
    ).parquet(in_path)
    out = scd2_stream(src, "user_id", "event_type", "ts", "event_id")
    t0 = time.time()
    q = (
        out.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    prog = q.lastProgress
    op = (prog or {}).get("stateOperators", [{}])[0]
    return {
        "provider": provider,
        "wall_sec": round(wall, 2),
        "state_rows": int(op.get("numRowsTotal", 0) or 0),
        "state_mem_bytes": int(op.get("memoryUsedBytes", 0) or 0),
    }


def scd2_ab(out_json: str, n_keys: int, rows_per_key: int, rounds: int) -> None:
    work = tempfile.mkdtemp(prefix="scd2_ab_")
    spark = build_session("scd2_ab")
    in_path = gen_scd2_input(spark, work, n_keys, rows_per_key)
    n_rows = n_keys * rows_per_key
    raw: dict[str, list[dict]] = {"hdfs": [], "rocksdb": []}
    for rnd in range(rounds):
        for provider in ("hdfs", "rocksdb"):
            r = run_scd2_arm(spark, in_path, provider, work, f"r{rnd}")
            raw[provider].append(r)
            print(json.dumps({"round": rnd, **r}), flush=True)
    summary = {}
    for provider, runs in raw.items():
        walls = [r["wall_sec"] for r in runs]
        summary[provider] = {
            "rows_per_sec_median": round(n_rows / statistics.median(walls)),
            "rows_per_sec_best": round(n_rows / min(walls)),
            "wall_sec_all": walls,
            "state_rows": runs[0]["state_rows"],
            "state_mem_bytes_max": max(r["state_mem_bytes"] for r in runs),
        }
    with open(out_json, "w") as f:
        json.dump(
            {
                "operator": "scd2_stream",
                "design": "interleaved A/B, same session, same input",
                "n_keys": n_keys,
                "rows_per_key": rows_per_key,
                "rounds": rounds,
                "load_avg_end": list(os.getloadavg()),
                "summary": summary,
                "raw": raw,
            },
            f,
            indent=1,
        )
    print(f"wrote {out_json}")
    shutil.rmtree(work, ignore_errors=True)


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else "STATE_SCALE.json"
    if "--scd2" in sys.argv:
        rest = [a for a in sys.argv[2:] if a != "--scd2"]
        n_keys = int(rest[0]) if len(rest) > 0 else 200_000
        rows_per_key = int(rest[1]) if len(rest) > 1 else 5
        rounds = int(rest[2]) if len(rest) > 2 else 3
        scd2_ab(out_json, n_keys, rows_per_key, rounds)
        return
    keys = [int(k) for k in sys.argv[2:]] or [100_000, 1_000_000, 4_000_000]
    work = tempfile.mkdtemp(prefix="state_scale_")
    spark = build_session("state_scale")
    results = []
    for n in keys:
        in_path = gen_input(spark, work, n)
        for provider in ("hdfs", "rocksdb"):
            r = {"n_keys": n, **run_arm(spark, in_path, provider, work)}
            results.append(r)
            print(json.dumps(r), flush=True)
    with open(out_json, "w") as f:
        json.dump(
            {
                "operator": "first_seen_stream",
                "rows_per_key": 2,
                "rocksdb_budget_mb": 512,
                "results": results,
            },
            f,
            indent=1,
        )
    print(f"wrote {out_json}")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
