#!/usr/bin/env python
"""Streaming recovery-time benchmark (VERDICT r9 #6).

The reference pins its delivery contract on restart-from-committed-
offset (rapids-and-rivers-impl RapidIntegrationTest.kt:205-276): a
consumer that dies resumes from the last committed offset. Our
checkpoint-restart tests prove the SEMANTICS; this tool measures the
COST — time for a fresh query instance (the pod-restart scenario) to
come back up on an existing checkpoint whose state store holds
O(sf0.1) keys, under both state-store providers:

- build: stream the sf-dir ``events`` table through
  ``first_seen_stream`` keyed on ``event_id`` (one state row per
  distinct key — 100k keys at sf0.1) to a checkpoint, availableNow.
- recover: drop ONE new event file beside the drained input and start
  a brand-new query on the same checkpoint. The measured wall time to
  drain that single-row delta is dominated by exactly what a restarted
  pod pays before its first commit: offset-log recovery plus a state
  reload for every shuffle partition (RocksDB: SST/changelog
  materialization; HDFS-backed: full-snapshot heap rebuild).

A new query instance on the same checkpoint recovers from the
committed offsets regardless of how the previous process exited, so
the clean-stop build phase measures the same recovery path a kill -9
would exercise (minus replaying the one uncommitted batch, which is
workload- not state-dependent).

Writes ``RECOVERY.json``:
  {"sf_dir": ..., "state_rows": N,
   "providers": {"rocksdb": {"build_s": ..., "recover_s": ...},
                 "hdfs":    {...}}}

Usage: python tools/recovery_bench.py [sf_dir] [out_json]
(defaults: /root/testdata/sf0.1, RECOVERY.json)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rapids_and_rivers_spark.session import build_session
from rapids_and_rivers_spark.sources import load_table
from rapids_and_rivers_spark.streaming.duals import first_seen_stream
from rapids_and_rivers_spark.streaming.state import (
    enable_hdfs_state,
    enable_rocksdb_state,
)


def _run_pass(spark, schema, in_dir: str, ckpt: str, out_dir: str) -> dict:
    """One availableNow drain of in_dir through first_seen_stream on an
    existing (or fresh) checkpoint; returns wall seconds + last
    progress."""
    stream = spark.readStream.schema(schema).parquet(in_dir)
    t0 = time.monotonic()
    q = (
        first_seen_stream(stream, "event_id", "ts")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    prog = q.lastProgress
    return {"wall_s": round(wall, 3), "progress": prog}


def bench_provider(spark, events, tag: str) -> dict:
    work = tempfile.mkdtemp(prefix=f"rars_recovery_{tag}_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ck")
    out_dir = os.path.join(work, "out")
    # the build corpus: every event, one state row per event_id
    events.write.mode("overwrite").parquet(in_dir)

    build = _run_pass(spark, events.schema, in_dir, ckpt, out_dir)
    state_rows = 0
    prog = build["progress"]
    if prog and prog.get("stateOperators"):
        state_rows = prog["stateOperators"][0].get("numRowsTotal", 0)

    # the recovery delta: ONE genuinely new key
    delta = events.limit(1).withColumn(
        "event_id", F.lit(-1).cast("long")
    )
    delta.write.mode("append").parquet(in_dir)

    recover = _run_pass(spark, events.schema, in_dir, ckpt, out_dir)
    shutil.rmtree(work, ignore_errors=True)
    return {
        "build_s": build["wall_s"],
        "state_rows": int(state_rows),
        "recover_s": recover["wall_s"],
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "RECOVERY.json"
    spark = build_session("recovery_bench")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )

    results: dict = {"sf_dir": sf_dir, "providers": {}}
    # rocksdb first (the engine default), then the heap-backed provider
    for tag, enable in (
        ("rocksdb", enable_rocksdb_state),
        ("hdfs", enable_hdfs_state),
    ):
        enable(spark)
        r = bench_provider(spark, events, tag)
        results["providers"][tag] = r
        print(
            f"{tag}: build {r['build_s']}s over {r['state_rows']} state "
            f"rows; RECOVERY (fresh query, 1-row delta) {r['recover_s']}s",
            flush=True,
        )
    enable_rocksdb_state(spark)  # restore the engine default
    results["state_rows"] = max(
        v["state_rows"] for v in results["providers"].values()
    )
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
