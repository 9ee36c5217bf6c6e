"""M4 streaming extensions (SURVEY.md §7.2): event-time watermarks +
tumbling windows, dropDuplicatesWithinWatermark, and the stream-stream
@behovId join generalizing the behov/løsning protocol — all on real
Structured Streaming queries over file sources.
"""

import json
import os

from pyspark.sql import functions as F


def write_lines(path, lines, name="part0.txt"):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def stream_json(spark, path, schema):
    raw = spark.readStream.format("text").load(path)
    return raw.select(F.from_json("value", schema).alias("m")).select("m.*")


def test_windowed_aggregation_with_watermark(spark, tmp_path):
    src = str(tmp_path / "in")
    write_lines(
        src,
        [
            json.dumps({"event_name": "click", "ts": f"2026-01-01T00:{m:02d}:00"})
            for m in (0, 1, 2, 10, 11, 30)
        ],
    )
    events = stream_json(spark, src, "event_name string, ts timestamp").withWatermark(
        "ts", "10 minutes"
    )
    agg = events.groupBy(
        F.window("ts", "10 minutes").alias("w"), "event_name"
    ).agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.w.start.minute, r.n) for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    assert rows == {(0, 3), (10, 2), (30, 1)}


def test_sliding_window_aggregation_with_watermark(spark, tmp_path):
    """Streaming dual of the window_sliding_agg catalog query: 30-minute
    windows sliding every 15 — each event lands in exactly 2 windows."""
    src = str(tmp_path / "in")
    write_lines(
        src,
        [
            json.dumps({"event_name": "click", "ts": f"2026-01-01T00:{m:02d}:00"})
            for m in (0, 5, 20, 40)
        ],
    )
    events = stream_json(spark, src, "event_name string, ts timestamp").withWatermark(
        "ts", "30 minutes"
    )
    agg = events.groupBy(
        F.window("ts", "30 minutes", "15 minutes").alias("w"), "event_name"
    ).agg(F.count(F.lit(1)).alias("n"))
    q = (
        agg.writeStream.format("memory")
        .queryName("slide_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.w.start.hour, r.w.start.minute, r.n)
        for r in spark.sql("SELECT * FROM slide_agg").collect()
    }
    # ts 00:00,00:05 -> windows starting 23:45 & 00:00; 00:20 -> 00:00 &
    # 00:15; 00:40 -> 00:15 & 00:30
    assert rows == {
        (23, 45, 2),
        (0, 0, 3),
        (0, 15, 2),
        (0, 30, 1),
    }


def test_drop_duplicates_within_watermark(spark, tmp_path):
    src = str(tmp_path / "in")
    write_lines(
        src,
        [
            json.dumps({"id": "a", "ts": "2026-01-01T00:00:00"}),
            json.dumps({"id": "a", "ts": "2026-01-01T00:00:03"}),  # dup within wm
            json.dumps({"id": "b", "ts": "2026-01-01T00:00:05"}),
        ],
    )
    events = stream_json(spark, src, "id string, ts timestamp").withWatermark(
        "ts", "1 minute"
    )
    deduped = events.dropDuplicatesWithinWatermark(["id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ids = sorted(r.id for r in spark.sql("SELECT id FROM dedup_wm").collect())
    assert ids == ["a", "b"]


def test_stream_stream_behov_join(spark, tmp_path):
    """The @behov/@løsning request-reply correlation (JsonMessage.kt:60-67,
    117-125) as a watermarked stream-stream inner join on @behovId."""
    needs_src = str(tmp_path / "needs")
    sols_src = str(tmp_path / "sols")
    write_lines(
        needs_src,
        [
            json.dumps(
                {"behovId": f"need-{i}", "behov": ["x"], "ts": f"2026-01-01T00:0{i}:00"}
            )
            for i in range(3)
        ],
    )
    write_lines(
        sols_src,
        [
            json.dumps(
                {"behovId": "need-1", "solution": 42, "ts": "2026-01-01T00:02:00"}
            ),
            json.dumps(
                {"behovId": "need-7", "solution": 9, "ts": "2026-01-01T00:03:00"}
            ),
        ],
    )
    needs = stream_json(
        spark, needs_src, "behovId string, behov array<string>, ts timestamp"
    ).withWatermark("ts", "10 minutes").alias("n")
    sols = stream_json(
        spark, sols_src, "behovId string, solution long, ts timestamp"
    ).withWatermark("ts", "10 minutes").alias("s")
    joined = needs.join(
        sols,
        F.expr(
            "n.behovId = s.behovId AND s.ts >= n.ts AND s.ts <= n.ts + INTERVAL 1 HOUR"
        ),
    ).select(F.col("n.behovId").alias("behovId"), "solution")
    q = (
        joined.writeStream.format("memory")
        .queryName("behov_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [(r.behovId, r.solution) for r in spark.sql("SELECT * FROM behov_join").collect()]
    assert rows == [("need-1", 42)]


def test_stateful_rate_limit_across_batches(spark, tmp_path):
    """applyInPandasWithState rate limiter: state survives micro-batch
    boundaries (PingPong.kt:29-35 lastPing generalized per key)."""
    from rapids_and_rivers_spark.streaming.stateful import rate_limit_by_key

    src = str(tmp_path / "in")
    # two files + maxFilesPerTrigger=1 => two micro-batches
    write_lines(
        src,
        [
            json.dumps({"k": "k1", "ts": "2026-01-01T00:00:00"}),
            json.dumps({"k": "k1", "ts": "2026-01-01T00:00:03"}),  # < 5s: drop
            json.dumps({"k": "k2", "ts": "2026-01-01T00:00:01"}),
        ],
        name="a.txt",
    )
    write_lines(
        src,
        [
            # only suppressed if k1's last_emit SURVIVED batch 1
            json.dumps({"k": "k1", "ts": "2026-01-01T00:00:04"}),
            json.dumps({"k": "k1", "ts": "2026-01-01T00:00:06"}),  # >= 5s: emit
        ],
        name="b.txt",
    )
    # the file source orders batches by modification time: pin a.txt first
    now = os.path.getmtime(os.path.join(src, "a.txt"))
    os.utime(os.path.join(src, "a.txt"), (now - 100, now - 100))
    os.utime(os.path.join(src, "b.txt"), (now + 100, now + 100))
    events = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(src)
        .select(F.from_json("value", "k string, ts timestamp").alias("m"))
        .select("m.*")
    )
    limited = rate_limit_by_key(events, "k", "ts", interval_seconds=5)
    q = (
        limited.writeStream.format("memory")
        .queryName("rate_limited")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.k, r.ts.isoformat())
        for r in spark.sql("SELECT * FROM rate_limited").collect()
    }
    assert got == {
        ("k1", "2026-01-01T00:00:00"),
        ("k1", "2026-01-01T00:00:06"),
        ("k2", "2026-01-01T00:00:01"),
    }


def test_stateful_rate_limit_on_batch_df(spark):
    """Batch/stream duality: the same operator runs on a plain DataFrame."""
    from rapids_and_rivers_spark.streaming.stateful import rate_limit_by_key

    df = spark.createDataFrame(
        [
            ("g", "2026-01-01T00:00:00"),
            ("g", "2026-01-01T00:00:02"),
            ("g", "2026-01-01T00:00:09"),
        ],
        "k string, raw string",
    ).select("k", F.col("raw").cast("timestamp").alias("ts"))
    out = rate_limit_by_key(df.select("k", "ts"), "k", "ts", interval_seconds=5)
    got = sorted(r.ts.isoformat() for r in out.collect())
    assert got == ["2026-01-01T00:00:00", "2026-01-01T00:00:09"]


def test_append_mode_emits_only_watermark_closed_windows(spark, tmp_path):
    """Append output mode: a window row is emitted exactly once, when the
    watermark passes its end — open windows stay in state. (Complete mode
    re-emits everything; append is what a parquet/Kafka sink needs.)"""
    src = str(tmp_path / "in")
    write_lines(
        src,
        [
            json.dumps({"event_name": "click", "ts": "2026-01-01T00:01:00"}),
            json.dumps({"event_name": "click", "ts": "2026-01-01T00:02:00"}),
            # late-ish arrival inside the first window, then a big jump
            # that pushes the watermark (5 min) beyond window [0,10)
            json.dumps({"event_name": "click", "ts": "2026-01-01T00:03:00"}),
            json.dumps({"event_name": "click", "ts": "2026-01-01T00:30:00"}),
        ],
    )
    events = stream_json(spark, src, "event_name string, ts timestamp").withWatermark(
        "ts", "5 minutes"
    )
    agg = events.groupBy(F.window("ts", "10 minutes").alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("append_win")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.w.start.minute, r.n) for r in spark.sql("SELECT * FROM append_win").collect()
    }
    # window [00:00,00:10) closed (watermark = 00:30-5min = 00:25 > 00:10)
    # and emitted once with all 3 rows; [00:30,00:40) is still open -> absent
    assert rows == {(0, 3)}


def test_sequence_by_key_state_survives_batches(spark, tmp_path):
    """transformWithStateInPandas: per-key sequence numbers continue
    across micro-batches from the checkpointed ValueState, and the batch
    fallback (window) gives identical output."""
    from rapids_and_rivers_spark.streaming.stateful import sequence_by_key

    src = str(tmp_path / "in")
    write_lines(
        src,
        [
            json.dumps({"k": "a", "ts": "2026-01-01T00:00:00"}),
            json.dumps({"k": "a", "ts": "2026-01-01T00:00:01"}),
            json.dumps({"k": "b", "ts": "2026-01-01T00:00:02"}),
        ],
        name="a.txt",
    )
    write_lines(
        src,
        [
            json.dumps({"k": "a", "ts": "2026-01-01T00:00:03"}),
            json.dumps({"k": "b", "ts": "2026-01-01T00:00:04"}),
        ],
        name="b.txt",
    )
    import os

    now = os.path.getmtime(os.path.join(src, "a.txt"))
    os.utime(os.path.join(src, "a.txt"), (now - 100, now - 100))
    os.utime(os.path.join(src, "b.txt"), (now + 100, now + 100))
    events = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(src)
        .select(F.from_json("value", "k string, ts timestamp").alias("m"))
        .select("m.*")
    )
    seq = sequence_by_key(events, "k", "ts")
    q = (
        seq.writeStream.format("memory")
        .queryName("seq_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.k, r.ts.isoformat(), r.seq)
        for r in spark.sql("SELECT * FROM seq_out").collect()
    }
    expected = {
        ("a", "2026-01-01T00:00:00", 0),
        ("a", "2026-01-01T00:00:01", 1),
        ("a", "2026-01-01T00:00:03", 2),  # continued from state in batch 2
        ("b", "2026-01-01T00:00:02", 0),
        ("b", "2026-01-01T00:00:04", 1),
    }
    assert got == expected
    # batch duality: same rows via the window fallback
    batch = spark.createDataFrame(
        [("a", "2026-01-01T00:00:00"), ("a", "2026-01-01T00:00:01"),
         ("a", "2026-01-01T00:00:03"), ("b", "2026-01-01T00:00:02"),
         ("b", "2026-01-01T00:00:04")],
        "k string, ts string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    got_b = {
        (r.k, r.ts.isoformat(), r.seq)
        for r in sequence_by_key(batch, "k", "ts").collect()
    }
    assert got_b == expected
