"""HTTP ops layer (U8: KtorApplication.kt probes + PreStopHook) and MDC
log-context scoping (T10: MDC.kt, KafkaRapid.kt poll/record scopes)."""

from __future__ import annotations

import json
import logging
import threading
import urllib.error
import urllib.request

from rapids_and_rivers_spark.logcontext import (
    MdcFilter,
    current_mdc,
    with_mdc,
)
from rapids_and_rivers_spark.streaming.lifecycle import RapidLifecycleListener
from rapids_and_rivers_spark.streaming.ops import (
    OpsServer,
    PreStopHook,
    attach_ops,
    prometheus_text,
)


def _get(port: int, path: str) -> tuple[int, str]:
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


# --- ops server ---------------------------------------------------------------


def test_ops_probe_lifecycle():
    srv = OpsServer()
    try:
        assert _get(srv.port, "/isalive") == (200, "ALIVE")
        # readiness requires the started toggle (KtorApplication.kt:105-112)
        assert _get(srv.port, "/isready")[0] == 503
        srv.mark_started()
        assert _get(srv.port, "/isready") == (200, "READY")
        srv.mark_stop_preparing()
        assert _get(srv.port, "/isready")[0] == 503
        assert _get(srv.port, "/nope")[0] == 404
    finally:
        srv.close()


def test_ops_alive_follows_check():
    alive = {"v": True}
    srv = OpsServer(alive_check=lambda: alive["v"])
    try:
        assert _get(srv.port, "/isalive")[0] == 200
        alive["v"] = False
        assert _get(srv.port, "/isalive")[0] == 503
    finally:
        srv.close()


def test_pre_stop_runs_hook_and_drops_readiness():
    stopped = threading.Event()
    hook = PreStopHook(stop=stopped.set)
    # engine signals shutdown-complete right after stop (normally wired
    # through the lifecycle listener's shutdown callback)
    orig_stop = hook._stop
    hook._stop = lambda: (orig_stop(), hook.on_shutdown_complete())[0]
    srv = OpsServer(pre_stop=hook)
    try:
        srv.mark_started()
        assert _get(srv.port, "/isready")[0] == 200
        code, body = _get(srv.port, "/stop")
        assert (code, body) == (200, "OK")
        assert stopped.is_set()
        # stop-preparing raised BEFORE the hook: readiness now off
        assert _get(srv.port, "/isready")[0] == 503
    finally:
        srv.close()


def test_pre_stop_hook_timeout_when_no_signal():
    hook = PreStopHook(stop=lambda: None)
    assert hook.handle_pre_stop(timeout=0.05) is False
    hook.on_shutdown_complete()
    assert hook.handle_pre_stop(timeout=0.05) is True


def test_custom_module_endpoint():
    """Custom-module injection (RapidApplication.Builder.withKtorModule /
    RapidApplicationComponentTest.kt custom-endpoint case)."""
    srv = OpsServer(modules={"/custom": lambda: (200, "CUSTOM!")})
    try:
        assert _get(srv.port, "/custom") == (200, "CUSTOM!")
        assert _get(srv.port, "/other")[0] == 404
    finally:
        srv.close()


def test_metrics_exposition_shape():
    text = prometheus_text(
        counters={"messages_total": 7},
        timers={"r/0:handler": {"count": 3, "total_seconds": 0.125}},
    )
    assert "# TYPE messages_total counter" in text
    assert "messages_total 7" in text
    assert 'on_packet_seconds_count{listener="r/0:handler"} 3' in text
    assert 'on_packet_seconds_sum{listener="r/0:handler"} 0.125' in text


class _Event:
    def __init__(self, name, run_id):
        self.name, self.runId = name, run_id


def test_attach_ops_follows_lifecycle_listener():
    events: list[str] = []
    listener = RapidLifecycleListener(events.append, "app", "i-1")
    srv = attach_ops(listener)
    try:
        assert _get(srv.port, "/isready")[0] == 503
        listener.onQueryStarted(_Event("q", "r-1"))
        assert _get(srv.port, "/isready")[0] == 200
        listener.onQueryTerminated(_Event("q", "r-1"))
        assert _get(srv.port, "/isready")[0] == 503
        # the listener also published the four lifecycle events
        names = [json.loads(e)["@event_name"] for e in events]
        assert names == [
            "application_up",
            "application_ready",
            "application_stop",
            "application_down",
        ]
    finally:
        srv.close()


# --- MDC ----------------------------------------------------------------------


def test_with_mdc_merges_and_restores():
    assert current_mdc() == {}
    with with_mdc(a="1"):
        assert current_mdc() == {"a": "1"}
        with with_mdc({"b": "2"}, a="override"):
            assert current_mdc() == {"a": "override", "b": "2"}
        # inner scope closed: ORIGINAL map restored (MDC.kt:12-16)
        assert current_mdc() == {"a": "1"}
    assert current_mdc() == {}


def test_mdc_filter_stamps_log_records():
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    logger = logging.getLogger("test.mdc")
    logger.setLevel(logging.INFO)
    handler = Capture()
    handler.addFilter(MdcFilter())
    logger.addHandler(handler)
    try:
        with with_mdc(rapids_poll_id="p-1"):
            logger.info("inside")
        logger.info("outside")
    finally:
        logger.removeHandler(handler)
    assert records[0].mdc == {"rapids_poll_id": "p-1"}
    assert records[0].mdc_text == "rapids_poll_id=p-1"
    assert records[1].mdc == {}


def test_process_batch_runs_in_poll_scope(spark):
    from rapids_and_rivers_spark.streaming.runtime import StreamingRapid

    seen: dict = {}
    rapid = StreamingRapid(spark, "app", "i-1")
    rapid.on_raw_batch(lambda df: seen.update(current_mdc()))
    batch = spark.createDataFrame(
        [('{"@event_name": "x"}', None)], "value string, key string"
    )
    rapid.process_batch(batch, batch_id=42)
    assert seen["rapids_batch_id"] == "42"
    assert "rapids_poll_id" in seen and "rapids_poll_time" in seen
    # scope closed after dispatch
    assert current_mdc() == {}


def test_packet_handlers_run_in_record_scope(spark, tmp_path):
    """Executor-side record MDC: a handler reads its own context and
    embeds it in the reply (the only executor->test channel)."""
    import json as _json

    from pyspark.sql import functions as F

    from rapids_and_rivers_spark.functions import predicates as P
    from rapids_and_rivers_spark.river import River
    from rapids_and_rivers_spark.streaming.runtime import StreamingRapid

    src, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    import os

    os.makedirs(src)
    with open(os.path.join(src, "m.jsonl"), "w") as f:
        f.write(_json.dumps({"@event_name": "need"}) + "\n")

    river = River("needs").validate(P.require_value("@event_name", "need"))

    def handler(packet, context):
        ctx = current_mdc()
        packet["mdc_keys"] = sorted(ctx.keys())
        context.publish(packet)

    river.on_packet(handler)
    rapid = (
        StreamingRapid.from_text_files(spark, src, "app", "i-1")
        .register(river)
        .set_sink_parquet(out)
    )
    rapid.run_available(ckpt)
    vals = [
        _json.loads(r.value)
        for r in spark.read.parquet(out).select(F.col("value")).collect()
    ]
    assert vals[0]["mdc_keys"] == [
        "rapids_record_before_notify_time",
        "rapids_record_bytes",
        "rapids_record_id",
    ]


def test_ops_stop_drains_real_streaming_query(spark, tmp_path):
    """End-to-end U8→R10: a live processing-time query is stopped through
    the HTTP /stop endpoint (PreStopHook → stop_gracefully); the in-flight
    batch commits its checkpoint, and a restart redelivers nothing."""
    import time

    from pyspark.sql import functions as F

    from rapids_and_rivers_spark.functions import predicates as P
    from rapids_and_rivers_spark.river import River
    from rapids_and_rivers_spark.streaming.runtime import StreamingRapid

    src, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    import os

    os.makedirs(src)
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        for i in range(5):
            f.write(json.dumps({"@event_name": "e", "n": i}) + "\n")

    river = River("all").validate(P.require_value("@event_name", "e"))
    river.respond(lambda passing: passing.select("value", "key"))
    rapid = (
        StreamingRapid.from_text_files(spark, src, "app", "i-1")
        .register(river)
        .set_sink_parquet(out)
    )
    query = rapid.start(ckpt, available_now=False, processing_time="1 second")
    hook = PreStopHook(stop=lambda: StreamingRapid.stop_gracefully(query))
    hook.on_shutdown_complete()  # stop_gracefully blocks until terminated
    srv = OpsServer(pre_stop=hook)
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() == 5:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        assert _get(srv.port, "/stop") == (200, "OK")
        assert not query.isActive
    finally:
        srv.close()
    assert spark.read.parquet(out).count() == 5
    # restart on the same checkpoint: nothing redelivered
    rapid2 = (
        StreamingRapid.from_text_files(spark, src, "app", "i-1")
        .register(river)
        .set_sink_parquet(out)
    )
    rapid2.run_available(ckpt)
    assert spark.read.parquet(out).count() == 5


def test_attach_ops_catches_up_when_query_already_ready():
    """The listener bus is asynchronous: if application_ready fired before
    attach_ops wired the callback, the server must catch up from the
    listener's event log instead of staying NOT READY forever."""
    listener = RapidLifecycleListener(lambda e: None, "app", "i-1")
    listener.onQueryStarted(_Event("q", "r-1"))  # ready BEFORE wiring
    srv = attach_ops(listener)
    try:
        assert _get(srv.port, "/isready")[0] == 200
    finally:
        srv.close()
    # already-terminated query: no catch-up to ready
    listener2 = RapidLifecycleListener(lambda e: None, "app", "i-1")
    listener2.onQueryStarted(_Event("q", "r-2"))
    listener2.onQueryTerminated(_Event("q", "r-2"))
    srv2 = attach_ops(listener2)
    try:
        assert _get(srv2.port, "/isready")[0] == 503
    finally:
        srv2.close()


def test_metrics_collector_feeds_endpoint(spark, tmp_path):
    """Full monitoring loop: river verdict counters -> observe() ->
    listener bus -> MetricsCollector -> /metrics exposition (the
    reference's Micrometer registry + Ktor metrics route, end to end)."""
    import os
    import time

    from pyspark.sql import functions as F

    from rapids_and_rivers_spark.functions import json_ops as J
    from rapids_and_rivers_spark.functions import predicates as P
    from rapids_and_rivers_spark.metrics import observe_verdicts
    from rapids_and_rivers_spark.river import River
    from rapids_and_rivers_spark.streaming.ops import MetricsCollector

    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "m.jsonl"), "w") as f:
        f.write(json.dumps({"@event_name": "need"}) + "\n")
        f.write(json.dumps({"@event_name": "nope"}) + "\n")

    collector = MetricsCollector()
    feed = collector.listener()
    spark.streams.addListener(feed)
    try:
        raw = spark.readStream.format("text").load(src)
        parsed = raw.select(F.col("value"), J.parse(F.col("value")).alias("__variant"))
        river = River("needs").validate(P.require_value("@event_name", "need"))
        observed, _ = observe_verdicts(river.evaluate(parsed))
        q = (
            observed.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        deadline = time.time() + 15
        while not collector.snapshot() and time.time() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(feed)
    counters = collector.snapshot()
    assert counters["river_metrics_messages"] == 2
    assert counters["river_metrics_passed"] == 1
    srv = OpsServer(
        metrics_provider=lambda: prometheus_text(counters=collector.snapshot())
    )
    try:
        code, body = _get(srv.port, "/metrics")
        assert code == 200
        assert "river_metrics_messages 2" in body
        assert "river_metrics_passed 1" in body
    finally:
        srv.close()


def test_state_store_gauges_reach_metrics_endpoint(spark, tmp_path):
    """A stateful streaming query's state-store health (rows, bytes,
    RocksDB custom metrics) must surface on /metrics as gauges: with
    RocksDB as the default backend, bounded-state observability is the
    100 TB operational question, and levels must OVERWRITE (gauge), not
    accumulate (counter), across progress events."""
    import os
    import time

    from pyspark.sql import functions as F

    from rapids_and_rivers_spark.streaming.ops import (
        MetricsCollector,
        OpsServer,
        prometheus_text,
    )

    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "m.jsonl"), "w") as f:
        for i in range(6):
            f.write(json.dumps({"k": f"key{i % 3}"}) + "\n")

    collector = MetricsCollector()
    feed = collector.listener()
    spark.streams.addListener(feed)
    try:
        raw = spark.readStream.format("text").load(src)
        keyed = raw.select(F.get_json_object("value", "$.k").alias("k"))
        counts = keyed.groupBy("k").count()
        q = (
            counts.writeStream.format("noop")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        deadline = time.time() + 15
        while not collector.snapshot_gauges() and time.time() < deadline:
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(feed)
    gauges = collector.snapshot_gauges()
    rows_keys = [k for k in gauges if k.endswith("_numRowsTotal")]
    assert rows_keys, f"no state gauges captured: {sorted(gauges)[:10]}"
    assert gauges[rows_keys[0]] == 3  # three distinct keys in state
    assert any(k.endswith("_memoryUsedBytes") for k in gauges)
    srv = OpsServer(
        metrics_provider=lambda: prometheus_text(
            gauges=collector.snapshot_gauges()
        )
    )
    try:
        code, body = _get(srv.port, "/metrics")
    finally:
        srv.close()
    assert code == 200
    assert "# TYPE " in body and "_numRowsTotal" in body


def test_gauge_and_counter_names_sanitized_for_prometheus():
    """Operator names with characters outside [a-zA-Z0-9_:] — e.g.
    'dedupeWithinWatermark(keys=[...])' — must reach the exposition as
    valid metric names (ADVICE r6: a single malformed line makes
    scrapers reject the whole scrape)."""
    from rapids_and_rivers_spark.streaming.ops import MetricsCollector

    c = MetricsCollector()
    c.gauge("state_flatMapGroupsWithState(keys=[user-id])_numRowsTotal", 5)
    c.record("river (main)", {"ok-count": 2})
    names = list(c.snapshot_gauges()) + list(c.snapshot())
    import re as _re

    for n in names:
        assert _re.fullmatch(r"[a-zA-Z_:][a-zA-Z0-9_:]*", n), n


def test_metric_name_sanitizes_leading_digit():
    # Prometheus names must match [a-zA-Z_:][a-zA-Z0-9_:]* — a leading
    # digit is as illegal as a stray '(' (ADVICE r7)
    from rapids_and_rivers_spark.streaming.ops import _metric_name

    assert _metric_name("0-state(op)") == "_0_state_op_"
    assert _metric_name("9lives") == "_9lives"
    assert _metric_name("ok_name:x") == "ok_name:x"
    assert _metric_name("") == "_"
