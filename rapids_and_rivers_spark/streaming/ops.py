"""HTTP ops layer (U8): liveness/readiness/metrics/pre-stop endpoints —
KtorApplication.kt:26-139, PreStopHook.kt:17-67, RapidApplication.kt
parity on the stdlib ``http.server`` (no extra dependencies).

This is control-plane, not data-plane: the orchestrator (Kubernetes in
the reference's deployment) probes ``/isalive`` and ``/isready``, scrapes
``/metrics``, and calls ``/stop`` as the preStop hook before SIGTERM so
the streaming query drains gracefully and commits its checkpoint before
the pod dies. Endpoint semantics mirror the reference exactly:

- ``/isalive``  → 200 ``ALIVE`` while the alive check passes, else 503.
- ``/isready``  → 200 ``READY`` only after the application-started toggle
  flips AND the ready check passes (KtorApplication.kt:105-112: the
  toggle set on ApplicationStarted, cleared on ApplicationStopPreparing);
  else 503.
- ``/metrics``  → Prometheus text exposition of the engine's counters and
  the ``on_packet_seconds`` timer snapshot.
- ``/stop``     → flips readiness off, runs the pre-stop hook (stop the
  query, wait for shutdown-complete up to 30 s — PreStopHook.kt:52-67),
  then answers 200 ``OK``.
"""

from __future__ import annotations

import re
import threading
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Mapping


def _metric_name(raw: str) -> str:
    """Prometheus exposition names must match ``[a-zA-Z_:][a-zA-Z0-9_:]*``
    — any other character (state-operator names carry '(', ')', '-',
    ...) would emit a line scrapers reject, and a LEADING digit is just
    as illegal as a stray one (ADVICE r6 + r7)."""
    name = re.sub(r"[^a-zA-Z0-9_:]", "_", raw)
    if not name or name[0].isdigit():
        name = "_" + name
    return name


@dataclass(frozen=True)
class OpsEndpoints:
    """Endpoint paths (NaisEndpoints parity, KtorApplication.kt:19-32)."""

    isalive: str = "/isalive"
    isready: str = "/isready"
    metrics: str = "/metrics"
    pre_stop: str = "/stop"


class PreStopHook:
    """Graceful pre-stop protocol (PreStopHook.kt:17-67).

    The reference registers as a status listener; ``onShutdownComplete``
    signals a conflated channel and ``handlePreStopRequest`` stops the
    rapid then waits up to 30 s for that signal. Python analog: a
    ``threading.Event`` (latest-signal-wins, sender never blocks — the
    CONFLATED-channel contract) set by the lifecycle listener's shutdown
    callback.

    ``stop`` is the engine-stop action, e.g.
    ``lambda: StreamingRapid.stop_gracefully(query)``.
    """

    def __init__(self, stop: Callable[[], None], lifecycle_listener=None):
        self._stop = stop
        self._shutdown_complete = threading.Event()
        if lifecycle_listener is not None:
            lifecycle_listener.on_shutdown_callbacks.append(
                self.on_shutdown_complete
            )

    def on_shutdown_complete(self) -> None:
        """Status-listener signal: engine finished shutting down."""
        self._shutdown_complete.set()

    def handle_pre_stop(self, timeout: float = 30.0) -> bool:
        """Stop the engine and wait for shutdown-complete; True if the
        signal arrived within ``timeout`` (PreStopHook.kt:52-67)."""
        self._stop()
        return self._shutdown_complete.wait(timeout)


def prometheus_text(
    counters: Mapping[str, float] | None = None,
    timers: Mapping[str, Mapping[str, float]] | None = None,
    gauges: Mapping[str, float] | None = None,
) -> str:
    """Minimal Prometheus text exposition: plain counters plus
    ``PacketTimer.snapshot()``-shaped ``{label: {count, total_seconds}}``
    timers rendered as ``*_count`` / ``*_seconds_sum`` pairs with a
    ``listener`` label (the Micrometer timer exposition shape), plus
    point-in-time gauges (state-store health: rows, bytes)."""
    lines: list[str] = []
    for name, value in sorted((counters or {}).items()):
        lines.append(f"# TYPE {name} counter")
        lines.append(f"{name} {value}")
    for name, value in sorted((gauges or {}).items()):
        lines.append(f"# TYPE {name} gauge")
        lines.append(f"{name} {value}")
    if timers:
        lines.append("# TYPE on_packet_seconds summary")
        for label, t in sorted(timers.items()):
            esc = label.replace("\\", "\\\\").replace('"', '\\"')
            lines.append(f'on_packet_seconds_count{{listener="{esc}"}} {t["count"]}')
            lines.append(
                f'on_packet_seconds_sum{{listener="{esc}"}} {t["total_seconds"]}'
            )
    return "\n".join(lines) + "\n"


class MetricsCollector:
    """Accumulates ``observe_verdicts`` counters from the streaming
    listener bus into a registry the ``/metrics`` endpoint scrapes —
    the Micrometer-registry-to-endpoint loop of the reference
    (KtorApplication.kt metrics route + River.kt counters).

    Register with ``spark.streams.addListener(collector.listener())``;
    totals are cumulative across micro-batches, keyed
    ``<observation>_<counter>``.
    """

    def __init__(self, observation_names: list[str] | None = None):
        self._names = set(observation_names or [])
        self._lock = threading.Lock()
        self.counters: dict[str, float] = {}
        self.gauges: dict[str, float] = {}

    def record(self, observation: str, metrics: Mapping[str, float]) -> None:
        with self._lock:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    key = _metric_name(f"{observation}_{k}")
                    self.counters[key] = self.counters.get(key, 0) + v

    def gauge(self, key: str, value: float) -> None:
        """Point-in-time overwrite (state rows/bytes are levels, not
        monotone counts — summing them across progress events would
        fabricate growth)."""
        with self._lock:
            self.gauges[_metric_name(key)] = value

    def snapshot(self) -> dict[str, float]:
        with self._lock:
            return dict(self.counters)

    def snapshot_gauges(self) -> dict[str, float]:
        with self._lock:
            return dict(self.gauges)

    def listener(self):
        """A StreamingQueryListener feeding this collector (imported
        lazily so the module stays usable without an active session)."""
        from pyspark.sql.streaming import listener as L

        collector = self

        class _Feed(L.StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                for name, row in (event.progress.observedMetrics or {}).items():
                    if collector._names and name not in collector._names:
                        continue
                    collector.record(name, row.asDict())
                # state-store health: with the RocksDB backend as the
                # default, "is my keyed state bounded?" is THE 100 TB
                # operational question — surface per-operator rows/bytes
                # (and the RocksDB custom metrics) as gauges
                for i, op in enumerate(event.progress.stateOperators or []):
                    label = getattr(op, "operatorName", None) or f"op{i}"
                    label = _metric_name(str(label))
                    for attr in ("numRowsTotal", "numRowsUpdated",
                                 "memoryUsedBytes"):
                        v = getattr(op, attr, None)
                        if isinstance(v, (int, float)):
                            collector.gauge(f"state_{label}_{attr}", v)
                    for k, v in (getattr(op, "customMetrics", None) or {}).items():
                        # skip per-partition detail metrics (dotted names
                        # like SnapshotLastUploaded.partition_N — hundreds
                        # of keys at real parallelism, and dots are invalid
                        # in Prometheus metric names)
                        if isinstance(v, (int, float)) and "." not in k:
                            collector.gauge(f"state_{label}_{k}", v)

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        return _Feed()


class OpsServer:
    """Threaded ops HTTP server. ``port=0`` binds an ephemeral port
    (exposed as ``.port``); the server thread is a daemon, so it never
    blocks interpreter exit. Wire readiness through a lifecycle listener
    with :func:`attach_ops`, or call :meth:`mark_started` /
    :meth:`mark_stop_preparing` directly."""

    def __init__(
        self,
        alive_check: Callable[[], bool] = lambda: True,
        ready_check: Callable[[], bool] = lambda: True,
        metrics_provider: Callable[[], str] | None = None,
        pre_stop: PreStopHook | Callable[[], None] | None = None,
        port: int = 0,
        endpoints: OpsEndpoints = OpsEndpoints(),
        modules: Mapping[str, Callable[[], tuple[int, str]]] | None = None,
        host: str = "0.0.0.0",
    ):
        """``modules`` is the custom-module injection surface
        (RapidApplication.Builder.withKtorModule,
        RapidApplicationComponentTest.kt custom-endpoint case): extra
        ``{path: handler}`` routes where the handler returns
        ``(status_code, body)``.

        ``host`` defaults to all interfaces — Kubernetes probes connect
        to the pod IP, not loopback (the reference's Ktor server binds
        0.0.0.0 too); pass ``127.0.0.1`` to keep the server local."""
        self._alive_check = alive_check
        self._ready_check = ready_check
        self._metrics_provider = metrics_provider or (lambda: prometheus_text())
        self._pre_stop = pre_stop
        self._endpoints = endpoints
        self._modules = dict(modules or {})
        self._ready_toggle = threading.Event()
        ops = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet: probes hit every few s
                pass

            def _respond(self, code: int, body: str, ctype="text/plain"):
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                e = ops._endpoints
                if self.path == e.isalive:
                    if not ops._alive_check():
                        return self._respond(503, "NOT ALIVE")
                    return self._respond(200, "ALIVE")
                if self.path == e.isready:
                    if not (ops._ready_toggle.is_set() and ops._ready_check()):
                        return self._respond(503, "NOT READY")
                    return self._respond(200, "READY")
                if self.path == e.metrics:
                    return self._respond(200, ops._metrics_provider())
                if self.path == e.pre_stop:
                    # KtorApplication.kt:118-137: raise stop-preparing
                    # (readiness off) BEFORE running the hook, answer OK
                    # only after the hook returns
                    ops.mark_stop_preparing()
                    hook = ops._pre_stop
                    if hook is not None:
                        if isinstance(hook, PreStopHook):
                            hook.handle_pre_stop()
                        else:
                            hook()
                    return self._respond(200, "OK")
                custom = ops._modules.get(self.path)
                if custom is not None:
                    code, body = custom()
                    return self._respond(code, body)
                return self._respond(404, "NOT FOUND")

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port: int = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def mark_started(self) -> None:
        """ApplicationStarted → readiness toggle on."""
        self._ready_toggle.set()

    def mark_stop_preparing(self) -> None:
        """ApplicationStopPreparing → readiness toggle off."""
        self._ready_toggle.clear()

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()


def attach_ops(
    lifecycle_listener,
    query=None,
    packet_timer=None,
    pre_stop: PreStopHook | Callable[[], None] | None = None,
    port: int = 0,
    metrics_collector: MetricsCollector | None = None,
) -> OpsServer:
    """Wire an :class:`OpsServer` to a running query: readiness follows
    the lifecycle listener's started/shutdown callbacks, liveness follows
    ``query.isActive``, ``/metrics`` exposes the packet timer and any
    :class:`MetricsCollector` counters."""
    alive = (lambda: bool(query.isActive)) if query is not None else (lambda: True)
    metrics = None
    if packet_timer is not None or metrics_collector is not None:
        metrics = lambda: prometheus_text(  # noqa: E731
            counters=metrics_collector.snapshot() if metrics_collector else None,
            timers=packet_timer.snapshot() if packet_timer else None,
            gauges=metrics_collector.snapshot_gauges() if metrics_collector else None,
        )
    server = OpsServer(
        alive_check=alive, metrics_provider=metrics, pre_stop=pre_stop, port=port
    )
    lifecycle_listener.on_ready_callbacks.append(server.mark_started)
    lifecycle_listener.on_shutdown_callbacks.append(server.mark_stop_preparing)
    # the listener bus delivers onQueryStarted asynchronously: if the
    # query became ready BEFORE this wiring ran, the callback above will
    # never fire — catch up from the listener's event log
    events = getattr(lifecycle_listener, "events", [])
    if "application_ready" in events and "application_stop" not in events:
        server.mark_started()
    return server
