"""Application lifecycle events (R8/R9, RapidApplication.kt:94-139,
RapidsConnection.kt:57-109).

The reference publishes ``application_up / application_ready /
application_not_ready / application_stop / application_down`` events onto
the rapid and exposes start/stop callbacks. Spark mapping: a
``StreamingQueryListener`` translating query start/progress/termination
into the same JSON events through a publish callback, plus a Python-side
status-listener registry.
"""

from __future__ import annotations

import json
from datetime import datetime
from typing import Callable

from pyspark.sql.streaming import listener as L


def lifecycle_event(event_name: str, app_name: str, instance_id: str) -> str:
    """One lifecycle event message (RapidApplication.kt:119-139 shape)."""
    return json.dumps(
        {
            "@event_name": event_name,
            "@opprettet": datetime.now().isoformat(),
            "app_name": app_name,
            "instance_id": instance_id,
        },
        ensure_ascii=False,
    )


class RapidLifecycleListener(L.StreamingQueryListener):
    """Publishes lifecycle events on query start / termination and fans out
    to registered status callbacks (StatusListener parity)."""

    def __init__(
        self,
        publish: Callable[[str], None],
        app_name: str,
        instance_id: str,
    ):
        self._publish = publish
        self.app_name = app_name
        self.instance_id = instance_id
        self.on_startup_callbacks: list[Callable[[], None]] = []
        self.on_ready_callbacks: list[Callable[[], None]] = []
        self.on_shutdown_callbacks: list[Callable[[], None]] = []
        self.events: list[str] = []

    def _emit(self, event_name: str) -> None:
        msg = lifecycle_event(event_name, self.app_name, self.instance_id)
        self.events.append(event_name)
        self._publish(msg)

    # StreamingQueryListener surface ------------------------------------------

    def onQueryStarted(self, event) -> None:
        # reference order: startup listeners run BEFORE consumption begins
        # (README.md:12-13 — migrations happen here), then up/ready publish
        for cb in self.on_startup_callbacks:
            cb()
        self._emit("application_up")
        for cb in self.on_ready_callbacks:
            cb()
        self._emit("application_ready")

    def onQueryProgress(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self._emit("application_stop")
        for cb in self.on_shutdown_callbacks:
            cb()
        self._emit("application_down")
