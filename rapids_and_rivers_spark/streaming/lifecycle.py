"""Application lifecycle events (R8/R9, RapidApplication.kt:94-139,
RapidsConnection.kt:57-109).

The reference publishes ``application_up / application_ready /
application_not_ready / application_stop / application_down`` events onto
the rapid and exposes start/stop callbacks. Spark mapping: a
``StreamingQueryListener`` translating query start/termination into the
same JSON events through a publish callback, plus a Python-side
status-listener registry.

Event shape parity: RapidApplication.applicationEvent (RapidApplication.kt
:119-139) builds ``JsonMessage.newMessage(event, {app_name, instance_id})``
— i.e. exactly ``@event_name``, ``@id``, ``@opprettet``, ``app_name``,
``instance_id`` — and publishes NOTHING when ``appName`` is null. Both
behaviors are reproduced here via :meth:`Packet.new_message`.
"""

from __future__ import annotations

import uuid as _uuid
from typing import Callable

from pyspark.sql.streaming import listener as L

from rapids_and_rivers_spark.packet import Packet


def lifecycle_event(
    event_name: str,
    app_name: str,
    instance_id: str,
    id_generator: Callable[[], str] | None = None,
) -> str:
    """One lifecycle event message with the exact reference field set
    (RapidApplication.kt:119-139: JsonMessage.newMessage(event,
    {app_name, instance_id}))."""
    packet = Packet.new_message(
        event_name,
        {"app_name": app_name, "instance_id": instance_id},
        id_generator=id_generator or (lambda: str(_uuid.uuid4())),
    )
    return packet.to_json()


class RapidLifecycleListener(L.StreamingQueryListener):
    """Publishes lifecycle events on query start / termination and fans out
    to registered status callbacks (StatusListener parity).

    ``query_name`` scopes the listener to one named query (the session
    listener bus sees every query); termination is matched by the runId
    remembered at start. With ``app_name=None`` no events are published —
    the reference's applicationEvent-returns-null contract."""

    def __init__(
        self,
        publish: Callable[[str], None],
        app_name: str | None,
        instance_id: str,
        id_generator: Callable[[], str] | None = None,
        query_name: str | None = None,
    ):
        self._publish = publish
        self.app_name = app_name
        self.instance_id = instance_id
        self._id_generator = id_generator
        self._query_name = query_name
        self._run_ids: set[str] = set()
        self.on_startup_callbacks: list[Callable[[], None]] = []
        self.on_ready_callbacks: list[Callable[[], None]] = []
        self.on_shutdown_callbacks: list[Callable[[], None]] = []
        self.events: list[str] = []

    def _emit(self, event_name: str) -> None:
        self.events.append(event_name)
        if self.app_name is None:
            return  # RapidApplication.kt:130 — no app_name, no event
        self._publish(
            lifecycle_event(
                event_name, self.app_name, self.instance_id, self._id_generator
            )
        )

    # StreamingQueryListener surface ------------------------------------------

    def onQueryStarted(self, event) -> None:
        if self._query_name and getattr(event, "name", None) != self._query_name:
            return
        run_id = getattr(event, "runId", None)
        if run_id is not None:
            self._run_ids.add(str(run_id))
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
        if self._query_name and str(event.runId) not in self._run_ids:
            return
        self._emit("application_stop")
        for cb in self.on_shutdown_callbacks:
            cb()
        self._emit("application_down")
