"""Packet — the imperative message object handed to Python handlers.

The hot path of the engine is Catalyst expressions (see river.py); Packet is
the U1 extension surface (SURVEY.md §2.7): arbitrary ``on_packet`` handlers
inside ``foreachBatch`` that need JsonMessage-style imperative access
(JsonMessage.kt):

- declared-key contract: reading an undeclared key raises
  (JsonMessage.kt:770-771; JsonMessageTest.kt:276-294);
- missing vs null distinct; nested ``.``-paths (JsonMessage.kt:763-768,784);
- mutation marks the key recognized; ``to_json`` serializes the full
  mutated tree, preserving undeclared fields (JsonMessage.kt:773-779);
- envelope auto-population on construction (JsonMessage.kt:127-135).
"""

from __future__ import annotations

import json
import uuid as _uuid
from datetime import datetime
from typing import Any, Callable

from rapids_and_rivers_spark.problems import MessageProblems

ID_KEY = "@id"
OPPRETTET_KEY = "@opprettet"
EVENT_NAME_KEY = "@event_name"
NEED_KEY = "@behov"
NEED_ID_KEY = "@behovId"
SOLUTION_KEY = "@løsning"
READ_COUNT_KEY = "system_read_count"
PARTICIPATING_SERVICES_KEY = "system_participating_services"
CAUSED_BY_KEY = "@forårsaket_av"

_MISSING = object()


class Packet:
    """A parsed, mutable JSON message with a declared-key projection contract."""

    def __init__(
        self,
        original_message: str,
        problems: MessageProblems | None = None,
        id_generator: Callable[[], str] = lambda: str(_uuid.uuid4()),
        service_name: str | None = None,
        instance_id: str | None = None,
        stamp: bool = True,
    ):
        self._problems = problems or MessageProblems(original_message)
        try:
            node = json.loads(original_message)
        except (ValueError, TypeError):
            self._problems.severe("Invalid JSON per Jackson library")
        if not isinstance(node, dict):
            self._problems.severe("Incoming message needs to be an object")
        self._node: dict[str, Any] = node
        self._recognized: set[str] = set()
        if stamp:
            # envelope auto-population (JsonMessage.kt:127-135)
            self._node.setdefault(ID_KEY, id_generator())
            self._node.setdefault(OPPRETTET_KEY, datetime.now().isoformat())
            self._node[READ_COUNT_KEY] = int(self._node.get(READ_COUNT_KEY, -1) or -1) + 1
            entry: dict[str, Any] = {
                "id": self._node[ID_KEY],
                "time": datetime.now().isoformat(),
            }
            if service_name:
                entry["service"] = service_name
            if instance_id:
                entry["instance"] = instance_id
            services = self._node.get(PARTICIPATING_SERVICES_KEY)
            if not isinstance(services, list):
                services = []
            self._node[PARTICIPATING_SERVICES_KEY] = services + [entry]
        # tracing capture at parse time (JsonMessage.kt:138-145): causation
        # reflects the message AS RECEIVED, not as later mutated by handlers
        self._tracing = {
            "id": self._node.get(ID_KEY),
            "opprettet": self._node.get(OPPRETTET_KEY),
            "event_name": self._node.get(EVENT_NAME_KEY, "ukjent"),
            "behov": self._node.get(NEED_KEY),
        }

    # -- declared-key contract -------------------------------------------------

    def declare(self, *keys: str) -> None:
        self._recognized.update(keys)

    def _resolve(self, key: str) -> Any:
        """Nested '.'-path lookup (JsonMessage.kt:763-768)."""
        node: Any = self._node
        for seg in key.split("."):
            if not isinstance(node, dict) or seg not in node:
                return _MISSING
            node = node[seg]
        return node

    def __getitem__(self, key: str) -> Any:
        if key not in self._recognized:
            raise KeyError(
                f"{key} is unknown; keys must be declared as required, forbidden, or interesting"
            )
        value = self._resolve(key)
        return None if value is _MISSING else value

    def is_missing(self, key: str) -> bool:
        return self._resolve(key) is _MISSING

    def is_missing_or_null(self, key: str) -> bool:
        v = self._resolve(key)
        return v is _MISSING or v is None

    def __setitem__(self, key: str, value: Any) -> None:
        """Set a top-level or nested field; marks it recognized (:773-777)."""
        self._recognized.add(key)
        segs = key.split(".")
        node = self._node
        for seg in segs[:-1]:
            nxt = node.get(seg)
            if not isinstance(nxt, dict):
                nxt = {}
                node[seg] = nxt
            node = nxt
        node[segs[-1]] = value

    def __contains__(self, key: str) -> bool:
        return not self.is_missing_or_null(key)

    # -- serialization ---------------------------------------------------------

    def to_json(self) -> str:
        """Serialize the full mutated tree (undeclared fields preserved)."""
        return json.dumps(self._node, ensure_ascii=False, separators=(",", ":"))

    @property
    def problems(self) -> MessageProblems:
        return self._problems

    # -- message construction (T3/T4, JsonMessage.kt:47-67) --------------------

    @staticmethod
    def new_message(
        event_name: str | None = None,
        fields: dict[str, Any] | None = None,
        id_generator: Callable[[], str] = lambda: str(_uuid.uuid4()),
    ) -> "Packet":
        body = dict(fields or {})
        if event_name is not None:
            body[EVENT_NAME_KEY] = event_name
        p = Packet(json.dumps(body), id_generator=id_generator, stamp=False)
        p._node.setdefault(ID_KEY, id_generator())
        p._node.setdefault(OPPRETTET_KEY, datetime.now().isoformat())
        p._recognized.update(body.keys())
        p._recognized.update({ID_KEY, OPPRETTET_KEY, EVENT_NAME_KEY})
        p._owns_identity = True
        return p

    def populate_standard_fields(
        self,
        reply: "Packet",
        id_generator: Callable[[], str] = lambda: str(_uuid.uuid4()),
    ) -> "Packet":
        """Publish-path stamp (JsonMessage.kt:69-95): the reply gets
        ``@forårsaket_av`` from *this* message plus a fresh ``@id`` and
        ``@opprettet`` (unless the reply constructed its own id — a reply
        that is the mutated original does NOT own the inherited id)."""
        tracing = getattr(self, "_tracing", None) or {
            "id": self._node.get(ID_KEY),
            "opprettet": self._node.get(OPPRETTET_KEY),
            "event_name": self._node.get(EVENT_NAME_KEY, "ukjent"),
            "behov": self._node.get(NEED_KEY),
        }
        caused_by: dict[str, Any] = {
            "id": tracing["id"],
            "opprettet": tracing["opprettet"],
            "event_name": tracing["event_name"] or "ukjent",
        }
        if tracing.get("behov"):
            caused_by["behov"] = tracing["behov"]
        reply._recognized.update({ID_KEY, OPPRETTET_KEY, CAUSED_BY_KEY})
        if not reply._owns_identity:
            reply._node[ID_KEY] = id_generator()
            reply._node[OPPRETTET_KEY] = datetime.now().isoformat()
        reply._node[CAUSED_BY_KEY] = caused_by
        return reply

    #: True when the packet minted its own @id (new_message/new_need);
    #: packets parsed from the wire inherit the sender's id and don't own it.
    _owns_identity: bool = False

    @staticmethod
    def new_need(
        needs: list[str],
        fields: dict[str, Any] | None = None,
        id_generator: Callable[[], str] = lambda: str(_uuid.uuid4()),
    ) -> "Packet":
        """`behov` request message with its correlation id (JsonMessage.kt:60-67)."""
        body = dict(fields or {})
        body[NEED_KEY] = needs
        body[NEED_ID_KEY] = id_generator()
        return Packet.new_message("behov", body, id_generator)
