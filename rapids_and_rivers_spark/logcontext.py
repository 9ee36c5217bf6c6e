"""MDC-style scoped log context (T10; MDC.kt:6-28, KafkaRapid.kt:160-217).

The reference wraps every poll and every record dispatch in an slf4j MDC
scope so log lines carry diagnostic fields (poll id, record offset, …)
without threading them through call signatures. Python analog:
``contextvars`` (safe across threads and asyncio, unlike a bare global)
with the exact CloseableMDCContext contract — merge on enter, restore the
ORIGINAL map on exit — plus a ``logging.Filter`` that stamps the current
map onto every ``LogRecord``.

Scope mapping: Spark has no per-record driver loop, so the poll-scope
analog wraps each micro-batch dispatch (``StreamingRapid.process_batch``)
and the record-scope analog wraps each packet-handler call inside the
executor-side handler loop (both control-plane; nothing here touches the
vectorized data path).
"""

from __future__ import annotations

import contextlib
import contextvars
import logging
import uuid
from datetime import datetime
from typing import Iterator

_mdc: contextvars.ContextVar[dict] = contextvars.ContextVar("mdc", default={})


def current_mdc() -> dict[str, str]:
    """Copy of the current context map (MDC.getCopyOfContextMap)."""
    return dict(_mdc.get())


@contextlib.contextmanager
def with_mdc(
    context: dict[str, str] | None = None, **fields: str
) -> Iterator[dict[str, str]]:
    """Scope log-context fields: ``with with_mdc(key="v"): ...``.

    MDC.kt:12-16 parity — the new map is ``original + new`` and the
    ORIGINAL map (not empty) is restored on exit, so scopes nest.
    """
    merged = {**_mdc.get(), **(context or {}), **fields}
    token = _mdc.set(merged)
    try:
        yield merged
    finally:
        _mdc.reset(token)


class MdcFilter(logging.Filter):
    """Stamp the current MDC map onto every LogRecord as ``record.mdc``
    (and a preformatted ``record.mdc_text``) so formatters can render it —
    the ``%X`` logback-pattern analog."""

    def filter(self, record: logging.LogRecord) -> bool:
        ctx = current_mdc()
        record.mdc = ctx
        record.mdc_text = " ".join(f"{k}={v}" for k, v in sorted(ctx.items()))
        return True


def poll_diagnostics(
    batch_id: int | str, n_records: int | None = None
) -> dict[str, str]:
    """Per-micro-batch diagnostic fields (pollDiganostics parity,
    KafkaRapid.kt:203-207) + the Spark batch id. ``n_records`` is omitted
    when unknown — counting a micro-batch DataFrame would cost an extra
    Spark job per batch just for a log field."""
    out = {
        "rapids_poll_id": str(uuid.uuid4()),
        "rapids_poll_time": datetime.now().isoformat(),
        "rapids_batch_id": str(batch_id),
    }
    if n_records is not None:
        out["rapids_poll_count"] = str(n_records)
    return out


def record_diagnostics(packet_json: str | None = None) -> dict[str, str]:
    """Per-packet diagnostic fields (recordDiganostics parity,
    KafkaRapid.kt:209-217; topic/partition/offset have no analog in the
    executor handler loop — the batch id in the enclosing poll scope is
    the locator)."""
    out = {
        "rapids_record_id": str(uuid.uuid4()),
        "rapids_record_before_notify_time": datetime.now().isoformat(),
    }
    if packet_json is not None:
        out["rapids_record_bytes"] = str(len(packet_json))
    return out
