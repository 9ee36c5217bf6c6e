"""Error accumulation for message validation (MessageProblems parity).

Mirrors rapids-and-rivers-api/MessageProblems.kt:1-51: ``error`` accumulates,
``severe`` raises immediately; the plain report redacts the original message
(only the extended report includes it — MessageProblemsTest.kt:21-34).
"""

from __future__ import annotations


class MessageProblemsException(Exception):
    """Raised on severe problems (MessageProblems.kt:15-19)."""

    def __init__(self, problems: "MessageProblems", message: str):
        super().__init__(message)
        self.problems = problems


class MessageProblems:
    def __init__(self, original_message: str):
        self._original = original_message
        self._errors: list[str] = []
        self._severe: list[str] = []

    def error(self, message: str) -> None:
        self._errors.append(message)

    def severe(self, message: str) -> None:
        self._severe.append(message)
        raise MessageProblemsException(self, message)

    def has_errors(self) -> bool:
        return bool(self._errors) or bool(self._severe)

    @property
    def errors(self) -> list[str]:
        return list(self._errors) + list(self._severe)

    def __str__(self) -> str:
        """Plain report: problems only, original message redacted."""
        if not self.has_errors():
            return "No errors in message"
        return "Problems exist. Original message not included. Problems:\n" + "\n".join(
            f"\t{e}" for e in self.errors
        )

    def to_extended_report(self) -> str:
        """Extended report includes the original message (for error sinks)."""
        if not self.has_errors():
            return "No errors in message"
        return (
            "Problems exist. Original message attached. Problems:\n"
            + "\n".join(f"\t{e}" for e in self.errors)
            + f"\nOriginal message: {self._original}"
        )
