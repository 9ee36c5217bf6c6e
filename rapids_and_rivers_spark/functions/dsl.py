"""Declarative validation DSL v2 — ``should / must / can`` (F28 parity).

Mirrors MessageValidation.kt:54-94: the reference's second-generation DSL

.. code-block:: kotlin

    validate {
        "key" should exist
        "@event_name" must be("ping")
        "extra" can exist
    }

where ``should`` failures accumulate as errors, ``must`` failures abort
("severe"), and ``can`` merely declares interest. Python spelling:

.. code-block:: python

    river.validate(spec(
        should("key").exist(),
        must("@event_name").be("ping"),
        can("extra").exist(),
    ))

Every combinator compiles to the same :class:`Rule` objects as the v1
predicates, so the two DSLs interoperate inside one river.
"""

from __future__ import annotations

from typing import Sequence

from rapids_and_rivers_spark.functions import json_ops as J
from rapids_and_rivers_spark.functions import predicates as P
from rapids_and_rivers_spark.functions.predicates import DEMAND, REQUIRE, Rule


class KeySpec:
    """One key bound to a severity tier, awaiting its combinator
    (MessageValidation.kt:17-21 builder + 54-78 infix DSL)."""

    def __init__(self, key: str, severity: str | None):
        self.key = key
        #: None => 'can' (optional: declare only)
        self.severity = severity

    # -- combinators (ValueValidation, MessageValidation.kt:30-52) ------------

    def exist(self) -> Rule:
        if self.severity is None:
            return P.interested_in(self.key)[0]
        return P.require_key(self.key, severity=self.severity)[0]

    def be(self, value) -> Rule:
        if self.severity is None:
            # optional equality: validated only when present
            eq = P.require_value(self.key, value)
            return Rule(
                name=f"can_be({self.key}={value!r})",
                ok=lambda v, r=eq: J.is_missing_or_null(v, self.key) | r.ok(v),
                message=f"Optional {self.key} present but not {value!r}",
                severity=REQUIRE,
                declared_keys=(self.key,),
            )
        return P.require_value(self.key, value, severity=self.severity)

    def be_in(self, values: Sequence[str]) -> Rule:
        if self.severity is None:
            raise ValueError("'can' supports exist()/be() only")
        return P.require_any(self.key, values, severity=self.severity)

    def parse_as(self, parser) -> Rule:
        if self.severity is None:
            return P.interested_in(self.key, parser=parser)[0]
        return P.require_parseable(self.key, parser, severity=self.severity)

    def not_exist(self) -> Rule:
        severity = self.severity or REQUIRE
        return P.forbid(self.key, severity=severity)[0]


def should(key: str) -> KeySpec:
    """Failures accumulate as errors (MessageValidation.kt 'should')."""
    return KeySpec(key, REQUIRE)


def must(key: str) -> KeySpec:
    """Failures abort validation — severe (MessageValidation.kt 'must')."""
    return KeySpec(key, DEMAND)


def can(key: str) -> KeySpec:
    """Declares interest; never fails on absence (MessageValidation.kt 'can')."""
    return KeySpec(key, None)


def spec(*rules: Rule) -> list[Rule]:
    """Bundle DSL rules for ``river.validate(...)`` (order preserved)."""
    return list(rules)
