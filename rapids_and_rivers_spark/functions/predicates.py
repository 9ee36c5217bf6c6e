"""The validation DSL — the reference's query language, compiled to Columns.

Each factory returns a :class:`Rule`: a named predicate over a parsed
variant column plus an error message and a severity. Rivers evaluate rules
in declaration order, accumulating error messages for ``require``-severity
rules and aborting at the first failed ``demand``-severity rule — mirroring
MessageProblems.kt:7-19 (require accumulates, demand/severe throws) and
River.kt:52-65 (preconditions → validations → dispatch).

Inventory parity (SURVEY.md §2.2): F1 require_key, F2-F4 require_value,
F5 require_any, F6 require_all, F7 require_contains, F8 require_all_or_any,
F9/F10 require_array (+ element validation), F11 require_parseable,
F12 forbid, F13 forbid_value, F14 forbid_values, F15/F16 interested_in,
F17-F26 demand_*/reject_* twins (same predicates, abort severity),
F28 should/must/can DSL (see dsl.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import Column, functions as F

from rapids_and_rivers_spark.functions import json_ops as J
from rapids_and_rivers_spark.functions import temporal

#: require = accumulate errors (MessageProblems.kt:7-9);
#: demand = abort validation of this message immediately (MessageProblems.kt:15-19)
REQUIRE = "require"
DEMAND = "demand"


@dataclass(frozen=True)
class Rule:
    """One compiled predicate: ok-expression + error message + severity."""

    name: str
    ok: Callable[[Column], Column]
    message: str
    severity: str = REQUIRE
    #: keys this rule declares readable on the packet (JsonMessage.kt:109)
    declared_keys: tuple[str, ...] = field(default_factory=tuple)
    #: optional dynamic message builder (variant -> string Column); when
    #: set it supersedes ``message`` (used for per-element error indexes)
    message_expr: Callable[[Column], Column] | None = None

    def with_severity(self, severity: str) -> "Rule":
        return Rule(
            self.name,
            self.ok,
            self.message,
            severity,
            self.declared_keys,
            self.message_expr,
        )


def _nn(col: Column) -> Column:
    """Null-safe boolean: a predicate over absent data is False, not NULL."""
    return F.coalesce(col, F.lit(False))


# --- F1 / F17: key presence -------------------------------------------------

def require_key(*keys: str, severity: str = REQUIRE) -> list[Rule]:
    """Key present and non-null (JsonMessage.kt:628-630,747-752)."""
    return [
        Rule(
            name=f"require_key({k})",
            ok=lambda v, k=k: ~J.is_missing_or_null(v, k),
            message=f"Missing required key: {k}",
            severity=severity,
            declared_keys=(k,),
        )
        for k in keys
    ]


# --- F2-F4 / F18-F20: typed value equality (strict, no coercion) ------------

def require_value(key: str, value, severity: str = REQUIRE) -> Rule:
    """Present, of the literal's JSON type, and equal (JsonMessage.kt:632-650).

    Strictness contract: ``require_value(k, 3)`` fails on ``"3"``
    (JsonMessageTest.kt:731-742); ``require_value(k, "3")`` fails on ``3``.
    """
    if isinstance(value, bool):
        ok = lambda v: _nn(J.as_boolean(v, key) == F.lit(value))  # noqa: E731
    elif isinstance(value, (int, float)):
        ok = lambda v: _nn(J.as_double(v, key) == F.lit(float(value)))  # noqa: E731
    elif isinstance(value, str):
        ok = lambda v: _nn(J.as_string(v, key) == F.lit(value))  # noqa: E731
    else:
        raise TypeError(f"unsupported literal type for require_value: {type(value)}")
    return Rule(
        name=f"require_value({key}={value!r})",
        ok=ok,
        message=f"Required {key} is not {value!r}",
        severity=severity,
        declared_keys=(key,),
    )


# --- F5 / F21: enum membership ----------------------------------------------

def require_any(key: str, values: Sequence[str], severity: str = REQUIRE) -> Rule:
    """Is a string and one of ``values`` (JsonMessage.kt:652-657)."""
    return Rule(
        name=f"require_any({key})",
        ok=lambda v: _nn(J.as_string(v, key).isin(list(values))),
        message=f"Required {key} must be one of: {', '.join(values)}",
        severity=severity,
        declared_keys=(key,),
    )


# --- F6 / F22: array superset ------------------------------------------------

def require_all(key: str, values: Sequence[str], severity: str = REQUIRE) -> Rule:
    """Is an array containing ALL of ``values`` (JsonMessage.kt:687-694)."""
    return Rule(
        name=f"require_all({key})",
        ok=lambda v: _nn(
            F.size(
                F.array_except(
                    F.array(*[F.lit(x) for x in values]), J.as_string_array(v, key)
                )
            )
            == 0
        ),
        message=f"Required {key} must contain all of: {', '.join(values)}",
        severity=severity,
        declared_keys=(key,),
    )


# --- F7: array contains -------------------------------------------------------

def require_contains(key: str, value: str, severity: str = REQUIRE) -> Rule:
    """Array contains the value (JsonMessage.kt:674-676)."""
    return Rule(
        name=f"require_contains({key},{value})",
        ok=lambda v: _nn(F.array_contains(J.as_string_array(v, key), value)),
        message=f"Required {key} to contain {value!r}",
        severity=severity,
        declared_keys=(key,),
    )


# --- F8 / F23: array intersection --------------------------------------------

def require_all_or_any(key: str, values: Sequence[str], severity: str = REQUIRE) -> Rule:
    """Array intersects ``values`` (JsonMessage.kt:678-685)."""
    return Rule(
        name=f"require_all_or_any({key})",
        ok=lambda v: _nn(
            F.arrays_overlap(
                J.as_string_array(v, key), F.array(*[F.lit(x) for x in values])
            )
        ),
        message=f"Required {key} to contain any of: {', '.join(values)}",
        severity=severity,
        declared_keys=(key,),
    )


# --- F9 / F10: array type & per-element validation ---------------------------

def require_array(
    key: str,
    element_ok: Callable[[Column], Column] | None = None,
    severity: str = REQUIRE,
) -> Rule:
    """Is a JSON array; optionally every element passes ``element_ok``.

    ``element_ok`` receives each element as a *variant* Column — use
    ``J.vtype``-style helpers with key ``""`` semantics or plain
    ``F.schema_of_variant`` / ``try_variant_get`` on it. Mirrors the
    recursive element-validation block of JsonMessage.kt:659-672.
    """
    if element_ok is None:
        ok = lambda v: _nn(J.is_array(v, key))  # noqa: E731
        message_expr = None
    else:
        ok = lambda v: _nn(  # noqa: E731
            J.is_array(v, key)
            & F.forall(
                F.try_variant_get(v, J.json_path(key), "array<variant>"),
                lambda e: F.coalesce(element_ok(e), F.lit(False)),
            )
        )

        def message_expr(v: Column) -> Column:
            # per-index failure report (JsonMessage.kt:663-671 indexes each
            # element's errors): "tags: elements [0, 2] failed validation"
            arr = F.try_variant_get(v, J.json_path(key), "array<variant>")
            bad = F.filter(
                F.transform(arr, lambda e, i: F.struct(i.alias("i"), e.alias("e"))),
                lambda s: ~F.coalesce(element_ok(s["e"]), F.lit(False)),
            )
            idx_list = F.array_join(
                F.transform(bad, lambda s: s["i"].cast("string")), ", "
            )
            return F.when(
                arr.isNull(), F.lit(f"Required {key} to be an array")
            ).otherwise(
                F.concat(
                    F.lit(f"{key}: elements ["),
                    idx_list,
                    F.lit("] failed validation"),
                )
            )

    return Rule(
        name=f"require_array({key})",
        ok=ok,
        message=f"Required {key} to be an array"
        + (" with valid elements" if element_ok else ""),
        severity=severity,
        declared_keys=(key,),
        message_expr=message_expr,
    )


# --- F11 / F26: custom parser -------------------------------------------------

_PARSERS: dict[str, Callable[[Column], Column]] = {
    "localdate": temporal.try_local_date,
    "yearmonth": temporal.try_year_month,
    "localdatetime": temporal.try_local_datetime,
    "instant": temporal.try_instant,
    "uuid": temporal.try_uuid,
}


def require_parseable(
    key: str,
    parser: str | Callable[[Column], Column],
    severity: str = REQUIRE,
) -> Rule:
    """Value parses under ``parser`` (JsonMessage.kt:700-709).

    ``parser`` is a name from ``{localdate, yearmonth, localdatetime,
    instant, uuid, number}`` or a Column->Column function returning NULL on
    parse failure (the expression analogue of 'parser throws = fail').
    """
    if isinstance(parser, str) and parser == "number":
        # strict is-a-JSON-number check (custom numeric parsers in the
        # reference operate on the JsonNode — the expression analogue is
        # the variant type guard, honoring "3" != 3)
        return Rule(
            name=f"require_parseable({key},number)",
            ok=lambda v: _nn(J.is_number(v, key)),
            message=f"Required {key} to parse as number",
            severity=severity,
            declared_keys=(key,),
        )
    if callable(parser):
        fn, label = parser, getattr(parser, "__name__", "custom")
    else:
        label = parser
        fn = _PARSERS.get(parser)
        if fn is None:
            raise ValueError(f"unknown parser {parser!r}")
    return Rule(
        name=f"require_parseable({key},{label})",
        ok=lambda v: _nn(fn(J.as_string(v, key)).isNotNull()),
        message=f"Required {key} to parse as {label}",
        severity=severity,
        declared_keys=(key,),
    )


# --- F12 / F24: forbidden keys ------------------------------------------------

def forbid(*keys: str, severity: str = REQUIRE) -> list[Rule]:
    """Key missing or null (JsonMessage.kt:711-713,754-757)."""
    return [
        Rule(
            name=f"forbid({k})",
            ok=lambda v, k=k: _nn(J.is_missing_or_null(v, k)),
            message=f"Forbidden key present: {k}",
            severity=severity,
            declared_keys=(k,),
        )
        for k in keys
    ]


# --- F13 / F25: forbidden value -----------------------------------------------

def forbid_value(key: str, value, severity: str = REQUIRE) -> Rule:
    """NOT (present and equal to value) (JsonMessage.kt:715-725)."""
    eq = require_value(key, value)
    return Rule(
        name=f"forbid_value({key}={value!r})",
        ok=lambda v: ~eq.ok(v),
        message=f"Forbidden {key} equal to {value!r}",
        severity=severity,
        declared_keys=(key,),
    )


def forbid_values(key: str, values: Sequence[str], severity: str = REQUIRE) -> Rule:
    """NOT (string and in values) (JsonMessage.kt:727-731)."""
    member = require_any(key, values)
    return Rule(
        name=f"forbid_values({key})",
        ok=lambda v: ~member.ok(v),
        message=f"Forbidden {key} in: {', '.join(values)}",
        severity=severity,
        declared_keys=(key,),
    )


# --- F15 / F16: interesting keys (declaration only) ---------------------------

def interested_in(
    *keys: str, parser: str | Callable[[Column], Column] | None = None
) -> list[Rule]:
    """Always passes; declares keys for projection (JsonMessage.kt:733-745).

    With ``parser``: fails only when present AND unparseable (F16).
    """
    if parser is None:
        return [
            Rule(
                name=f"interested_in({k})",
                ok=lambda v: F.lit(True),
                message="",
                declared_keys=(k,),
            )
            for k in keys
        ]
    parse_rule = [require_parseable(k, parser) for k in keys]
    return [
        Rule(
            name=f"interested_in({k},parsed)",
            ok=lambda v, k=k, r=r: J.is_missing_or_null(v, k) | r.ok(v),
            message=f"Interesting key {k} present but unparseable",
            declared_keys=(k,),
        )
        for k, r in zip(keys, parse_rule)
    ]


# --- F17-F26 convenience: demand twins ---------------------------------------

def demand_key(*keys: str) -> list[Rule]:
    return require_key(*keys, severity=DEMAND)


def demand_value(key: str, value) -> Rule:
    return require_value(key, value, severity=DEMAND)


def demand_any(key: str, values: Sequence[str]) -> Rule:
    return require_any(key, values, severity=DEMAND)


def demand_all(key: str, values: Sequence[str]) -> Rule:
    return require_all(key, values, severity=DEMAND)


def demand_all_or_any(key: str, values: Sequence[str]) -> Rule:
    return require_all_or_any(key, values, severity=DEMAND)


def reject_key(*keys: str) -> list[Rule]:
    return forbid(*keys, severity=DEMAND)


def reject_value(key: str, value) -> Rule:
    return forbid_value(key, value, severity=DEMAND)


def reject_values(key: str, values: Sequence[str]) -> Rule:
    return forbid_values(key, values, severity=DEMAND)
