"""Typed access over JSON message columns via Spark 4 VariantType.

The reference's message model (JsonMessage.kt, see SURVEY.md §1) is a
row-oriented JSON object with *strict* scalar typing: ``"3" != 3``
(JsonMessage.kt:645-650), *missing* and *null* are distinct states
(JsonMessage.kt:784), and nested keys are navigated with ``.``-separated
paths (JsonMessage.kt:35,763-768).

Spark mapping: parse the raw string ONCE with ``try_parse_json`` into a
``VariantType`` column, then inspect sub-values:

- missing key        -> SQL NULL variant
- JSON null          -> variant whose ``schema_of_variant`` is ``'VOID'``
- type inspection    -> ``schema_of_variant`` (STRING / BIGINT / DECIMAL /
                        DOUBLE / BOOLEAN / ARRAY<..> / OBJECT<..>)
- strict extraction  -> ``try_variant_get`` guarded by a type check
                        (the raw cast coerces, so the guard carries the
                        strictness contract)

All functions take/return Columns and stay inside Catalyst codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Path separator in message keys, mirroring JsonMessage.kt:35.
NESTED_KEY_SEPARATOR = "."

_NUMERIC_PREFIXES = ("BIGINT", "DECIMAL", "DOUBLE", "FLOAT", "INT", "SMALLINT", "TINYINT")


def json_path(key: str) -> str:
    """Dotted message key -> variant JSON path, bracket-quoted per segment.

    Bracket quoting makes keys like ``@event_name`` or ``@løsning`` safe.
    """
    segments = key.split(NESTED_KEY_SEPARATOR)
    return "$" + "".join("['" + s.replace("'", "\\'") + "']" for s in segments)


def parse(value: Column | str) -> Column:
    """Raw JSON string column -> variant (SQL NULL when unparseable)."""
    return F.try_parse_json(value)


def is_json_object(v: Column) -> Column:
    """True when the variant parsed AND the top level is a JSON object.

    The reference rejects non-object top levels as 'severe'
    (JsonMessage.kt:97-105).
    """
    return F.schema_of_variant(v).startswith("OBJECT")


def get(v: Column, key: str) -> Column:
    """Variant sub-value at a dotted key (SQL NULL when the path is missing)."""
    return F.try_variant_get(v, json_path(key), "variant")


def vtype(v: Column, key: str) -> Column:
    """Schema string of the sub-value ('VOID' for JSON null, NULL for missing)."""
    return F.schema_of_variant(get(v, key))


def is_missing(v: Column, key: str) -> Column:
    return get(v, key).isNull()


def is_null(v: Column, key: str) -> Column:
    """JSON-null (present but null) — distinct from missing (JsonMessage.kt:784)."""
    return vtype(v, key) == "VOID"


def is_missing_or_null(v: Column, key: str) -> Column:
    sub = get(v, key)
    return sub.isNull() | (F.schema_of_variant(sub) == "VOID")


def is_string(v: Column, key: str) -> Column:
    return vtype(v, key) == "STRING"


def is_boolean(v: Column, key: str) -> Column:
    return vtype(v, key) == "BOOLEAN"


def is_number(v: Column, key: str) -> Column:
    t = vtype(v, key)
    cond = t.startswith(_NUMERIC_PREFIXES[0])
    for p in _NUMERIC_PREFIXES[1:]:
        cond = cond | t.startswith(p)
    return cond


def is_array(v: Column, key: str) -> Column:
    return vtype(v, key).startswith("ARRAY")


def is_object(v: Column, key: str) -> Column:
    return vtype(v, key).startswith("OBJECT")


def as_string(v: Column, key: str) -> Column:
    """Strict string extraction: NULL unless the JSON value IS a string.

    Mirrors requireValue(key, String) demanding ``node.isString``
    (JsonMessage.kt:638-643) — a JSON number 3 must NOT surface as "3".
    """
    return F.when(is_string(v, key), F.try_variant_get(v, json_path(key), "string"))


def as_double(v: Column, key: str) -> Column:
    """Numeric extraction as double: NULL unless the JSON value is a number.

    The reference compares numbers via Jackson ``numberValue()`` so
    ``3 == 3.0`` but ``"3" != 3`` (JsonMessage.kt:645-650; proven by
    JsonMessageTest.kt:731-742).
    """
    return F.when(is_number(v, key), F.try_variant_get(v, json_path(key), "double"))


def as_long(v: Column, key: str) -> Column:
    return F.when(is_number(v, key), F.try_variant_get(v, json_path(key), "long"))


def as_boolean(v: Column, key: str) -> Column:
    return F.when(is_boolean(v, key), F.try_variant_get(v, json_path(key), "boolean"))


def as_string_array(v: Column, key: str) -> Column:
    """Array-of-strings extraction: NULL unless the value is a JSON array.

    Non-string elements surface as their JSON text (used for membership
    tests on string enums, matching requireAll/requireContains which
    compare via ``asText()`` — JsonMessage.kt:674-698).
    """
    return F.when(
        is_array(v, key), F.try_variant_get(v, json_path(key), "array<string>")
    )


def loose_string(v: Column, key: str) -> Column:
    """Lenient text of a scalar sub-value (string/number/bool -> its text).

    Matches Jackson ``asText()`` semantics used by the reference's tag
    derivation (River.kt:195-233). NULL for missing/null/array/object.
    """
    t = vtype(v, key)
    return F.when(
        t.isNotNull() & (t == "STRING"),
        F.try_variant_get(v, json_path(key), "string"),
    ).when(
        t.isNotNull() & ~t.startswith("ARRAY") & ~t.startswith("OBJECT") & (t != "VOID"),
        F.try_variant_get(v, json_path(key), "string"),
    )
