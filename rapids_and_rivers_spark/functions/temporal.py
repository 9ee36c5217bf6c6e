"""Temporal & id parsers — strict / optional / lenient (SURVEY.md §1.2, T7/T8).

The reference parses temporal values from JSON strings on demand
(JsonMessage.kt:786-838). Each helper here takes a *string* Column and
returns the parsed value or NULL on failure, so ``require_parseable``
can express 'parser throws = validation fails' as an expression.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
# ISO local date-time: no zone offset / Z suffix allowed (asLocalDateTime
# rejects zoned input — JsonMessage.kt:803)
_LOCAL_DT_RE = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}(:\d{2}(\.\d{1,9})?)?$"
# ISO instant: requires a zone offset or Z (asInstant — JsonMessage.kt:805)
_ZONED_DT_RE = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}(:\d{2}(\.\d{1,9})?)?(Z|[+-]\d{2}:?\d{2})$"
_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"
_YM_RE = r"^\d{4}-\d{2}$"


def try_local_date(col: Column) -> Column:
    """ISO-8601 date or NULL (asLocalDate, JsonMessage.kt:786-787)."""
    return F.when(col.rlike(_DATE_RE), F.try_to_date(col))


def try_year_month(col: Column) -> Column:
    """'yyyy-MM' string validated, returned as-is (asYearMonth, :789-790)."""
    return F.when(col.rlike(_YM_RE) & F.try_to_date(F.concat(col, F.lit("-01"))).isNotNull(), col)


def try_local_datetime(col: Column) -> Column:
    """ISO local date-time (REJECTS zoned input), NTZ timestamp or NULL."""
    return F.when(col.rlike(_LOCAL_DT_RE), F.try_to_timestamp(col))


def try_instant(col: Column) -> Column:
    """ISO zoned/offset date-time -> timestamp or NULL (asInstant)."""
    return F.when(col.rlike(_ZONED_DT_RE), F.try_to_timestamp(col))


def try_lenient_timestamp(col: Column) -> Column:
    """Instant, falling back to local date-time (JsonMessage.kt:812-838)."""
    return F.coalesce(try_instant(col), try_local_datetime(col))


def try_uuid(col: Column) -> Column:
    """Lowercased UUID text or NULL (String.toUUID, JsonMessage.kt:782)."""
    return F.when(col.rlike(_UUID_RE), F.lower(col))
