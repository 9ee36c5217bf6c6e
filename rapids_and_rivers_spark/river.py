"""River — a declaratively-filtered view of the rapid, compiled to Catalyst.

The reference evaluates, per message (River.kt:52-65):
parse (fail ⇒ onSevere) → preconditions (fail ⇒ onPreconditionError) →
validations (fail ⇒ onError) → onPacket.

Spark design (SURVEY.md §7.1): the whole pipeline is ONE projection over a
once-parsed variant column producing a *verdict* struct instead of a bare
filter, so the 3-channel error routing and the ordered, accumulated error
messages (MessageProblems.kt:7-19) are reproducible and testable:

    verdict ∈ {pass, precondition_failed, validation_failed, unparseable}
    errors  = array<string> in declaration order, truncated at the first
              failed demand-severity rule (severe aborts evaluation)

Batch/stream duality: ``evaluate`` works identically on batch and streaming
DataFrames — same expression tree, different source/sink.

At scale: rules are pure Column expressions (whole-stage codegen, no
Python), the variant parse happens once per message regardless of how many
rules/rivers inspect it (the reference re-parses per river — River.kt:53-55,
an O(rivers) multiplier we eliminate), and the verdict projection is
shuffle-free: it scales linearly with input partitions.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from rapids_and_rivers_spark.functions import json_ops as J
from rapids_and_rivers_spark.functions.predicates import DEMAND, Rule

VARIANT_COL = "__variant"
VERDICT_COL = "verdict"
ERRORS_COL = "errors"


class Verdict:
    PASS = "pass"
    PRECONDITION_FAILED = "precondition_failed"
    VALIDATION_FAILED = "validation_failed"
    UNPARSEABLE = "unparseable"


def _flatten(rules: Iterable[Rule | Sequence[Rule]]) -> list[Rule]:
    out: list[Rule] = []
    for r in rules:
        if isinstance(r, Rule):
            out.append(r)
        else:
            out.extend(r)
    return out


def _errors_expr(rules: Sequence[Rule], v: Column) -> Column:
    """Ordered error accumulation with demand-abort (MessageProblems.kt:7-19).

    require-severity failures append their message and continue; the first
    demand-severity failure appends and stops evaluating later rules —
    built in declaration order for determinism (SURVEY.md §4).
    """
    errors = F.array().cast("array<string>")
    aborted = F.lit(False)
    for rule in rules:
        ok = F.coalesce(rule.ok(v), F.lit(False))
        fail = (~ok) & (~aborted)
        # a rule may carry a dynamic (per-message) error message built from
        # the variant — e.g. requireArray reports WHICH element indexes
        # failed (JsonMessage.kt:663-671 errors are per-index)
        msg = rule.message_expr(v) if rule.message_expr is not None else F.lit(
            rule.message
        )
        errors = F.when(fail, F.array_append(errors, msg)).otherwise(errors)
        if rule.severity == DEMAND:
            aborted = aborted | fail
    return errors


class River:
    """Builder: register preconditions/validations, then compile onto a DF.

    Mirrors River.kt:18-35 (rule registration) and README.md:14-22
    (preconditions gate *relevance* — silent drop; validations gate
    *correctness* — logged error).
    """

    def __init__(self, name: str = "river"):
        self.name = name
        self._preconditions: list[Rule] = []
        self._validations: list[Rule] = []
        self._listeners: list[Callable] = []
        self._responders: list[Callable[[DataFrame], DataFrame]] = []

    # -- registration ---------------------------------------------------------

    def precondition(self, *rules: Rule | Sequence[Rule]) -> "River":
        self._preconditions.extend(_flatten(rules))
        return self

    def validate(self, *rules: Rule | Sequence[Rule]) -> "River":
        self._validations.extend(_flatten(rules))
        return self

    def on_packet(self, fn: Callable) -> "River":
        """Register a Python packet handler (U1 surface; used by rapids)."""
        self._listeners.append(fn)
        return self

    def respond(self, fn: Callable[[DataFrame], DataFrame]) -> "River":
        """Register an expression-level responder: ``fn(passing_df) ->
        replies_df`` with columns ``(value, key)``.

        This is the scalable handler path — the whole enrich/reply stays a
        Catalyst plan (U1 handlers that need imperative Python use
        ``on_packet``, executed via mapInPandas on the executors).
        """
        self._responders.append(fn)
        return self

    @property
    def listeners(self) -> list[Callable]:
        return list(self._listeners)

    @property
    def responders(self) -> list[Callable[[DataFrame], DataFrame]]:
        return list(self._responders)

    @property
    def declared_keys(self) -> list[str]:
        """All keys declared by rules, in declaration order, deduplicated."""
        seen: dict[str, None] = {}
        for rule in self._preconditions + self._validations:
            for k in rule.declared_keys:
                seen.setdefault(k, None)
        return list(seen)

    # -- compilation ----------------------------------------------------------

    def verdict_expr(self, v: Column) -> Column:
        """struct(verdict, errors) over a parsed variant column."""
        unparseable = v.isNull() | ~F.coalesce(J.is_json_object(v), F.lit(False))
        pre_errors = _errors_expr(self._preconditions, v)
        val_errors = _errors_expr(self._validations, v)
        verdict = (
            F.when(unparseable, Verdict.UNPARSEABLE)
            .when(F.size(pre_errors) > 0, Verdict.PRECONDITION_FAILED)
            .when(F.size(val_errors) > 0, Verdict.VALIDATION_FAILED)
            .otherwise(Verdict.PASS)
        )
        errors = (
            F.when(unparseable, F.array(F.lit("Invalid JSON per Jackson library")))
            .when(F.size(pre_errors) > 0, pre_errors)
            .otherwise(val_errors)
        )
        return F.struct(verdict.alias(VERDICT_COL), errors.alias(ERRORS_COL))

    def evaluate(self, df: DataFrame, value_col: str = "value") -> DataFrame:
        """Attach ``__variant``, ``verdict``, ``errors`` columns.

        The variant parse is materialized as a column so Catalyst evaluates
        it once and every rule expression references the shared result. A
        pre-existing ``__variant`` column is REUSED — the runtime parses
        each micro-batch once and every registered river shares it (the
        reference re-parses per river, River.kt:53-55).
        """
        if VARIANT_COL in df.columns:
            with_v = df
        else:
            with_v = df.withColumn(VARIANT_COL, J.parse(F.col(value_col)))
        verdict = self.verdict_expr(F.col(VARIANT_COL))
        return with_v.withColumn(VERDICT_COL, verdict[VERDICT_COL]).withColumn(
            ERRORS_COL, verdict[ERRORS_COL]
        )

    def passing(self, df: DataFrame, value_col: str = "value") -> DataFrame:
        """Messages that pass the river; variant column retained for projection."""
        return self.evaluate(df, value_col).filter(F.col(VERDICT_COL) == Verdict.PASS)

    # -- projection (P1/P2: declared-key access as typed columns) --------------

    @staticmethod
    def field(key: str, dtype: str = "string", alias: str | None = None) -> Column:
        """Typed projection of a declared key from the ``__variant`` column.

        dtype: any Spark cast target ('string','long','double','boolean',
        'timestamp', 'array<string>', ...). Strict-typing variants live in
        functions.json_ops (as_string/as_double/...).
        """
        col = F.try_variant_get(F.col(VARIANT_COL), J.json_path(key), dtype)
        return col.alias(alias or key.replace(".", "_"))

    @staticmethod
    def strict_field(key: str, dtype: str, alias: str | None = None) -> Column:
        """Projection honoring the strict typing contract (no coercion)."""
        v = F.col(VARIANT_COL)
        fn = {
            "string": J.as_string,
            "double": J.as_double,
            "long": J.as_long,
            "boolean": J.as_boolean,
            "array<string>": J.as_string_array,
        }[dtype]
        return fn(v, key).alias(alias or key.replace(".", "_"))
