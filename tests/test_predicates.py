"""Truth-table corpus for the validation DSL, ported from the reference's
JsonMessageTest.kt (see SURVEY.md §5.1): every predicate against
missing / null / wrong-type / match fixtures, evaluated through the Spark
river compiler on a batch DataFrame.
"""

import pytest
from pyspark.sql import functions as F

from rapids_and_rivers_spark.functions import predicates as P
from rapids_and_rivers_spark.river import River, Verdict


def run_river(spark, river: River, messages: list[str]) -> list[tuple[str, list[str]]]:
    df = spark.createDataFrame([(m,) for m in messages], "value string")
    rows = river.evaluate(df).select("verdict", "errors").collect()
    return [(r.verdict, r.errors) for r in rows]


def verdicts(spark, rules, messages, stage="validate"):
    river = River()
    getattr(river, "validate" if stage == "validate" else "precondition")(rules)
    return [v for v, _ in run_river(spark, river, messages)]


# --- F1 require_key: present and non-null (JsonMessageTest truth table) -----

def test_require_key(spark):
    msgs = ['{"k":1}', '{"k":"v"}', '{"k":null}', '{"other":1}', '{"k":false}']
    assert verdicts(spark, P.require_key("k"), msgs) == [
        Verdict.PASS, Verdict.PASS, Verdict.VALIDATION_FAILED,
        Verdict.VALIDATION_FAILED, Verdict.PASS,
    ]


def test_require_key_nested_path(spark):
    # nested '.'-paths (JsonMessageTest.kt:297-310)
    msgs = ['{"a":{"b":{"c":1}}}', '{"a":{"b":{}}}', '{"a":1}']
    assert verdicts(spark, P.require_key("a.b.c"), msgs) == [
        Verdict.PASS, Verdict.VALIDATION_FAILED, Verdict.VALIDATION_FAILED,
    ]


# --- F2-F4 require_value: strict typing (JsonMessageTest.kt:731-742) ---------

def test_require_value_number_strict(spark):
    msgs = ['{"n":3}', '{"n":"3"}', '{"n":3.0}', '{"n":4}', '{"n":null}', "{}"]
    assert verdicts(spark, P.require_value("n", 3), msgs) == [
        Verdict.PASS, Verdict.VALIDATION_FAILED, Verdict.PASS,
        Verdict.VALIDATION_FAILED, Verdict.VALIDATION_FAILED, Verdict.VALIDATION_FAILED,
    ]


def test_require_value_string_strict(spark):
    msgs = ['{"s":"3"}', '{"s":3}', '{"s":"x"}']
    assert verdicts(spark, P.require_value("s", "3"), msgs) == [
        Verdict.PASS, Verdict.VALIDATION_FAILED, Verdict.VALIDATION_FAILED,
    ]


def test_require_value_boolean(spark):
    msgs = ['{"b":true}', '{"b":"true"}', '{"b":false}']
    assert verdicts(spark, P.require_value("b", True), msgs) == [
        Verdict.PASS, Verdict.VALIDATION_FAILED, Verdict.VALIDATION_FAILED,
    ]


# --- F5 require_any -----------------------------------------------------------

def test_require_any(spark):
    msgs = ['{"e":"a"}', '{"e":"b"}', '{"e":"c"}', '{"e":1}', "{}"]
    assert verdicts(spark, P.require_any("e", ["a", "b"]), msgs) == [
        Verdict.PASS, Verdict.PASS, Verdict.VALIDATION_FAILED,
        Verdict.VALIDATION_FAILED, Verdict.VALIDATION_FAILED,
    ]


# --- F6-F8 array membership ----------------------------------------------------

def test_require_all(spark):
    msgs = ['{"a":["x","y","z"]}', '{"a":["x"]}', '{"a":"x"}', "{}"]
    assert verdicts(spark, P.require_all("a", ["x", "y"]), msgs) == [
        Verdict.PASS, Verdict.VALIDATION_FAILED, Verdict.VALIDATION_FAILED,
        Verdict.VALIDATION_FAILED,
    ]


def test_require_contains(spark):
    msgs = ['{"a":["x","y"]}', '{"a":["y"]}', '{"a":[]}']
    assert verdicts(spark, P.require_contains("a", "x"), msgs) == [
        Verdict.PASS, Verdict.VALIDATION_FAILED, Verdict.VALIDATION_FAILED,
    ]


def test_require_all_or_any(spark):
    # (JsonMessageTest.kt:558-610)
    msgs = ['{"a":["x","q"]}', '{"a":["q"]}', '{"a":["x","y"]}']
    assert verdicts(spark, P.require_all_or_any("a", ["x", "y"]), msgs) == [
        Verdict.PASS, Verdict.VALIDATION_FAILED, Verdict.PASS,
    ]


# --- F9/F10 require_array + element validation ---------------------------------

def test_require_array(spark):
    msgs = ['{"a":[]}', '{"a":[1]}', '{"a":{}}', '{"a":"no"}']
    assert verdicts(spark, P.require_array("a"), msgs) == [
        Verdict.PASS, Verdict.PASS, Verdict.VALIDATION_FAILED, Verdict.VALIDATION_FAILED,
    ]


def test_require_array_element_validation(spark):
    # every element must be an object with key "id" (JsonMessageTest.kt:777-796)
    rule = P.require_array(
        "a",
        element_ok=lambda e: F.try_variant_get(e, "$['id']", "variant").isNotNull(),
    )
    msgs = ['{"a":[{"id":1},{"id":2}]}', '{"a":[{"id":1},{}]}', '{"a":[]}']
    assert verdicts(spark, rule, msgs) == [
        Verdict.PASS, Verdict.VALIDATION_FAILED, Verdict.PASS,
    ]


# --- F11 require_parseable -----------------------------------------------------

def test_require_parseable_datetime(spark):
    msgs = [
        '{"t":"2024-01-01T10:00:00"}',
        '{"t":"2024-01-01T10:00:00Z"}',  # zoned input rejected by asLocalDateTime
        '{"t":"not a time"}',
        '{"t":10}',
    ]
    assert verdicts(spark, P.require_parseable("t", "localdatetime"), msgs) == [
        Verdict.PASS, Verdict.VALIDATION_FAILED, Verdict.VALIDATION_FAILED,
        Verdict.VALIDATION_FAILED,
    ]


def test_require_parseable_instant(spark):
    msgs = ['{"t":"2024-01-01T10:00:00Z"}', '{"t":"2024-01-01T10:00:00+01:00"}',
            '{"t":"2024-01-01T10:00:00"}']
    assert verdicts(spark, P.require_parseable("t", "instant"), msgs) == [
        Verdict.PASS, Verdict.PASS, Verdict.VALIDATION_FAILED,
    ]


def test_require_parseable_uuid_and_date(spark):
    msgs = ['{"u":"c9a6b4f1-111e-4b3a-9caf-6f2fb2a1e3a0","d":"2024-02-29","m":"2024-02"}']
    river = River().validate(
        P.require_parseable("u", "uuid"),
        P.require_parseable("d", "localdate"),
        P.require_parseable("m", "yearmonth"),
    )
    assert [v for v, _ in run_river(spark, river, msgs)] == [Verdict.PASS]


# --- F12-F14 forbid -------------------------------------------------------------

def test_forbid(spark):
    # key missing or null passes (JsonMessageTest.kt:842-878)
    msgs = ["{}", '{"k":null}', '{"k":1}', '{"k":"x"}']
    assert verdicts(spark, P.forbid("k"), msgs) == [
        Verdict.PASS, Verdict.PASS, Verdict.VALIDATION_FAILED, Verdict.VALIDATION_FAILED,
    ]


def test_forbid_value(spark):
    msgs = ['{"k":"bad"}', '{"k":"ok"}', "{}", '{"k":null}']
    assert verdicts(spark, P.forbid_value("k", "bad"), msgs) == [
        Verdict.VALIDATION_FAILED, Verdict.PASS, Verdict.PASS, Verdict.PASS,
    ]


def test_forbid_values(spark):
    msgs = ['{"k":"a"}', '{"k":"z"}', "{}"]
    assert verdicts(spark, P.forbid_values("k", ["a", "b"]), msgs) == [
        Verdict.VALIDATION_FAILED, Verdict.PASS, Verdict.PASS,
    ]


# --- F15/F16 interested_in -------------------------------------------------------

def test_interested_in_always_passes(spark):
    msgs = ["{}", '{"k":1}', '{"k":null}']
    assert verdicts(spark, P.interested_in("k"), msgs) == [Verdict.PASS] * 3


def test_interested_in_with_parser(spark):
    # parser applies only when present (JsonMessage.kt:737-745)
    msgs = ["{}", '{"t":null}', '{"t":"2024-01-01"}', '{"t":"garbage"}']
    assert verdicts(spark, P.interested_in("t", parser="localdate"), msgs) == [
        Verdict.PASS, Verdict.PASS, Verdict.PASS, Verdict.VALIDATION_FAILED,
    ]


# --- routing: preconditions vs validations vs unparseable (River.kt:52-65) -----

def test_verdict_routing(spark):
    river = (
        River()
        .precondition(P.require_value("@event_name", "ping"))
        .validate(P.require_key("ping_time"))
    )
    msgs = [
        '{"@event_name":"ping","ping_time":"t"}',
        '{"@event_name":"pong","ping_time":"t"}',
        '{"@event_name":"ping"}',
        "not json",
        "[1,2]",
        "3",
    ]
    out = [v for v, _ in run_river(spark, river, msgs)]
    assert out == [
        Verdict.PASS, Verdict.PRECONDITION_FAILED, Verdict.VALIDATION_FAILED,
        Verdict.UNPARSEABLE, Verdict.UNPARSEABLE, Verdict.UNPARSEABLE,
    ]


# --- error accumulation order + demand abort (MessageProblems.kt:7-19) ----------

def test_error_accumulation_order(spark):
    river = River().validate(
        P.require_key("a"), P.require_key("b"), P.require_key("c")
    )
    _, errors = run_river(spark, river, ["{}"])[0]
    assert errors == [
        "Missing required key: a",
        "Missing required key: b",
        "Missing required key: c",
    ]


def test_demand_aborts_accumulation(spark):
    river = River().validate(
        P.require_key("a"),
        P.demand_value("e", "x"),
        P.require_key("b"),  # never evaluated after failed demand
    )
    _, errors = run_river(spark, river, ['{"e":"y","other":1}'])[0]
    assert errors == ["Missing required key: a", "Required e is not 'x'"]


def test_demand_pass_continues(spark):
    river = River().validate(
        P.demand_value("e", "x"), P.require_key("b")
    )
    verdict, errors = run_river(spark, river, ['{"e":"x","b":1}'])[0]
    assert verdict == Verdict.PASS and errors == []


def test_require_array_reports_failing_indexes(spark):
    """F10 element-validation errors name the failing element indexes
    (JsonMessage.kt:663-671 indexes element errors)."""
    import json
    from pyspark.sql import functions as F
    from rapids_and_rivers_spark.functions import predicates as P
    from rapids_and_rivers_spark.river import River

    msgs = [
        json.dumps({"xs": [1, -2, 3, -4]}),  # indexes 1, 3 fail
        json.dumps({"xs": [5, 6]}),          # passes
        json.dumps({"xs": "nope"}),          # not an array
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    river = River("r").validate(
        P.require_array(
            "xs", element_ok=lambda e: F.try_variant_get(e, "$", "long") > 0
        )
    )
    rows = river.evaluate(df).select("verdict", "errors").collect()
    assert rows[0].verdict == "validation_failed"
    assert rows[0].errors == ["xs: elements [1, 3] failed validation"]
    assert rows[1].verdict == "pass"
    assert rows[2].verdict == "validation_failed"
    assert rows[2].errors == ["Required xs to be an array"]
