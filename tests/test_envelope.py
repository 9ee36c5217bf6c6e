"""Envelope semantics (SURVEY.md §1.4): id preservation, read-count bump,
provenance append, causation stamping — mirroring JsonMessageTest.kt:67-73,
218-229, 90-102 and the ping→pong golden fields of
RapidApplicationComponentTest.kt:196-213.
"""

import json

from pyspark.sql import functions as F

from rapids_and_rivers_spark.functions import envelope as E


def stamp(spark, messages, **kw):
    df = spark.createDataFrame([(m,) for m in messages], "value string")
    out = E.stamp_envelope_df(df, **kw)
    return [
        json.loads(r.out)
        for r in out.select(E.to_json_message(F.col("message_map")).alias("out")).collect()
    ]


def test_id_preserved_when_present(spark):
    d = stamp(spark, ['{"@id":"abc","x":1}'])[0]
    assert d["@id"] == "abc"
    assert d["system_participating_services"][0]["id"] == "abc"


def test_id_generated_and_consistent_with_provenance(spark):
    d = stamp(spark, ['{"x":1}'])[0]
    assert d["@id"]
    # the generated @id and the provenance entry id MUST agree
    assert d["system_participating_services"][0]["id"] == d["@id"]


def test_read_count_bump(spark):
    first = stamp(spark, ['{"x":1}'])[0]
    assert first["system_read_count"] == 0
    second = stamp(spark, [json.dumps(first)])[0]
    assert second["system_read_count"] == 1
    assert len(second["system_participating_services"]) == 2


def test_opprettet_preserved(spark):
    d = stamp(spark, ['{"@opprettet":"2024-01-01T00:00:00"}'])[0]
    assert d["@opprettet"] == "2024-01-01T00:00:00"


def test_service_identity_in_provenance(spark):
    d = stamp(spark, ["{}"], service_name="app", instance_id="host-1")[0]
    entry = d["system_participating_services"][0]
    assert entry["service"] == "app" and entry["instance"] == "host-1"


def test_unknown_fields_preserved_on_republish(spark):
    d = stamp(spark, ['{"custom":{"deep":[1,"two",null]},"n":3,"s":"3"}'])[0]
    assert d["custom"] == {"deep": [1, "two", None]}
    # strict JSON typing survives the map<string,variant> roundtrip
    assert d["n"] == 3 and d["s"] == "3"


def test_reply_gets_fresh_id_and_causation(spark):
    df = spark.createDataFrame([('{"@event_name":"ping","x":1}',)], "value string")
    stamped = E.stamp_envelope_df(
        df, id_generator=F.lit("orig-id"), now=F.lit("2024-01-01T00:00:00")
    )
    reply_map = E.merge(F.col("message_map"), {"@event_name": E.vlit("pong")})
    out = stamped.select(
        E.to_json_message(
            E.stamp_reply(
                reply_map,
                F.col("message_map"),
                id_generator=F.lit("reply-id"),
                now=F.lit("2024-01-02T00:00:00"),
            )
        ).alias("out")
    )
    d = json.loads(out.collect()[0].out)
    assert d["@event_name"] == "pong"
    assert d["@id"] == "reply-id"           # fresh id, not the original's
    assert d["@opprettet"] == "2024-01-02T00:00:00"
    cb = d["@forårsaket_av"]
    assert cb == {
        "id": "orig-id",
        "opprettet": "2024-01-01T00:00:00",
        "event_name": "ping",
    }
    # original payload fields ride along on the mutated reply
    assert d["x"] == 1
