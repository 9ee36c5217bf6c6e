"""The standard message envelope as composable Column expressions.

Reference semantics (SURVEY.md §1.4, JsonMessage.kt):

- ``@id``           UUID per message, preserved if present (:36,127-131)
- ``@opprettet``    creation local date-time, set if absent (:37,132-133)
- ``@event_name``   discriminator, ``"ukjent"`` if absent (:38,111)
- ``system_read_count``  bumped on every re-parse: ``coalesce(c,-1)+1`` (:40,134)
- ``system_participating_services``  append-only provenance array (:43-45,82-95,135)
- ``@forårsaket_av``  causation envelope of the triggering message, stamped
  on every reply, which also gets a fresh ``@id``/``@opprettet`` (:69-95)

Open-schema mutation model: a message is parsed to ``map<string,variant>``
(lossless, key-order-preserving); updates are merged with ``map_concat``
under LAST_WIN so undeclared fields pass through untouched on republish
(JsonMessage.kt:779 serializes the full mutated tree). The engine computes
``original JSON ⊕ updates`` — nothing is mutated in place.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

ID_KEY = "@id"
OPPRETTET_KEY = "@opprettet"
EVENT_NAME_KEY = "@event_name"
NEED_KEY = "@behov"
NEED_ID_KEY = "@behovId"
SOLUTION_KEY = "@løsning"
READ_COUNT_KEY = "system_read_count"
PARTICIPATING_SERVICES_KEY = "system_participating_services"
CAUSED_BY_KEY = "@forårsaket_av"
UNKNOWN_EVENT_NAME = "ukjent"

#: JSON object string -> lossless top-level map (values keep exact JSON types)
MESSAGE_MAP_TYPE = "map<string,variant>"


def to_message_map(value: Column | str) -> Column:
    """Parse a JSON object string into ``map<string,variant>``."""
    return F.from_json(value, MESSAGE_MAP_TYPE)


def to_json_message(msg_map: Column) -> Column:
    """Serialize the (merged) message map back to a JSON object string."""
    return F.to_json(msg_map)


def merge(msg_map: Column, updates: dict[str, Column]) -> Column:
    """``original ⊕ updates``: set/replace top-level fields, keep the rest.

    ``updates`` values must be *variant* Columns (use :func:`vlit` /
    ``F.parse_json`` / ``F.to_variant_object``). Overridden keys keep their
    original position; new keys append — deterministic output ordering.
    """
    if not updates:
        return msg_map
    keys = F.array(*[F.lit(k) for k in updates])
    vals = F.array(*list(updates.values()))
    return F.map_concat(msg_map, F.map_from_arrays(keys, vals))


def vlit(value) -> Column:
    """Python literal -> variant Column (strict JSON typing preserved)."""
    import json

    return F.parse_json(F.lit(json.dumps(value)))


def variant_of(col: Column) -> Column:
    """Typed scalar/struct Column -> variant of just that value."""
    return F.try_variant_get(F.to_variant_object(F.struct(col.alias("x"))), "$.x", "variant")


def message_id(msg_map: Column, id_generator: Column | None = None) -> Column:
    """``@id``: preserved when present, else generated (JsonMessage.kt:127-131).

    ``id_generator`` defaults to ``uuid()``; inject a deterministic Column
    for tests/oracles (RandomIdGenerator is pluggable in the reference —
    rapids-and-rivers-api/River.kt:5-10).
    """
    gen = id_generator if id_generator is not None else F.expr("uuid()")
    return F.coalesce(
        F.try_variant_get(msg_map[ID_KEY], "$", "string"), gen
    )


def opprettet(msg_map: Column, now: Column | None = None) -> Column:
    """``@opprettet``: preserved when present, else creation time (:132-133)."""
    created = now if now is not None else F.date_format(
        F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    )
    return F.coalesce(F.try_variant_get(msg_map[OPPRETTET_KEY], "$", "string"), created)


def event_name(msg_map: Column) -> Column:
    """``@event_name`` with the reference's 'ukjent' default (:38,111)."""
    return F.coalesce(
        F.try_variant_get(msg_map[EVENT_NAME_KEY], "$", "string"),
        F.lit(UNKNOWN_EVENT_NAME),
    )


def bumped_read_count(msg_map: Column) -> Column:
    """``system_read_count``: ``coalesce(prior,-1)+1`` (JsonMessage.kt:134)."""
    return (
        F.coalesce(
            F.try_variant_get(msg_map[READ_COUNT_KEY], "$", "long"), F.lit(-1)
        )
        + 1
    )


def participating_services_entry(
    service_id: Column,
    time: Column,
    service: str | None = None,
    instance: str | None = None,
    image: str | None = None,
) -> Column:
    """One provenance entry ``{id, time, service?, instance?, image?}``.

    Service identity comes from app config (the reference reads
    NAIS_APP_NAME / NAIS_APP_IMAGE / HOSTNAME — JsonMessage.kt:43-45,82-95).
    """
    fields = [service_id.alias("id"), time.alias("time")]
    if service:
        fields.append(F.lit(service).alias("service"))
    if instance:
        fields.append(F.lit(instance).alias("instance"))
    if image:
        fields.append(F.lit(image).alias("image"))
    return F.struct(*fields)


def appended_participating_services(msg_map: Column, entry: Column) -> Column:
    """Append a provenance entry to the (possibly absent) array (:135)."""
    prior = F.try_variant_get(
        msg_map[PARTICIPATING_SERVICES_KEY], "$", "array<variant>"
    )
    appended = F.array_append(
        F.coalesce(prior, F.array().cast("array<variant>")),
        variant_of(entry),
    )
    return variant_of(appended)


def caused_by(original_map: Column) -> Column:
    """``@forårsaket_av`` causation struct from the triggering message
    (JsonMessage.kt:69-80): ``{id, opprettet, event_name, behov?}``."""
    return variant_of(
        F.struct(
            F.try_variant_get(original_map[ID_KEY], "$", "string").alias("id"),
            F.try_variant_get(original_map[OPPRETTET_KEY], "$", "string").alias(
                "opprettet"
            ),
            event_name(original_map).alias("event_name"),
        )
    )


def stamp_envelope(
    msg_map: Column,
    service_name: str | None = None,
    instance_id: str | None = None,
    image: str | None = None,
    id_generator: Column | None = None,
    now: Column | None = None,
) -> Column:
    """The on-parse envelope stamp (JsonMessage.kt:127-135): ensure
    ``@id``/``@opprettet``, bump ``system_read_count``, append provenance."""
    now_col = now if now is not None else F.date_format(
        F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    )
    the_id = message_id(msg_map, id_generator)
    updates = {
        ID_KEY: variant_of(the_id),
        OPPRETTET_KEY: variant_of(opprettet(msg_map, now)),
        READ_COUNT_KEY: variant_of(bumped_read_count(msg_map)),
        PARTICIPATING_SERVICES_KEY: appended_participating_services(
            msg_map,
            participating_services_entry(the_id, now_col, service_name, instance_id, image),
        ),
    }
    return merge(msg_map, updates)


def stamp_envelope_df(
    df,
    value_col: str = "value",
    out_col: str = "message_map",
    service_name: str | None = None,
    instance_id: str | None = None,
    image: str | None = None,
    id_generator: Column | None = None,
    now: Column | None = None,
):
    """DF-level envelope stamp that evaluates the generated id/time ONCE.

    ``uuid()``/``current_timestamp()`` are non-deterministic: referencing
    them twice inside a single projection yields two different values (the
    message ``@id`` and its provenance-entry id must agree). Materializing
    them as columns first pins a single evaluation — Catalyst does not
    collapse projections across non-deterministic expressions.
    """
    gen = id_generator if id_generator is not None else F.expr("uuid()")
    now_col = now if now is not None else F.date_format(
        F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    )
    out = (
        df.withColumn("__msg_map", to_message_map(F.col(value_col)))
        .withColumn("__gen_id", gen)
        .withColumn("__now", now_col)
    )
    stamped = stamp_envelope(
        F.col("__msg_map"),
        service_name=service_name,
        instance_id=instance_id,
        image=image,
        id_generator=F.col("__gen_id"),
        now=F.col("__now"),
    )
    return out.withColumn(out_col, stamped).drop("__msg_map", "__gen_id", "__now")


def stamp_reply(
    reply_map: Column,
    original_map: Column,
    id_generator: Column | None = None,
    now: Column | None = None,
    reply_owns_id: bool = False,
) -> Column:
    """The publish-path stamp (populateStandardFields, JsonMessage.kt:69-95):
    ``@forårsaket_av`` + fresh ``@id``/``@opprettet`` on the reply.

    A reply is usually the mutated *original*, so its map still carries the
    triggering message's id — the reference replaces it with a fresh one.
    Pass ``reply_owns_id=True`` only when the reply was constructed from
    scratch with its own identity (then its values win).
    """
    gen = id_generator if id_generator is not None else F.expr("uuid()")
    created = now if now is not None else F.date_format(
        F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    )
    if reply_owns_id:
        new_id = F.coalesce(reply_map[ID_KEY], variant_of(gen))
        new_created = F.coalesce(reply_map[OPPRETTET_KEY], variant_of(created))
    else:
        new_id = variant_of(gen)
        new_created = variant_of(created)
    updates = {
        ID_KEY: new_id,
        OPPRETTET_KEY: new_created,
        CAUSED_BY_KEY: caused_by(original_map),
    }
    return merge(reply_map, updates)
