"""Randomized differential testing: the Spark predicate compiler vs a
pure-Python reference evaluator over a seeded adversarial JSON corpus.

The reference pins correctness with exhaustive example tables
(JsonMessageTest.kt); this goes further: hundreds of generated documents
mixing missing / null / wrong-type / nested / unicode values, each rule's
verdict compared bit-for-bit against an independent Python implementation
of the JsonMessage semantics. One Spark round-trip evaluates the whole
corpus (the corpus is a DataFrame, not a loop).
"""

import json
import random

import pytest

from pyspark.sql import functions as F

from rapids_and_rivers_spark.functions import predicates as P
from rapids_and_rivers_spark.river import River


def _gen_docs(seed: int, n: int = 300) -> list[str]:
    rng = random.Random(seed)
    scalars = [
        lambda: rng.randint(-5, 5),
        lambda: rng.choice([3, "3", 3.0, "3.0"]),  # the strict-typing trap
        lambda: round(rng.uniform(-2, 2), 3),
        lambda: rng.choice([True, False]),
        lambda: rng.choice(["a", "b", "ø-unicode", "", "null"]),
        lambda: None,
    ]

    def value(depth=0):
        r = rng.random()
        if depth < 2 and r < 0.15:
            return {k: value(depth + 1) for k in rng.sample("pqr", rng.randint(1, 2))}
        if depth < 2 and r < 0.3:
            return [value(depth + 1) for _ in range(rng.randint(0, 3))]
        return rng.choice(scalars)()

    docs = []
    for _ in range(n):
        doc = {}
        for key in ("a", "b", "tags", "nested"):
            r = rng.random()
            if r < 0.25:
                continue  # missing
            if key == "tags" and r < 0.7:
                doc[key] = [rng.choice(["x", "y", "z"]) for _ in range(rng.randint(0, 4))]
            elif key == "nested" and r < 0.7:
                doc[key] = {"inner": value()}
            else:
                doc[key] = value()
        docs.append(json.dumps(doc, ensure_ascii=False))
    return docs


# --- pure-Python reference semantics (JsonMessage.kt) -------------------------

_MISSING = object()


def _node(doc: dict, path: str):
    cur = doc
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return _MISSING
        cur = cur[part]
    return cur


def _is_str(v):
    return isinstance(v, str)


def _is_num(v):
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def py_require_key(doc, k):
    v = _node(doc, k)
    return v is not _MISSING and v is not None


def py_require_value_str(doc, k, val):
    v = _node(doc, k)
    return _is_str(v) and v == val


def py_require_value_num(doc, k, val):
    v = _node(doc, k)
    return _is_num(v) and float(v) == float(val)


def py_require_value_bool(doc, k, val):
    v = _node(doc, k)
    return isinstance(v, bool) and v == val


def py_require_any(doc, k, vals):
    v = _node(doc, k)
    return _is_str(v) and v in vals


def py_require_all(doc, k, vals):
    v = _node(doc, k)
    return isinstance(v, list) and all(x in v for x in vals)


def py_require_contains(doc, k, val):
    v = _node(doc, k)
    return isinstance(v, list) and val in v


def py_require_all_or_any(doc, k, vals):
    v = _node(doc, k)
    return isinstance(v, list) and any(x in v for x in vals)


def py_forbid(doc, k):
    v = _node(doc, k)
    return v is _MISSING or v is None


def py_forbid_values(doc, k, vals):
    return not py_require_any(doc, k, vals)


def py_require_array(doc, k):
    return isinstance(_node(doc, k), list)


def py_require_number(doc, k):
    return _is_num(_node(doc, k))


CASES = [
    ("require_key(a)", P.require_key("a"), lambda d: py_require_key(d, "a")),
    (
        "require_key(nested.inner)",
        P.require_key("nested.inner"),
        lambda d: py_require_key(d, "nested.inner"),
    ),
    (
        "require_value(a,'3')",
        P.require_value("a", "3"),
        lambda d: py_require_value_str(d, "a", "3"),
    ),
    (
        "require_value(a,3)",
        P.require_value("a", 3),
        lambda d: py_require_value_num(d, "a", 3),
    ),
    (
        "require_value(b,True)",
        P.require_value("b", True),
        lambda d: py_require_value_bool(d, "b", True),
    ),
    (
        "require_any(b,['a','b'])",
        P.require_any("b", ["a", "b"]),
        lambda d: py_require_any(d, "b", ["a", "b"]),
    ),
    (
        "require_all(tags,['x','y'])",
        P.require_all("tags", ["x", "y"]),
        lambda d: py_require_all(d, "tags", ["x", "y"]),
    ),
    (
        "require_contains(tags,'z')",
        P.require_contains("tags", "z"),
        lambda d: py_require_contains(d, "tags", "z"),
    ),
    (
        "require_all_or_any(tags,['y','z'])",
        P.require_all_or_any("tags", ["y", "z"]),
        lambda d: py_require_all_or_any(d, "tags", ["y", "z"]),
    ),
    ("forbid(a)", P.forbid("a"), lambda d: py_forbid(d, "a")),
    (
        "forbid_values(b,['a'])",
        P.forbid_values("b", ["a"]),
        lambda d: py_forbid_values(d, "b", ["a"]),
    ),
    ("require_array(tags)", P.require_array("tags"), lambda d: py_require_array(d, "tags")),
    (
        "require_parseable(a,number)",
        P.require_parseable("a", "number"),
        lambda d: py_require_number(d, "a"),
    ),
]


@pytest.mark.parametrize("seed", [11, 42, 1337])
def test_predicates_match_python_reference(spark, seed):
    docs = _gen_docs(seed)
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i int, value string")

    rivers = [River(name).validate(rules) for name, rules, _ in CASES]
    out = df
    for case_i, river in enumerate(rivers):
        ev = river.evaluate(out if case_i == 0 else out)
        out = ev.withColumn(f"ok_{case_i}", F.col("verdict") == "pass").drop(
            "verdict", "errors"
        )
    rows = {r.i: r for r in out.collect()}

    mismatches = []
    for i, doc_str in enumerate(docs):
        doc = json.loads(doc_str)
        for case_i, (name, _, pyfn) in enumerate(CASES):
            expected = bool(pyfn(doc))
            got = bool(rows[i][f"ok_{case_i}"])
            if expected != got:
                mismatches.append((name, doc_str, expected, got))
    assert not mismatches, mismatches[:5]
