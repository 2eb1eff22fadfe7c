"""Strict-mode unevaluated tracking on the TYPED-COLUMN compiler path
(VERDICT r3 item 4): the same annotation model `pyvalidator` gained in
round 3, re-expressed as pure Column expressions (no UDF) behind the
same opt-in — spec-level ``{"strict_unevaluated": true}``.

Differential: every (schema, instance) pair must agree with the
pyvalidator strict twin, which is itself differentially fuzzed against
the stock `jsonschema` Draft201909Validator. Parity default (flag off)
must stay byte-identical to the reference semantics: partial
unevaluatedProperties (src/validators.lisp:606-629), unevaluatedItems
skipped (t/draft2019-09.lisp:83-87)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_schema_spark.compiler import _schema_pred
from json_schema_spark.pyvalidator import Validator
from json_schema_spark.spec import ConstraintSpec

# schemas over map<string,long> object columns
MAP_SCHEMAS = [
    {"properties": {"a": {}}, "unevaluatedProperties": False},
    {"properties": {"a": {}}, "patternProperties": {"^b": {}},
     "unevaluatedProperties": False},
    {"allOf": [{"properties": {"a": {}}}, {"properties": {"b": {}}}],
     "unevaluatedProperties": False},
    {"anyOf": [{"properties": {"a": {}}, "required": ["a"]},
               {"properties": {"b": {}}, "required": ["b"]}],
     "unevaluatedProperties": False},
    {"oneOf": [{"properties": {"a": {}}, "required": ["a"]},
               {"properties": {"b": {}}, "required": ["b"]}],
     "unevaluatedProperties": False},
    {"if": {"required": ["a"]}, "then": {"properties": {"a": {}, "b": {}}},
     "else": {"properties": {"c": {}}}, "unevaluatedProperties": False},
    {"dependentSchemas": {"a": {"properties": {"b": {}}}},
     "properties": {"a": {}}, "unevaluatedProperties": False},
    {"$defs": {"base": {"properties": {"a": {}}}},
     "$ref": "#/$defs/base", "unevaluatedProperties": False},
    {"allOf": [{"additionalProperties": True}],
     "unevaluatedProperties": False},
    {"properties": {"a": {}}, "unevaluatedProperties": {"maximum": 10}},
    {"unevaluatedProperties": False},
]

MAP_INSTANCES = [
    {}, {"a": 1}, {"b": 2}, {"a": 1, "b": 2}, {"a": 1, "c": 3},
    {"a": 1, "b": 2, "c": 3}, {"x": 9}, {"a": 1, "b": 99},
]

# schemas over array<long> columns
ARR_SCHEMAS = [
    {"items": [{"type": "integer"}], "unevaluatedItems": False},
    {"items": [{"type": "integer"}], "additionalItems": {"maximum": 5},
     "unevaluatedItems": False},
    {"items": {"type": "integer"}, "unevaluatedItems": False},
    {"allOf": [{"items": [{}, {}]}], "unevaluatedItems": False},
    {"anyOf": [{"items": [{"maximum": 1}, {"maximum": 1}], "minItems": 2},
               {"items": [{"minimum": 5}]}],
     "unevaluatedItems": False},
    {"if": {"minItems": 2}, "then": {"items": [{}, {}]},
     "else": {"items": [{}]}, "unevaluatedItems": False},
    {"$defs": {"two": {"items": [{}, {}]}}, "$ref": "#/$defs/two",
     "unevaluatedItems": False},
    {"items": [{}], "unevaluatedItems": {"maximum": 3}},
    {"unevaluatedItems": False},
    {"unevaluatedItems": {"minimum": 0}},
]

ARR_INSTANCES = [
    [], [1], [1, 2], [0, 1], [1, 2, 3], [5], [1, 2, 99], [7, 7, 7, 7],
]


def _compiled_verdicts(spark, schemas, instances, dt, strict):
    """One Spark job: every (schema, instance) verdict off the typed
    column compiler, columns = schemas, rows = instances."""
    row_schema = T.StructType([
        T.StructField("i", T.LongType()), T.StructField("v", dt)])
    preds = []
    for s in schemas:
        spec = ConstraintSpec(dict(
            s, draft="draft2019-09",
            **({"strict_unevaluated": True} if strict else {})))
        preds.append(_schema_pred(s, dt, "draft2019-09", spec)(F.col("v")))
    df = spark.createDataFrame(list(enumerate(instances)), row_schema)
    out = df.select("i", *[preds[j].alias(f"c{j}") for j in range(len(preds))]) \
        .orderBy("i").collect()
    return [[r[f"c{j}"] for j in range(len(preds))] for r in out]


@pytest.mark.parametrize("strict", [False, True])
def test_compiler_matches_pyvalidator_twin(spark, strict):
    cases = [
        (MAP_SCHEMAS, MAP_INSTANCES,
         T.MapType(T.StringType(), T.LongType())),
        (ARR_SCHEMAS, ARR_INSTANCES, T.ArrayType(T.LongType())),
    ]
    failures = []
    for schemas, instances, dt in cases:
        got = _compiled_verdicts(spark, schemas, instances, dt, strict)
        for j, schema in enumerate(schemas):
            v = Validator(schema, draft="draft2019-09",
                          strict_unevaluated=strict)
            for i, data in enumerate(instances):
                want = v.is_valid(data)
                if got[i][j] != want:
                    failures.append(
                        f"strict={strict} {schema} :: {data!r} "
                        f"want {want} got {got[i][j]}")
    assert not failures, "\n".join(failures)


def test_strict_flag_off_keeps_unevaluated_items_noop(spark):
    """Parity default: unevaluatedItems compiles to nothing."""
    dt = T.ArrayType(T.LongType())
    schema = {"items": [{"type": "integer"}], "unevaluatedItems": False}
    spec = ConstraintSpec(dict(schema, draft="draft2019-09"))
    pred = _schema_pred(schema, dt, "draft2019-09", spec)(F.col("v"))
    df = spark.createDataFrame([([1, 2, 3],)], T.StructType(
        [T.StructField("v", dt)]))
    assert df.select(pred.alias("ok")).collect()[0]["ok"] is True
