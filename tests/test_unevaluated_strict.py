"""Strict-mode 2019-09 `unevaluatedProperties`/`unevaluatedItems`
(round-3 DOCUMENTED ENGINE EXTENSION, opt-in via
``Validator(strict_unevaluated=True)``): full in-place-applicator
annotation tracking, differentially checked against the independent
`jsonschema` Draft201909Validator, which implements the spec'd
annotation semantics. The DEFAULT stays reference parity — the
reference diffs unevaluatedProperties against direct `properties` only
(src/validators.lisp:606-629) and skips unevaluatedItems
(t/draft2019-09.lisp:83-87)."""

from __future__ import annotations

import pytest
from jsonschema import Draft201909Validator

from json_schema_spark.pyvalidator import Validator

SCHEMAS = [
    # unevaluatedProperties through each applicator family
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
    {"properties": {"a": {}}, "unevaluatedProperties": {"type": "integer"}},
    # unevaluatedItems through items / additionalItems / applicators
    {"items": [{"type": "integer"}], "unevaluatedItems": False},
    {"items": [{"type": "integer"}], "additionalItems": {"type": "string"},
     "unevaluatedItems": False},
    {"items": {"type": "integer"}, "unevaluatedItems": False},
    {"allOf": [{"items": [{}, {}]}], "unevaluatedItems": False},
    {"anyOf": [{"items": [{"type": "integer"}, {"type": "integer"}],
                "minItems": 2}, {"items": [{"type": "string"}]}],
     "unevaluatedItems": False},
    {"if": {"minItems": 2}, "then": {"items": [{}, {}]},
     "else": {"items": [{}]}, "unevaluatedItems": False},
    {"$defs": {"two": {"items": [{}, {}]}}, "$ref": "#/$defs/two",
     "unevaluatedItems": False},
    {"items": [{}], "unevaluatedItems": {"type": "integer"}},
    {"unevaluatedItems": False},
    {"unevaluatedItems": {"type": "string"}},
]

INSTANCES = [
    {}, {"a": 1}, {"b": 2}, {"a": 1, "b": 2}, {"a": 1, "c": 3},
    {"a": 1, "b": 2, "c": 3}, {"x": 9},
    [], [1], [1, 2], [1, "s"], [1, 2, 3], ["s"], [1, 2, "s"],
    "scalar", 5, None,
]


def test_strict_mode_matches_jsonschema_annotations():
    failures = []
    for schema in SCHEMAS:
        ref = Draft201909Validator(schema)
        v = Validator(schema, draft="draft2019-09", strict_unevaluated=True)
        for data in INSTANCES:
            want = ref.is_valid(data)
            got = v.is_valid(data)
            if got != want:
                failures.append(f"{schema} :: {data!r} want {want} got {got}")
    assert not failures, "\n".join(failures)


def test_parity_default_unchanged():
    """Without the flag: unevaluatedItems is a no-op and
    unevaluatedProperties diffs only direct properties — the
    reference's documented behavior."""
    v = Validator({"items": [{"type": "integer"}],
                   "unevaluatedItems": False}, draft="draft2019-09")
    assert v.is_valid([1, "extra", "more"])  # keyword skipped

    v2 = Validator({"allOf": [{"properties": {"b": {}}}],
                    "properties": {"a": {}},
                    "unevaluatedProperties": False}, draft="draft2019-09")
    # 'b' is evaluated only through allOf; the partial reference
    # semantics do not see it -> invalid under parity...
    assert not v2.is_valid({"a": 1, "b": 2})
    # ...but valid under strict tracking
    v3 = Validator({"allOf": [{"properties": {"b": {}}}],
                    "properties": {"a": {}},
                    "unevaluatedProperties": False},
                   draft="draft2019-09", strict_unevaluated=True)
    assert v3.is_valid({"a": 1, "b": 2})


def test_strict_flag_leaves_other_drafts_alone():
    """unevaluated* are 2019-09 keywords; draft7 skips them as unknown
    keywords whatever the flag says."""
    for strict in (False, True):
        v = Validator({"items": [{}], "unevaluatedItems": False},
                      draft="draft7", strict_unevaluated=strict)
        assert v.is_valid([1, 2, 3])
