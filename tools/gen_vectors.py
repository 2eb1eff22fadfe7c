"""Generate a large keyword-conformance corpus in the official
JSON-Schema-Test-Suite file format, labeled by the `jsonschema` PyPI
library's per-draft validators (Draft4/6/7/201909Validator).

The reference pins the official suite as a git submodule
(/root/reference/JSON-Schema-Test-Suite, t/json-schema-test-case-helper
.lisp:57-96) which is not vendored in this environment, so this script
reconstructs equivalent coverage: a curated schema pool x a shared
instance pool, cross-producted per draft, with `valid` labels computed
by an independent, widely-used validator implementation.  Output files
are checked in under tests/vectors/gen_<draft>.json and consumed by the
same three conformance runners as the hand-written vectors.

Reference-parity divergences (mirroring the reference's own skip list,
t/draft4.lisp:34-35,43-44,57-58 and t/draft7.lisp:54-55,69-70) are
handled by EXTENDING the jsonschema validators (see _parity below), so
the parity semantics apply at any nesting depth:

* draft4 `type: integer` on a zero-fraction float: the reference's
  integer-p (src/types.lisp:41-42) treats 1.0 as an integer in EVERY
  draft ("1.0d0 is an integer"), while strict draft4 (and jsonschema)
  reject it.  We keep reference parity.
* `$ref` siblings: the reference does not suppress sibling keywords in
  draft<=7 (it skips the suite's "ref overrides any sibling keywords"
  case); schemas with $ref+siblings are simply not generated here.
* `format` groups (round 3) are labeled by an independent
  reimplementation of the reference's per-draft format tables (see
  _F_TABLES below) — NOT jsonschema's RFC-strict checker;
  `$ref`-with-siblings groups (round 3) are labeled through an
  allOf-conjunction rewrite (_conjoin_ref_siblings) reproducing the
  reference's siblings-conjoined semantics in draft<=7;
  `unevaluatedProperties` stays with the hand-written vectors
  (reference-parity partial semantics).

Run: python tools/gen_vectors.py   (rewrites tests/vectors/gen_*.json)
"""

from __future__ import annotations

import json
import math
from pathlib import Path

from decimal import Decimal, InvalidOperation, localcontext

import jsonschema
from jsonschema import (
    Draft4Validator,
    Draft6Validator,
    Draft7Validator,
    Draft201909Validator,
)
from jsonschema import validators as jsv

OUT_DIR = Path(__file__).resolve().parent.parent / "tests" / "vectors"


def _integer_parity(checker, instance):
    """Reference integer-p (src/types.lisp:41-42): anything without a
    fractional part is an integer — in EVERY draft, including draft4
    where the strict spec (and stock jsonschema) reject 1.0."""
    if isinstance(instance, bool):
        return False
    if isinstance(instance, int):
        return True
    return (isinstance(instance, float) and math.isfinite(instance)
            and instance == int(instance))


def _multiple_of_exact(validator, db, instance, schema):
    """Exact-arithmetic multipleOf: the reference parses JSON numbers to
    CL rationals so 4.5 % 1.5 == 0 exactly; stock jsonschema uses float
    modulo, which mislabels huge values.  Decimal(str(x)) reproduces the
    rational behavior for every decimal literal."""
    if not isinstance(instance, (int, float)) or isinstance(instance, bool):
        return
    try:
        with localcontext() as ctx:
            ctx.prec = 400  # huge exponents: default prec raises DivisionImpossible
            rem = Decimal(str(instance)) % Decimal(str(db))
    except InvalidOperation:
        return
    if rem != 0:
        yield jsonschema.exceptions.ValidationError(
            f"{instance!r} is not a multiple of {db!r}")


def _parity(base, *, d4_integer=False):
    tc = base.TYPE_CHECKER
    if d4_integer:
        tc = tc.redefine("integer", _integer_parity)
    return jsv.extend(base, {"multipleOf": _multiple_of_exact},
                      type_checker=tc)


VALIDATORS = {
    "draft4": _parity(Draft4Validator, d4_integer=True),
    "draft6": _parity(Draft6Validator),
    "draft7": _parity(Draft7Validator),
    "draft2019-09": _parity(Draft201909Validator),
}

ALL = ("draft4", "draft6", "draft7", "draft2019-09")
D6UP = ("draft6", "draft7", "draft2019-09")
D7UP = ("draft7", "draft2019-09")
D2019 = ("draft2019-09",)
D4 = ("draft4",)

# ---------------------------------------------------------------------------
# shared instance pool: every JSON shape the keyword set can react to
# ---------------------------------------------------------------------------

INSTANCES = [
    # strings (incl. the official suite's unicode-length classics:
    # astral-plane chars and combining marks count as CODE POINTS)
    "", "a", "foo", "foo bar", "fooooooooooo", "Foo", "123", "1.0",
    "café", "ßß", "a@b", "  ", "null", "true",
    "\U0001F4A9", "a\U0001F4A9b", "e\u0301", "\u00e9",
    # numbers
    0, 1, -1, 2, 3, 5, 10, 100, -7, 12345678910111213141516171819,
    0.0, 1.0, 1.5, -1.5, 2.5, 3.0, 4.5, 0.1, 1e2, 98249283749234923498293171823948729348710298301928331.0,
    # booleans / null
    True, False, None,
    # arrays
    [], [1], [1, 2], [1, 2, 3, 4, 5], [1, 1], [1.0, 1], ["a", "b"],
    ["a", "a"], [1, "a", True], [[1], [2]], [[1], [1]], [{"a": 1}],
    [{"a": 1}, {"a": 1}], [None], [True, False], ["1", 1],
    # objects
    {}, {"a": 1}, {"a": 1, "b": 2}, {"a": "x"}, {"b": 2},
    {"a": 1, "b": 2, "c": 3}, {"foo": "bar"}, {"foo": 1, "bar": 2},
    {"a": {"b": 1}}, {"a": []}, {"a": None}, {"": 1},
    {"a": 1, "A": 2}, {"abc": 1, "abd": 2}, {"quux": 9},
    # schema-shaped documents (drive the metaschema-fragment group;
    # plain nested objects to every other group)
    {"type": "string"}, {"type": ["array", "boolean"]},
    {"type": "strings"}, {"type": ["string", "string"]},
    {"type": 3}, {"minimum": "3"}, {"minimum": 3},
    {"required": ["a", "b"]}, {"required": ["a", "a"]},
    {"properties": {"a": {"type": "integer"}}},
    {"properties": {"a": {"type": "nope"}}},
    {"allOf": [{"type": "object"}, {"minimum": 1}]}, {"allOf": []},
    # key-order adversaries (round 5): deep equality must be key-set +
    # recursive values (json-equal-p, src/utils.lisp:69-96), never the
    # serialized JSON text.  Key order below is the INSERTION order of
    # these literals and survives json.dumps into the vector files and
    # the runners' JSON string columns (no sort_keys on the data path),
    # so uniqueItems/enum/const see genuinely permuted texts.
    {"b": 2, "a": 1},                                   # = {"a":1,"b":2}
    [{"a": 1, "b": 2}, {"b": 2, "a": 1}],               # dup via key order
    [{"a": 1, "b": 2}, {"a": 2, "b": 1}],               # values swapped: unique
    [{"x": {"a": 1, "b": 2}}, {"x": {"b": 2, "a": 1}}],  # nested permutation
    [[{"a": 1, "b": 2}], [{"b": 2, "a": 1}]],           # inside arrays
    [{"a": [1, {"p": 1, "q": 2}]}, {"a": [1, {"q": 2, "p": 1}]}],
]

# ---------------------------------------------------------------------------
# schema pool: (group-description, schema, drafts it applies to)
# ---------------------------------------------------------------------------

SCHEMAS: list[tuple[str, dict | bool, tuple[str, ...]]] = [
    # --- type -------------------------------------------------------------
    ("type string", {"type": "string"}, ALL),
    ("type number", {"type": "number"}, ALL),
    ("type integer", {"type": "integer"}, ALL),
    ("type object", {"type": "object"}, ALL),
    ("type array", {"type": "array"}, ALL),
    ("type boolean", {"type": "boolean"}, ALL),
    ("type null", {"type": "null"}, ALL),
    ("type union", {"type": ["string", "integer"]}, ALL),
    ("type union all", {"type": ["object", "array", "null"]}, ALL),
    # --- enum / const -----------------------------------------------------
    ("enum scalars", {"enum": [1, "foo", True, None]}, ALL),
    ("enum composites", {"enum": [[1, 2], {"a": 1}, "a"]}, ALL),
    ("enum 1.0 vs 1", {"enum": [1.0]}, ALL),
    ("enum empty string", {"enum": [""]}, ALL),
    ("const int", {"const": 2}, D6UP),
    ("const object", {"const": {"a": 1, "b": 2}}, D6UP),
    ("const array", {"const": [1, 2]}, D6UP),
    ("const null", {"const": None}, D6UP),
    ("const false", {"const": False}, D6UP),
    # --- string keywords --------------------------------------------------
    ("minLength 2", {"minLength": 2}, ALL),
    ("maxLength 2", {"maxLength": 2}, ALL),
    ("minLength unicode", {"minLength": 3}, ALL),
    ("pattern anchored", {"pattern": "^fo"}, ALL),
    ("pattern unanchored", {"pattern": "o b"}, ALL),
    ("pattern digits", {"pattern": "^[0-9]+$"}, ALL),
    # --- numeric keywords -------------------------------------------------
    ("minimum 1", {"minimum": 1}, ALL),
    ("minimum -1.5", {"minimum": -1.5}, ALL),
    ("maximum 3", {"maximum": 3}, ALL),
    ("maximum 2.5", {"maximum": 2.5}, ALL),
    ("exclusiveMinimum numeric", {"exclusiveMinimum": 1}, D6UP),
    ("exclusiveMaximum numeric", {"exclusiveMaximum": 3.0}, D6UP),
    ("draft4 exclusiveMinimum bool", {"minimum": 1, "exclusiveMinimum": True}, D4),
    ("draft4 exclusiveMaximum bool", {"maximum": 3, "exclusiveMaximum": True}, D4),
    ("draft4 inclusive bool false", {"minimum": 1, "exclusiveMinimum": False}, D4),
    ("multipleOf int", {"multipleOf": 2}, ALL),
    ("multipleOf 0.5", {"multipleOf": 0.5}, ALL),
    ("multipleOf 1.5", {"multipleOf": 1.5}, ALL),
    ("minimum on bignum", {"minimum": 1e28}, ALL),
    # --- object keywords --------------------------------------------------
    ("required a", {"required": ["a"]}, ALL),
    ("required a and b", {"required": ["a", "b"]}, ALL),
    ("required empty ok", {"required": ["zzz"]}, ALL),
    ("properties typed", {"properties": {"a": {"type": "integer"},
                                         "b": {"type": "string"}}}, ALL),
    ("properties nested", {"properties": {"a": {"properties": {
        "b": {"minimum": 2}}}}}, ALL),
    ("patternProperties", {"patternProperties": {"^ab": {"type": "integer"}}}, ALL),
    ("additionalProperties false",
     {"properties": {"a": {}}, "additionalProperties": False}, ALL),
    ("additionalProperties schema",
     {"properties": {"a": {}}, "additionalProperties": {"type": "integer"}}, ALL),
    ("additionalProperties with patternProperties",
     {"properties": {"a": {}}, "patternProperties": {"^b": {}},
      "additionalProperties": False}, ALL),
    ("propertyNames maxLength", {"propertyNames": {"maxLength": 2}}, D6UP),
    ("propertyNames pattern", {"propertyNames": {"pattern": "^a"}}, D6UP),
    ("minProperties 1", {"minProperties": 1}, ALL),
    ("maxProperties 2", {"maxProperties": 2}, ALL),
    ("dependencies array", {"dependencies": {"a": ["b"]}}, ALL),
    ("dependencies schema", {"dependencies": {"a": {"required": ["c"]}}},
     ("draft4", "draft6", "draft7")),
    ("dependentRequired", {"dependentRequired": {"a": ["b"]}}, D2019),
    ("dependentSchemas", {"dependentSchemas": {"a": {"required": ["c"]}}}, D2019),
    # --- array keywords ---------------------------------------------------
    ("items uniform", {"items": {"type": "integer"}}, ALL),
    ("items uniform nested", {"items": {"minimum": 2}}, ALL),
    ("items tuple", {"items": [{"type": "integer"}, {"type": "string"}]}, ALL),
    ("items tuple additional false",
     {"items": [{"type": "integer"}], "additionalItems": False}, ALL),
    ("items tuple additional schema",
     {"items": [{}], "additionalItems": {"type": "integer"}}, ALL),
    ("contains minimum", {"contains": {"minimum": 5}}, D6UP),
    ("contains type", {"contains": {"type": "string"}}, D6UP),
    # 2019-09 count semantics (engine extension beyond reference parity;
    # the jsonschema labeler implements them spec-correctly)
    ("minContains 2", {"contains": {"minimum": 5}, "minContains": 2}, D2019),
    ("minContains 0 vacuous", {"contains": {"minimum": 5}, "minContains": 0}, D2019),
    ("maxContains 2", {"contains": {"type": "integer"}, "maxContains": 2}, D2019),
    ("min+maxContains band",
     {"contains": {"minimum": 3}, "minContains": 1, "maxContains": 2}, D2019),
    ("minItems 2", {"minItems": 2}, ALL),
    ("maxItems 2", {"maxItems": 2}, ALL),
    ("uniqueItems", {"uniqueItems": True}, ALL),
    ("uniqueItems false", {"uniqueItems": False}, ALL),
    # --- combinators ------------------------------------------------------
    ("allOf", {"allOf": [{"minimum": 1}, {"maximum": 3}]}, ALL),
    ("allOf types", {"allOf": [{"type": "integer"}, {"minimum": 2}]}, ALL),
    ("anyOf", {"anyOf": [{"type": "string"}, {"minimum": 5}]}, ALL),
    ("anyOf with bool", {"anyOf": [{"type": "null"}, {"enum": [1, 2]}]}, ALL),
    ("oneOf", {"oneOf": [{"type": "integer"}, {"minimum": 2}]}, ALL),
    ("oneOf disjoint", {"oneOf": [{"type": "string"}, {"type": "boolean"}]}, ALL),
    ("not", {"not": {"type": "integer"}}, ALL),
    ("not nested", {"not": {"properties": {"a": {"type": "integer"}}}}, ALL),
    ("double negation", {"not": {"not": {"type": "integer"}}}, ALL),
    ("if then else", {"if": {"type": "integer"}, "then": {"minimum": 2},
                      "else": {"maxLength": 3}}, D7UP),
    ("if then only", {"if": {"minimum": 2}, "then": {"multipleOf": 2}}, D7UP),
    ("if else only", {"if": {"type": "string"}, "else": {"minimum": 1}}, D7UP),
    # --- boolean / empty schemas -----------------------------------------
    ("boolean schema true", True, D6UP),
    ("boolean schema false", False, D6UP),
    ("empty schema", {}, ALL),
    ("properties with boolean subschemas",
     {"properties": {"a": True, "b": False}}, D6UP),
    ("items boolean false", {"items": False}, D6UP),
    # --- $ref (no siblings: reference skips "ref overrides siblings") -----
    ("ref to definitions", {"definitions": {"pos": {"minimum": 0}},
                            "$ref": "#/definitions/pos"},
     ("draft4", "draft6", "draft7")),
    ("ref to defs", {"$defs": {"s": {"type": "string"}},
                     "$ref": "#/$defs/s"}, D2019),
    ("ref nested in properties",
     {"definitions": {"int": {"type": "integer"}},
      "properties": {"a": {"$ref": "#/definitions/int"}}},
     ("draft4", "draft6", "draft7")),
    ("ref chain",
     {"definitions": {"a": {"$ref": "#/definitions/b"},
                      "b": {"minimum": 2}},
      "$ref": "#/definitions/a"}, ("draft4", "draft6", "draft7")),
    ("ref with escaped pointer",
     {"definitions": {"a/b": {"type": "integer"}},
      "$ref": "#/definitions/a~1b"}, ("draft4", "draft6", "draft7")),
    ("anchor ref 2019",
     {"$defs": {"s": {"$anchor": "pos", "minimum": 0}}, "$ref": "#pos"},
     D2019),
    ("plain-name id anchor ref",
     {"definitions": {"s": {"$id": "#neg", "maximum": 0}}, "$ref": "#neg"},
     ("draft6", "draft7")),
    # --- remote-STYLE absolute/relative $id refs (r4: resolved from
    # the in-document registry, no network — the shape a cross-file
    # "remote" ref takes once its target is vendored/harvested) -------
    ("absolute-id ref draft7",
     {"$id": "https://example.test/root.json",
      "definitions": {"item": {"$id": "https://example.test/item.json",
                               "type": "integer"}},
      "$ref": "https://example.test/item.json"},
     ("draft6", "draft7")),
    ("absolute-id ref 2019",
     {"$id": "https://example.test/root.json",
      "$defs": {"item": {"$id": "https://example.test/item.json",
                         "minimum": 2}},
      "$ref": "https://example.test/item.json"}, D2019),
    ("relative-id base remap 2019",
     {"$id": "https://example.test/root.json",
      "$defs": {"item": {"$id": "item.json", "type": "integer"}},
      "$ref": "https://example.test/item.json"}, D2019),
    ("relative ref against base 2019",
     {"$id": "https://example.test/root.json",
      "$defs": {"item": {"$id": "item.json", "maxLength": 3}},
      "$ref": "item.json"}, D2019),
    ("absolute-id chain via pointer 2019",
     {"$id": "https://example.test/a.json",
      "$defs": {"mid": {"$id": "https://example.test/b.json",
                        "$ref": "#/$defs/leaf",
                        "$defs": {"leaf": {"multipleOf": 2}}}},
      "$ref": "https://example.test/b.json"}, D2019),
    # --- metaschema STRUCTURAL group (r4): the schema IS a draft-7
    # metaschema fragment (schemaArray/simpleTypes/recursive sub-schema
    # shape, t/json-schema.lisp's own $schema-driven dispatch target) —
    # instances below include schema-shaped documents, so keyword
    # recursion ($ref cycles, additionalProperties-of-sub, enum tables)
    # is exercised the way validating a SCHEMA document exercises it --
    ("metaschema fragment",
     {"definitions": {
         "schemaArray": {"type": "array", "minItems": 1,
                         "items": {"$ref": "#/definitions/sub"}},
         "simpleTypes": {"enum": ["array", "boolean", "integer", "null",
                                  "number", "object", "string"]},
         "sub": {
             "type": ["object", "boolean"],
             "properties": {
                 "type": {"anyOf": [
                     {"$ref": "#/definitions/simpleTypes"},
                     {"type": "array",
                      "items": {"$ref": "#/definitions/simpleTypes"},
                      "minItems": 1, "uniqueItems": True}]},
                 "minimum": {"type": "number"},
                 "required": {"type": "array", "items": {"type": "string"},
                              "uniqueItems": True},
                 "properties": {
                     "type": "object",
                     "additionalProperties": {"$ref": "#/definitions/sub"}},
                 "allOf": {"$ref": "#/definitions/schemaArray"},
             }}},
      "$ref": "#/definitions/sub"},
     ("draft4", "draft6", "draft7")),
    # --- nested / combined ------------------------------------------------
    ("object with everything",
     {"type": "object", "required": ["a"], "minProperties": 1,
      "properties": {"a": {"type": "integer", "minimum": 0}},
      "additionalProperties": {"type": "integer"}}, ALL),
    ("array of objects",
     {"items": {"required": ["a"], "properties": {"a": {"minimum": 1}}}}, ALL),
    ("deep nesting",
     {"properties": {"a": {"items": {"properties": {
         "b": {"type": "integer"}}}}}}, ALL),
    # --- combined / adversarial shapes -------------------------------------
    ("allOf with nested anyOf",
     {"allOf": [{"anyOf": [{"type": "integer"}, {"type": "string"}]},
                {"not": {"enum": [1, "a"]}}]}, ALL),
    ("oneOf overlapping ranges",
     {"oneOf": [{"minimum": 0, "maximum": 5}, {"minimum": 3, "maximum": 10}]},
     ALL),
    ("not anyOf", {"not": {"anyOf": [{"type": "array"},
                                     {"type": "object"}]}}, ALL),
    ("if nested in properties",
     {"properties": {"a": {"if": {"minimum": 3}, "then": {"multipleOf": 3},
                           "else": {"multipleOf": 2}}}}, D7UP),
    ("contains inside items",
     {"items": {"contains": {"minimum": 2}}}, D6UP),
    ("patternProperties plus additionalProperties typed",
     {"patternProperties": {"^a": {"type": "integer"}},
      "additionalProperties": {"type": "string"}}, ALL),
    ("dependencies multi-key",
     {"dependencies": {"a": ["b", "c"], "b": ["c"]}},
     ("draft4", "draft6", "draft7")),
    ("propertyNames with enum-like pattern",
     {"propertyNames": {"pattern": "^(a|b|abc)$"}}, D6UP),
    ("uniqueItems with numeric cross-type",
     {"uniqueItems": True, "items": {"type": "number"}}, ALL),
    ("uniqueItems over objects (key-order deep equality)",
     {"uniqueItems": True, "items": {"type": "object"}}, ALL),
    ("uniqueItems nested in property",
     {"properties": {"a": {"uniqueItems": True}}}, ALL),
    ("enum key-order-permuted object",
     {"enum": [{"b": 2, "a": 1}, "x"]}, ALL),
    ("const key-order-permuted object",
     {"const": {"b": 2, "a": 1}}, D6UP),
    ("required inside allOf",
     {"allOf": [{"required": ["a"]}, {"required": ["b"]}]}, ALL),
    ("exclusive bounds stacked",
     {"exclusiveMinimum": 0, "exclusiveMaximum": 3, "multipleOf": 1}, D6UP),
    ("ref inside anyOf",
     {"definitions": {"s": {"type": "string"}},
      "anyOf": [{"$ref": "#/definitions/s"}, {"minimum": 5}]},
     ("draft4", "draft6", "draft7")),
    ("boolean subschemas in combinators",
     {"anyOf": [False, {"type": "integer"}]}, D6UP),
    ("minLength under not",
     {"not": {"minLength": 3}}, ALL),
]

# ---------------------------------------------------------------------------
# $ref WITH SIBLINGS (round-3 extension): the reference conjoins sibling
# keywords with the $ref target in every draft (it skips the official
# suite's "ref overrides any sibling keywords" case, t/draft7.lisp:69-70)
# while stock jsonschema IGNORES siblings in draft<=7. Labeling rewrites
# each {$ref, siblings...} node into {"allOf": [{$ref}, {siblings}]}
# (conjunction made explicit), which jsonschema evaluates identically in
# every draft. definitions/$defs stay at their node so '#/...' pointers
# still resolve.
# ---------------------------------------------------------------------------

_KEEP_AT_NODE = {"definitions", "$defs", "$id", "id", "$schema"}


def _conjoin_ref_siblings(schema):
    if isinstance(schema, list):
        return [_conjoin_ref_siblings(s) for s in schema]
    if not isinstance(schema, dict):
        return schema
    out = {k: _conjoin_ref_siblings(v) for k, v in schema.items()}
    if "$ref" in out and len(out.keys() - _KEEP_AT_NODE - {"$ref"}) > 0:
        kept = {k: out[k] for k in out if k in _KEEP_AT_NODE}
        rest = {k: out[k] for k in out
                if k not in _KEEP_AT_NODE and k != "$ref"}
        return {**kept, "allOf": [{"$ref": out["$ref"]}, rest]}
    return out


REF_SIBLING_SCHEMAS: list[tuple[str, dict, tuple[str, ...]]] = [
    ("ref with sibling maximum",
     {"definitions": {"pos": {"minimum": 0}},
      "$ref": "#/definitions/pos", "maximum": 5},
     ("draft4", "draft6", "draft7")),
    ("ref with sibling type",
     {"definitions": {"short": {"maxLength": 3}},
      "$ref": "#/definitions/short", "type": "string"},
     ("draft4", "draft6", "draft7")),
    ("ref chain with siblings at each hop",
     {"definitions": {"a": {"$ref": "#/definitions/b", "multipleOf": 2},
                      "b": {"minimum": 2}},
      "$ref": "#/definitions/a", "maximum": 100},
     ("draft4", "draft6", "draft7")),
    ("ref in properties with sibling",
     {"definitions": {"int": {"type": "integer"}},
      "properties": {"a": {"$ref": "#/definitions/int", "minimum": 2}}},
     ("draft4", "draft6", "draft7")),
    ("ref to false schema",
     {"definitions": {"no": False}, "$ref": "#/definitions/no"},
     ("draft6", "draft7")),
    ("ref to empty schema with sibling",
     {"definitions": {"any": {}}, "$ref": "#/definitions/any",
      "minProperties": 1},
     ("draft4", "draft6", "draft7")),
    ("2019 ref with siblings (spec-conjunctive)",
     {"$defs": {"s": {"type": "string"}}, "$ref": "#/$defs/s",
      "minLength": 2}, D2019),
    ("2019 anchor ref with sibling",
     {"$defs": {"s": {"$anchor": "pos", "minimum": 0}},
      "$ref": "#pos", "multipleOf": 2}, D2019),
    ("ref inside allOf with outer keywords",
     {"definitions": {"pos": {"minimum": 0}},
      "allOf": [{"$ref": "#/definitions/pos"}, {"maximum": 10}],
      "type": "number"}, ("draft4", "draft6", "draft7")),
    ("escaped-pointer ref with sibling",
     {"definitions": {"a/b": {"type": "integer"}},
      "$ref": "#/definitions/a~1b", "minimum": 1},
     ("draft4", "draft6", "draft7")),
]


# ---------------------------------------------------------------------------
# format keyword (round-3 extension): labeled by an INDEPENDENT
# re-implementation of the reference's format table semantics
# (src/formats.lisp) — NOT stock jsonschema's format checker, whose
# RFC-strict email/idn-email would mislabel the reference's loose
# "contains @" semantics; and NOT the engine's own formats.py (that
# would be circular). Every checker below is written directly from the
# cited formats.lisp behavior with stdlib primitives.
# ---------------------------------------------------------------------------

import datetime as _dt
import re as _re


def _f_date(s):  # src/formats.lisp:19-24 (regex + real calendar)
    if not _re.fullmatch(r"\d{4}-\d{2}-\d{2}", s):
        return False
    try:
        _dt.date(int(s[0:4]), int(s[5:7]), int(s[8:10]))
        return True
    except ValueError:
        return False


_TIME_F = r"(\d{2}):(\d{2}):(\d{2})(\.\d+)?([Zz]|[+-]\d{2}:\d{2})"


def _f_offset_ok(s):  # RFC-3339 time-numoffset: hour<=23, minute<=59
    m = _re.search(r"[+-](\d{2}):(\d{2})$", s)
    return m is None or (int(m[1]) <= 23 and int(m[2]) <= 59)


def _f_time(s):  # :75-84 — RFC-3339 partial-time, leap second allowed
    m = _re.fullmatch(_TIME_F, s)
    return (bool(m) and int(m[1]) <= 23 and int(m[2]) <= 59
            and int(m[3]) <= 60 and _f_offset_ok(s))


def _f_date_time(s):  # :27-32
    m = _re.fullmatch(r"(\d{4}-\d{2}-\d{2})[Tt ]" + _TIME_F, s)
    return (bool(m) and _f_date(m[1]) and int(m[2]) <= 23
            and int(m[3]) <= 59 and int(m[4]) <= 60 and _f_offset_ok(s))


def _f_duration(s):  # :35-40 — ISO-8601 duration
    return bool(_re.fullmatch(
        r"P(?!$)(\d+Y)?(\d+M)?(\d+W)?(\d+D)?"
        r"(T(?=\d)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?", s))


def _f_email(s):  # :43-45 — deliberately loose
    return "@" in s


def _f_hostname(s):  # :11-12,48-53
    return bool(_re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9.\-]{0,254}", s)
                and all(len(l) < 64 for l in s.split("."))
                and not s.endswith("-"))


def _f_ipv4(s):  # :56-58 — dotted quad, no leading zeros
    o = r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
    return bool(_re.fullmatch(rf"({o}\.){{3}}{o}", s))


def _f_ipv6(s):  # :61-65 — quri-style parse + split-parts <= 8 guard
    if len(s.split(":")) > 8 or "%" in s:
        return False
    import ipaddress
    try:
        ipaddress.IPv6Address(s)
        return True
    except ValueError:
        return False


def _f_json_pointer(s):  # :68-72
    if _re.search(r"~(?![01])", s):
        return False
    return s == "" or s.startswith("/")


def _f_regex(s):  # :101-105 — value compiles
    try:
        _re.compile(s)
        return True
    except _re.error:
        return False


def _f_uri(s):  # :108-113 — parses with a non-empty scheme
    import urllib.parse
    try:
        return bool(urllib.parse.urlsplit(s).scheme)
    except ValueError:
        return False


def _f_uri_reference(s):  # :15-16,116-125 — allowed character set
    return bool(_re.fullmatch(
        r"[A-Za-z0-9\-._~:/?#\[\]@!$&'()*+,;=%]*", s)) and "\\" not in s


_F_COMMON = {
    "date-time": _f_date_time, "email": _f_email, "idn-email": _f_email,
    "hostname": _f_hostname, "ipv4": _f_ipv4, "ipv6": _f_ipv6,
    "uri": _f_uri, "regex": _f_regex,
}
# per-draft tables (src/formats.lisp:137-189); formats absent from a
# draft's table pass VACUOUSLY (dispatcher, src/validators.lisp:364-366)
_F_TABLES = {
    "draft4": {**_F_COMMON, "json-pointer": _f_json_pointer},
    "draft6": {**_F_COMMON, "json-pointer": _f_json_pointer,
               "uri-reference": _f_uri_reference},
    "draft7": {**_F_COMMON, "date": _f_date, "time": _f_time,
               "json-pointer": _f_json_pointer,
               "uri-reference": _f_uri_reference},
    "draft2019-09": {**_F_COMMON, "date": _f_date, "time": _f_time,
                     "duration": _f_duration,
                     "json-pointer": _f_json_pointer,
                     "uri-reference": _f_uri_reference},
}

FORMAT_INSTANCES = [
    # dates
    "2024-01-01", "2020-02-29", "2021-02-29", "2020-02-30", "2024-13-01",
    "2024-00-10", "24-01-01", "2024-1-1", "2024-01-01T00:00:00Z",
    # date-times
    "2024-01-01T12:30:45Z", "2024-01-01t23:59:60z",
    "2024-01-01 12:30:45+05:30", "2024-01-01T12:30:45.123456789Z",
    "2024-01-01T24:00:00Z", "2024-01-01T12:60:00Z", "2024-01-01T12:30:45",
    "2024-02-30T12:00:00Z", "2024-01-01T12:30:45+99:99",
    "2024-01-01T12:30:45-23:59", "2024-01-01T12:30:45+00:60",
    # times
    "12:30:45Z", "23:59:60+00:00", "12:30:45.5Z", "24:00:00Z", "1:30:45Z",
    "12:30:45", "12:30:45+24:00", "12:30:45-18:00",
    # durations
    "P1Y", "PT1H30M", "P1DT12H", "P1W", "P", "PT", "P1H", "-P1Y",
    "PT0.5S",
    # emails (loose!)
    "a@b", "user@example.com", "no-at-sign", "a@", "@b", "@",
    # hostnames
    "example.com", "a-b.example", "-bad.start", "bad.end-", "host_name",
    "127.0.0.1", "a" * 63 + ".com", "b" * 64 + ".com",
    # ipv4
    "255.255.255.255", "256.1.1.1", "1.2.3", "01.2.3.4", "1.2.3.4.5",
    # ipv6
    "::1", "::", "2001:db8::8a2e:370:7334", "1:2:3:4:5:6:7:8",
    "1:2:3:4:5:6:7:8:9", "g::1", "1::2::3", "::ffff:1.2.3.4",
    "1:2:3:4:5:6:1.2.3.4", "fe80::1%eth0", "::2:3:4:5:6:7:8",
    "0001::8",
    # json-pointer
    "", "/foo/bar", "/foo~01", "/foo~1bar", "foo", "/~2", "/~",
    # regex
    "^a+$", "a[", "a+b*", "\\d{2,4}", "(",
    # uri / uri-reference
    "https://example.com/x?q=1#f", "ftp://host/file", "//no-scheme",
    "example.com/path", "/relative/path", "#frag", "a b", "back\\slash",
    "?q=2",
    # non-strings: format is type-gated -> vacuous pass
    1, True, None, [], {"a": 1},
]

# formats generated per draft INCLUDING drafts whose table lacks them
# (vacuous-dispatch coverage: e.g. `time` in draft4 passes everything)
FORMAT_NAMES = [
    "date", "time", "date-time", "duration", "email", "idn-email",
    "hostname", "ipv4", "ipv6", "json-pointer", "regex", "uri",
    "uri-reference",
]


def _format_label(draft: str, name: str, data) -> bool:
    if not isinstance(data, str):
        return True  # type-gated
    checker = _F_TABLES[draft].get(name)
    if checker is None:
        return True  # absent from the draft's table: vacuous
    return checker(data)


def label(draft: str, desc: str, schema, data) -> bool:
    return VALIDATORS[draft](schema).is_valid(data)


def main() -> None:
    for draft in ALL:
        groups = []
        n = 0
        for desc, schema, drafts in SCHEMAS:
            if draft not in drafts:
                continue
            tests = []
            for data in INSTANCES:
                tests.append({
                    "description": f"instance {json.dumps(data, sort_keys=True)[:60]}",
                    "data": data,
                    "valid": label(draft, desc, schema, data),
                })
            n += len(tests)
            groups.append({"description": desc, "schema": schema,
                           "tests": tests})
        # $ref-with-siblings: labeled through the conjunction rewrite
        for desc, schema, drafts in REF_SIBLING_SCHEMAS:
            if draft not in drafts:
                continue
            labeler = _conjoin_ref_siblings(schema)
            tests = [{
                "description": f"instance {json.dumps(d, sort_keys=True)[:60]}",
                "data": d,
                "valid": label(draft, desc, labeler, d),
            } for d in INSTANCES]
            n += len(tests)
            groups.append({"description": desc, "schema": schema,
                           "tests": tests})
        # format keyword: reference-parity labeler over string edges
        for name in FORMAT_NAMES:
            tests = [{
                "description": f"instance {json.dumps(d, sort_keys=True)[:60]}",
                "data": d,
                "valid": _format_label(draft, name, d),
            } for d in FORMAT_INSTANCES]
            n += len(tests)
            suffix = "" if name in _F_TABLES[draft] else " (vacuous: not in draft table)"
            groups.append({"description": f"format {name}{suffix}",
                           "schema": {"format": name}, "tests": tests})
        out = OUT_DIR / f"gen_{draft}.json"
        out.write_text(json.dumps(groups, indent=1, sort_keys=False))
        print(f"{out.name}: {len(groups)} groups, {n} cases")


if __name__ == "__main__":
    main()
