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
* `format`/`unevaluatedProperties` are covered by the hand-written
  vectors (reference-parity semantics differ from jsonschema's).

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
    # (nested-$id base remapping is NOT generated: stock jsonschema's
    # resolver treats the remapped URI as remote; the engine's registry
    # unit tests cover that path instead)
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
        out = OUT_DIR / f"gen_{draft}.json"
        out.write_text(json.dumps(groups, indent=1, sort_keys=False))
        print(f"{out.name}: {len(groups)} groups, {n} cases")


if __name__ == "__main__":
    main()
