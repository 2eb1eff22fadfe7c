"""Property-based differential conformance: hypothesis-generated JSON
instances through the engine's pure-Python validator vs the independent
`jsonschema` library (extended with the reference's documented parity
semantics — see tools/gen_vectors.py), across all four drafts and the
full curated schema pool.

This goes beyond the reference's own testing (it runs only the static
official suite, SURVEY.md §5) and guards exactly the class of bug the
static corpus can miss: divergence on instance shapes nobody wrote a
vector for.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from gen_vectors import SCHEMAS, VALIDATORS  # noqa: E402  (parity-extended)

from json_schema_spark.pyvalidator import Validator  # noqa: E402

DRAFTS = ("draft4", "draft6", "draft7", "draft2019-09")

# JSON value strategy: finite numbers only (NaN/Inf are not JSON),
# text kept short so pattern/length keywords exercise both sides of
# their bounds, plus big ints for the bignum path.
_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10 ** 30), max_value=10 ** 30),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=8),
)
_json = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(max_size=4), children, max_size=5),
    ),
    max_leaves=12,
)

# one precompiled engine validator per (draft, schema) — compile-once
_ENGINE = {}
_ORACLE = {}
for _draft in DRAFTS:
    for _desc, _schema, _drafts in SCHEMAS:
        if _draft in _drafts:
            _ENGINE[(_draft, _desc)] = Validator(_schema, draft=_draft)
            _ORACLE[(_draft, _desc)] = VALIDATORS[_draft](_schema)

_KEYS = sorted(_ENGINE)


@settings(max_examples=1000, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=_json, pick=st.integers(min_value=0, max_value=len(_KEYS) - 1))
def test_engine_matches_parity_oracle(data, pick):
    draft, desc = _KEYS[pick]
    engine_ok = _ENGINE[(draft, desc)].is_valid(data)
    oracle_ok = _ORACLE[(draft, desc)].is_valid(data)
    assert engine_ok == oracle_ok, (
        f"{draft}::{desc}: engine={engine_ok} oracle={oracle_ok} "
        f"data={data!r}")


@settings(max_examples=100, deadline=None, derandomize=True)
@given(data=_json)
def test_valid_iff_no_errors_contract(data):
    """json-schema:validate's return contract (src/json-schema.lisp:33-38)
    holds for arbitrary instances."""
    v = _ENGINE[("draft7", "object with everything")]
    ok, errors = v.validate(data)
    assert ok == (not errors)


@settings(max_examples=200, deadline=None)  # NOT derandomized: keeps
# exploring new inputs every run; any failure it ever finds is a real
# engine/oracle divergence worth a flake (hypothesis prints the
# reproducing seed)
@given(data=_json, pick=st.integers(min_value=0, max_value=len(_KEYS) - 1))
def test_engine_matches_parity_oracle_explore(data, pick):
    draft, desc = _KEYS[pick]
    assert (_ENGINE[(draft, desc)].is_valid(data)
            == _ORACLE[(draft, desc)].is_valid(data))


# --- strict unevaluated* mode vs stock jsonschema (round 3) -----------------
# In strict mode the engine claims SPEC 2019-09 annotation semantics for
# unevaluatedProperties/unevaluatedItems — so the differential oracle is
# STOCK Draft201909Validator (no parity extension needed: these schemas
# avoid the documented parity divergences).
from jsonschema import Draft201909Validator  # noqa: E402

_STRICT_SCHEMAS = [
    {"properties": {"a": {}}, "patternProperties": {"^b": {}},
     "unevaluatedProperties": False},
    {"allOf": [{"properties": {"x": {"type": "integer"}}},
               {"patternProperties": {"^y": {}}}],
     "unevaluatedProperties": {"type": "string"}},
    {"anyOf": [{"properties": {"a": {}}, "required": ["a"]},
               {"properties": {"b": {}}, "required": ["b"]}],
     "unevaluatedProperties": False},
    {"if": {"required": ["a"]}, "then": {"properties": {"a": {}, "b": {}}},
     "else": {"properties": {"c": {}}}, "unevaluatedProperties": False},
    {"$defs": {"base": {"properties": {"a": {}}}},
     "$ref": "#/$defs/base", "unevaluatedProperties": False},
    {"dependentSchemas": {"a": {"properties": {"b": {}}}},
     "properties": {"a": {}}, "unevaluatedProperties": False},
    {"items": [{"type": "integer"}], "unevaluatedItems": False},
    {"items": [{}], "additionalItems": {"type": "integer"},
     "unevaluatedItems": False},
    {"allOf": [{"items": [{}, {}]}], "unevaluatedItems": {"type": "string"}},
    {"anyOf": [{"items": [{}, {}], "minItems": 2}, {"items": [{}]}],
     "unevaluatedItems": False},
    {"if": {"minItems": 2}, "then": {"items": [{}, {}]},
     "else": {"items": [{}]}, "unevaluatedItems": False},
]
_STRICT_ENGINE = [Validator(s, draft="draft2019-09", strict_unevaluated=True)
                  for s in _STRICT_SCHEMAS]
_STRICT_ORACLE = [Draft201909Validator(s) for s in _STRICT_SCHEMAS]


@settings(max_examples=500, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=_json,
       pick=st.integers(min_value=0, max_value=len(_STRICT_SCHEMAS) - 1))
def test_strict_unevaluated_matches_spec_oracle(data, pick):
    got = _STRICT_ENGINE[pick].is_valid(data)
    want = _STRICT_ORACLE[pick].is_valid(data)
    assert got == want, (
        f"{_STRICT_SCHEMAS[pick]}: engine={got} oracle={want} data={data!r}")
