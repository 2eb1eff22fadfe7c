"""Keyword conformance: vendored JSON-Schema-Test-Suite-format vectors
(FIXTURES.md §4) through (a) the pure-Python reference-parity validator
and (b) the distributed Arrow-batched UDF path — both must reproduce
every `valid` flag. Vector format matches the reference harness
(t/json-schema-test-case-helper.lisp:12-29)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from json_schema_spark.pyvalidator import Validator, json_equal

VECTOR_DIR = Path(__file__).parent / "vectors"
DRAFTS = ["draft7", "draft2019-09", "draft4", "draft6"]


def load_vectors(draft: str):
    groups = json.loads((VECTOR_DIR / f"{draft}.json").read_text())
    for g in groups:
        for case in g["tests"]:
            yield pytest.param(
                g["schema"], case["data"], case["valid"], draft,
                id=f"{draft}::{g['description']}::{case['description']}",
            )


ALL_CASES = [p for d in DRAFTS for p in load_vectors(d)]


@pytest.mark.parametrize("schema,data,valid,draft", ALL_CASES)
def test_pyvalidator_conformance(schema, data, valid, draft):
    v = Validator(schema, draft=draft)
    ok, errors = v.validate(data)
    assert ok == valid, "\n".join(e.pretty() for e in errors)
    # invariants mirroring json-schema:validate's return contract
    # (src/json-schema.lisp:33-38): valid iff errors nil
    assert (not errors) == ok


def test_udf_path_matches_pyvalidator(spark):
    """The distributed path: ONE DataFrame holding every draft7 case,
    one applyInPandas pass grouped by schema id — Arrow batches, no
    per-row Python in the plan besides the sanctioned UDF."""
    import pandas as pd

    groups = json.loads((VECTOR_DIR / "draft7.json").read_text())
    schema_map = {i: json.dumps(g["schema"]) for i, g in enumerate(groups)}
    rows, expected = [], {}
    for i, g in enumerate(groups):
        for j, case in enumerate(g["tests"]):
            rows.append((i, j, json.dumps(case["data"])))
            expected[(i, j)] = case["valid"]

    df = spark.createDataFrame(rows, "gid int, cid int, doc string")
    bc = spark.sparkContext.broadcast(schema_map)

    def check(key, pdf: pd.DataFrame) -> pd.DataFrame:
        validator = Validator(json.loads(bc.value[key[0]]), draft="draft7")
        out = pdf.copy()
        out["valid"] = [
            validator.is_valid(json.loads(doc)) for doc in pdf["doc"]
        ]
        return out[["gid", "cid", "valid"]]

    res = df.groupBy("gid").applyInPandas(check, "gid int, cid int, valid boolean")
    got = {(r["gid"], r["cid"]): r["valid"] for r in res.collect()}
    assert got == expected


def test_error_objects_nest_and_pretty_print():
    """Error model parity: sub-errors nest; pretty output uses the
    'Additionally:' style (README.rst:70-79)."""
    v = Validator({"properties": {"a": {"minimum": 2, "type": "integer"}}})
    ok, errors = v.validate({"a": 0.5})
    assert not ok
    assert len(errors) == 1
    e = errors[0]
    assert e.keyword == "properties" and e.path == "/a"
    kws = {s.keyword for s in e.sub_errors}
    assert kws == {"minimum", "type"}  # accumulation, not short-circuit
    text = e.pretty()
    assert "Additionally:" in text
    d = e.to_dict()
    assert d["sub_errors"][0]["path"] == "/a"


def test_json_equal_semantics():
    # src/utils.lisp:69-96 parity
    assert json_equal(1, 1.0)
    assert not json_equal(True, 1)
    assert not json_equal(False, 0)
    assert json_equal({"a": [1, {"b": 2}]}, {"a": [1.0, {"b": 2.0}]})
    assert not json_equal({"a": 1}, {"a": 1, "b": 2})
    assert json_equal(None, None)
    assert not json_equal(None, 0)


def test_ref_depth_cap():
    """Cyclic $refs hit the depth cap (src/reference.lisp:35-36)
    instead of recursing forever."""
    v = Validator({"$ref": "#"})
    ok, errors = v.validate(5)
    assert not ok
    assert "depth cap" in errors[0].pretty() or errors[0].sub_errors


GEN_DRAFTS = ["draft4", "draft6", "draft7", "draft2019-09"]


def _gen_groups(draft: str):
    p = VECTOR_DIR / f"gen_{draft}.json"
    return json.loads(p.read_text())


def test_pyvalidator_generated_corpus():
    """The full generated corpus (tools/gen_vectors.py: schema pool x
    instance pool labeled by the independent `jsonschema` library with
    documented reference-parity extensions) through the pure-Python
    path — batched in one loop, ~21k cases across all four drafts."""
    failures, n = [], 0
    for draft in GEN_DRAFTS:
        for g in _gen_groups(draft):
            v = Validator(g["schema"], draft=draft)
            for case in g["tests"]:
                n += 1
                ok, errors = v.validate(case["data"])
                if ok != case["valid"]:
                    failures.append(
                        f"{draft}::{g['description']}::{case['description']}"
                        f" want {case['valid']} got {ok}")
                if (not errors) != ok:
                    failures.append(
                        f"{draft}::{g['description']}::{case['description']}"
                        " errors/valid contract broken")
    assert not failures, f"{len(failures)} failures:\n" + "\n".join(failures[:30])
    assert n > 20000, n


def test_udf_path_generated_corpus(spark):
    """All four drafts' generated vectors through the distributed
    Arrow-batched path: one DataFrame, one applyInPandas grouped by
    (draft, schema id)."""
    import pandas as pd

    schema_map, rows, expected = {}, [], {}
    for draft in GEN_DRAFTS:
        for i, g in enumerate(_gen_groups(draft)):
            schema_map[(draft, i)] = json.dumps(g["schema"])
            for j, case in enumerate(g["tests"]):
                rows.append((draft, i, j, json.dumps(case["data"])))
                expected[(draft, i, j)] = case["valid"]

    df = spark.createDataFrame(rows, "draft string, gid int, cid int, doc string")
    bc = spark.sparkContext.broadcast(schema_map)

    def check(key, pdf: pd.DataFrame) -> pd.DataFrame:
        validator = Validator(json.loads(bc.value[(key[0], key[1])]), draft=key[0])
        out = pdf.copy()
        out["valid"] = [validator.is_valid(json.loads(d)) for d in pdf["doc"]]
        return out[["draft", "gid", "cid", "valid"]]

    res = df.repartition(8, "draft", "gid").groupBy("draft", "gid").applyInPandas(
        check, "draft string, gid int, cid int, valid boolean")
    got = {(r["draft"], r["gid"], r["cid"]): r["valid"] for r in res.collect()}
    assert got == expected
