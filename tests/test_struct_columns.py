"""Object keywords on STRUCT-typed columns (the conformance corpus
infers MapType for dict instances, so the StructType branches —
properties field recursion, required-as-non-null, dependencies on
fields, min/maxProperties over non-null fields — get their own golden
test here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_schema_spark import compile_spec, verdict_df

ROWS = [
    # (id, a, b)  -> struct meta {a:int, b:string}
    (1, 5, "x"),
    (2, None, "y"),     # a absent
    (3, 50, None),      # b absent, a over max
    (4, -1, "zzzz"),    # a under min, b too long
    (5, None, None),    # both absent
]


@pytest.fixture(scope="module")
def struct_df(spark):
    base = spark.createDataFrame(ROWS, "id long, a long, b string")
    return base.select(
        "id", F.struct(F.col("a"), F.col("b")).alias("meta"))


def _counts(spark, struct_df, schema: dict) -> dict[str, int]:
    spec = {"draft": "draft7", "columns": {"meta": schema}}
    compiled = compile_spec(spec, struct_df)
    return {
        f"{r['column']}/{r['keyword']}": r["n_violations"]
        for r in verdict_df(struct_df, compiled).collect()
    }


def test_struct_properties_recursion(spark, struct_df):
    got = _counts(spark, struct_df, {
        "properties": {"a": {"minimum": 0, "maximum": 10},
                       "b": {"maxLength": 3}}})
    # a: row3 (50>10) + row4 (-1<0); absent a (rows 2,5) pass vacuously
    # b: row4 ('zzzz' len 4); absent b (rows 3,5) pass vacuously
    # n_violations counts ROWS failing the fused properties predicate
    assert got["meta/properties"] == 2  # rows 3 and 4


def test_struct_required_fields(spark, struct_df):
    got = _counts(spark, struct_df, {"required": ["a", "b"]})
    # required inside the struct: a null field = missing key
    assert got["meta/required"] == 3  # rows 2, 3, 5


def test_struct_dependencies_array_form(spark, struct_df):
    got = _counts(spark, struct_df, {"dependencies": {"a": ["b"]}})
    # a present requires b present: row 3 violates (a=50, b null)
    assert got["meta/dependencies"] == 1


def test_struct_min_max_properties(spark, struct_df):
    got = _counts(spark, struct_df, {"minProperties": 2})
    # rows with fewer than 2 present fields: rows 2, 3, 5
    assert got["meta/minProperties"] == 3
    got = _counts(spark, struct_df, {"maxProperties": 1})
    # rows with 2 present fields: rows 1, 4
    assert got["meta/maxProperties"] == 2


def test_struct_const_deep_equality(spark, struct_df):
    got = _counts(spark, struct_df, {"const": {"a": 5, "b": "x"}})
    # only row 1 matches the struct literal
    assert got["meta/const"] == 4


def test_struct_matches_pyvalidator(spark, struct_df):
    """The struct column path agrees with the pure-Python validator on
    the same logical objects (null field = absent key)."""
    from json_schema_spark.pyvalidator import Validator

    schema = {"properties": {"a": {"minimum": 0, "maximum": 10},
                             "b": {"maxLength": 3}},
              "required": ["a"],
              "dependencies": {"a": ["b"]}}
    v = Validator(schema, draft="draft7")
    expected_bad = 0
    for _id, a, b in ROWS:
        obj = {}
        if a is not None:
            obj["a"] = a
        if b is not None:
            obj["b"] = b
        ok, _ = v.validate(obj)
        expected_bad += 0 if ok else 1

    spec = {"draft": "draft7", "columns": {"meta": schema}}
    compiled = compile_spec(spec, struct_df)
    from json_schema_spark import violations_df
    bad_rows = (
        violations_df(struct_df, compiled, id_cols=["id"])
        .select("id").distinct().count()
    )
    assert bad_rows == expected_bad
