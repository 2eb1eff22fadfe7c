"""Verdict/violation materialization on the VARIANT path
(compiler_variant.variant_verdict_df / variant_violations_df): the
typed path's output shapes over dynamic JSON, per-keyword granular,
zero executor Python.

Value evidence: a hand-labeled fixture with every keyword family
failing somewhere, a conjunction check against the conformance-gated
``validate_variant_column``, and a direct DuckDB per-keyword twin for
the rows-only driver query ``events_json_verdicts_variant``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_schema_spark.compiler_variant import (
    validate_variant_column, variant_verdict_df, variant_violations_df,
)

SCHEMA = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 50}},
    "additionalProperties": False,
}

# (doc_id, json, expected failed keywords)
DOCS = [
    (0, '{"k": 5}', set()),
    (1, '{"k": 99}', {"properties"}),                 # maximum
    (2, "{}", {"required"}),
    (3, '{"k": 5, "x": 1}', {"additionalProperties"}),
    (4, "[1, 2]", {"type"}),                          # non-object: object
                                                      # keywords vacuous
    (5, "not json {", {"(parse)"}),                   # ONLY parse fails
    (6, None, set()),                                 # NULL raw: vacuous,
                                                      # like a NULL typed col
    (7, '{"k": "hi"}', {"properties"}),               # type inside properties
    (8, '{"k": null}', {"properties"}),               # present null: required
                                                      # SEES it (variant keeps
                                                      # null vs absent)
    (9, '{"k": -1, "y": 2}',
     {"properties", "additionalProperties"}),         # error accumulation
]


def _df(spark):
    return spark.createDataFrame(
        [(i, d) for i, d, _ in DOCS],
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("doc", T.StringType()),
        ]),
    )


def test_violations_match_hand_labels(spark):
    got = {
        (r["doc_id"], r["keyword"])
        for r in variant_violations_df(
            _df(spark), "doc", SCHEMA, id_cols=["doc_id"]).collect()
    }
    want = {(i, kw) for i, _, kws in DOCS for kw in kws}
    assert got == want


def test_violation_rows_carry_typed_path_schema(spark):
    """Same output schema as compiler.violations_df — the runner,
    IceTable results sink, and errors.render_verdict_report consume
    both paths interchangeably."""
    v = variant_violations_df(_df(spark), "doc", SCHEMA,
                              id_cols=["doc_id"], run_id="r1")
    assert [f.name for f in v.schema.fields] == [
        "doc_id", "keyword", "column", "path", "message",
        "sub_errors", "run_id"]
    row = v.where(F.col("keyword") == "properties").first()
    assert row["column"] == "doc" and row["path"] == "/properties"
    assert row["run_id"] == "r1"


def test_verdicts_equal_conjunction(spark):
    """A document is valid under validate_variant_column iff the
    per-keyword path emits zero violations for it (NULL raw input
    excluded: the per-keyword path treats it vacuously, typed-path
    style, while the conjunction folds it into malformed_valid)."""
    df = _df(spark).where(F.col("doc").isNotNull())
    ok = df.select(
        "doc_id",
        validate_variant_column(F.col("doc"), SCHEMA).alias("ok"))
    nviol = variant_violations_df(df, "doc", SCHEMA, id_cols=["doc_id"]) \
        .groupBy("doc_id").count()
    joined = ok.join(nviol, "doc_id", "left").fillna(0, ["count"])
    bad = joined.where(F.col("ok") == (F.col("count") > 0)).collect()
    assert bad == [], bad


def test_verdict_rollup_counts(spark):
    rows = {(r["column"], r["keyword"]): r
            for r in variant_verdict_df(_df(spark), "doc", SCHEMA).collect()}
    want = {"(parse)": 1, "type": 1, "required": 1, "properties": 4,
            "additionalProperties": 2}
    assert {k[1]: r["n_violations"] for k, r in rows.items()} == want
    assert all(r["n_rows"] == len(DOCS) for r in rows.values())
    assert all((r["n_violations"] == 0) == r["pass"] for r in rows.values())


def test_predicates_are_branch_free_at_the_root(spark):
    """Perf regression guard: the NULL-vacuous gates must be boolean
    algebra (x IS NULL OR pred), never when().otherwise() — Spark's
    subexpression elimination does not reach inside conditional
    branches, and re-wrapping cost a measured 4.4x on the VARIANT pass
    and 25% on the typed constraint pass (BENCH/BASELINE.md r4)."""
    from json_schema_spark.compiler import compile_spec

    vpred = validate_variant_column(F.col("doc"), SCHEMA)
    assert not str(vpred).upper().startswith("COLUMN<'CASE WHEN")
    for _, pred in __import__("json_schema_spark.compiler_variant",
                              fromlist=["variant_checks"]) \
            .variant_checks(SCHEMA):
        assert not str(pred(F.col("v"))).upper().startswith("COLUMN<'CASE WHEN")

    df = spark.createDataFrame([("https://x", "en")], ["url", "lang"])
    compiled = compile_spec(
        {"columns": {"url": {"type": "string", "minLength": 3,
                             "maxLength": 99, "pattern": "^https://"}}}, df)
    for c in compiled.checks:
        assert not str(c.predicate).upper().startswith("COLUMN<'CASE WHEN"), \
            (c.column, c.keyword)


def test_runner_composes_with_variant_path(spark, tmp_path):
    """ValidationRunner consumes a variant CompiledSpec unchanged:
    checkpoint-resumable per-partition validation of a dynamic JSON
    column, zero executor Python — inject ``variant_compiled_spec``
    as ``compiled`` and pre-add the shared parsed column."""
    from json_schema_spark.compiler_variant import (
        variant_compiled_spec, with_parsed_variant,
    )
    from json_schema_spark.plans.runner import ValidationRunner

    df = _df(spark).withColumn(
        "grp", F.when(F.col("doc_id") < 5, "a").otherwise("b"))
    src = with_parsed_variant(df, "doc")

    r = ValidationRunner(spark, spec={}, results_dir=str(tmp_path / "res"),
                         id_cols=("doc_id",),
                         compiled=variant_compiled_spec("doc", SCHEMA))
    assert sorted(r.run(src, partition_col="grp")) == ["a", "b"]

    # per-partition verdict rows carry the per-keyword granularity
    vd = {(row["partition"], row["check"]): row
          for row in r.verdicts().collect()}
    assert vd[("a", "doc/type")]["pass"] is False        # doc 4 is an array
    assert vd[("b", "doc/type")]["pass"] is True
    assert vd[("a", "doc/(parse)")]["n_violations"] == 0
    assert vd[("b", "doc/(parse)")]["n_violations"] == 1  # doc 5 malformed
    # violation rows match the hand labels, now with partition lineage
    got = {(row["doc_id"], row["keyword"])
           for row in r.violations().collect()}
    assert got == {(i, kw) for i, _, kws in DOCS for kw in kws}
    # resume is a no-op
    assert r.run(src, partition_col="grp") == []


def test_driver_query_matches_duckdb():
    """Direct DuckDB per-keyword twin for the rows-only driver entry
    (oracle slots are capped at the driver's 50-query sample window,
    test_driver_contract.py)."""
    import duckdb

    import __spark_entry__ as entry
    from json_schema_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]")
    got = sorted(tuple(r) for r in
                 entry.q_events_json_verdicts_variant(spark, sf_dir).collect())

    kw_pred = {
        "(parse)": "props IS NOT NULL AND NOT json_valid(props)",
        "type": "json_valid(props) AND json_type(props) <> 'OBJECT'",
        "required": """json_valid(props) AND json_type(props) = 'OBJECT'
                       AND json_extract(props, '$.k') IS NULL""",
        "properties": """json_valid(props) AND json_type(props) = 'OBJECT'
                         AND json_extract(props, '$.k') IS NOT NULL
                         AND NOT (json_type(props, '$.k')
                                    IN ('UBIGINT', 'BIGINT', 'INTEGER')
                                  AND try_cast(json_extract_string(props, '$.k')
                                               AS BIGINT) BETWEEN 0 AND 50)""",
        "additionalProperties": """json_valid(props)
                         AND json_type(props) = 'OBJECT'
                         AND len(list_filter(json_keys(props),
                                             k -> k <> 'k')) > 0""",
    }
    sql = "\nUNION ALL\n".join(
        f"""SELECT event_type AS part, 'props' AS col_name,
                   '{kw}' AS keyword,
                   count(*) FILTER (WHERE {pred})::BIGINT AS n_violations,
                   count(*)::BIGINT AS n_rows,
                   count(*) FILTER (WHERE {pred}) = 0 AS check_pass
            FROM read_parquet('{sf_dir}/events.parquet')
            GROUP BY event_type"""
        for kw, pred in kw_pred.items())
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want
