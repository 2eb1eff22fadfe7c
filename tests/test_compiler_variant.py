"""VARIANT-path conformance: the SAME vendored + generated vectors,
each case's `data` serialized back to JSON text and validated entirely
JVM-side through ``compiler_variant`` (SURVEY.md §5.1 — fourth
validation path).

Unlike the typed-column path, every case shares one physical
representation (a JSON string), so there are no dtype buckets and no
NULL-as-absent skips: JSON ``null`` data, heterogeneous arrays and
mixed-shape objects all run. One Spark job per draft: rows = cases,
one predicate column per DISTINCT schema, read the (row, its-schema)
cell.

Schemas the variant path declines at compile time (PCRE-only patterns,
cyclic $ref past the unroll) are counted as fallbacks — the contract
is fall-back-or-agree, never silently-approximate. As of r5 the full
4-draft corpus has ZERO declines (pinned below).
"""

from __future__ import annotations

import json
import math
from pathlib import Path

from pyspark.sql import functions as F

from json_schema_spark.compiler_variant import (
    VariantUnsupported, compile_variant, validate_variant_column,
)
from json_schema_spark.spec import ConstraintSpec, SpecError

VECTOR_DIR = Path(__file__).parent / "vectors"
DRAFTS = ["draft7", "draft2019-09", "draft4", "draft6"]


def _has_fractional_multiple_of(schema) -> bool:
    if isinstance(schema, dict):
        mo = schema.get("multipleOf")
        if isinstance(mo, float) and mo != int(mo):
            return True
        return any(_has_fractional_multiple_of(v) for v in schema.values())
    if isinstance(schema, list):
        return any(_has_fractional_multiple_of(v) for v in schema)
    return False


def _float_exactness_case(schema, data) -> bool:
    """Same float-exactness class the reference itself skips
    (t/draft7.lisp:54-55) and the typed path excludes: the parsed
    binary double differs from the decimal literal the corpus labeled."""
    return (isinstance(data, (int, float)) and not isinstance(data, bool)
            and abs(data) > 1e26 and _has_fractional_multiple_of(schema))


def _registry_for(schema, draft):
    if isinstance(schema, dict):
        try:
            return ConstraintSpec(dict(schema, draft=draft)).registry
        except SpecError:
            return None
    return None


def test_variant_compiler_reproduces_vectors(spark):
    failures, n_run, n_fallback, n_skipped = [], 0, 0, 0
    for draft in DRAFTS:
        groups = []
        for fname in (f"{draft}.json", f"gen_{draft}.json"):
            groups.extend(json.loads((VECTOR_DIR / fname).read_text()))

        preds, pred_idx = [], {}
        rows, labels = [], []
        for g in groups:
            schema = g["schema"]
            skey = json.dumps(schema, sort_keys=True)
            if skey not in pred_idx:
                try:
                    p = compile_variant(schema, draft, _registry_for(schema, draft))
                except VariantUnsupported:
                    p = None  # declared fallback — counted, not failed
                except SpecError:
                    p = None
                pred_idx[skey] = len(preds)
                preds.append(p)
            gi = pred_idx[skey]
            for case in g["tests"]:
                data = case["data"]
                if isinstance(data, float) and (math.isnan(data) or math.isinf(data)):
                    n_skipped += 1
                    continue
                if _float_exactness_case(schema, data):
                    n_skipped += 1
                    continue
                if preds[gi] is None:
                    n_fallback += 1
                    continue
                labels.append(f"{draft}: {g['description']}::{case['description']}")
                rows.append((len(rows), gi, json.dumps(data), case["valid"]))

        if not rows:
            continue
        df = spark.createDataFrame(rows, "i long, g int, j string, expected boolean")
        v = F.try_parse_json(F.col("j"))
        sel = [F.col("i"), F.col("g"), F.col("expected")] + [
            (p(v).alias(f"c{j}") if p is not None
             else F.lit(None).cast("boolean").alias(f"c{j}"))
            for j, p in enumerate(preds)
        ]
        for r in df.select(*sel).collect():
            got = r[f"c{r['g']}"]
            n_run += 1
            if got is None or bool(got) != r["expected"]:
                failures.append(f"{labels[r['i']]} -> got {got}, want {r['expected']}")

    assert not failures, f"{len(failures)} divergences:\n" + "\n".join(failures[:40])
    # the JVM variant path must carry the clear majority of the corpus
    assert n_run >= 30000, (
        f"only {n_run} cases ran JVM-side (fallback={n_fallback}, skip={n_skipped})")


def test_variant_null_vs_absent(spark):
    """The semantics the typed path cannot express (SURVEY.md §1.1):
    present-null fails `required`-less type checks but satisfies
    required; absent is vacuous for properties but fails required."""
    docs = [
        ('{"k": null}',),   # present null
        ('{}',),            # absent
        ('{"k": 1}',),      # present non-null
    ]
    df = spark.createDataFrame(docs, ["j"])
    required = validate_variant_column(
        F.col("j"), {"type": "object", "required": ["k"]})
    typed = validate_variant_column(
        F.col("j"), {"properties": {"k": {"type": "null"}}})
    got = [tuple(r) for r in df.select(required, typed).collect()]
    #            required  properties:{k:{type:null}}
    assert got == [(True, True),    # null IS present; null IS type null
                   (False, True),   # absent fails required, vacuous for props
                   (True, False)]   # 1 is not type null


def test_variant_malformed_json_policy(spark):
    df = spark.createDataFrame([("{",), ('{"a":1}',), (None,)], ["j"])
    strict = validate_variant_column(F.col("j"), {"type": "object"})
    lax = validate_variant_column(F.col("j"), {"type": "object"},
                                  malformed_valid=True)
    assert [r[0] for r in df.select(strict).collect()] == [False, True, False]
    assert [r[0] for r in df.select(lax).collect()] == [True, True, True]


def test_variant_declines_pcre_pattern():
    import pytest
    with pytest.raises(VariantUnsupported):
        compile_variant({"pattern": r"\p{Lu}+"})


def test_variant_unique_items_cross_type(spark):
    """json-equal-p parity on the tricky scalar cases: 1 == 1.0 but
    1 != "1" != true; nulls equal each other (src/utils.lisp:69-96)."""
    cases = [
        ("[1, 1.0]", False),        # numeric = across int/float
        ('[1, "1"]', True),
        ("[true, 1]", True),        # bools only equal bools
        ("[null, null]", False),
        ('["[1,2]", [1, 2]]', True),  # string vs array: distinct
        ("[[1, 2], [1, 2]]", False),
        ('[{"a": 1}, {"a": 1}]', False),
    ]
    df = spark.createDataFrame([(j,) for j, _ in cases], ["j"])
    pred = validate_variant_column(F.col("j"), {"uniqueItems": True})
    got = [bool(r[0]) for r in df.select(pred).collect()]
    assert got == [ok for _, ok in cases]


def test_variant_query_equals_udf_path(spark):
    """The 51st driver query (outside the driver's 50-row correctness
    sample): the VARIANT path must reproduce the pandas-UDF path's
    per-event_type verdict counts exactly on real table data."""
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    udf_rows = sorted(
        tuple(r) for r in entry.q_events_json_validate_full(spark, sf_dir).collect())
    var_rows = sorted(
        tuple(r) for r in entry.q_events_json_validate_variant(spark, sf_dir).collect())
    assert udf_rows == var_rows
    assert len(var_rows) > 0


def test_variant_query_matches_duckdb(spark):
    """Direct DuckDB value check for the rows-only driver entry — the
    same SQL shape as the oracled UDF twin's oracle."""
    import duckdb

    sf_dir = "/root/testdata/sf0.01"
    import __spark_entry__ as entry

    got = sorted(tuple(r) for r in
                 entry.q_events_json_validate_variant(spark, sf_dir).collect())
    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(f"""
        SELECT event_type, count(*) AS n_rows,
               count(*) FILTER (WHERE NOT (
                 json_valid(props)
                 AND json_type(props) = 'OBJECT'
                 AND json_keys(props) = ['k']
                 AND json_type(props, '$.k') IN ('UBIGINT','BIGINT','INTEGER')
                 AND try_cast(json_extract_string(props, '$.k') AS BIGINT)
                     BETWEEN 0 AND 50))::BIGINT AS n_violations
        FROM read_parquet('{sf_dir}/events.parquet')
        GROUP BY event_type
    """).fetchall())
    assert got == want


def test_variant_plan_is_jvm_only(spark):
    """The whole point: no Python in the plan. A BatchEvalPython /
    ArrowEvalPython node would mean the path silently regressed to
    UDFs."""
    df = spark.createDataFrame([('{"a": 1}',)], ["j"])
    pred = validate_variant_column(
        F.col("j"),
        {"type": "object", "required": ["a"],
         "properties": {"a": {"type": "integer", "minimum": 0}}})
    plan = df.select(pred.alias("ok"))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan


def test_container_gates_avoid_root_schema_of_variant(spark):
    """Perf guard for the strict-container-cast gates: an object/array
    type gate must never call schema_of_variant on the gated value —
    stringifying a whole document's nested schema cost 1.74s against a
    0.96s parse floor on 4M docs (BENCH/BASELINE.md r4). The gate is
    try_variant_get cast success, which codegen CSE shares with the
    object/array applicators."""
    obj_pred = validate_variant_column(
        F.col("j"), {"type": "object", "required": ["a"]})
    arr_pred = validate_variant_column(
        F.col("j"), {"type": "array", "minItems": 1})
    for pred in (obj_pred, arr_pred):
        assert "schema_of_variant" not in str(pred), str(pred)
    # scalar gates legitimately keep schema_of_variant (lenient casts
    # make cast-success wrong for them) — pin that too so a future
    # "optimize everything to casts" change trips loudly
    s_pred = validate_variant_column(F.col("j"), {"type": "string"})
    assert "schema_of_variant" in str(s_pred)


def test_variant_embedded_id_and_anchor_refs(spark):
    """Base-URI-aware $ref on the VARIANT path (r5): relative refs and
    $anchor targets resolve against the nearest enclosing $id — the
    compile-time analogue of pyvalidator's _base_stack, mirroring the
    reference's add-id-to-table walk (src/reference.lisp:193-238).
    Before this landed these schemas DECLINED to the UDF path."""
    schema = {
        "$id": "https://example.test/root.json",
        "type": "object",
        "properties": {
            "node": {"$ref": "tree.json"},
            "leaf": {"$ref": "tree.json#mark"},
        },
        "$defs": {
            "tree": {
                "$id": "tree.json",
                "type": "object",
                "properties": {
                    "n": {"type": "integer"},
                    "tag": {"$anchor": "mark", "type": "string"},
                },
                "required": ["n"],
            },
        },
    }
    from json_schema_spark.spec import ConstraintSpec
    reg = ConstraintSpec(dict(schema, draft="draft2019-09")).registry
    pred = compile_variant(schema, "draft2019-09", reg)  # must NOT decline
    rows = [
        ('{"node": {"n": 1, "tag": "x"}, "leaf": "ok"}', True),
        ('{"node": {"tag": "x"}}', False),            # missing required n
        ('{"node": {"n": "s"}}', False),              # n wrong type
        ('{"leaf": 7}', False),                       # anchor target: string
        ('{}', True),                                 # both absent: vacuous
    ]
    df = spark.createDataFrame([(j,) for j, _ in rows], ["j"])
    got = [bool(r[0]) for r in
           df.select(pred(F.try_parse_json(F.col("j")))).collect()]
    assert got == [ok for _, ok in rows]


def test_variant_decline_set_is_pinned():
    """The decline set must never silently regrow: across the full
    4-draft corpus ZERO schemas decline to the UDF path (r5: base-URI
    $ref resolution + unevaluated* closed the last ones)."""
    declined = []
    for draft in DRAFTS:
        groups = []
        for fname in (f"{draft}.json", f"gen_{draft}.json"):
            groups.extend(json.loads((VECTOR_DIR / fname).read_text()))
        seen = set()
        for g in groups:
            skey = json.dumps(g["schema"], sort_keys=True)
            if skey in seen:
                continue
            seen.add(skey)
            try:
                compile_variant(g["schema"], draft,
                                _registry_for(g["schema"], draft))
            except VariantUnsupported as e:
                declined.append((draft, g["description"], str(e)))
            except SpecError:
                declined.append((draft, g["description"], "SpecError"))
    assert len(declined) == 0, declined


def test_variant_unevaluated_matches_pyvalidator_twin(spark):
    """Strict + partial unevaluated* on the VARIANT path (r5: three-
    path symmetry): every (schema, instance) verdict must agree with
    the pyvalidator twin — the same differential harness as
    test_unevaluated_strict_compiler, instances serialized to JSON and
    judged entirely JVM-side."""
    from json_schema_spark.pyvalidator import Validator
    from tests.test_unevaluated_strict_compiler import (
        ARR_INSTANCES, ARR_SCHEMAS, MAP_INSTANCES, MAP_SCHEMAS,
    )

    failures = []
    for strict in (False, True):
        for schemas, instances in ((MAP_SCHEMAS, MAP_INSTANCES),
                                   (ARR_SCHEMAS, ARR_INSTANCES)):
            preds = [
                compile_variant(s, "draft2019-09",
                                _registry_for(s, "draft2019-09"),
                                strict=strict)
                for s in schemas
            ]
            rows = [(i, json.dumps(d)) for i, d in enumerate(instances)]
            df = spark.createDataFrame(rows, "i long, j string")
            v = F.try_parse_json(F.col("j"))
            out = df.select("i", *[
                preds[k](v).alias(f"c{k}") for k in range(len(preds))
            ]).orderBy("i").collect()
            for k, schema in enumerate(schemas):
                tw = Validator(schema, draft="draft2019-09",
                               strict_unevaluated=strict)
                for i, data in enumerate(instances):
                    want, got = tw.is_valid(data), out[i][f"c{k}"]
                    if got is None or bool(got) != want:
                        failures.append(
                            f"strict={strict} {schema} :: {data!r} "
                            f"want {want} got {got}")
    assert not failures, "\n".join(failures[:30])
