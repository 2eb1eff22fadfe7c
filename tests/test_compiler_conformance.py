"""Column-compiler conformance: the SAME vendored vectors, but each
case's `data` becomes a typed one-column row and the compiled Column
predicate must reproduce `valid` (SURVEY.md §5.1).

Cases whose data cannot live in a typed column are skipped with a
reason (heterogeneous arrays/enums, null data — NULL means *absent* in
the engine by design, SURVEY.md §1.1). Everything else must agree with
the pure-Python reference-parity validator.

Execution posture: one Spark job per dtype bucket — all cases of a
bucket become rows of one DataFrame and every case's predicate becomes
one select column; we read the (row i, column i) diagonal. ~6 jobs for
the whole suite instead of ~150.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from json_schema_spark.compiler import _schema_pred
from json_schema_spark.spec import ConstraintSpec, SpecError

VECTOR_DIR = Path(__file__).parent / "vectors"
DRAFTS = ["draft7", "draft2019-09", "draft4", "draft6"]


def infer_dtype(v):
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, str):
        return T.StringType()
    if isinstance(v, list):
        if not v:
            return T.ArrayType(T.LongType())
        elem_types = {type(infer_dtype(x)) for x in v}
        if len(elem_types) != 1 or isinstance(v[0], (list, dict)):
            inner = infer_dtype(v[0])
            if all(infer_dtype(x).simpleString() == inner.simpleString() for x in v):
                return T.ArrayType(inner)
            # int+float mix -> double array
            if elem_types <= {T.LongType, T.DoubleType}:
                return T.ArrayType(T.DoubleType())
            return None
        if elem_types == {T.LongType} :
            return T.ArrayType(T.LongType())
        return T.ArrayType(infer_dtype(v[0]))
    if isinstance(v, dict):
        vts = {infer_dtype(x).simpleString() if x is not None and infer_dtype(x) else None
               for x in v.values()}
        vts.discard(None)
        if len(vts) > 1:
            return None
        inner = infer_dtype(next((x for x in v.values() if x is not None), 0)) \
            if v else T.LongType()
        if inner is None:
            return None
        return T.MapType(T.StringType(), inner, valueContainsNull=True)
    return None  # null data: engine treats NULL as absent — out of scope


def norm(v, dt):
    """Coerce python value to the bucket dtype (1 -> 1.0 in double arrays)."""
    if isinstance(dt, T.DoubleType) and isinstance(v, int) and not isinstance(v, bool):
        return float(v)
    if isinstance(dt, T.ArrayType):
        return [norm(x, dt.elementType) for x in v]
    if isinstance(dt, T.MapType):
        return {k: (None if x is None else norm(x, dt.valueType)) for k, x in v.items()}
    return v


def collect_cases():
    for draft in DRAFTS:
        groups = json.loads((VECTOR_DIR / f"{draft}.json").read_text())
        for g in groups:
            for case in g["tests"]:
                yield draft, g["schema"], g["description"], case


def test_column_compiler_reproduces_vectors(spark):
    buckets: dict[str, list] = {}
    n_skipped = 0
    for draft, schema, gdesc, case in collect_cases():
        dt = infer_dtype(case["data"])
        if dt is None:
            n_skipped += 1
            continue
        buckets.setdefault(f"{draft}\x00{dt.simpleString()}", []).append(
            (dt, schema, case, f"{gdesc}::{case['description']}")
        )

    failures, n_run = [], 0
    for key, cases in buckets.items():
        draft = key.split("\x00")[0]
        dt = cases[0][0]
        row_schema = T.StructType([
            T.StructField("i", T.LongType()),
            T.StructField("v", dt),
            T.StructField("expected", T.BooleanType()),
        ])
        probe = spark.createDataFrame([], row_schema)  # analysis-only checks
        rows, preds, labels = [], [], []
        for idx, (dt_, schema, case, label) in enumerate(cases):
            try:
                pred = _schema_pred(
                    schema, dt, draft,
                    ConstraintSpec(dict(schema, draft=draft) if isinstance(schema, dict) else {"draft": draft}),
                )(F.col("v"))
                probe.select(pred)  # raises AnalysisException if untypeable
            except AssertionError:
                raise
            except Exception:  # unrepresentable on this typed column
                n_skipped += 1
                pred = None
            preds.append(pred)
            labels.append(label)
            rows.append((idx, norm(case["data"], dt), case["valid"]))

        df = spark.createDataFrame(rows, row_schema)
        sel = [F.col("i"), F.col("expected")] + [
            (p.alias(f"c{j}") if p is not None else F.lit(None).cast("boolean").alias(f"c{j}"))
            for j, p in enumerate(preds)
        ]
        for r in df.select(*sel).collect():
            j = r["i"]
            got = r[f"c{j}"]
            if got is None:
                continue  # compile-skip
            n_run += 1
            if bool(got) != r["expected"]:
                failures.append(f"{key}: {labels[j]} -> got {got}, want {r['expected']}")

    assert not failures, "\n".join(failures)
    # the column path must exercise the clear majority of the suite
    assert n_run >= 120, f"only {n_run} cases ran on the column path"
