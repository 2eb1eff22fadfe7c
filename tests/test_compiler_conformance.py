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
        if -(2**63) <= v < 2**63:
            return T.LongType()
        # bignum path (t/draft7.lisp:82 optional/bignum): DecimalType
        return T.DecimalType(38, 0) if len(str(abs(v))) <= 38 else None
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, str):
        return T.StringType()
    if isinstance(v, list):
        if not v:
            return T.ArrayType(T.LongType())
        inners = [infer_dtype(x) for x in v]
        if any(x is None for x in inners):
            return None  # e.g. [None]: null elements are out of column scope
        elem_types = {type(i) for i in inners}
        if len(elem_types) != 1 or isinstance(v[0], (list, dict)):
            inner = inners[0]
            if all(i.simpleString() == inner.simpleString() for i in inners):
                return T.ArrayType(inner)
            # int+float mix -> double array
            if elem_types <= {T.LongType, T.DoubleType}:
                return T.ArrayType(T.DoubleType())
            return None
        return T.ArrayType(inners[0])
    if isinstance(v, dict):
        if any(x is None for x in v.values()):
            # a null map value reads as ABSENT under the engine's
            # NULL-as-absent convention (SURVEY.md §1.1) — JSON null
            # property semantics are out of typed-column scope
            return None
        value_dts = [infer_dtype(x) for x in v.values() if x is not None]
        if any(dt is None for dt in value_dts):
            return None  # an untypeable value (e.g. recursive nesting)
        vts = {dt.simpleString() for dt in value_dts}
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
    if isinstance(dt, T.DecimalType):
        import decimal
        return decimal.Decimal(v)
    if isinstance(dt, T.ArrayType):
        return [norm(x, dt.elementType) for x in v]
    if isinstance(dt, T.MapType):
        return {k: (None if x is None else norm(x, dt.valueType)) for k, x in v.items()}
    return v


def collect_cases():
    for draft in DRAFTS:
        for fname in (f"{draft}.json", f"gen_{draft}.json"):
            groups = json.loads((VECTOR_DIR / fname).read_text())
            for g in groups:
                for case in g["tests"]:
                    yield draft, g["schema"], g["description"], case


def _has_fractional_multiple_of(schema) -> bool:
    if isinstance(schema, dict):
        mo = schema.get("multipleOf")
        if isinstance(mo, float) and mo != int(mo):
            return True
        return any(_has_fractional_multiple_of(v) for v in schema.values())
    if isinstance(schema, list):
        return any(_has_fractional_multiple_of(v) for v in schema)
    return False


def _huge_inexact_multiple_of(schema, data) -> bool:
    return (isinstance(data, (int, float)) and not isinstance(data, bool)
            and abs(data) > 1e26 and _has_fractional_multiple_of(schema))


def test_column_compiler_reproduces_vectors(spark):
    buckets: dict[str, list] = {}
    n_skipped = 0
    for draft, schema, gdesc, case in collect_cases():
        dt = infer_dtype(case["data"])
        if dt is None:
            n_skipped += 1
            continue
        if _huge_inexact_multiple_of(schema, case["data"]):
            # |x| > 1e26 with a fractional divisor: the column holds a
            # binary double whose exact value differs from the decimal
            # literal the corpus labeled — same float-exactness class
            # the reference itself skips (t/draft7.lisp:54-55).
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
            T.StructField("g", T.LongType()),
            T.StructField("v", dt),
            T.StructField("expected", T.BooleanType()),
        ])
        probe = spark.createDataFrame([], row_schema)  # analysis-only checks
        # one compiled predicate per DISTINCT schema in the bucket —
        # the corpus reuses each schema for ~50 instances, so deduping
        # cuts compile+analysis work ~50x
        preds, pred_idx = [], {}
        rows, labels = [], []
        for idx, (dt_, schema, case, label) in enumerate(cases):
            skey = json.dumps(schema, sort_keys=True)
            if skey not in pred_idx:
                try:
                    pred = _schema_pred(
                        schema, dt, draft,
                        ConstraintSpec(dict(schema, draft=draft) if isinstance(schema, dict) else {"draft": draft}),
                    )(F.col("v"))
                    probe.select(pred)  # raises AnalysisException if untypeable
                except AssertionError:
                    raise
                except Exception:  # unrepresentable on this typed column
                    pred = None
                pred_idx[skey] = len(preds)
                preds.append(pred)
            g = pred_idx[skey]
            if preds[g] is None:
                n_skipped += 1
            labels.append(label)
            rows.append((idx, g, norm(case["data"], dt), case["valid"]))

        df = spark.createDataFrame(rows, row_schema)
        sel = [F.col("i"), F.col("g"), F.col("expected")] + [
            (p.alias(f"c{j}") if p is not None else F.lit(None).cast("boolean").alias(f"c{j}"))
            for j, p in enumerate(preds)
        ]
        for r in df.select(*sel).collect():
            got = r[f"c{r['g']}"]
            if got is None:
                continue  # compile-skip
            n_run += 1
            if bool(got) != r["expected"]:
                failures.append(f"{key}: {labels[r['i']]} -> got {got}, want {r['expected']}")

    assert not failures, "\n".join(failures)
    # the column path must exercise the clear majority of the suite
    assert n_run >= 5000, f"only {n_run} cases ran on the column path"
