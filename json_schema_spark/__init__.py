"""json_schema_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the semantics of fisxoj/json-schema
(a Common Lisp JSON Schema validator for drafts 4/6/7/2019-09) as a
distributed, columnar constraint engine:

* per-keyword validators (reference: src/validators.lisp) compile to
  Spark SQL ``Column`` predicates evaluated JVM-side under whole-stage
  codegen (:mod:`json_schema_spark.compiler`);
* dynamic-shape JSON documents are validated by a vectorized,
  Arrow-batched pandas UDF wrapping a pure-Python validator with
  reference-parity semantics (:mod:`json_schema_spark.pyvalidator`);
* dataset-level generalizations — column stats, uniqueness, referential
  checks, distribution drift — live in
  :mod:`json_schema_spark.operators`;
* checkpoint/resumable per-partition runs in
  :mod:`json_schema_spark.plans.runner`.

Nothing here ports the reference's execution model (single-threaded
recursive descent); only its observable semantics are preserved.
"""

from json_schema_spark.spec import ConstraintSpec, SpecRegistry
from json_schema_spark.compiler import compile_spec, violations_df, verdict_df

__all__ = [
    "ConstraintSpec",
    "SpecRegistry",
    "compile_spec",
    "violations_df",
    "verdict_df",
]

__version__ = "0.1.0"
