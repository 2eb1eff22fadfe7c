"""Dynamic-JSON validation path shootout: Arrow-UDF vs native VARIANT.

The engine has three validation paths for the same semantics
(SURVEY.md §2): typed columns (compiler.py), dynamic JSON via the
Arrow-batched pandas-UDF validator (pyvalidator.py), and — new in
round 4 — dynamic JSON compiled to JVM-side VARIANT expressions
(compiler_variant.py). This bench measures the docs/sec of the two
DYNAMIC paths on an identical synthetic JSON corpus and asserts they
agree on every row's verdict before timing anything, so the speedup
figure is for a like-for-like semantic workload.

The corpus is generated deterministically JVM-side (pure id
arithmetic — no Python generation cost, no RNG) and exercises the
keyword families the schema declares: required-absence, enum, type
(string-for-number), minimum/maximum, pattern, per-item minLength,
additionalProperties, nested-object required/minimum.

Usage: python BENCH/json_paths.py [n_docs]
Writes BENCH/json_paths.json; bench.py folds the speedup scalar into
its contract line.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from json_schema_spark.session import get_spark  # noqa: E402

SCHEMA = {
    "type": "object",
    "required": ["url", "lang", "score"],
    "properties": {
        "url": {"type": "string", "pattern": "^https://",
                "minLength": 10, "maxLength": 200},
        "lang": {"enum": ["en", "de", "fr", "es"]},
        "score": {"type": "number", "minimum": 0, "maximum": 1},
        "tags": {"type": "array", "maxItems": 8,
                 "items": {"type": "string", "minLength": 1}},
        "meta": {"type": "object", "required": ["views"],
                 "properties": {"views": {"type": "integer", "minimum": 0}}},
    },
    "additionalProperties": False,
}


def synth_json(spark, n_docs: int):
    """n_docs JSON docs as one string column, deterministic by id.

    Built with concat (not to_json of a struct) because violations
    need SHAPE variety — missing keys, wrong types, extra keys — that
    a fixed struct cannot express."""
    c = F.col("id")
    s = c.cast("string")

    url = F.concat(
        F.when(c % 11 == 0, F.lit('"url":"http://example.com/'))  # pattern viol
        .otherwise(F.lit('"url":"https://example.com/')),
        s, F.lit('"'))
    lang = (
        F.when(c % 7 == 0, F.lit(""))                      # required viol
        .when(c % 13 == 0, F.lit(',"lang":"zz"'))          # enum viol
        .otherwise(F.concat(
            F.lit(',"lang":"'),
            F.element_at(F.array(F.lit("en"), F.lit("de"),
                                 F.lit("fr"), F.lit("es")),
                         (c % 4 + 1).cast("int")),
            F.lit('"'))))
    score = (
        F.when(c % 17 == 0, F.lit(',"score":1.5'))         # maximum viol
        .when(c % 19 == 0, F.lit(',"score":"high"'))       # type viol
        .otherwise(F.concat(F.lit(',"score":0.'),
                            F.lpad((c % 100).cast("string"), 2, "0"))))
    tags = (
        F.when(c % 23 == 0, F.lit(',"tags":["a",""]'))     # item minLength viol
        .when(c % 3 == 0, F.lit(',"tags":["news","web"]'))
        .otherwise(F.lit("")))
    meta = (
        F.when(c % 29 == 0, F.lit(',"meta":{"views":-3}'))  # nested min viol
        .otherwise(F.concat(F.lit(',"meta":{"views":'),
                            (c % 1000).cast("string"), F.lit("}"))))
    extra = F.when(c % 31 == 0, F.lit(',"extra":1')) \
        .otherwise(F.lit(""))                               # additionalProps viol

    return spark.range(n_docs).select(
        F.concat(F.lit("{"), url, lang, score, tags, meta, extra,
                 F.lit("}")).alias("doc"))


def _corpus(spark, n_docs: int) -> str:
    cache = os.path.join(HERE, ".cache", f"jsonevents_{n_docs}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        synth_json(spark, n_docs).write.mode("overwrite").parquet(cache)
    return cache


def _timed(spark, path: str, ok_col_fn, reps: int = 3, warmups: int = 2):
    """Median docs/sec of a full validation pass (count + valid-sum —
    forces every row through the predicate). Fresh DataFrame per rep
    so AQE stage reuse cannot skip work."""
    def one():
        df = spark.read.parquet(path)
        t0 = time.perf_counter()
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(ok_col_fn(F.col("doc")).cast("long")).alias("n_valid"),
        ).collect()[0]
        return time.perf_counter() - t0, row["n"], row["n_valid"]
    for _ in range(warmups):
        one()
    runs = sorted(one() for _ in range(reps))
    wall, n, n_valid = runs[len(runs) // 2]
    return wall, n, n_valid


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark(app_name="jss-json-paths",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    path = _corpus(spark, n_docs)

    from json_schema_spark.compiler_variant import validate_variant_column
    from json_schema_spark.pyvalidator import validate_json_udf

    udf = validate_json_udf(SCHEMA, draft="draft7")

    def udf_ok(col):
        return udf(col)["valid"]

    def variant_ok(col):
        return validate_variant_column(col, SCHEMA, draft="draft7")

    # the two paths must be row-equal BEFORE any timing is trusted
    n_disagree = spark.read.parquet(path).select(
        F.sum((udf_ok(F.col("doc")) != variant_ok(F.col("doc")))
              .cast("long")).alias("d")).collect()[0]["d"]
    assert n_disagree == 0, f"paths disagree on {n_disagree} rows"

    def parse_floor_ok(col):
        # the irreducible cost of the VARIANT path: parse every doc,
        # touch the variant once. Validation overhead = variant pass
        # minus this floor.
        return F.parse_json(col).isNotNull()

    wall_u, n_u, valid_u = _timed(spark, path, udf_ok)
    wall_v, n_v, valid_v = _timed(spark, path, variant_ok)
    assert (n_u, valid_u) == (n_v, valid_v)
    wall_f, _, _ = _timed(spark, path, parse_floor_ok)

    result = {
        "n_docs": n_docs,
        "n_valid": int(valid_u),
        "udf_docs_per_sec": round(n_docs / wall_u),
        "udf_wall_s": round(wall_u, 3),
        "variant_docs_per_sec": round(n_docs / wall_v),
        "variant_wall_s": round(wall_v, 3),
        "variant_speedup": round(wall_u / wall_v, 2),
        "parse_floor_docs_per_sec": round(n_docs / wall_f),
        "parse_floor_wall_s": round(wall_f, 3),
        # fraction of the variant pass spent ABOVE the parse floor —
        # how much headroom predicate optimization has left
        "predicate_overhead_frac": round((wall_v - wall_f) / wall_v, 3),
    }
    print(json.dumps(result))
    with open(os.path.join(HERE, "json_paths.json"), "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
