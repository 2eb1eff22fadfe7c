"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's operators (SURVEY.md §2) as (spark, sf_dir) ->
DataFrame callables plus DuckDB oracle SQL for the correctness gate.

The engine itself lives in ``json_schema_spark/``; this module only
wires it to the driver-provided tables (TESTDATA.md): `documents`
(doc_id, text, lang, source, n_chars), `embeddings`
(vec_id, embedding float[64], label), `events`, and the TPC-H-ish
star schema.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from json_schema_spark import compile_spec, verdict_df, violations_df
from json_schema_spark.operators.drift import chi2_by_partition, ks_stat
from json_schema_spark.operators.referential import referential_violations
from json_schema_spark.operators.stats import column_stats
from json_schema_spark.operators.unique import duplicate_keys

SF0001 = "/root/testdata/sf0.001"

# Constraint spec over the driver `documents` table, using the
# reference keyword vocabulary (bounds chosen so violations EXIST in
# the data: n_chars spans ~48..553).
DOC_SPEC = {
    "$id": "https://example.com/driver-documents.json",
    "draft": "draft7",
    "columns": {
        "doc_id": {"type": "integer", "minimum": 0},
        "text": {"type": "string", "minLength": 50, "maxLength": 400},
        "lang": {"enum": ["en", "de", "fr", "es"]},
        "source": {"type": "string", "pattern": "^src\\d+$"},
        "n_chars": {"minimum": 50, "maximum": 400},
    },
    "required": ["doc_id", "text", "lang", "source", "n_chars"],
}

# (column, keyword, duckdb fail-predicate) — keep in LOCKSTEP with
# DOC_SPEC; used to generate the oracle SQL for the violation queries.
_DOC_CHECKS_SQL = [
    ("doc_id", "minimum", "doc_id IS NOT NULL AND doc_id < 0"),
    ("text", "minLength", "text IS NOT NULL AND length(text) < 50"),
    ("text", "maxLength", "text IS NOT NULL AND length(text) > 400"),
    ("lang", "enum", "lang IS NOT NULL AND lang NOT IN ('en','de','fr','es')"),
    ("source", "pattern", "source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]+$')"),
    ("n_chars", "minimum", "n_chars IS NOT NULL AND n_chars < 50"),
    ("n_chars", "maximum", "n_chars IS NOT NULL AND n_chars > 400"),
    ("doc_id", "required", "doc_id IS NULL"),
    ("text", "required", "text IS NULL"),
    ("lang", "required", "lang IS NULL"),
    ("source", "required", "source IS NULL"),
    ("n_chars", "required", "n_chars IS NULL"),
]
# checks that compile to vacuous-true on this physical schema are
# omitted from the Spark check list too (type string/integer on
# matching physical types fold away) — EXCEPT 'type' checks that stay
# runtime-relevant; here all `type` gates are statically satisfied, so
# neither side emits them. doc_id/minimum stays (runtime check).

_ALLOWED_LANGS = ("en", "de", "fr")  # ref-check allow-list (zh+es violate)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _read(name: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    return fn


def _compiled(spark: SparkSession, sf_dir: str):
    df = _docs(spark, sf_dir)
    # `type` checks on physically-typed columns are static truths; drop
    # them from the emitted list so query output matches the oracle.
    compiled = compile_spec(DOC_SPEC, df)
    compiled.checks = [c for c in compiled.checks if c.keyword != "type"]
    return df, compiled


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_constraint_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full keyword-set constraint pass, per-check verdicts
    in one aggregation (SURVEY.md §2.1/§2.7)."""
    df, compiled = _compiled(spark, sf_dir)
    return verdict_df(df, compiled).select(
        F.col("column").alias("col_name"),
        F.col("keyword"),
        F.col("n_violations"),
        F.col("n_rows"),
        F.col("pass").alias("check_pass"),
    )


def q_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation rows (error-accumulation semantics: every failed
    keyword yields a row, src/validators.lisp:105-108)."""
    df, compiled = _compiled(spark, sf_dir)
    v = violations_df(df, compiled, id_cols=["doc_id"])
    return v.select(
        F.col("doc_id"),
        F.col("column").alias("col_name"),
        F.col("keyword"),
    )


def q_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-lang stats (null rate, min/max/avg, distincts)."""
    df = _docs(spark, sf_dir)
    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


def q_stats_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup stats pass: per (lang, source) + per lang + grand total
    in ONE shuffle (north_star 'single groupBy-rollup pass')."""
    df = _docs(spark, sf_dir)
    return (
        df.rollup("lang", "source")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def q_unique_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage uniqueness on (lang, n_chars): keys with >1 row
    (dataset-level uniqueItems, src/validators.lisp:632-639)."""
    df = _docs(spark, sf_dir)
    return duplicate_keys(df, ["lang", "n_chars"], salt_width=8,
                          salt_source="doc_id")


def q_ref_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential check: langs outside the allow-list dimension via
    broadcast left-anti join ($ref-miss analogue, SURVEY.md §2.4)."""
    df = _docs(spark, sf_dir)
    dim = spark.createDataFrame([(c,) for c in _ALLOWED_LANGS], ["lang_code"])
    miss = referential_violations(df, dim, key="lang", dim_key="lang_code")
    return miss.select("doc_id", "lang")


def q_drift_chi2_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square drift of lang distribution per source vs pooled."""
    df = _docs(spark, sf_dir)
    return chi2_by_partition(df, "lang", "source").select(
        F.col("partition").alias("part"),
        F.col("chi2"),
        F.col("dof"),
        F.col("n_rows"),
    )


def q_drift_ks_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS of n_chars between src0 and src1."""
    df = _docs(spark, sf_dir)
    return ks_stat(df, "n_chars", "source", "src0", "src1")


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (scan + filter + hash agg)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join + agg + top-N (broadcast dims)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
              orders.o_custkey == F.col("c_custkey"))
        .where(F.col("o_orderdate") < F.lit("1995-03-15"))
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full keyword-set constraint pass on sf0.001."""
    return q_constraint_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "constraint_summary": q_constraint_summary,
        "constraint_violations": q_constraint_violations,
        "column_stats": q_column_stats,
        "stats_rollup": q_stats_rollup,
        "unique_check": q_unique_check,
        "ref_lang": q_ref_lang,
        "drift_chi2_lang": q_drift_chi2_lang,
        "drift_ks_chars": q_drift_ks_chars,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _violations_union_sql() -> str:
    parts = [
        f"SELECT doc_id, '{col}' AS col_name, '{kw}' AS keyword "
        f"FROM documents WHERE {pred}"
        for col, kw, pred in _DOC_CHECKS_SQL
    ]
    return " UNION ALL ".join(parts)


def _summary_sql() -> str:
    parts = [
        f"SELECT '{col}' AS col_name, '{kw}' AS keyword, "
        f"count(*) FILTER (WHERE {pred}) AS n_violations, "
        f"count(*) AS n_rows, "
        f"count(*) FILTER (WHERE {pred}) = 0 AS check_pass "
        f"FROM documents"
        for col, kw, pred in _DOC_CHECKS_SQL
    ]
    return " UNION ALL ".join(parts)


def oracle_sql() -> dict[str, str]:
    return {
        "constraint_summary": _summary_sql(),
        "constraint_violations": _violations_union_sql(),
        "column_stats": """
            SELECT lang,
                   count(*) AS n_rows,
                   count(*) FILTER (WHERE text IS NULL) AS n_null_text,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars,
                   round(avg(n_chars), 4) AS avg_chars,
                   count(DISTINCT source) AS n_sources
            FROM documents GROUP BY lang
        """,
        "stats_rollup": """
            SELECT lang, source,
                   GROUPING(lang, source) AS gid,
                   count(*) AS n_rows,
                   sum(n_chars) AS sum_chars,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars
            FROM documents GROUP BY ROLLUP (lang, source)
        """,
        "unique_check": """
            SELECT lang, n_chars, count(*) AS dup_count
            FROM documents GROUP BY lang, n_chars HAVING count(*) > 1
        """,
        "ref_lang": """
            SELECT doc_id, lang FROM documents
            WHERE lang IS NOT NULL AND lang NOT IN ('en','de','fr')
        """,
        "drift_chi2_lang": """
            WITH cells AS (
              SELECT source AS part, lang AS cat, count(*) AS obs
              FROM documents
              WHERE lang IS NOT NULL AND source IS NOT NULL
              GROUP BY 1, 2),
            pt AS (SELECT part, sum(obs) AS n_part FROM cells GROUP BY 1),
            ct AS (SELECT cat, sum(obs) AS n_cat FROM cells GROUP BY 1),
            g AS (SELECT sum(obs) AS n_total FROM cells)
            SELECT part,
                   round(sum(pow(obs - n_part*n_cat/n_total, 2)
                             / (n_part*n_cat/n_total)), 4) AS chi2,
                   count(*) - 1 AS dof,
                   max(n_part) AS n_rows
            FROM cells JOIN pt USING (part) JOIN ct USING (cat) CROSS JOIN g
            GROUP BY part
        """,
        "drift_ks_chars": """
            WITH t AS (
              SELECT n_chars AS v,
                     CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_a
              FROM documents
              WHERE source IN ('src0','src1') AND n_chars IS NOT NULL),
            pv AS (SELECT v, sum(is_a) AS cnt_a, sum(1 - is_a) AS cnt_b
                   FROM t GROUP BY v),
            cdf AS (SELECT sum(cnt_a) OVER (ORDER BY v) AS cum_a,
                           sum(cnt_b) OVER (ORDER BY v) AS cum_b
                    FROM pv),
            tot AS (SELECT max(cum_a) AS na, max(cum_b) AS nb FROM cdf)
            SELECT max(na) AS n_a, max(nb) AS n_b,
                   round(max(abs(cum_a / na - cum_b / nb)), 6) AS ks
            FROM cdf CROSS JOIN tot
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
    }
