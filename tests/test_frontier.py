"""Crawl-frontier generation (html_extract.py:crawl_frontier): hand
fixture with known anchors, fetched-ledger removal, per-host politeness
cap, unknown-host default score, and the broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from json_schema_spark.operators.html_extract import (
    crawl_frontier,
    wrap_page_links,
)


def _pages(spark, rows):
    """rows: (doc_id, [absolute hrefs])."""
    df = spark.createDataFrame(rows, "doc_id INT, links ARRAY<STRING>")
    page = wrap_page_links(
        F.lit("body text"), F.md5(F.col("doc_id").cast("string")),
        F.lit("src.com"), F.col("links"))
    return df.select("doc_id", page.alias("page"))


def _run(spark, rows, fetched, scores, k=10):
    pages = _pages(spark, rows)
    fdf = spark.createDataFrame([(u,) for u in fetched] or [("",)],
                                "url STRING")
    sdf = spark.createDataFrame(list(scores.items()) or [("", 0.0)],
                                "host STRING, host_score DOUBLE")
    out = crawl_frontier(pages, F.col("page"), fdf, sdf, k_per_host=k)
    return {r["url"]: (r["host"], r["n_refs"], r["host_score"],
                       r["rank_in_domain"])
            for r in out.collect()}


def test_discovery_dedup_and_fetched_removal(spark):
    got = _run(
        spark,
        rows=[
            (1, ["https://a.com/x", "https://a.com/y"]),
            (2, ["https://a.com/x", "https://b.com/z#frag"]),
            (3, ["/relative", "mailto:x@y.z", "https://a.com/x"]),
        ],
        fetched=["https://a.com/y"],
        scores={"a.com": 0.5},
    )
    # a.com/x referenced 3x, ranked first; fragment stripped; fetched
    # /y removed; relative + mailto ignored; b.com unknown -> score 0
    assert got == {
        "https://a.com/x": ("a.com", 3, 0.5, 1),
        "https://b.com/z": ("b.com", 1, 0.0, 1),
    }


def test_politeness_cap_and_rank_order(spark):
    # one host, 5 candidate urls with n_refs 3,2,1,1,1 -> cap at 2
    rows = []
    rid = 0
    for url, refs in [("https://h.com/a", 3), ("https://h.com/b", 2),
                      ("https://h.com/c", 1), ("https://h.com/d", 1),
                      ("https://h.com/e", 1)]:
        for _ in range(refs):
            rid += 1
            rows.append((rid, [url]))
    got = _run(spark, rows, fetched=[], scores={"h.com": 1.0}, k=2)
    assert got == {
        "https://h.com/a": ("h.com", 3, 1.0, 1),
        "https://h.com/b": ("h.com", 2, 1.0, 2),
    }


def test_rank_tiebreak_is_url_ascending(spark):
    rows = [(1, ["https://h.com/z", "https://h.com/a"])]
    got = _run(spark, rows, fetched=[], scores={}, k=1)
    assert got == {"https://h.com/a": ("h.com", 1, 0.0, 1)}


def test_plan_broadcasts_host_scores(spark):
    pages = _pages(spark, [(1, ["https://a.com/x"])])
    fdf = spark.createDataFrame([("u",)], "url STRING")
    sdf = spark.createDataFrame([("a.com", 1.0)],
                                "host STRING, host_score DOUBLE")
    out = crawl_frontier(pages, F.col("page"), fdf, sdf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan          # host_scores re-entry
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
