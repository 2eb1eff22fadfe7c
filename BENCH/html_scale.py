"""Hostile-scale soak for the HTML/link-graph family (round 5): run
html_extract_report, html_metadata_report, link_edges+degree_profile,
and pagerank_hosts over a 1M-page synthetic corpus and record wall
time, per-doc throughput, the byte-identity invariant at scale, and
per-stage task-time balance (max/median <= 4x bar) from Spark's own
UI metrics — the same evidence discipline as BENCH/skew.py.

Usage: python BENCH/html_scale.py [n_docs]
Writes BENCH/html_scale.json and prints the result JSON.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from skew import StageWatch, timed  # noqa: E402

from json_schema_spark.operators.html_extract import (  # noqa: E402
    degree_profile,
    html_extract_report,
    html_metadata_report,
    link_edges,
    pagerank_hosts,
    wrap_page_links,
)
from json_schema_spark.session import get_spark  # noqa: E402
from json_schema_spark.sources.tables import synth_webpages  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="jss-html-soak",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    cache = os.path.join(HERE, ".cache", f"pages_{n_docs}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        synth_webpages(spark, n_docs).write.mode("overwrite").parquet(cache)
    docs = (spark.read.parquet(cache)
            .where(F.col("text").isNotNull())
            .withColumn("doc_id", F.xxhash64("url")))

    watch = StageWatch()
    results: dict = {"n_docs": n_docs}

    # 1. extraction byte-identity at 1M pages
    rep, stats = timed(watch, lambda: html_extract_report(
        docs, "doc_id", "text", "lang").collect())
    total = sum(r.n_docs for r in rep)
    ident = sum(r.n_byte_identical for r in rep)
    results["html_extract"] = {
        "docs": total, "docs_per_sec": int(total / stats["wall_s"]),
        "byte_identical": ident, "identity_ok": ident == total, **stats}

    # 2. metadata profile
    _, stats = timed(watch, lambda: html_metadata_report(
        docs, "doc_id", "text", "lang").collect())
    results["html_metadata"] = {
        "docs_per_sec": int(total / stats["wall_s"]), **stats}

    # 3. link graph over lattice pages (101 domains so the edge/degree
    # tables are bigger than the 7-domain driver fixture)
    i = F.pmod(F.col("doc_id"), F.lit(100_000))
    dom = F.concat(F.lit("d"), F.pmod(i, F.lit(101)).cast("string"),
                   F.lit(".org"))
    links = F.transform(
        F.sequence(F.lit(1), F.pmod(i, F.lit(3)) + 1),
        lambda j: F.concat(F.lit("https://d"),
                           F.pmod(i + j, F.lit(101)).cast("string"),
                           F.lit(".org/p")))
    pages = docs.select(
        dom.alias("src_domain"),
        wrap_page_links(F.col("text"), F.md5(i.cast("string")), dom, links)
        .alias("page"))
    edges = link_edges(pages, F.col("src_domain"), F.col("page"))
    prof, stats = timed(watch, lambda: degree_profile(edges).collect())
    results["link_graph"] = {
        "docs_per_sec": int(total / stats["wall_s"]),
        "domains": len(prof),
        "edges_weighted": int(sum(r.out_links for r in prof)), **stats}

    # 4. pagerank (10 iterations; edge build dominated)
    pr, stats = timed(watch, lambda: pagerank_hosts(
        edges, 0.85, 10).collect())
    results["pagerank_hosts"] = {
        "rank_mass": round(sum(r.pagerank for r in pr), 6), **stats}

    worst = max(
        (s.get("worst_ratio", 0.0), name)
        for name, s in results.items() if isinstance(s, dict)
    )
    results["worst_ratio"] = worst[0]
    results["worst_job"] = worst[1]
    results["pass_4x"] = worst[0] <= 4.0

    out = os.path.join(HERE, "html_scale.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
