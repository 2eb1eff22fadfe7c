"""Hostile-scale soak for the WARC-ingest + full-curation family
(round 5 closers): at 1M synthetic pages, (1) build WARC records,
assemble multi-record segments, parse them back and verify byte
identity via aggregate checksums (count, total Content-Length bytes,
md5-prefix sum — no join, aggregate-sized compare), and (2) run the
composed q_pipeline_web_curation end to end. Records wall time,
per-doc throughput, and per-stage task balance (max/median <= 4x bar)
from Spark's own UI metrics — the evidence discipline of BENCH/skew.py
and BENCH/html_scale.py.

Usage: python BENCH/warc_scale.py [n_docs]
Writes BENCH/warc_scale.json and prints the result JSON.
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

from json_schema_spark.operators.html_extract import wrap_page  # noqa: E402
from json_schema_spark.session import get_spark  # noqa: E402
from json_schema_spark.sources.tables import synth_webpages  # noqa: E402
from json_schema_spark.sources.warc import (  # noqa: E402
    assemble_segments,
    parse_warc_records,
    warc_record,
)


def _md5_prefix_sum(col: str):
    """Order-insensitive 60-bit checksum over a string column: sum of
    the first 15 md5 hex chars as bigint (aggregate-sized identity
    evidence without shuffling payloads into a join)."""
    return F.sum(F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10)
                 .cast("decimal(38,0)"))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="jss-warc-soak",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    cache = os.path.join(HERE, ".cache", f"warc_docs_{n_docs}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        (synth_webpages(spark, n_docs)
         .where(F.col("text").isNotNull())
         .select(F.xxhash64("url").alias("doc_id"), "text", "lang")
         .write.mode("overwrite").parquet(cache))
    docs = spark.read.parquet(cache)

    watch = StageWatch()
    results: dict = {"n_docs": n_docs}

    # --- 1. WARC roundtrip at scale -----------------------------------
    i = F.col("doc_id")
    key = F.md5(F.concat(F.lit("k:"), i.cast("string")))
    domain = F.concat(F.lit("src"), F.pmod(i, F.lit(11)).cast("string"),
                      F.lit(".com"))
    uri = F.concat(F.lit("https://"), domain, F.lit("/d/"),
                   i.cast("string"))
    rec_id = F.concat(F.lit("<urn:md5:"), key, F.lit(">"))
    page = wrap_page(F.col("text"), key, domain)

    # expected aggregate identity, straight from the page expression
    exp = docs.select(page.alias("p")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length("p")).alias("bytes"),
        _md5_prefix_sum("p").alias("md5sum")).collect()[0]

    def roundtrip():
        recs = docs.select(i, warc_record(page, uri, rec_id).alias("rec"))
        segs = assemble_segments(recs, F.pmod(i, F.lit(131072)), i)
        parsed = parse_warc_records(segs)
        return parsed.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("content_length").alias("bytes"),
            _md5_prefix_sum("payload").alias("md5sum")).collect()[0]

    got, stats = timed(watch, roundtrip)
    results["warc_roundtrip"] = {
        "records": got.n,
        "docs_per_sec": int(got.n / stats["wall_s"]),
        "payload_bytes": int(got.bytes),
        "identity_ok": (got.n == exp.n and got.bytes == exp.bytes
                        and got.md5sum == exp.md5sum),
        **stats,
    }

    # --- 2. full curation pipeline at scale ---------------------------
    import __spark_entry__ as em

    # the driver query reads {sf_dir}/documents.parquet — point it at a
    # dir whose documents.parquet is the 1M cache
    sf_dir = os.path.join(HERE, ".cache", f"warc_sf_{n_docs}")
    os.makedirs(sf_dir, exist_ok=True)
    link = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(cache, link)
    out, stats = timed(
        watch,
        lambda: em.queries()["pipeline_web_curation"](spark, sf_dir)
        .groupBy("shard").agg(F.count(F.lit(1)).alias("n"),
                              F.sum("n_chars_kept").alias("chars"))
        .collect())
    kept = sum(r.n for r in out)
    results["pipeline_web_curation"] = {
        "kept_docs": kept,
        "shards": len(out),
        "docs_per_sec": int(n_docs / stats["wall_s"]),
        **stats,
    }

    worst = max(
        (s.get("worst_ratio", 0.0), name)
        for name, s in results.items() if isinstance(s, dict)
    )
    results["worst_ratio"] = worst[0]
    results["worst_job"] = worst[1]
    results["pass_4x"] = worst[0] <= 4.0

    with open(os.path.join(HERE, "warc_scale.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
