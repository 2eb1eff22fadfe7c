"""Hostile-scale soak for the late round-5 operator family:
robots_filter, snapshot_diff, script_mix, mixture_execute,
doc_chunking, corpus_datacard — each driver query run verbatim over a
1M-doc documents table (the same symlinked-sf trick as
BENCH/warc_scale.py), large outputs collapsed through an aggregate so
the driver side stays aggregate-sized.  Records wall, per-doc
throughput, and per-stage task balance (max/median <= 4x bar) from
Spark's own UI metrics — the BENCH/skew.py evidence discipline.

Usage: python BENCH/late_ops_scale.py [n_docs]
Writes BENCH/late_ops_scale.json and prints the result JSON.
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

from json_schema_spark.session import get_spark  # noqa: E402
from json_schema_spark.sources.tables import synth_webpages  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="jss-lateops-soak",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    # documents-shaped 1M cache (doc_id, text, lang, source, n_chars)
    cache = os.path.join(HERE, ".cache", f"lateops_docs_{n_docs}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        (synth_webpages(spark, n_docs)
         .select(
             F.xxhash64("url").alias("doc_id"), "text", "lang",
             F.concat(F.lit("src"),
                      F.pmod(F.xxhash64("url"), F.lit(20)).cast("string"))
             .alias("source"),
             F.char_length("text").alias("n_chars"))
         .write.mode("overwrite").parquet(cache))
    sf_dir = os.path.join(HERE, ".cache", f"lateops_sf_{n_docs}")
    os.makedirs(sf_dir, exist_ok=True)
    link = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(cache, link)

    import __spark_entry__ as em
    qs = em.queries()

    # untimed warmup: first-ever job pays JVM JIT + codegen compile,
    # which otherwise lands as a phantom straggler in the first timed
    # stage (same discipline as bench.py)
    spark.read.parquet(cache).agg(F.count(F.lit(1))).collect()

    # (name, collapse) — collapse turns per-doc outputs into an
    # aggregate-sized driver result; None collects as-is
    jobs = [
        ("robots_filter", lambda d: d.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("allowed").cast("long")).alias("n_allowed"))),
        ("snapshot_diff", None),
        ("script_mix", lambda d: d.groupBy("dominant").count()),
        ("mixture_execute", None),
        ("doc_chunking", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("tokens"))),
        ("corpus_datacard", None),
    ]
    watch = StageWatch()
    results: dict = {"n_docs": n_docs}
    for name, collapse in jobs:
        def run(name=name, collapse=collapse):
            df = qs[name](spark, sf_dir)
            if collapse is not None:
                df = collapse(df)
            return df.collect()

        rows, stats = timed(watch, run)
        results[name] = {
            "out_rows": len(rows),
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

    with open(os.path.join(HERE, "late_ops_scale.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
