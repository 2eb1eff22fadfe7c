"""Hostile-scale soak for the session's closer operators:
bpe_train, bpe_token_counts, fuzzy_contamination, crawl_frontier,
calibration_sweep, minhash_fidelity — each driver query run verbatim
over a 1M-doc documents table (the BENCH/late_ops_scale.py recipe:
symlinked-sf cache, large outputs collapsed through an aggregate, and
per-stage task balance from Spark's own UI metrics against the
max/median <= 4x bar).

Usage: python BENCH/new_ops_scale.py [n_docs]
Writes BENCH/new_ops_scale.json and prints the result JSON.
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
    # heap scales with cores unless the caller overrides (run_pass.py
    # precedent — a 32-thread soak OOMs at the 8g session default)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM",
                          f"{2 * (os.cpu_count() or 8)}g")
    spark = get_spark(app_name="jss-newops-soak",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    # doc_id must be dense AND unique — the driver fixtures cap their
    # audit samples with doc_id range predicates sized for the
    # testdata's dense ids (raw xxhash64 ids put half the corpus under
    # any literal bound: the minhash_fidelity exact-Jaccard audit
    # ballooned to 166k docs), and COLLIDING ids (a pmod fold) merge
    # two texts into one "document", which breaks pair-Jaccard
    # arithmetic (n_inter can exceed per-doc gram counts -> 0/0).
    # One global row_number is a one-time cache-build cost, not a
    # measured shape.
    from pyspark.sql import Window

    cache = os.path.join(HERE, ".cache", f"newops_docs_{n_docs}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        (synth_webpages(spark, n_docs)
         .select(
             (F.row_number().over(Window.orderBy("url", "warc_ts")) - 1)
             .alias("doc_id"),
             "text", "lang",
             F.concat(F.lit("src"),
                      F.pmod(F.xxhash64("url"), F.lit(20)).cast("string"))
             .alias("source"),
             F.char_length("text").alias("n_chars"))
         .repartition(64)
         .write.mode("overwrite").parquet(cache))
    sf_dir = os.path.join(HERE, ".cache", f"newops_sf_{n_docs}")
    os.makedirs(sf_dir, exist_ok=True)
    link = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(cache, link)

    import __spark_entry__ as em
    qs = em.queries()

    spark.read.parquet(cache).agg(F.count(F.lit(1))).collect()

    jobs = [
        # merge table is 8 rows — already driver-sized
        ("bpe_train", None),
        ("bpe_token_counts", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_subtokens").alias("subtokens"))),
        ("fuzzy_contamination", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("edit_dist").alias("min_dist"))),
        ("crawl_frontier", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum("n_refs").alias("refs"))),
        # 21 threshold rows — driver-sized
        ("calibration_sweep", None),
        ("minhash_fidelity", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("abs_err"), 6).alias("mean_abs_err"),
            F.round(F.max("abs_err"), 6).alias("max_abs_err"))),
        # vocab/fingerprint family (corpus-scale explodes + groupBys;
        # winnow/postings run their fixed-size driver samples)
        ("heaps_profile", None),           # 16 rows
        ("zipf_profile", None),            # top-100 rows
        ("winnow_fingerprint", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.countDistinct("doc_id").alias("n_docs"))),
        ("postings_index", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_postings"),
            F.sum("n_occ").alias("n_occurrences"))),
        ("nfc_audit", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_docs_audited"),
            F.sum(F.col("changed").cast("int")).alias("n_changed"))),
        ("winnow_near_dup", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.max("n_shared").alias("max_shared"))),
        ("readability", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("fre"), 4).alias("mean_fre"))),
        # full corpus: jaccard pair graph + components + assignment
        ("leakage_safe_split", None),      # 3 rows
        # multi-query BM25 + graded metrics (one row per qid)
        ("retrieval_eval", None),
        # page build + (href, text) extraction + per-host top-5
        ("anchor_text", None),             # 7 hosts x 5 rows
        # full-corpus explode -> (doc, type) counts -> entropy fold
        ("token_entropy", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("norm_entropy"), 6).alias("mean_norm_h"))),
        # unigram + bigram counts -> vocab joins -> top-50 (50 rows)
        ("pmi_collocations", None),
        # key-normalize projection + min-rep agg + reused-exchange join
        ("bitext_candidates", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("pair_key").alias("n_keys"))),
        # trigram explode + five broadcast lookups + per-doc fold
        ("stupid_backoff", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_trigrams").alias("n_trigrams"),
            F.round(F.avg("sb_score"), 4).alias("mean_score"))),
        # per-row argmax projection + one groupBy (|langs|^2 rows)
        ("lang_confusion", None),
        # codegen key projection + TakeOrdered (100 rows)
        ("weighted_sample", None),
        # page build + edge extract + distinct + self-join (21 rows)
        ("cocitation", None),
        # xxhash fast twin of stupid_backoff (same shapes, JVM hash)
        ("stupid_backoff_fast", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_trigrams").alias("n_trigrams"),
            F.round(F.avg("sb_score"), 4).alias("mean_score"))),
        # vocab-bounded merge chain + broadcast + two groupBys (|langs|)
        ("tokenizer_fertility", None),
        # corpus -> score histogram -> aggregate-sized cut (1 row)
        ("budget_threshold", None),
        # shared gram pair stage, containment scoring
        ("dedup_containment", lambda d: d.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.max("containment"), 6).alias("max_containment"))),
        # one count_distinct groupBy on the determinant (13 keys)
        ("fd_check", None),
    ]
    only = set(sys.argv[2:])
    if only:
        jobs = [(n, c) for n, c in jobs if n in only]
    watch = StageWatch()
    out_path = os.path.join(HERE, "new_ops_scale.json")
    results: dict = {"n_docs": n_docs}
    if only and os.path.exists(out_path):
        # subset run: merge into the existing artifact (same n_docs
        # only — a different corpus size invalidates the other rows)
        prev = json.load(open(out_path))
        if prev.get("n_docs") == n_docs:
            results = prev
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

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
