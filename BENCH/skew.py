"""Skew soak (VERDICT r2 item 1): run the dedup/uniqueness family on a
deliberately skewed corpus — one hot URL at ~5% of all rows, one hot
domain at 40%, 25% boilerplate near-dup text — and measure per-stage
TASK-TIME balance from Spark's own metrics. Pass criterion: in every
non-trivial stage, max task time <= 4x median (no straggler owns the
stage), with the skew mitigations actually wired in:

* unique_check        -> duplicate_keys(salt_width="auto")  (adaptive
                         salting from the live skew statistic)
* dedup_minhash       -> minhash_candidates(max_bucket=256) (hot LSH
                         band buckets excluded via broadcast anti-join)
* dedup_ngram_jaccard -> max_df=5 stop-gram pruning
* dedup_groups        -> connected components over the capped pairs

A small UNCAPPED minhash control on a slice demonstrates the blowout
the cap removes (pair count, wall time).

Usage: python BENCH/skew.py [n_docs] [text_docs]
Writes BENCH/skew_results.json (bench.py folds it into its JSON line)
and prints the result JSON to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from json_schema_spark.operators import dedup  # noqa: E402
from json_schema_spark.operators.unique import (  # noqa: E402
    adaptive_salt_width,
    duplicate_keys,
)
from json_schema_spark.session import get_spark  # noqa: E402
from json_schema_spark.sources.tables import synth_skewed_webpages  # noqa: E402

UI = "http://localhost:4040/api/v1"


def _get(path: str):
    with urllib.request.urlopen(f"{UI}{path}", timeout=10) as r:
        return json.load(r)


def _app_id() -> str:
    return _get("/applications")[0]["id"]


class StageWatch:
    """Per-job stage task-time balance from the Spark UI REST API
    (metrics the engine itself reports — no instrumentation in the
    operators)."""

    def __init__(self):
        self.app = _app_id()
        self.seen: set[int] = set()
        self._drain()  # stages from setup are not ours

    def _stages(self):
        return _get(f"/applications/{self.app}/stages?status=COMPLETE")

    def _drain(self):
        for s in self._stages():
            self.seen.add(s["stageId"])

    def snapshot(self, min_tasks: int = 8, min_median_ms: float = 100.0):
        """Stats for stages completed since the last call: worst
        max/median task-time ratio over stages big enough to judge
        (tiny stages are scheduling noise, not skew)."""
        worst, stages = 0.0, []
        for s in self._stages():
            if s["stageId"] in self.seen:
                continue
            self.seen.add(s["stageId"])
            n = s.get("numCompleteTasks", 0)
            if n < min_tasks:
                continue
            q = _get(
                f"/applications/{self.app}/stages/{s['stageId']}"
                f"/{s['attemptId']}/taskSummary?quantiles=0.5,1.0")
            med, mx = q["executorRunTime"]
            if med < min_median_ms:
                continue
            ratio = mx / max(med, 1.0)
            stages.append({
                "stage": s["stageId"], "name": s["name"].split("\n")[0][:60],
                "tasks": n, "median_ms": round(med), "max_ms": round(mx),
                "ratio": round(ratio, 2),
            })
            worst = max(worst, ratio)
        return {"worst_ratio": round(worst, 2), "stages": stages}


def timed(watch: StageWatch, fn):
    t0 = time.monotonic()
    out = fn()
    wall = round(time.monotonic() - t0, 2)
    snap = watch.snapshot()
    return out, {"wall_s": wall, **snap}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    text_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    spark = get_spark(app_name="jss-skew-soak",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    cache = os.path.join(HERE, ".cache", f"skewed_{n_docs}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        synth_skewed_webpages(spark, n_docs).write.mode("overwrite") \
            .parquet(cache)
    docs = spark.read.parquet(cache)
    texts = (docs.where(F.col("doc_id") % (n_docs // text_docs) == 0)
             .select("doc_id", "text"))

    watch = StageWatch()
    results: dict = {"n_docs": n_docs, "text_docs": text_docs}

    # 1. salted uniqueness with ADAPTIVE width (hot url ~5% of rows)
    target = 50_000
    width = adaptive_salt_width(docs, ["url"], target_rows_per_task=target)
    watch.snapshot()  # the pre-pass is setup, not the measured job
    n_dup, stats = timed(watch, lambda: duplicate_keys(
        docs, ["url"], salt_width=width).count())
    results["unique_check_auto_salt"] = {
        "salt_width": width, "dup_keys": n_dup, **stats}

    # 2. minhash with band-bucket cap (25% boilerplate near-dups)
    pairs = dedup.minhash_candidates(texts, "doc_id", "text", n=3, k=64,
                                     bands=16, max_bucket=256)
    pairs.persist()
    n_pairs, stats = timed(watch, pairs.count)
    results["dedup_minhash_capped"] = {"pairs": n_pairs, **stats}

    # 2b. UNCAPPED control on a ~8k-doc slice: the blowout the cap
    # removes (the boilerplate cluster alone fans out ~(slice/4)^2/2
    # pairs; running uncapped at full text_docs would be the very
    # quadratic catastrophe the cap exists to prevent)
    slice_mod = max(1, text_docs // 8000)
    slice_docs = texts.where(
        F.pmod(F.xxhash64("doc_id"), F.lit(slice_mod)) == 0)
    n_slice = slice_docs.count()
    n_unc, stats = timed(watch, lambda: dedup.minhash_candidates(
        slice_docs, "doc_id", "text", n=3, k=64, bands=16).count())
    results["dedup_minhash_uncapped_slice"] = {
        "slice_docs": n_slice, "pairs": n_unc, **stats}

    # 3. ngram jaccard with stop-gram pruning
    n_ng, stats = timed(watch, lambda: dedup.ngram_jaccard_pairs(
        texts, "doc_id", "text", n=3, threshold=0.8, max_df=5).count())
    results["dedup_ngram_jaccard_maxdf"] = {"pairs": n_ng, **stats}

    # 4. connected components over the capped candidate pairs
    strong = pairs.where(F.col("est_jaccard") >= 0.8)
    n_grp, stats = timed(watch, lambda: dedup.connected_components(
        strong, "doc_a", "doc_b").select("grp").distinct().count())
    results["dedup_groups"] = {"groups": n_grp, **stats}
    pairs.unpersist()

    # 5. cross-doc duplicate-span coverage (operators/quality.py): the
    # 25% boilerplate cluster makes its trigrams ~250k-doc-hot — the
    # stop-gram-skew case the operator's hash-join-back shape must
    # absorb (each gram contributes rows LINEAR in its positions)
    from json_schema_spark.operators.quality import duplicate_span_coverage
    n_half_dup, stats = timed(watch, lambda: duplicate_span_coverage(
        texts, "doc_id", "text", n=3)
        .where(F.col("dup_span_frac") > 0.5).count())
    results["dup_span_coverage"] = {"docs_over_half_dup": n_half_dup, **stats}

    # 6. repetition profile (r5: VERDICT r4 next #6) — per-doc array
    # expressions over the SAME hostile corpus; the boilerplate docs'
    # dup-bigram fraction is ~1, the top-gram-mass groupBys shuffle
    # the 250k-hot boilerplate grams (partial-aggregable, so the hot
    # gram combines map-side instead of landing on one reducer)
    from json_schema_spark.operators.quality import (
        cross_contamination, repetition_profile,
    )
    n_rep, stats = timed(watch, lambda: repetition_profile(
        texts, "doc_id", "text", n=2)
        .where(F.col("dup_bigram_frac") > 0.9).count())
    results["repetition_profile"] = {"docs_over_09_dup_bigrams": n_rep,
                                     **stats}

    # 7. train/eval contamination (r5) — eval slice vs the FULL hostile
    # corpus as training side: every boilerplate eval doc is ~fully
    # contaminated, and the hot grams hit the distinct-gram-set
    # collapse + broadcast-ability of the join back
    n_cont, stats = timed(watch, lambda: cross_contamination(
        texts, slice_docs, "doc_id", "text", n=3)
        .where(F.col("contamination_frac") > 0.9).count())
    results["contamination_check"] = {"eval_docs_over_09_hit": n_cont,
                                      **stats}

    # 8. per-domain quota (r5) — the hot domain holds 40% of ALL rows;
    # the naive single window funnels every one of its rows through
    # ONE task, the salted two-stage top-k bounds any domain to
    # k*n_salts rows before the final window. The naive run is the
    # CONTROL (excluded from the mitigated max, like the uncapped
    # minhash slice).
    from json_schema_spark.operators.sampling import per_domain_cap

    order = [F.asc("doc_id")]
    n_cap, stats = timed(watch, lambda: per_domain_cap(
        docs, "domain", k=100, order_by=order,
        salt_key="doc_id", n_salts=32).count())
    results["domain_cap_salted"] = {"kept": n_cap, **stats}
    n_naive, stats = timed(watch, lambda: per_domain_cap(
        docs, "domain", k=100, order_by=order).count())
    results["domain_cap_naive_control"] = {"kept": n_naive, **stats}

    # 9. LM perplexity (r5) — the 25% boilerplate template makes a few
    # bigram hash buckets extremely hot; the pair/context groupBys are
    # combinable (hot grams partial-aggregate map-side) and the LM
    # tables re-enter as broadcasts, so no reduce task owns a hot gram
    from json_schema_spark.operators.lm import bigram_lm_perplexity

    n_ppl, stats = timed(watch, lambda: bigram_lm_perplexity(
        texts, "doc_id", "text",
        is_reference=F.col("doc_id") % 3 == 0,  # texts carries no lang
        n_buckets=4096).where(F.col("perplexity") < 100).count())
    results["lm_perplexity"] = {"docs_under_100_ppl": n_ppl, **stats}

    # 10. cross-snapshot incremental dedup (r5) — fingerprint over the
    # URL column, so the hot url (~5% of ALL rows) is ONE hot
    # fingerprint: the within-snapshot rollup must absorb a ~100k-row
    # group map-side (partial agg before the fp shuffle), and the
    # snap-1 probe joins a ~1.9M-row ledger on fp while history stays
    # unscanned (metadata-pruned to the snap-0 partition)
    import shutil
    import tempfile

    from json_schema_spark.operators.incremental_dedup import (
        create_dedup_ledger,
        incremental_dedup_snapshot,
    )

    led_root = tempfile.mkdtemp(prefix="skew_ledger_", dir=HERE)
    ledger = create_dedup_ledger(spark, led_root)
    snap0 = docs.where(F.col("doc_id") % 2 == 0)
    snap1 = docs.where(F.col("doc_id") % 2 == 1)
    r0, stats = timed(watch, lambda: incremental_dedup_snapshot(
        snap0, ledger, "doc_id", "url", 0).collect()[0].asDict())
    results["dedup_incremental_snap0"] = {**r0, **stats}
    r1, stats = timed(watch, lambda: incremental_dedup_snapshot(
        snap1, ledger, "doc_id", "url", 1).collect()[0].asDict())
    results["dedup_incremental_snap1"] = {**r1, **stats}
    shutil.rmtree(led_root, ignore_errors=True)

    worst = max(v["worst_ratio"] for v in results.values()
                if isinstance(v, dict) and "worst_ratio" in v
                and v is not results["dedup_minhash_uncapped_slice"]
                and v is not results["domain_cap_naive_control"])
    results["worst_ratio_mitigated_jobs"] = worst
    results["pass_no_straggler_4x"] = bool(worst <= 4.0)

    out = os.path.join(HERE, "skew_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
