"""Value-level tests for the r5 retrieval + data-selection operators:
BM25 top-k, per-domain quota (salted two-stage top-k), and DSIR
importance weights — tiny hand-computed fixtures plus property checks
the driver oracle can't express (salted == unsalted, weight ordering).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from json_schema_spark.operators.retrieval import bm25_topk
from json_schema_spark.operators.sampling import dsir_weights, per_domain_cap


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (1, "spark spark joins data", "en", "a.com"),
        (2, "spark data", "en", "a.com"),
        (3, "joins and more joins here", "de", "b.org"),
        (4, "nothing relevant at all whatsoever", "en", "b.org"),
        (5, "data data data spark", "fr", "a.com"),
        (6, "", "en", "b.org"),
        (7, None, "en", "c.net"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, host string")


def _bm25(tf, df_t, dl, n, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_matches_hand_computation(tiny_docs):
    out = {
        r["id"]: r
        for r in bm25_topk(tiny_docs, "doc_id", "text",
                           ["spark", "joins"], k=10).collect()
    }
    # corpus: 6 non-null docs, dls 4,2,5,5,4,0 -> avgdl 20/6
    n, avgdl = 6, 20 / 6
    # doc 1: spark tf=2 (df=3), joins tf=1 (df=2), dl=4
    exp1 = _bm25(2, 3, 4, n, avgdl) + _bm25(1, 2, 4, n, avgdl)
    assert out[1]["score"] == pytest.approx(round(exp1, 4), abs=1e-9)
    assert out[1]["n_matched_terms"] == 2
    # doc 3: joins tf=2, dl=5
    exp3 = _bm25(2, 2, 5, n, avgdl)
    assert out[3]["score"] == pytest.approx(round(exp3, 4), abs=1e-9)
    assert out[3]["n_matched_terms"] == 1
    # docs 4, 6, 7 match nothing -> absent
    assert set(out) == {1, 2, 3, 5}


def test_bm25_k_cut_is_deterministic(tiny_docs):
    top2 = bm25_topk(tiny_docs, "doc_id", "text",
                     ["spark", "joins"], k=2).collect()
    allr = sorted(
        bm25_topk(tiny_docs, "doc_id", "text",
                  ["spark", "joins"], k=10).collect(),
        key=lambda r: (-r["score"], r["id"]))
    assert [r["id"] for r in top2] == [r["id"] for r in allr[:2]]


def test_per_domain_cap_exact_topk(tiny_docs):
    df = tiny_docs.withColumn("n_chars", F.length("text"))
    kept = per_domain_cap(
        df, "host", k=2,
        order_by=[F.desc_nulls_last("n_chars"), F.asc("doc_id")],
    ).select("doc_id", "host", "rank_in_domain").collect()
    got = {(r["doc_id"], r["host"], r["rank_in_domain"]) for r in kept}
    # a.com lengths: d1=22, d2=10, d5=20 -> keep 1,5 ; b.org: d3=25,
    # d4=34, d6=0 -> keep 4,3 ; c.net: d7 (null length sorts last,
    # still rank 1 of 1)
    assert got == {(1, "a.com", 1), (5, "a.com", 2),
                   (4, "b.org", 1), (3, "b.org", 2),
                   (7, "c.net", 1)}


def test_per_domain_cap_salted_equals_unsalted(spark):
    # 2000 rows over 3 domains (one hot), k=5: the two-stage salted
    # plan must return EXACTLY the naive single-window result
    rows = [(i, "hot.com" if i % 10 < 8 else f"d{i % 2}.org", i * 37 % 997)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, host string, score long")
    order = [F.desc("score"), F.asc("id")]
    naive = per_domain_cap(df, "host", 5, order).collect()
    salted = per_domain_cap(df, "host", 5, order,
                            salt_key="id", n_salts=16).collect()
    key = lambda r: (r["host"], r["rank_in_domain"])
    assert sorted((r["id"], *key(r)) for r in naive) \
        == sorted((r["id"], *key(r)) for r in salted)


def test_dsir_weights_hand_computed(spark):
    # 3 docs, target = lang 'en'; exact-token feature space
    rows = [(1, "aa aa bb", "en"), (2, "bb cc", "de"), (3, "aa cc", "de")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["id"]: r for r in
           dsir_weights(df, "doc_id", "text",
                        F.col("lang") == "en", alpha=1.0).collect()}
    # counts: aa raw 3 / tgt 2, bb raw 2 / tgt 1, cc raw 2 / tgt 0
    # totals: R=7, T=3, V=3
    lr = {t: math.log((ct + 1) / (3 + 3)) - math.log((cr + 1) / (7 + 3))
          for t, (cr, ct) in {"aa": (3, 2), "bb": (2, 1), "cc": (2, 0)}.items()}
    exp1 = (lr["aa"] + lr["aa"] + lr["bb"]) / 3
    exp2 = (lr["bb"] + lr["cc"]) / 2
    assert out[1]["weight"] == pytest.approx(round(exp1, 6), abs=1e-9)
    assert out[2]["weight"] == pytest.approx(round(exp2, 6), abs=1e-9)
    assert out[1]["n_tokens"] == 3 and out[3]["n_tokens"] == 2
    # target-heavy tokens weigh more: doc1 (aa-heavy) > doc2 (bb+cc)
    assert out[1]["weight"] > out[2]["weight"]


def test_dsir_bucketed_is_broadcast_and_sane(spark):
    # hashed feature space: weights shift the same direction as the
    # exact variant even with collisions, and the ratio-table join is
    # a BroadcastHashJoin (the corpus-never-shuffles scale claim)
    rows = [(i, ("english target words here" if i % 2 == 0
                 else "andere worte ganz anders"),
             "en" if i % 2 == 0 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = dsir_weights(df, "doc_id", "text", F.col("lang") == "en",
                       n_buckets=1 << 16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows_out = {r["id"]: r["weight"] for r in out.collect()}
    assert rows_out[0] > rows_out[1]  # en doc outweighs de doc


def test_temperature_mix_rates_hand_values(spark):
    from json_schema_spark.operators.sampling import temperature_mix_rates

    # masses 80/20: tau=0.5 -> tpow sqrt(.8)/sqrt(.2); shares
    # .8944/.4472 normalized -> 2/3, 1/3; raw rates (2/3)/.8=5/6 and
    # (1/3)/.2=5/3 -> normalized keep rates .5 / 1.0
    rows = [(i, "big") for i in range(80)] + [(i + 100, "small") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["source"]: r for r in
           temperature_mix_rates(df, "source", tau=0.5).collect()}
    assert out["big"]["natural_share"] == pytest.approx(0.8)
    assert out["big"]["target_share"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["small"]["target_share"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["small"]["keep_rate"] == pytest.approx(1.0)
    assert out["big"]["keep_rate"] == pytest.approx(0.5, abs=1e-6)


def test_temperature_one_is_identity(spark):
    from json_schema_spark.operators.sampling import temperature_mix_rates

    rows = [(i, f"s{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    for r in temperature_mix_rates(df, "source", tau=1.0).collect():
        assert r["keep_rate"] == pytest.approx(1.0)
        assert r["target_share"] == pytest.approx(r["natural_share"])


def test_temperature_mix_by_token_weight(spark):
    from json_schema_spark.operators.sampling import temperature_mix_rates
    from pyspark.sql import functions as F

    rows = [(1, "a", 300), (2, "b", 100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    out = {r["source"]: r for r in temperature_mix_rates(
        df, "source", tau=0.0, weight=F.col("n_tok")).collect()}
    # tau=0: uniform target shares regardless of mass
    assert out["a"]["target_share"] == pytest.approx(0.5)
    assert out["b"]["target_share"] == pytest.approx(0.5)
    assert out["a"]["natural_share"] == pytest.approx(0.75)


def test_shard_plan_is_partitioning_invariant(spark):
    """The plan is keyed on content (md5), so ANY input partitioning
    yields the identical (doc_id, shard_id, pos) rows — the property
    that makes it reproducible on a real cluster."""
    from json_schema_spark.operators.sampling import shard_plan

    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = shard_plan(df, "doc_id", n_shards=4, seed=7)
    b = shard_plan(df.repartition(13), "doc_id", n_shards=4, seed=7)
    rows_a = sorted(map(tuple, a.select("doc_id", "shard_id", "pos").collect()))
    rows_b = sorted(map(tuple, b.select("doc_id", "shard_id", "pos").collect()))
    assert rows_a == rows_b


def test_shard_plan_positions_and_balance(spark):
    """Each shard's pos is contiguous 1..count; all shards populated;
    the uniform md5 key keeps shard sizes within a loose balance band."""
    from json_schema_spark.operators.sampling import shard_plan

    n, k = 800, 8
    df = spark.range(0, n).withColumnRenamed("id", "doc_id")
    out = shard_plan(df, "doc_id", n_shards=k, seed=42)
    per = {r["shard_id"]: r for r in out.groupBy("shard_id").agg(
        F.count("*").alias("c"), F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.count_distinct("pos").alias("d")).collect()}
    assert set(per) == set(range(k))
    assert sum(r["c"] for r in per.values()) == n
    for r in per.values():
        assert (r["lo"], r["hi"], r["d"]) == (1, r["c"], r["c"])
        assert 0.5 * n / k <= r["c"] <= 1.5 * n / k  # uniform-hash band


def test_shard_plan_seed_is_epoch_reshuffle(spark):
    """A different seed re-orders the same corpus (fresh epoch): same
    doc_id set, different (shard_id, pos) assignment."""
    from json_schema_spark.operators.sampling import shard_plan

    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["shard_id"], r["pos"])
         for r in shard_plan(df, "doc_id", 4, seed=1).collect()}
    b = {r["doc_id"]: (r["shard_id"], r["pos"])
         for r in shard_plan(df, "doc_id", 4, seed=2).collect()}
    assert set(a) == set(b)
    assert any(a[d] != b[d] for d in a)


def test_shard_plan_no_global_sort(spark):
    """Scale guard: the plan must hash-partition by shard_id and sort
    within shards — never range-partition (a global sort of the whole
    corpus through one ordering)."""
    from json_schema_spark.operators.sampling import shard_plan

    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = shard_plan(df, "doc_id", 4).select(
        "doc_id", "shard_id", "pos")._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning(shard_id" in plan


def test_execute_mix_thresholds_and_defaults(spark):
    """execute_mix applies the integerized md5 thresholds exactly
    (recomputable in plain Python), keeps everything for sources
    missing from the rate table, and is deterministic."""
    import hashlib

    from pyspark.sql import functions as F

    from json_schema_spark.operators.sampling import execute_mix

    docs = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(400)]
        + [(1000 + i, "orphan") for i in range(5)],
        "doc_id long, source string")
    rates = spark.createDataFrame(
        [("a", 0.25), ("b", 1.0)], "source string, keep_rate double")
    kept = execute_mix(docs, rates, "source", key_col="doc_id", seed=13)
    got = {r["doc_id"] for r in kept.collect()}

    def bucket(k: int) -> int:
        return int(hashlib.md5(f"{k}#13".encode()).hexdigest()[:15],
                   16) % 1_000_000

    exp = {i for i in range(400)
           if bucket(i) < (250_000 if i % 2 == 0 else 1_000_000)}
    exp |= {1000 + i for i in range(5)}        # missing source -> keep
    assert got == exp
    assert {r["doc_id"] for r in execute_mix(
        docs, rates, "source", key_col="doc_id", seed=13).collect()} == got


# ------------------------------------------------------- leakage-safe split

def test_leakage_safe_split_invariant_and_rollup(spark):
    from json_schema_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(200)],
                                 "doc_id long")
    # 50 pair-groups (0,1)(2,3)... + 100 singletons
    groups = spark.createDataFrame(
        [(i, i - i % 2) for i in range(100)], "node long, grp long")
    out = leakage_safe_split(docs, "doc_id", groups).collect()
    assert {r["split"] for r in out} <= {"train", "val", "test"}
    assert sum(r["n_docs"] for r in out) == 200
    assert sum(r["n_groups"] for r in out) == 150  # 50 pairs + 100 singles
    assert all(r["leak_groups"] == 0 for r in out)
    # dominant split gets the bulk under the 90/5/5 default
    top = max(out, key=lambda r: r["n_docs"])
    assert top["split"] == "train" and top["n_docs"] > 120


def test_leakage_safe_split_pairs_stay_together(spark):
    from json_schema_spark.operators.sampling import _bucket, leakage_safe_split

    # reconstruct per-doc assignment through a 1-doc-per-group corpus:
    # paired docs MUST land where their group label lands
    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    groups = spark.createDataFrame(
        [(i, (i // 4) * 4) for i in range(40)], "node long, grp long")
    from pyspark.sql import functions as F

    s = (docs.join(groups.withColumnRenamed("node", "doc_id"),
                   "doc_id", "left")
         .select("doc_id",
                 F.coalesce("grp", F.col("doc_id")).alias("grp")))
    # every group of 4 consecutive ids shares one bucket => one split
    bks = {r["grp"]: r["bk"] for r in
           s.select("grp", _bucket(F.col("grp"), 11).alias("bk"))
           .distinct().collect()}
    assert len(bks) == 10


def test_leakage_safe_split_bad_weights_raise(spark):
    from json_schema_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame([(1,)], "doc_id long")
    groups = spark.createDataFrame([(1, 1)], "node long, grp long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(docs, "doc_id", groups,
                           splits=(("train", 0.5), ("test", 0.4)))


# ---------------------------------------------------------------------------
# retrieval_eval: graded-relevance P/R/MRR/NDCG@k over multi-query BM25
# ---------------------------------------------------------------------------

def _eval_reference(docs, queries, k, k1=1.2, b=0.75):
    """Pure-Python mirror of retrieval_eval (same formulas, same
    rounding, same tie-breaks) for hand-scale fixtures."""
    toks = {i: t.lower().split() for i, t in docs.items() if t is not None}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for qid, terms in queries.items():
        terms = sorted({t.lower() for t in terms})
        m = len(terms)
        # candidates: docs matching >= 1 term
        cand = {}
        dft = {t: sum(1 for v in toks.values() if t in v) for t in terms}
        for i, v in toks.items():
            matched = [t for t in terms if t in v]
            if not matched:
                continue
            score = sum(
                (math.log(1.0 + (n - dft[t] + 0.5) / (dft[t] + 0.5))
                 * v.count(t) * (k1 + 1.0))
                / (v.count(t) + k1 * (1.0 - b + b * len(v) / avgdl))
                for t in matched)
            rel = 2 if len(matched) == m else (
                1 if 2 * len(matched) >= m else 0)
            cand[i] = (round(score, 4), rel)
        ranked = sorted(cand, key=lambda i: (-cand[i][0], i))[:k]
        ideal = sorted((i for i in cand if cand[i][1] > 0),
                       key=lambda i: (-cand[i][1], i))[:k]
        n_rel = sum(1 for i in cand if cand[i][1] > 0)
        hits = sum(1 for i in ranked if cand[i][1] > 0)
        dcg = sum(cand[i][1] / math.log2(r + 2)
                  for r, i in enumerate(ranked))
        idcg = sum(cand[i][1] / math.log2(r + 2)
                   for r, i in enumerate(ideal))
        franks = [r + 1 for r, i in enumerate(ranked) if cand[i][1] > 0]
        out[qid] = {
            "n_cand": len(cand), "n_rel": n_rel, "hits_at_k": hits,
            "precision_at_k": round(hits / float(k), 6),
            "recall_at_k": round(hits / n_rel, 6) if n_rel else 0.0,
            "mrr_at_k": round(1.0 / franks[0], 6) if franks else 0.0,
            "ndcg_at_k": round(dcg / idcg, 6) if idcg > 0 else 0.0,
        }
    return out


RE_QUERIES = {
    # qa: doc1 matches both (rel 2), docs 2/3/5 match one (rel 1)
    "qa": ["spark", "joins"],
    # qb (m=3): doc3 matches 1 of 3 -> rel 0; doc4 matches 2 -> rel 1
    "qb": ["joins", "whatsoever", "nothing"],
}


def test_retrieval_eval_matches_reference(tiny_docs):
    from json_schema_spark.operators.retrieval import retrieval_eval

    got = {r["qid"]: r.asDict() for r in retrieval_eval(
        tiny_docs, "doc_id", "text", RE_QUERIES, k=2).collect()}
    docs = {r["doc_id"]: r["text"] for r in tiny_docs.collect()}
    exp = _eval_reference(docs, RE_QUERIES, k=2)
    assert set(got) == set(exp)
    for qid in exp:
        for key, val in exp[qid].items():
            assert got[qid][key] == pytest.approx(val, abs=1e-9), (
                qid, key, got[qid][key], val)
    # spot-pin the graded tiers the fixture was built for
    assert exp["qa"]["n_rel"] == 4 and exp["qa"]["recall_at_k"] == 0.5
    # qb candidates: docs 1 and 3 match only 'joins' (rel 0), doc 4
    # matches 'nothing'+'whatsoever' (2 of 3 -> rel 1)
    assert exp["qb"]["n_cand"] == 3 and exp["qb"]["n_rel"] == 1


def test_retrieval_eval_salted_equals_unsalted(tiny_docs):
    from json_schema_spark.operators.retrieval import retrieval_eval

    plain = sorted(retrieval_eval(
        tiny_docs, "doc_id", "text", RE_QUERIES, k=2).collect())
    salted = sorted(retrieval_eval(
        tiny_docs, "doc_id", "text", RE_QUERIES, k=2,
        salted=True, n_salts=4).collect())
    assert plain == salted


# ---------------------------------------------------------------------------
# weighted_sample: Efraimidis-Spirakis u^(1/w) without replacement
# ---------------------------------------------------------------------------

def test_weighted_sample_matches_reference_keys(spark):
    import hashlib

    from json_schema_spark.operators.sampling import weighted_sample

    rows = [(i, float(i * 10)) for i in range(1, 21)] + [
        (21, 0.0), (22, None), (23, -5.0)]  # never sampled
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, "doc_id", "w", k=5).collect()

    def key(i, w):
        h = int(hashlib.md5(f"{i}#13".encode()).hexdigest()[:15], 16)
        return ((h + 1) / float(1 << 60)) ** (1.0 / w)

    exp = sorted(((key(i, w), i, w) for i, w in rows[:20]),
                 key=lambda t: (-t[0], t[1]))[:5]
    assert [(r.id, r.weight, r.rank) for r in got] == [
        (i, w, n + 1) for n, (_, i, w) in enumerate(exp)]
    for r, (kv, _, _) in zip(got, exp):
        assert r.sample_key == pytest.approx(round(kv, 6), abs=1e-12)


def test_weighted_sample_is_seed_reproducible_and_epochs_differ(spark):
    from json_schema_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 1.0) for i in range(200)], "doc_id long, w double")
    a = [r.id for r in weighted_sample(df, "doc_id", "w", k=10).collect()]
    b = [r.id for r in weighted_sample(df, "doc_id", "w", k=10).collect()]
    c = [r.id for r in weighted_sample(df, "doc_id", "w", k=10,
                                       seed=14).collect()]
    assert a == b          # same seed -> identical sample
    assert a != c          # new seed -> fresh epoch


# ---------------------------------------------------------------------------
# budget_threshold: token-budget quality cut
# ---------------------------------------------------------------------------

def test_budget_threshold_hand_values(spark):
    from json_schema_spark.operators.sampling import budget_threshold

    # buckets: s=0.9 (100 tok, 1 doc), s=0.8 (200 tok, 2 docs),
    #          s=0.7 (300 tok, 1 doc)
    rows = [(0.9, 100), (0.8, 120), (0.8, 80), (0.7, 300)]
    df = spark.createDataFrame(rows, "s double, tok long")
    out = budget_threshold(df, F.col("s"), F.col("tok"),
                           budget_tokens=350).collect()[0]
    # greedy whole buckets: 0.9 (100) + 0.8 (200) = 300 <= 350; adding
    # 0.7 would hit 600 -> threshold 0.8, one bucket under-filled
    assert out.threshold_score == 0.8
    assert out.kept_docs == 3 and out.kept_tokens == 300
    assert out.utilization == round(300 / 350.0, 6)
    assert out.budget_tokens == 350


def test_budget_threshold_overbudget_top_bucket_is_empty_cut(spark):
    from json_schema_spark.operators.sampling import budget_threshold

    df = spark.createDataFrame([(0.9, 500)], "s double, tok long")
    out = budget_threshold(df, F.col("s"), F.col("tok"),
                           budget_tokens=100).collect()[0]
    assert out.threshold_score is None
    assert out.kept_docs == 0 and out.kept_tokens == 0
    assert out.utilization == 0.0


# ---------------------------------------------------------------------------
# plan-shape guards for the session's operators (the 100 TB posture,
# pinned so a regression in Catalyst usage fails loudly)
# ---------------------------------------------------------------------------

def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_weighted_sample_plan_is_take_ordered(spark):
    from json_schema_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(100)], "doc_id long, w double")
    plan = _plan(weighted_sample(df, "doc_id", "w", k=5))
    # the top-k must be a per-partition heap + driver merge, never a
    # global Sort of the corpus
    assert "TakeOrderedAndProject" in plan


def test_retrieval_eval_salted_plan_uses_window_group_limit(tiny_docs):
    from json_schema_spark.operators.retrieval import retrieval_eval

    plan = _plan(retrieval_eval(
        tiny_docs, "doc_id", "text", RE_QUERIES, k=2,
        salted=True, n_salts=4))
    # Spark 4 bounds each window task's heap to k rows per key at both
    # salted stages; no corpus-side cartesian anywhere
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_budget_threshold_plan_aggregates_before_window(spark):
    from json_schema_spark.operators.sampling import budget_threshold

    df = spark.createDataFrame(
        [(0.5 + (i % 5) / 10.0, i) for i in range(100)],
        "s double, tok long")
    plan = _plan(budget_threshold(df, F.col("s"), F.col("tok"), 1000))
    # the corpus collapses through a partial-aggregable HashAggregate
    # BEFORE the (aggregate-sized) global window
    assert "HashAggregate" in plan and "Window" in plan
    assert "CartesianProduct" not in plan
