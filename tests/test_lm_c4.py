"""Value-level tests for the r5 CCNet-perplexity and C4-rules
operators — hand-computed fixtures where every count, logp, and rule
boolean is known in advance.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from json_schema_spark.operators.lm import bigram_lm_perplexity
from json_schema_spark.operators.quality import c4_rules


@pytest.fixture(scope="module")
def lm_docs(spark):
    rows = [
        (1, "a b a b a", True),    # reference: bigrams ab,ba,ab,ba
        (2, "a b c", True),        # reference: ab, bc
        (3, "a b x", False),       # scored only
        (4, "z", False),           # < 2 tokens -> NULL perplexity
        (5, "", False),            # empty -> NULL
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, ref boolean")


def test_bigram_lm_hand_computation(lm_docs):
    out = {r["id"]: r for r in bigram_lm_perplexity(
        lm_docs, "doc_id", "text", F.col("ref"), alpha=1.0,
    ).collect()}
    # reference counts: c(a,b)=3, c(b,a)=2, c(b,c)=1;
    # contexts: c(a)=3? -> context counts come from bigram POSITIONS:
    # prev=a appears 3x, prev=b appears 3x; V = |{a,b,c}| = 3
    V = 3

    def logp(c_pair, c_ctx):
        return math.log((c_pair + 1.0) / (c_ctx + 1.0 * V))

    # doc 3 "a b x": logp(ab)=ln(4/6), logp(bx)=ln(1/6)
    expect3 = math.exp(-(logp(3, 3) + logp(0, 3)) / 2)
    assert out[3]["n_bigrams"] == 2
    assert out[3]["perplexity"] == pytest.approx(expect3, abs=1e-5)
    # doc 1 scores its own 4 bigrams: ab,ba,ab,ba
    expect1 = math.exp(-(2 * logp(3, 3) + 2 * logp(2, 3)) / 4)
    assert out[1]["perplexity"] == pytest.approx(expect1, abs=1e-5)
    # short/empty docs: present, 0 bigrams, NULL perplexity
    assert out[4]["n_bigrams"] == 0 and out[4]["perplexity"] is None
    assert out[5]["n_bigrams"] == 0 and out[5]["perplexity"] is None


def test_bigram_lm_bucketed_close_to_exact(lm_docs):
    """4096 buckets on a 3-type vocabulary: collisions are possible in
    principle but the md5 keys of these specific grams do not collide;
    bucketed scores must equal exact scores."""
    exact = {r["id"]: r["perplexity"] for r in bigram_lm_perplexity(
        lm_docs, "doc_id", "text", F.col("ref")).collect()}
    bucketed = {r["id"]: r["perplexity"] for r in bigram_lm_perplexity(
        lm_docs, "doc_id", "text", F.col("ref"), n_buckets=4096).collect()}
    assert exact == bucketed


def test_bigram_lm_reference_like_scores_lower(spark):
    """The signal property CCNet uses: reference-like text scores
    lower perplexity than shuffled/noise text under the same LM."""
    ref = "the cat sat on the mat . " * 10
    rows = ([(i, ref, True) for i in range(5)]
            + [(100, "the cat sat on the mat .", False),
               (101, "mat the on sat . cat qqq zzz", False)])
    df = spark.createDataFrame(rows, "doc_id long, text string, ref boolean")
    out = {r["id"]: r["perplexity"] for r in bigram_lm_perplexity(
        df, "doc_id", "text", F.col("ref")).collect()}
    assert out[100] < out[101]


@pytest.fixture(scope="module")
def c4_docs(spark):
    good = "\n".join(["this line has five words.",
                      "and this one also qualifies!",
                      'a third keeper line here?"'])
    rows = [
        (1, good),                                    # 3 kept -> passes
        (2, good.replace(".", "")),                   # line 1 loses punct
        (3, "too short.\nalso tiny.\nthree here."),   # <5 words/line
        (4, good + "\nvar x = { a: 1 }"),             # brace
        (5, good + "\nLorem Ipsum dolor"),            # lorem (case-insens)
        (6, good + "\nenable JavaScript to continue"),  # js line
        (7, ""),                                      # empty
        (8, None),                                    # dropped
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_c4_rules_battery(c4_docs):
    out = {r["id"]: r for r in c4_rules(c4_docs).collect()}
    assert 8 not in out and len(out) == 7
    assert out[1]["n_lines"] == 3 and out[1]["n_kept_lines"] == 3
    assert out[1]["passes_c4"]
    assert out[2]["n_kept_lines"] == 2 and not out[2]["passes_c4"]
    assert out[3]["n_kept_lines"] == 0 and not out[3]["passes_c4"]
    assert out[4]["has_brace"] and not out[4]["passes_c4"]
    assert out[5]["has_lorem"] and not out[5]["passes_c4"]
    assert out[6]["has_javascript_line"] and not out[6]["passes_c4"]
    r7 = out[7]
    assert r7["n_lines"] == 1 and r7["n_kept_lines"] == 0
    assert r7["kept_frac"] == 0.0 and not r7["passes_c4"]


def test_c4_kept_frac_value(c4_docs):
    out = {r["id"]: r for r in c4_rules(c4_docs).collect()}
    assert out[2]["kept_frac"] == pytest.approx(2.0 / 3, abs=1e-6)
    assert out[4]["kept_frac"] == pytest.approx(3.0 / 4, abs=1e-6)


def test_perplexity_buckets_semantics(spark):
    """The CCNet head/middle/tail split (driver query
    perplexity_buckets): within each language every head doc must
    score <= every middle doc <= every tail doc (at the 0.01 cutoff
    granularity), all three buckets are populated on a spread corpus,
    and sizes are near-thirds."""
    import __spark_entry__ as em

    out = em.queries()["perplexity_buckets"](
        spark, "/root/testdata/sf0.01").collect()
    assert len(out) > 0
    by_lang: dict[str, dict[str, list[float]]] = {}
    for r in out:
        by_lang.setdefault(r["lang"], {}).setdefault(
            r["ppl_bucket"], []).append(round(r["perplexity"], 2))
    for lang, buckets in by_lang.items():
        n = sum(len(v) for v in buckets.values())
        if n < 9:
            continue  # too few docs for a meaningful third
        assert set(buckets) == {"head", "middle", "tail"}, lang
        assert max(buckets["head"]) <= min(buckets["middle"]) + 0.011
        assert max(buckets["middle"]) <= min(buckets["tail"]) + 0.011
        # histogram-granular thirds: head is a prefix whose size is
        # >= n/3 only once the cutoff value's ties are included
        assert len(buckets["head"]) >= n / 3 - 1


# ---------------------------------------------------------------------------
# stupid_backoff_score: Brants et al. trigram LM with constant backoff
# ---------------------------------------------------------------------------

def _sb_docs(spark):
    rows = [
        # reference corpus: "a b c a b d"
        (1, "a b c a b d", True),
        # trigram hit: S = c3(a b c)/c2(a b) = 1/2 -> score 2
        (2, "a b c", False),
        # bigram backoff: S = 0.4 * c2(a b)/c1(a) = 0.4 -> score 2.5
        (3, "x a b", False),
        # unigram floor: S = 0.16 * (0+1)/(N=6 + V=4) = 0.016 -> 62.5
        (4, "x y z", False),
        # < 3 tokens: no trigram evidence -> NULL
        (5, "a b", False),
        (6, None, False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, ref boolean")


def test_stupid_backoff_hand_levels(spark):
    from json_schema_spark.operators.lm import stupid_backoff_score

    got = {r.id: r for r in stupid_backoff_score(
        _sb_docs(spark), "doc_id", "text", F.col("ref")).collect()}
    assert got[2].sb_score == 2.0 and got[2].n_trigrams == 1
    assert got[3].sb_score == 2.5
    assert got[4].sb_score == 62.5
    assert got[5].sb_score is None and got[5].n_trigrams == 0
    assert 6 not in got  # NULL text never enters


def test_stupid_backoff_bucketed_matches_exact_when_collision_free(spark):
    from json_schema_spark.operators.lm import stupid_backoff_score

    docs = _sb_docs(spark)
    exact = sorted(stupid_backoff_score(
        docs, "doc_id", "text", F.col("ref")).collect())
    bucketed = sorted(stupid_backoff_score(
        docs, "doc_id", "text", F.col("ref"),
        n_buckets=1_000_000, hash_fn="md5").collect())
    assert exact == bucketed


def test_stupid_backoff_xxhash_bucketed_matches_exact(spark):
    from json_schema_spark.operators.lm import stupid_backoff_score

    docs = _sb_docs(spark)
    exact = sorted(stupid_backoff_score(
        docs, "doc_id", "text", F.col("ref")).collect())
    fast = sorted(stupid_backoff_score(
        docs, "doc_id", "text", F.col("ref"),
        n_buckets=1_000_000, hash_fn="xxhash").collect())
    assert exact == fast
    with pytest.raises(ValueError, match="hash_fn"):
        stupid_backoff_score(docs, "doc_id", "text", F.col("ref"),
                             hash_fn="bogus")


def test_stupid_backoff_bucketed_plan_is_all_broadcast(spark):
    from json_schema_spark.operators.lm import stupid_backoff_score

    out = stupid_backoff_score(
        _sb_docs(spark), "doc_id", "text", F.col("ref"), n_buckets=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # all five count-table lookups + the scalar must be broadcasts —
    # the corpus never shuffles on vocabulary
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan
