"""Unit tests for json_schema_spark/operators/vocab.py (Heaps, Zipf,
winnowing fingerprints + near-dup pairs, inverted-index postings),
operators/normalize.py (NFC audit) and textstats.readability_profile
on hand-computed fixtures.

The driver-grade DuckDB comparison for the seven queries runs in
tests/test_driver_contract.py::test_rotated_out_queries_match_duckdb_oracle.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from json_schema_spark.operators.normalize import nfc_audit
from json_schema_spark.operators.vocab import (
    build_postings,
    heaps_profile,
    winnow_fingerprints,
    zipf_profile,
)


# ---------------------------------------------------------------- heaps

def test_heaps_profile_hand_buckets(spark):
    # bucket = id % 2: bucket0 = docs 0,2; bucket1 = docs 1,3
    rows = [
        (0, "a b c"),        # b0: types {a,b,c}
        (1, "a d"),          # b1: d new after union with b0
        (2, "b b e"),        # b0: e
        (3, "c"),            # b1: nothing new
        (4, None),           # ignored
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r for r in
           heaps_profile(df, "doc_id", "text", n_buckets=2).collect()}
    b0, b1 = out[0], out[1]
    assert (b0["n_docs"], b0["n_tokens"]) == (2, 6)
    assert (b1["n_docs"], b1["n_tokens"]) == (2, 3)
    # first-seen semantics: {a,b,c,e} first in bucket 0, {d} in 1
    assert b0["new_types"] == 4 and b1["new_types"] == 1
    assert b0["vocab_cum"] == 4 and b1["vocab_cum"] == 5
    assert b0["tokens_cum"] == 6 and b1["tokens_cum"] == 9


def test_heaps_profile_negative_ids_and_blank(spark):
    rows = [(-3, "x y"), (-2, ""), (5, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r for r in
           heaps_profile(df, "doc_id", "text", n_buckets=4).collect()}
    # pmod(-3, 4) = 1 = pmod(5, 4) (two docs, 3 tokens);
    # pmod(-2, 4) = 2 (blank text -> 0 tokens)
    assert out[1]["n_docs"] == 2 and out[1]["n_tokens"] == 3
    assert out[1]["new_types"] == 2 and out[1]["vocab_cum"] == 2
    assert out[2]["n_tokens"] == 0 and out[2]["vocab_cum"] == 2
    assert sum(r["new_types"] for r in out.values()) == 2


# ----------------------------------------------------------------- zipf

def test_zipf_profile_ranks_ties_and_slope(spark):
    # freqs: b=4, a=4, c=2, d=1 -> tie a/b broken token-ascending
    rows = [(1, "a b a b"), (2, "a b c C"), (3, "a b c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = zipf_profile(df, "text", topk=3).collect()
    got = [(r["term_rank"], r["token"], r["freq"]) for r in out]
    assert sorted(got) == [(1, "a", 4), (2, "b", 4), (3, "c", 3)]
    # slope identical on every row and equals the closed-form fit
    xs = [math.log(r) for r, _, _ in sorted(got)]
    ys = [math.log(f) for _, _, f in sorted(got)]
    mx, my = sum(xs) / 3, sum(ys) / 3
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / \
        sum((x - mx) ** 2 for x in xs)
    assert {round(r["zipf_slope"], 6) for r in out} == {round(slope, 6)}


# ------------------------------------------------------------- winnowing

def _h60(gram: str) -> int:
    return int(hashlib.md5((gram + ":w").encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int, w: int):
    """Literal reference implementation of the paper's scheme."""
    import re

    key = re.sub(r"\s+", " ", text.lower()).strip()
    if len(key) < k:
        return set()
    h = [_h60(key[i:i + k]) for i in range(len(key) - k + 1)]
    if len(h) < w:
        mn = min(h)
        # rightmost occurrence of the min
        return {(max(i for i, v in enumerate(h) if v == mn), mn)}
    out = set()
    for j in range(len(h) - w + 1):
        window = h[j:j + w]
        mn = min(window)
        pos = j + max(i for i, v in enumerate(window) if v == mn)
        out.add((pos, mn))
    return out


@pytest.mark.parametrize("text", [
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaa",                      # all-equal hashes: tie-breaks
    "ab" * 20,                           # period-2 repetition
    "  spaced   out\ttext  with   runs ",
    "tiny",                              # shorter than k -> no output
    "sixch",                             # exactly one gram (k=5, len 6? -> 2)
    "12345",                             # exactly k chars -> 1 gram
])
def test_winnow_matches_reference_implementation(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {(r["pos"], r["fp"]) for r in
           winnow_fingerprints(df, "doc_id", "text", k=5, w=4).collect()}
    assert got == _py_winnow(text, 5, 4)


def test_winnow_shared_substring_guarantee(spark):
    """The paper's guarantee: any shared substring of length
    >= k + w - 1 produces at least one COMMON fingerprint."""
    k, w = 5, 4
    shared = "unmistakable shared passage"
    assert len(shared) >= k + w - 1
    rows = [(1, "left context " + shared + " and more"),
            (2, "totally different opening then " + shared)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(df, "doc_id", "text", k=k, w=w).collect()
    fps1 = {r["fp"] for r in out if r["doc_id"] == 1}
    fps2 = {r["fp"] for r in out if r["doc_id"] == 2}
    assert fps1 & fps2, "winnowing guarantee violated"


def test_winnow_plan_has_no_shuffle(spark):
    df = spark.createDataFrame([(1, "abcdefghij")],
                               "doc_id long, text string")
    plan = winnow_fingerprints(df, "doc_id", "text")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# -------------------------------------------------------------- postings

def test_postings_positions_df_and_band(spark):
    rows = [
        (1, "a b a c stop"),
        (2, "b a stop"),
        (3, "c stop"),
        (4, "hapax stop"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = build_postings(df, "doc_id", "text", min_df=2, max_df=3)
    got = {(r["term"], r["doc_id"]): (r["term_df"], r["n_occ"],
                                      r["positions"])
           for r in out.collect()}
    # 'stop' df=4 > max_df: pruned; 'hapax' df=1 < min_df: pruned
    assert not any(t == "stop" for t, _ in got)
    assert not any(t == "hapax" for t, _ in got)
    assert got[("a", 1)] == (2, 2, "0,2")
    assert got[("a", 2)] == (2, 1, "1")
    assert got[("b", 1)] == (2, 1, "1")
    assert got[("b", 2)] == (2, 1, "0")
    assert got[("c", 1)] == (2, 1, "3")
    assert got[("c", 3)] == (2, 1, "0")
    assert len(got) == 6


def test_postings_case_folds_and_skips_null(spark):
    rows = [(1, "A a"), (2, None), (3, "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["term"], r["doc_id"]): r["positions"]
           for r in build_postings(df, "doc_id", "text",
                                   min_df=2).collect()}
    assert got == {("a", 1): "0,1", ("a", 3): "0"}


# ------------------------------------------------------------------ nfc

def test_nfc_audit_hand_rows(spark):
    decomposed = "cafe\u0301"   # e + combining acute
    composed = "caf\u00e9"
    rows = [(1, decomposed), (2, composed), (3, None), (4, ""),
            (5, "plain ascii")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           nfc_audit(df, "doc_id", "text").collect()}
    assert out[1]["changed"] is True
    assert (out[1]["chars_before"], out[1]["chars_after"]) == (5, 4)
    assert (out[1]["bytes_before"], out[1]["bytes_after"]) == (6, 5)
    # normalization converges: md5(norm(decomposed)) == md5(composed)
    assert out[1]["norm_md5"] == out[2]["norm_md5"]
    assert out[2]["changed"] is False
    assert out[3]["changed"] is False and out[3]["norm_md5"] is None
    assert out[4]["changed"] is False
    assert out[4]["chars_before"] == 0 and out[4]["bytes_after"] == 0
    assert out[5]["changed"] is False


def test_nfc_audit_rejects_unknown_form(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        nfc_audit(df, "doc_id", "text", form="NFX")


# --------------------------------------------------------- winnow near-dup

def test_winnow_near_dup_pairs_and_overlap(spark):
    from json_schema_spark.operators.vocab import winnow_near_dup

    shared = "a long unmistakably shared passage of text"
    rows = [
        (1, shared + " with one ending"),
        (2, shared + " and a different close"),
        (3, "completely unrelated material nothing alike"),
        (4, shared + " with one ending"),          # identical to 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r for r in
           winnow_near_dup(df, "doc_id", "text", min_shared=2).collect()}
    assert (1, 2) in out and (1, 4) in out and (2, 4) in out
    assert not any(3 in p for p in out)
    # identical docs: identical fingerprint sets -> overlap exactly 1
    assert out[(1, 4)]["overlap"] == 1.0
    assert 0.0 < out[(1, 2)]["overlap"] <= 1.0
    assert out[(1, 2)]["n_shared"] >= 2


def test_winnow_near_dup_stop_fp_pruning(spark):
    from json_schema_spark.operators.vocab import winnow_near_dup

    boiler = "same boilerplate sentence appearing everywhere"
    rows = [(i, boiler + f" unique tail {i:03d}x") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # without the cap: every pair matches on the boilerplate
    dense = winnow_near_dup(df, "doc_id", "text", min_shared=2).count()
    assert dense > 0
    # cap 5 << 20 docs: boilerplate fps pruned, tails are unique ->
    # no pair survives
    pruned = winnow_near_dup(df, "doc_id", "text", min_shared=2,
                             max_fp_df=5).count()
    assert pruned == 0


# ------------------------------------------------------------ readability

def _py_readability(text):
    import re

    if text is None:
        return (None, None, None, None)
    toks = [t for t in re.split(r"\s+", text.lower().strip()) if t] \
        if text.strip() else []
    n_words = len(toks)
    n_sent = max(1, len(re.findall(r"[.!?]+", text)))
    n_syll = sum(max(1, len(re.findall(r"[aeiouy]+", t))) for t in toks)
    fre = None
    if n_words > 0:
        fre = round(206.835 - 1.015 * (n_words / n_sent)
                    - 84.6 * (n_syll / n_words), 4)
    return (n_words, n_sent, n_syll, fre)


@pytest.mark.parametrize("text", [
    "The cat sat. It ran fast!",
    "no punctuation here at all",
    "Dr. Smith went... Did he? Yes!!",
    "rhythm myth",                    # y-as-vowel + no-vowel floor
    "",
    None,
])
def test_readability_matches_reference(spark, text):
    from json_schema_spark.operators.textstats import readability_profile

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = readability_profile(df, "doc_id", "text").collect()[0]
    want = _py_readability(text)
    got = (r["n_words"], r["n_sentences"], r["n_syllables"],
           None if r["fre"] is None else round(r["fre"], 4))
    if text is None:
        assert got == (None, None, None, None)
    elif text == "":
        assert got == (0, 1, 0, None)
    else:
        assert got == want


def test_readability_plan_has_no_shuffle(spark):
    from json_schema_spark.operators.textstats import readability_profile

    df = spark.createDataFrame([(1, "a b c.")], "doc_id long, text string")
    plan = readability_profile(df, "doc_id", "text")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# pmi_collocations: PMI bigram collocations
# ---------------------------------------------------------------------------

def test_pmi_collocations_hand_values(spark):
    import math

    from json_schema_spark.operators.vocab import pmi_collocations

    df = spark.createDataFrame(
        [("hong kong is big and hong kong is old",),
         ("new york and hong kong",), ("big and old and new",),
         (None,), ("",)],
        "text string")
    got = {(r.w1, r.w2): r for r in pmi_collocations(
        df, "text", min_count=2, topk=10).collect()}
    # corpus: N = 9 + 5 + 5 = 19 tokens, B = 8 + 4 + 4 = 16 bigrams
    n, b = 19, 16
    # 'hong kong' x3 (never crosses doc bounds), hong x3, kong x3
    exp = round(math.log2((3 / b) / ((3 / n) * (3 / n))), 6)
    r = got[("hong", "kong")]
    assert (r.n_pair, r.n_w1, r.n_w2, r.pmi) == (3, 3, 3, exp)
    # min_count floors hapax pairs: 'york and' occurs once -> absent
    assert ("york", "and") not in got
    # determinism: ranks are 1..len with the (pmi desc, w1, w2) order
    ranks = sorted(r.rank for r in got.values())
    assert ranks == list(range(1, len(got) + 1))


def test_pmi_collocations_no_cross_document_bigrams(spark):
    from json_schema_spark.operators.vocab import pmi_collocations

    # 'b a' would only exist across the document boundary
    df = spark.createDataFrame([("a b",), ("a b",)], "text string")
    got = {(r.w1, r.w2) for r in pmi_collocations(
        df, "text", min_count=1, topk=10).collect()}
    assert got == {("a", "b")}
