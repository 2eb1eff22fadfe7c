"""BPE merge training (operators/bpe.py) vs a literal Python port of
the Sennrich et al. 2016 reference loop (learn_bpe.py's
get_pair_statistics / replace_pair, greedy left-to-right
non-overlapping), plus the two-pass padded-replace rewrite trick on
adversarial run-heavy inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_schema_spark.operators.bpe import (
    EOW,
    bpe_token_counts,
    bpe_train,
    word_frequencies,
)


# ---------------------------------------------------------------- reference
def _ref_word_freqs(texts: list[str]) -> dict[str, int]:
    freqs: dict[str, int] = {}
    for t in texts:
        if t is None or not t.strip():
            continue
        for w in t.lower().split():
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _ref_apply(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_bpe_full(freqs: dict[str, int], n_merges: int):
    """Reference loop kept deliberately simple: rewrite the whole
    vocab dict each round (vocab-sized, fine at test scale)."""
    vocab = {tuple(list(w) + [EOW]): f for w, f in freqs.items()}
    merges = []
    for r in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                key = (syms[i], syms[i + 1])
                pairs[key] = pairs.get(key, 0) + f
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        merges.append((r, f"{a} {b}", a + b, cnt))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            ns = _ref_apply(syms, a, b)
            nxt[ns] = nxt.get(ns, 0) + f
        vocab = nxt
    return merges, vocab


TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a banana and a bandana",
    "low lower lowest newer newest",
    "ababab abab ab",       # adjacent-run rewrites (two-pass trick)
    "aaaa aaa aa a",        # same-symbol runs (greedy left-alignment)
    "the the the banana band",
    "",
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t) for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(rows, "doc_id INT, text STRING")


def test_word_frequencies_match_reference(docs):
    got = {
        r["s"]: r["freq"]
        for r in word_frequencies(docs, "text").collect()
    }
    want = {
        " ".join(list(w) + [EOW]): f
        for w, f in _ref_word_freqs(TEXTS).items()
    }
    assert got == want


def test_bpe_train_matches_reference_loop(docs):
    n = 10
    got = [tuple(r) for r in bpe_train(docs, "text", n_merges=n)
           .orderBy("merge_round").collect()]
    want, _ = _ref_bpe_full(_ref_word_freqs(TEXTS), n)
    assert got == want


def test_bpe_train_run_heavy_rewrites(spark):
    """'a a' must merge left-to-right through runs exactly like the
    reference: 'aaaa' -> (aa aa), 'aaa' -> (aa a)."""
    df = spark.createDataFrame(
        [(0, "aaaa aaa aa aaaaa aaaaaa")], "doc_id INT, text STRING"
    )
    got = [tuple(r) for r in bpe_train(df, "text", n_merges=4)
           .orderBy("merge_round").collect()]
    want, vocab = _ref_bpe_full(_ref_word_freqs(["aaaa aaa aa aaaaa aaaaaa"]), 4)
    assert got == want


def test_bpe_train_stops_when_pairs_exhausted(spark):
    # single-char words: one pair each with </w>; after merging them
    # all, no adjacent pairs remain anywhere.
    df = spark.createDataFrame([(0, "x y x y x")], "doc_id INT, text STRING")
    out = bpe_train(df, "text", n_merges=50).collect()
    assert len(out) == 2  # 'x </w>' then 'y </w>'
    assert {r["merged"] for r in out} == {"x" + EOW, "y" + EOW}


def test_token_counts_match_reference_apply(docs):
    n = 6
    merges_df = bpe_train(docs, "text", n_merges=n)
    merges = [r["pair"] for r in merges_df.orderBy("merge_round").collect()]
    got = {
        r["id"]: (r["n_words"], r["n_subtokens"])
        for r in bpe_token_counts(docs, "doc_id", "text", merges).collect()
    }

    _, vocab_after = _ref_bpe_full(_ref_word_freqs(TEXTS), n)
    # reference per-word subtoken length after the same merges
    word_len: dict[str, int] = {}
    for w in _ref_word_freqs(TEXTS):
        syms = tuple(list(w) + [EOW])
        for pr in merges:
            a, b = pr.split(" ", 1)
            syms = _ref_apply(syms, a, b)
        word_len[w] = len(syms)
    want = {}
    for i, t in enumerate(TEXTS):
        ws = [w for w in (t or "").lower().split() if w]
        if ws:
            want[i] = (len(ws), sum(word_len[w] for w in ws))
    assert got == want


def test_token_counts_zero_merges_is_charlen_plus_one(docs):
    got = {
        r["id"]: r["n_subtokens"]
        for r in bpe_token_counts(docs, "doc_id", "text", []).collect()
    }
    for i, t in enumerate(TEXTS):
        ws = [w for w in (t or "").lower().split() if w]
        if ws:
            assert got[i] == sum(len(w) + 1 for w in ws)


def test_tokenizer_fertility_hand_values(spark):
    from json_schema_spark.operators.bpe import tokenizer_fertility

    # merges: 'l o'->'lo', 'lo w'? no — keep one merge 'l o'
    rows = [
        (1, "low low", "en"),    # 'low' -> l o w </w> -> lo w </w> (3 subs)
        (2, "lo", "en"),         # 'lo'  -> l o </w>   -> lo </w>  (2 subs)
        (3, "xy", "de"),         # no merge applies: x y </w> (3 subs)
        (4, "  ", "fr"),         # whitespace-only: excluded
        (5, None, "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.lang: r for r in tokenizer_fertility(
        df, "doc_id", "text", "lang", ["l o"]).collect()}
    en = got["en"]
    # en: 3 words (low x2, lo), subtokens 3+3+2=8, chars 3+3+2=8
    assert (en.n_docs, en.n_words, en.n_subtokens) == (2, 3, 8)
    assert en.subtokens_per_word == round(8 / 3, 6)
    assert en.chars_per_subtoken == 1.0
    de = got["de"]
    # de fragments worse: 3 subtokens for one 2-char word
    assert (de.n_docs, de.n_words, de.n_subtokens) == (1, 1, 3)
    assert de.subtokens_per_word == 3.0
    assert de.subtokens_per_word > en.subtokens_per_word  # equity gap
    assert "fr" not in got
