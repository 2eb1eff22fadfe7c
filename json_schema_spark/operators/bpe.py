"""Byte-pair-encoding merge training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") over a web-text
corpus — the tokenizer-training step of a pretraining-data pipeline:
learn the first N merge rules from corpus word frequencies, and apply
a learned merge table back to the corpus for subword token counts.

Reference scope note: the reference engine (fisxoj/json-schema) stops
at per-document keyword validation; this is a §2.8 training-pipeline
extension.

Scale shape (the 100 TB posture): the ONLY corpus-scale work is the
initial word-frequency aggregation — one partial-aggregable groupBy
on the exploded whitespace tokens.  Everything after operates on the
word-frequency table, which is VOCABULARY-sized (bounded by distinct
words, not corpus rows): each merge round is one explode+groupBy over
that bounded table plus a 1-row collect (the argmax pair).  The
driver loop is inherent to the algorithm — merge r+1's counts depend
on merge r's rewrite — and each iteration's driver traffic is exactly
one (pair, count) row.  The vocab table is ``localCheckpoint``-ed
every round so round r's plan does not replay rounds 0..r-1.

Greedy-merge parity: applying a merge "a b" -> "ab" must rewrite
non-overlapping occurrences greedily LEFT-TO-RIGHT — including
same-symbol runs, where alignment matters: merging ``a a`` over six
``a`` symbols must give ``aa aa aa``.  String-replace tricks on the
space-joined form CANNOT express this (a padded ``replace(' a a ')``
consumes the separator space shared by adjacent occurrences and
mis-aligns every run — measured: 6 a's -> ``aa a aa a``), and RE2
(the DuckDB oracle's engine) has no lookbehind to fix it.  The
correct construction, identical in both engines, is a left-FOLD over
the symbol array (Spark ``F.aggregate``, DuckDB ``list_reduce``):
the accumulator is the space-joined output built so far; a symbol
``x == b`` merges iff the accumulator ends with ``' ' || a``.  The
boundary test is unambiguous because symbols never contain spaces,
and the greedy skip is automatic because a just-merged token ``a+b``
can never equal ``a`` (it is strictly longer).  tests/test_bpe.py
pins both engines against a literal Python port of the Sennrich
reference loop, including run-heavy inputs.

Determinism: argmax tie-break is (count DESC, pair ASC) under binary
string ordering — identical in Spark and DuckDB default collations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# End-of-word marker appended as a standalone symbol (Sennrich §3.2);
# single-character words still yield one adjacent pair with it.
EOW = "</w>"


def _char_symbols(word: Column) -> Column:
    """Space-joined characters + the end-of-word marker symbol."""
    return F.concat(
        F.trim(F.regexp_replace(word, r"(.)", r"$1 ")), F.lit(" " + EOW)
    )


def word_frequencies(
    df: DataFrame, text_col: str, lowercase: bool = True
) -> DataFrame:
    """Corpus -> (symstr, freq) word-frequency table.  The one
    corpus-scale pass: explode whitespace tokens, partial-aggregable
    count per distinct word, then project each word to its initial
    character-symbol string."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = (
        df.where(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(F.explode(F.split(F.trim(text), r"\s+")).alias("w"))
        .where(F.col("w") != "")
    )
    return (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(_char_symbols(F.col("w")).alias("s"), "freq")
    )


def _adjacent_pairs(s: Column) -> Column:
    """Array of adjacent symbol pairs ('sym1 sym2') in a symbol
    string.  The symbol array is bound once via a higher-order lambda
    over an index sequence (no repeated split)."""
    syms = F.split(s, " ")
    # sequence(0, -1) is DESCENDING in Spark, not empty — guard the
    # single-symbol case explicitly.
    return F.when(F.size(syms) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(syms) - 2),
            lambda i: F.concat_ws(" ", F.element_at(syms, i + 1),
                                  F.element_at(syms, i + 2)),
        )
    )


def _apply_merge(s: Column, pair: str) -> Column:
    """Greedy left-to-right non-overlapping merge rewrite via the
    accumulator fold (module docstring).  ``pair`` is a driver-side
    literal ('a b'), so lengths and the merged token fold into the
    codegen'd expression as constants."""
    a, b = pair.split(" ", 1)
    merged = a + b
    syms = F.split(s, " ")

    def step(acc: Column, x: Column) -> Column:
        return F.when(
            (x == F.lit(b)) & F.endswith(acc, F.lit(" " + a)),
            F.concat(
                F.substr(acc, F.lit(1), F.length(acc) - (len(a) + 1)),
                F.lit(" " + merged),
            ),
        ).otherwise(F.concat(acc, F.lit(" "), x))

    # F.trim can't be passed bare as `finish`: its optional second
    # parameter makes PySpark bind it as a 2-arg lambda.
    return F.aggregate(syms, F.lit(""), step, lambda acc: F.trim(acc))


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
    lowercase: bool = True,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules.  Returns the
    merge table — (merge_round int, pair string, merged string,
    pair_count bigint) — which IS the trained tokenizer artifact and
    is inherently driver-sized (one row per merge).

    Stops early if the vocabulary runs out of adjacent pairs."""
    spark = df.sparkSession
    vocab = word_frequencies(df, text_col, lowercase=lowercase)
    vocab = vocab.localCheckpoint(eager=False)
    # count materializes the vocabulary checkpoint (the corpus-scale
    # word-frequency groupBy runs under AQE) and sizes the merge loop's
    # shuffle width to the VOCABULARY, capped by the session's
    # configured parallelism. AQE is scoped OFF for the loop (r6,
    # guide §2.4): every round runs on the bounded word-type table, so
    # adaptive re-planning has nothing to adapt and only multiplies
    # driver jobs per round. Counts/merges are exact integers/strings
    # with a deterministic tie-break — results are width-independent.
    n_vocab = vocab.count()
    sp_before = spark.conf.get("spark.sql.shuffle.partitions")
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    p = max(1, min(int(sp_before), n_vocab // 100_000))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(p))

    rows: list[tuple[int, str, str, int]] = []
    try:
        for r in range(n_merges):
            top = (
                vocab.select(
                    F.explode(_adjacent_pairs(F.col("s"))).alias("pr"),
                    "freq")
                .groupBy("pr")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("pr"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            pair, cnt = top[0]["pr"], int(top[0]["cnt"])
            rows.append((r, pair, pair.replace(" ", ""), cnt))
            vocab = vocab.select(
                _apply_merge(F.col("s"), pair).alias("s"), "freq"
            ).localCheckpoint(eager=False)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", sp_before)

    return spark.createDataFrame(
        rows,
        "merge_round INT, pair STRING, merged STRING, pair_count BIGINT",
    )


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[str],
    lowercase: bool = True,
) -> DataFrame:
    """Apply a learned merge table and emit per-document subword token
    counts — (id, n_words, n_subtokens).

    Scale shape: the merge chain is applied to the DISTINCT-word
    vocabulary only (bounded), producing a word -> subtoken-count map
    that re-enters as a BROADCAST join against the exploded corpus;
    the corpus itself is never rewritten, and the only corpus-scale
    shuffle is the final per-document sum."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    doc_words = (
        df.where(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(F.col(id_col).alias("id"),
                F.explode(F.split(F.trim(text), r"\s+")).alias("w"))
        .where(F.col("w") != "")
    )
    sym = _char_symbols(F.col("w"))
    for pair in merges:
        sym = _apply_merge(sym, pair)
    word_map = (
        doc_words.select("w").distinct()
        .select("w", F.size(F.split(sym, " ")).alias("n_sub"))
    )
    return (
        doc_words.join(F.broadcast(word_map), "w")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_words"),
             F.sum("n_sub").alias("n_subtokens"))
    )


def tokenizer_fertility(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    merges: list[str],
    round_to: int = 6,
    lowercase: bool = True,
) -> DataFrame:
    """Tokenizer fertility audit by language: (lang, n_docs, n_words,
    n_subtokens, subtokens_per_word, chars_per_subtoken) under a
    frozen merge table — the standard multilingual-tokenizer equity
    check (languages the merges were not trained on fragment into more
    subtokens per word, inflating their effective sequence length and
    training cost; fertility ≈ 1 means the vocabulary fits).

    Scale shape: same as bpe_token_counts — the merge chain rewrites
    only the DISTINCT-word vocabulary (bounded) and re-enters as a
    broadcast; corpus-side work is one explode + two partial-
    aggregable groupBys (per-doc, then per-lang); word chars sum as
    length(w) in the same pass, so no second scan.
    """
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    doc_words = (
        df.where(F.col(text_col).isNotNull()
                 & (F.trim(F.col(text_col)) != ""))
        .select(F.col(id_col).alias("id"),
                F.col(lang_col).alias("lang"),
                F.explode(F.split(F.trim(text), r"\s+")).alias("w"))
        .where(F.col("w") != "")
    )
    sym = _char_symbols(F.col("w"))
    for pair in merges:
        sym = _apply_merge(sym, pair)
    word_map = (
        doc_words.select("w").distinct()
        .select("w", F.size(F.split(sym, " ")).alias("n_sub"))
    )
    per_doc = (
        doc_words.join(F.broadcast(word_map), "w")
        .groupBy("id", "lang")
        .agg(F.count(F.lit(1)).alias("n_words"),
             F.sum("n_sub").alias("n_subtokens"),
             F.sum(F.length("w")).alias("word_chars"))
    )
    return (
        per_doc.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_words").alias("n_words"),
             F.sum("n_subtokens").alias("n_subtokens"),
             F.round(F.sum("n_subtokens") / F.sum("n_words"), round_to)
             .alias("subtokens_per_word"),
             F.round(F.sum("word_chars") / F.sum("n_subtokens"), round_to)
             .alias("chars_per_subtoken"))
    )
