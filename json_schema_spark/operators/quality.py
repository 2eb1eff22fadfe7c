"""Corpus-quality operators for training-data pipelines: Gopher-style
repetition signals, cross-document duplicate-span coverage, and PII
scanning/redaction.

Reference scope note: the reference engine (fisxoj/json-schema) stops at
per-document keyword validation; these operators are the §2.8
training-pipeline extensions a web-scale corpus needs BEFORE schema
validation even makes sense — filtering boilerplate-repetitive pages,
measuring cross-document contamination, and scrubbing PII.

Spark shapes (the 100 TB posture):

* Tokenization is ALWAYS its own projection (``tokens_df``). Higher-
  order functions are interpreted (never whole-stage-codegen'd) and
  re-evaluate every embedded subtree once per lambda ELEMENT — an
  inlined ``split(trim(text))`` inside a gram lambda is O(tokens²)
  regex scans per document (measured: a 26-minute single task at a
  5,000-doc benchmark scale; the same trap dedup.py's _ngrams_of
  documents). With tokens materialized, every gram expression
  references a plain attribute and the split runs once per row —
  CollapseProject keeps the projection separate because the attribute
  is referenced more than once.
* Per-document signals (``repetition_signals``) are then O(tokens·n)
  array expressions — no shuffle, no executor Python.
* The one corpus-level operator (``duplicate_span_coverage``) hashes
  every n-gram to a single xxhash64 BIGINT before the shuffle (rows
  stay narrow), aggregates doc-counts per gram with a partial-
  aggregable groupBy, and joins positions back on the hash — two
  shuffles on the gram key, both AQE-coalesced; no all-pairs join
  anywhere.  The 64-bit hash makes this (and ``cross_contamination``)
  SIGNAL-GRADE at the 100 TB posture, not exact: once distinct grams
  approach 2^32 (a few billion — reachable at that scale), birthday
  collisions inflate dup_spans/hit_spans by roughly
  n_grams²/2^65 expected false pairs.  Exact-at-scale callers pass
  ``hash_bits=128`` (two independently-seeded xxhash64s in a 16-byte
  struct key, collision horizon ~2^64 grams) at ~2x shuffle-key
  width; the DuckDB oracles compare exact strings, so any collision
  at TEST scale would surface as a value mismatch (none ever has:
  P(collision) < 1e-11 at 10^4 grams), and the fuzz suite pins the
  128-bit path row-equal to the 64-bit path on every corpus.
* PII scanning is `regexp_count`/`regexp_replace` built-ins with
  patterns restricted to the Java∩RE2 common subset so the DuckDB
  oracle runs the identical expressions.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import ws_tokens

__all__ = [
    "tokens_df",
    "word_ngram_strings",
    "dup_ngram_frac",
    "repetition_signals",
    "repetition_profile",
    "duplicate_span_coverage",
    "duplicate_span_removal",
    "cross_contamination",
    "fuzzy_contamination",
    "line_boilerplate_dedup",
    "compression_ratio",
    "gopher_rules",
    "c4_rules",
    "token_entropy",
    "PII_PATTERNS",
    "pii_counts",
    "pii_redact",
    "pii_profile",
]


def tokens_df(
    df: DataFrame, id_col: str, text_col: str, toks_col: str = "__toks",
) -> DataFrame:
    """(id, toks) projection — the mandatory materialization step
    before any gram lambda (see module docstring: an inlined split is
    re-evaluated once per lambda element)."""
    return df.select(
        F.col(id_col), ws_tokens(F.col(text_col)).alias(toks_col))


def word_ngram_strings(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of an ALREADY-MATERIALIZED token-array
    column, as array<string>.

    ``toks`` must be a plain column reference from a previous
    projection (use :func:`tokens_df`), never an inline
    ``ws_tokens(text)`` — the lambda body re-evaluates embedded
    subtrees per element.  Empty/short texts yield an empty array
    (never NULL) so downstream size() arithmetic stays three-valued-
    logic-free.
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dup_ngram_frac(toks: Column, n: int) -> Column:
    """Within-document duplicate n-gram fraction (Gopher repetition
    signal) over a materialized token-array column:
    1 - distinct_grams/total_grams.  0.0 for texts shorter than ``n``
    tokens.  Pure array expression — no explode, no shuffle.
    """
    grams = word_ngram_strings(toks, n)
    return F.when(
        F.size(grams) > 0,
        F.round(1.0 - F.size(F.array_distinct(grams)) / F.size(grams), 9),
    ).otherwise(F.lit(0.0))


def repetition_signals(toks: Column) -> list[tuple[str, Column]]:
    """The per-document repetition stack as (name, Column) pairs over a
    materialized token-array column: duplicate-fraction for 1/2/3/5-
    grams.  Callers project them in one pass."""
    return [
        ("dup_unigram_frac", dup_ngram_frac(toks, 1)),
        ("dup_bigram_frac", dup_ngram_frac(toks, 2)),
        ("dup_trigram_frac", dup_ngram_frac(toks, 3)),
        ("dup_5gram_frac", dup_ngram_frac(toks, 5)),
    ]


def repetition_profile(
    df: DataFrame, id_col: str, text_col: str, n: int = 2,
) -> DataFrame:
    """Per-document repetition profile incl. the top-n-gram mass
    fraction (fraction of n-gram slots taken by the single most
    frequent n-gram — the Gopher "top 2-gram character fraction"
    analog at token granularity).

    Shape: two branches joined on the doc id.  The SIGNALS branch is
    projection-only: tokens, then the four gram ARRAYS as their own
    projection (one interpreted transform each per doc row), then
    fracs as cheap array ops over those attributes.  The TOP-GRAM
    branch explodes the n-grams and runs two partial-aggregable
    groupBys.  Signals must NOT ride the groupBy as grouping keys: the
    optimizer collapses computed grouping keys into the aggregate's
    input projection, re-evaluating every gram lambda once per
    EXPLODED row instead of once per document (measured 96 s of CPU on
    5,000 docs before this split; ~1 s after).
    """
    toks = F.col("__toks")
    tdf = tokens_df(df, id_col, text_col)
    gram_arrays = tdf.select(
        F.col(id_col),
        *[word_ngram_strings(toks, k).alias(f"__g{k}") for k in (1, 2, 3, 5)],
        word_ngram_strings(toks, n).alias("__gn"),
    )

    def _frac(g: Column) -> Column:
        return F.when(
            F.size(g) > 0,
            F.round(1.0 - F.size(F.array_distinct(g)) / F.size(g), 9),
        ).otherwise(F.lit(0.0))

    signals = gram_arrays.select(
        F.col(id_col),
        F.size("__gn").alias("n_grams"),
        _frac(F.col("__g1")).alias("dup_unigram_frac"),
        _frac(F.col("__g2")).alias("dup_bigram_frac"),
        _frac(F.col("__g3")).alias("dup_trigram_frac"),
        _frac(F.col("__g5")).alias("dup_5gram_frac"),
    )
    exploded = tdf.select(
        F.col(id_col),
        F.explode_outer(word_ngram_strings(toks, n)).alias("__gram"),
    )
    top = (
        exploded.groupBy(id_col, "__gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max(F.when(F.col("__gram").isNotNull(), F.col("__c"))
                   .otherwise(F.lit(0))).alias("__top"))
    )
    return signals.join(top, id_col).select(
        id_col, "n_grams",
        "dup_unigram_frac", "dup_bigram_frac",
        "dup_trigram_frac", "dup_5gram_frac",
        F.when(F.col("n_grams") > 0,
               F.round(F.col("__top") / F.col("n_grams"), 9))
        .otherwise(F.lit(0.0)).alias("top_ngram_frac"),
    )


def _gram_key(g: Column, hash_bits: int) -> Column:
    """Shuffle key for an n-gram string: one xxhash64 BIGINT (8-byte
    rows, the default), or — for exactness past ~2^32 distinct grams,
    where 64-bit birthday collisions start inflating counts — a
    16-byte struct of two independently-seeded xxhash64s (Spark's
    xxhash64 folds every argument into the state, so appending a
    constant salt column yields an independent second hash; collision
    horizon moves to ~2^64 grams, far past any real corpus)."""
    if hash_bits == 64:
        return F.xxhash64(g)
    if hash_bits == 128:
        return F.struct(F.xxhash64(g).alias("h1"),
                        F.xxhash64(g, F.lit(1)).alias("h2"))
    raise ValueError(f"hash_bits must be 64 or 128, got {hash_bits}")


def duplicate_span_coverage(
    df: DataFrame, id_col: str, text_col: str, n: int = 10,
    hash_bits: int = 64,
) -> DataFrame:
    """Cross-document duplicate-span coverage: for each document, the
    fraction of its n-gram positions whose n-gram also occurs in at
    least one OTHER document — the n-gram-granular analog of exact
    substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better") that a SQL engine can actually run
    at corpus scale.

    Returns (id, n_spans, dup_spans, dup_span_frac).

    Scale shape: grams are xxhash64-hashed BIGINTs before any shuffle;
    gram -> distinct-doc-count is two partial-aggregable groupBys
    (dedupe (doc,gram), then count per gram — NO countDistinct row
    explosion); the position join back is a plain equi-join on the
    8-byte hash.  Stop-gram skew is bounded: a gram occurring in k
    docs contributes k join rows, linear in corpus positions.
    Signal-grade at extreme scale with the default 64-bit gram hash
    (birthday collisions once distinct grams approach 2^32 slightly
    inflate dup_spans — module docstring quantifies it); pass
    ``hash_bits=128`` for exactness at that scale at ~2x shuffle-key
    width (collision horizon ~2^64 grams).
    """
    toks = F.col("__toks")
    # explode_outer + post-filter on the GENERATED attribute: plain
    # explode lets InferFiltersFromGenerate push a size()>0 filter that
    # duplicates the whole gram expression below the projection
    # (shingle_grams documents the same trap)
    pos = (
        tokens_df(df, id_col, text_col)
        .select(
            F.col(id_col),
            F.explode_outer(
                F.transform(word_ngram_strings(toks, n),
                            lambda g: _gram_key(g, hash_bits))).alias("__g"),
        )
        .where(F.col("__g").isNotNull())
        # lazy reuse barrier (r6, guide §7.2): pos feeds both the
        # gram-doc-count branch and the coverage join — without it the
        # tokenize + gram-hash explode runs once per consumer.
        # Materializes (id, hash) = ~16 bytes/position, linear.
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    doc_gram = pos.select(id_col, "__g").distinct()
    gram_docs = doc_gram.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n_docs"))
    covered = (
        pos.join(gram_docs, "__g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("__n_docs") > 1).cast("long")).alias("dup_spans"),
        )
    )
    all_docs = df.select(id_col).distinct()
    return (
        all_docs.join(covered, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("dup_spans", F.lit(0)).alias("dup_spans"),
            F.when(F.coalesce("n_spans", F.lit(0)) > 0,
                   F.round(F.col("dup_spans") / F.col("n_spans"), 9))
            .otherwise(F.lit(0.0)).alias("dup_span_frac"),
        )
    )


def duplicate_span_removal(
    df: DataFrame, id_col: str, text_col: str, n: int = 10,
    hash_bits: int = 64,
) -> DataFrame:
    """Cross-document duplicate-span REMOVAL — the transformation that
    :func:`duplicate_span_coverage` only measures (Lee et al. 2022,
    exact-substring dedup, here at word-n-gram granularity): every
    token covered by at least one n-gram that also occurs in ANOTHER
    document is cut, in every document it appears in; the surviving
    tokens are reassembled in original order.

    Returns (id, n_tokens, removed_tokens, kept_text).  ``kept_text``
    is tokenizer-granular canonical text (whitespace runs collapse to
    single spaces, even for documents with zero removals) — callers
    needing the byte-identity invariant use the VALIDATION path, not a
    transformative dedup; NULL/blank text yields ``kept_text = ''``
    with zero counts.

    Scale shape: the same two partial-aggregable groupBys as coverage
    (dedupe (doc, gram-hash), count docs per gram), but the gram-docs
    side is FILTERED to doc-count > 1 **before** the position join, so
    only the duplicated-gram vocabulary (typically a small fraction of
    the corpus) flows through the inner join; duplicated START
    positions then collapse to one sorted per-doc array (one
    groupBy(doc), AQE-coalesced) and the token mask is evaluated
    doc-locally as pure array expressions — O(tokens x dup_positions)
    per document, bounded by page size, zero extra shuffle, no
    executor Python.  Same 64-bit signal-grade / 128-bit exact hashing
    ladder as the other gram operators (module docstring); the DuckDB
    oracle compares exact strings end-to-end (the reassembled text
    itself), so any hash collision at test scale surfaces as a value
    mismatch.
    """
    toksdf = tokens_df(df, id_col, text_col)
    toks = F.col("__toks")
    pos = (
        toksdf.select(
            F.col(id_col),
            F.posexplode_outer(
                F.transform(word_ngram_strings(toks, n),
                            lambda g: _gram_key(g, hash_bits)))
            .alias("__p", "__g"),
        )
        .where(F.col("__g").isNotNull())
        # lazy reuse barrier (r6, guide §7.2): pos feeds both the
        # dup-vocabulary branch and the position join — without it the
        # tokenize + gram-hash explode runs once per consumer.
        # Materializes (id, pos, hash) = ~20 bytes/position, linear.
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    doc_gram = pos.select(id_col, "__g").distinct()
    dup_grams = (
        doc_gram.groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .where(F.col("__nd") > 1)
        .select("__g")
    )
    dup_pos = (
        pos.join(dup_grams, "__g")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("__p")).alias("__dup"))
    )
    joined = toksdf.join(dup_pos, id_col, "left")
    dup = F.coalesce(F.col("__dup"), F.array().cast("array<int>"))
    # token i is cut iff some duplicated gram STARTS in [i-n+1, i];
    # F.filter's 0-based index matches posexplode's __p numbering
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(dup, lambda p: (p <= i) & (i <= p + (n - 1))),
    )
    ntok = F.coalesce(F.size(toks), F.lit(0))
    return joined.select(
        F.col(id_col),
        ntok.alias("n_tokens"),
        (ntok - F.coalesce(F.size(kept), F.lit(0))).alias("removed_tokens"),
        F.coalesce(F.array_join(kept, " "), F.lit("")).alias("kept_text"),
    )


def line_boilerplate_dedup(
    df: DataFrame, id_col: str, text_col: str,
    min_doc_freq: int = 2, hash_bits: int = 64,
    broadcast_hot: bool = True,
) -> DataFrame:
    """Line-level boilerplate removal (CCNet / RefinedWeb line-wise
    dedup): a line whose TRIMMED form is non-empty and occurs in at
    least ``min_doc_freq`` DISTINCT documents is boilerplate (cookie
    banners, nav bars, footers) and is dropped; every other line is
    preserved BYTE-IDENTICALLY and documents are reassembled in
    original line order.

    Returns (id, clean_text, n_lines, removed_lines, removed_frac).
    NULL text stays NULL with zero counts; empty trimmed lines are
    never boilerplate (they would trivially match across all docs).

    Scale shape: lines explode once; the hot-line set is a partial-
    aggregable two-stage groupBy on the xxhash64 of the trimmed line
    (dedupe (doc, line-hash), then count per hash — no countDistinct
    row explosion) FILTERED to count >= min_doc_freq BEFORE the join,
    so the probe side is only the boilerplate vocabulary — tiny
    relative to the corpus and broadcast by default
    (``broadcast_hot=False`` drops the hint for corpora whose hot set
    outgrows the driver, where AQE picks the strategy). Reassembly is
    one groupBy(doc) over (pos, line) structs. Same 64-bit
    signal-grade / 128-bit exact hashing ladder as the gram operators
    (module docstring); the DuckDB oracle compares exact strings, so
    a collision at test scale would surface as a value mismatch.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode_outer(F.split(F.col(text_col), "\n", -1))
        .alias("__pos", "__line"),
    # lazy reuse barrier (r6, guide §7.2): lines feeds the hot-line
    # vocabulary and the marking join — without it the line explode
    # over the corpus executes twice. Line rows, ~text-sized, linear.
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    norm = F.trim(F.col("__line"))
    hot = (
        lines.where(norm != "")
        .select(id_col, _gram_key(norm, hash_bits).alias("__h"))
        .distinct()
        .groupBy("__h").agg(F.count(F.lit(1)).alias("__nd"))
        .where(F.col("__nd") >= F.lit(int(min_doc_freq)))
        .select("__h")
    )
    if broadcast_hot:
        hot = F.broadcast(hot)
    marked = (
        lines.withColumn("__h", F.when(norm != "",
                                       _gram_key(norm, hash_bits)))
        .join(hot.withColumnRenamed("__h", "__hot_h"),
              F.col("__h").eqNullSafe(F.col("__hot_h")), "left")
        .withColumn("__drop", F.col("__hot_h").isNotNull())
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.sum(F.col("__line").isNotNull().cast("long")).alias("n_lines"),
            F.sum(F.col("__drop").cast("long")).alias("removed_lines"),
            F.when(
                F.sum(F.col("__line").isNotNull().cast("long")) > 0,
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.when(~F.col("__drop"),
                                   F.struct(F.col("__pos").alias("p"),
                                            F.col("__line").alias("l"))))),
                        lambda x: x.getField("l")),
                    "\n"),
            ).alias("clean_text"),
        )
        .select(
            id_col,
            "clean_text",
            "n_lines",
            "removed_lines",
            F.when(F.col("n_lines") > 0,
                   F.round(F.col("removed_lines") / F.col("n_lines"), 9))
            .otherwise(F.lit(0.0)).alias("removed_frac"),
        )
    )


def cross_contamination(
    train: DataFrame, eval_df: DataFrame,
    id_col: str, text_col: str, n: int = 8,
    hash_bits: int = 64,
) -> DataFrame:
    """Train/eval decontamination (the GPT-3/PaLM n-gram overlap
    check): for each EVAL document, the fraction of its n-gram
    positions whose n-gram appears anywhere in the TRAINING corpus.

    Returns (id, n_spans, hit_spans, contamination_frac) — one row per
    eval document, including gram-less ones (zeros).

    Scale shape: the training side collapses to its DISTINCT gram-hash
    set (xxhash64 BIGINTs, one partial-aggregable dedupe — at 100 TB
    this is the big side but it shuffles narrow 8-byte rows exactly
    once and can be persisted/bucketed for reuse across eval sets);
    eval positions LEFT-join that set on the hash, so the output is
    linear in eval positions.  No all-pairs anywhere.
    Signal-grade at extreme scale with the default 64-bit gram hash:
    birthday collisions past ~2^32 distinct training grams slightly
    inflate hit_spans — conservative in the safe direction for
    decontamination (false POSITIVE hits discard clean eval docs,
    never admit contaminated ones); pass ``hash_bits=128`` for
    exactness at that scale (module docstring).
    """
    def _pos(df: DataFrame) -> DataFrame:
        toks = F.col("__toks")
        return (
            tokens_df(df, id_col, text_col)
            .select(
                F.col(id_col),
                F.explode_outer(
                    F.transform(word_ngram_strings(toks, n),
                                lambda g: _gram_key(g, hash_bits))).alias("__g"),
            )
            .where(F.col("__g").isNotNull())
        )

    train_grams = _pos(train).select("__g").distinct() \
        .withColumn("__hit", F.lit(1))
    overlap = (
        _pos(eval_df)
        .join(train_grams, "__g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce("__hit", F.lit(0)).cast("long")).alias("hit_spans"),
        )
    )
    return (
        eval_df.select(id_col).distinct()
        .join(overlap, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("hit_spans", F.lit(0)).alias("hit_spans"),
            F.when(F.coalesce("n_spans", F.lit(0)) > 0,
                   F.round(F.col("hit_spans") / F.col("n_spans"), 9))
            .otherwise(F.lit(0.0)).alias("contamination_frac"),
        )
    )


def fuzzy_contamination(
    train: DataFrame, eval_df: DataFrame,
    id_col: str, text_col: str,
    max_dist: int = 4, prefix_len: int = 64,
) -> DataFrame:
    """FUZZY train/eval decontamination: surface (eval, train) pairs
    whose normalized document prefixes are within ``max_dist``
    single-character edits — the edit-distance complement of
    ``cross_contamination``'s exact n-gram overlap (catches light
    paraphrase/whitespace/punctuation mutations that break every
    n-gram but leave the text essentially identical; cf. the fuzzy
    dedup step in GPT-3 appendix A / Lee et al. 2022 §5).

    Comparison key: lowercase, whitespace collapsed to single spaces,
    NON-ASCII CHARACTERS STRIPPED, first ``prefix_len`` chars.  The
    ASCII projection is a deliberate parity decision: Spark's
    levenshtein counts CHARS while DuckDB's counts BYTES, so the
    oracle-checked key must make them coincide; a unicode-faithful
    variant is Spark-side only (drop the strip).

    Returns (eval_id, train_id, edit_dist), one row per matching pair.

    Scale shape — PassJoin segment pigeonhole (Li, Deng & Feng 2011;
    the published algorithm for distributed edit-distance joins).  A
    length band alone degenerates on web text (most normalized
    prefixes saturate at ``prefix_len``, putting the whole corpus in
    one bucket = brute force; measured: the 1M x 24k soak would have
    run ~24B levenshtein calls).  Instead each TRAIN key is split
    into d+1 contiguous segments: with at most d edits, at least one
    segment is untouched and appears VERBATIM in the eval key at a
    start position shifted by at most d — so the recall-complete
    equi-join key is (train_len, segment_index, segment_text), with
    the small eval side exploding to every (candidate train length,
    segment slot, allowed shift) substring (<= (2d+1)^2 * (d+1) keys
    per eval doc, deduped, then BROADCAST).  The train side explodes
    to d+1 narrow rows per doc; only segment-matching candidates ever
    reach the final thresholded-levenshtein confirm (early-exit DP).
    Keys shorter than d+1 chars cannot yield d+1 non-empty segments
    and take the length-band path instead (their band buckets are
    tiny by construction).  The blocking is recall-complete, so the
    output is value-identical to brute force — which is exactly what
    the DuckDB oracle computes.  Known caveat on natural text: common
    document openers share segments and inflate the candidate set;
    the mitigations are a longer ``prefix_len`` or larger d+1 (more,
    shorter segments are MORE selective here, not less).
    """
    d = max_dist

    def _key(c: Column) -> Column:
        ascii_only = F.regexp_replace(F.lower(c), r"[^\x00-\x7F]", "")
        collapsed = F.trim(F.regexp_replace(ascii_only, r"\s+", " "))
        return F.substring(collapsed, 1, prefix_len)

    def _seg_bounds(i: Column, length: Column):
        """Even split of a length-`length` key into d+1 segments:
        0-based start and length of segment i."""
        start = F.floor((i * length) / F.lit(d + 1)).cast("int")
        end = F.floor(((i + 1) * length) / F.lit(d + 1)).cast("int")
        return start, (end - start)

    ev = (
        eval_df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("eval_id"),
                _key(F.col(text_col)).alias("ep"))
        .where(F.col("ep") != "")
    )
    tr = (
        train.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("train_id"),
                _key(F.col(text_col)).alias("tp"))
        .where(F.col("tp") != "")
    )

    # --- segment path: train keys long enough for d+1 non-empty segs
    tl = F.length("tp")
    seg_structs = F.transform(
        F.sequence(F.lit(0), F.lit(d)),
        lambda i: F.struct(
            tl.cast("int").alias("L"),
            i.cast("int").alias("i"),
            F.substr(F.col("tp"), _seg_bounds(i, tl)[0] + 1,
                     _seg_bounds(i, tl)[1]).alias("seg"),
        ),
    )
    tr_segs = (
        tr.where(tl > d)
        .select("train_id", "tp", F.explode(seg_structs).alias("s"))
        .select("train_id", "tp", "s.L", "s.i", "s.seg")
    )

    M = F.length("ep")

    def _per_len(L: Column) -> Column:
        def _per_seg(i: Column) -> Column:
            start, slen = _seg_bounds(i, L)
            lo = F.greatest(F.lit(0), start - d)
            hi = F.least(M - slen, start + d)
            ps = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
                F.array().cast("array<int>"))
            return F.transform(
                ps,
                lambda p: F.struct(
                    L.cast("int").alias("L"), i.cast("int").alias("i"),
                    F.substr(F.col("ep"), p + 1, slen).alias("seg")),
            )
        return F.flatten(F.transform(F.sequence(F.lit(0), F.lit(d)),
                                     _per_seg))

    lenlo = F.greatest(F.lit(d + 1), M - d)
    lenhi = M + d
    cand_arr = F.array_distinct(F.flatten(
        F.when(lenlo <= lenhi, F.transform(F.sequence(lenlo, lenhi),
                                           _per_len))
        .otherwise(F.array().cast(
            "array<array<struct<L:int,i:int,seg:string>>>"))))
    ev_cands = (
        ev.select("eval_id", "ep", F.explode(cand_arr).alias("c"))
        .select("eval_id", "ep", "c.L", "c.i", "c.seg")
    )
    seg_pairs = tr_segs.join(F.broadcast(ev_cands), ["L", "i", "seg"]) \
        .select("eval_id", "train_id", "tp", "ep")

    # --- short path: train keys of length <= d (too short to segment;
    # their length-band buckets are tiny by construction)
    ev_short = ev.select(
        "eval_id", "ep",
        F.explode(F.sequence(F.greatest(F.lit(1), M - d), M + d))
        .alias("__len"),
    ).where(F.col("__len") <= d)
    short_pairs = (
        tr.where(tl <= d).withColumn("__len", tl)
        .join(F.broadcast(ev_short), "__len")
        .select("eval_id", "train_id", "tp", "ep")
    )

    dist = F.levenshtein(F.col("tp"), F.col("ep"), d)
    return (
        seg_pairs.unionByName(short_pairs)
        .dropDuplicates(["eval_id", "train_id"])
        .select("eval_id", "train_id", dist.alias("edit_dist"))
        .where(F.col("edit_dist") >= 0)  # threshold form returns -1 past it
    )


def compression_ratio(
    df: DataFrame, id_col: str, text_col: str, level: int = 6,
) -> DataFrame:
    """zlib-deflate compressibility per document:
    (id, utf8_bytes, zlib_bytes, compression_ratio) with ratio =
    zlib_bytes / utf8_bytes (NULL text -> NULL row values; empty text
    ratio = 1.0 by convention).

    The standard cheap boilerplate proxy (RefinedWeb/Dolma-style
    filters): repetitive machine-generated text compresses far below
    prose, so a low ratio flags boilerplate and a ratio near 1 flags
    high-entropy noise — both cut before training.

    zlib has no JVM/SQL twin, so this is deliberately the slow-path
    shape done right: one Arrow-batched ``mapInPandas`` over (id, text)
    only (per-BATCH Python, zlib itself is C; peak memory one Arrow
    batch per worker), zero shuffles, projection-parallel.  The pytest
    pins it against direct ``zlib.compress`` calls.
    """
    import zlib

    import pandas as pd

    def _sizes(batches):
        for pdf in batches:
            raw, comp = [], []
            for v in pdf[text_col]:
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    raw.append(None)
                    comp.append(None)
                else:
                    b = str(v).encode("utf-8")
                    raw.append(len(b))
                    comp.append(len(zlib.compress(b, level)))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "utf8_bytes": pd.array(raw, dtype="Int64"),
                "zlib_bytes": pd.array(comp, dtype="Int64"),
            })

    id_type = df.schema[id_col].dataType.simpleString()
    sized = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        _sizes,
        schema=f"{id_col} {id_type}, utf8_bytes long, zlib_bytes long")
    return sized.select(
        id_col, "utf8_bytes", "zlib_bytes",
        F.when(F.col("utf8_bytes") > 0,
               F.round(F.col("zlib_bytes") / F.col("utf8_bytes"), 9))
        .when(F.col("utf8_bytes") == 0, F.lit(1.0))
        .alias("compression_ratio"),
    )


# ---------------------------------------------------------------------------
# PII scanning / redaction
# ---------------------------------------------------------------------------

# Java∩RE2 common-subset patterns (no backrefs, no lookaround) so the
# DuckDB oracle can run the byte-identical expressions.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — deliberately loose, the web-pipeline norm
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    # NANP-ish phone: optional +1, 3-3-4 groups with ./-/space seps
    "phone": r"(\+1[ .\-]?)?\(?[0-9]{3}\)?[ .\-][0-9]{3}[ .\-][0-9]{4}",
    # dotted-quad with 1-3 digit octets (validation-grade ipv4 lives in
    # functions/formats.py; this is a scan pattern)
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
    # US SSN shape
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def pii_counts(col: Column) -> list[tuple[str, Column]]:
    """(kind, count Column) per PII pattern — regexp_count built-ins,
    fully codegen."""
    return [(k, F.regexp_count(col, F.lit(p))) for k, p in PII_PATTERNS.items()]


def pii_redact(col: Column) -> Column:
    """Replace every PII match with ``[PII:<kind>]``.  Order matters:
    email before phone/ipv4 so '1.2.3.4@x.co' redacts as one email,
    and ssn before phone so a 3-2-4 group is not half-eaten by the
    phone pattern's 3-3-4."""
    out = col
    for kind in ("email", "ssn", "phone", "ipv4"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"[PII:{kind}]")
    return out


def pii_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII counts + a total, one projection pass."""
    c = F.col(text_col)
    counts = pii_counts(c)
    total = None
    for _, cnt in counts:
        total = cnt if total is None else total + cnt
    return df.select(
        F.col(id_col),
        *[cnt.cast("long").alias(f"n_{k}") for k, cnt in counts],
        total.cast("long").alias("n_pii"),
    )


# Gopher rules (Rae et al. 2021, arXiv:2112.11446 Appendix A1.1):
# the canonical published heuristic-filter battery for web text.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stopwords: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Per-document Gopher quality-rule battery.  Emits every signal
    plus the combined verdict so downstream filters can loosen single
    rules without recomputing:

      (id, word_count, mean_word_len, symbol_word_ratio,
       bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
       n_stopwords, passes_gopher)

    Rules (Gopher A1.1): 50 <= words <= 100k; mean word length in
    [3, 10]; '#'/'...' symbol-to-word ratio <= 0.1; < 90% of lines
    bullet-started; < 30% of lines ellipsis-ended; >= 80% of words
    contain an alphabetic character; >= 2 distinct stopwords from an
    8-word list.

    Scale shape: one projection materializes tokens and lines (the
    O(tokens^2) HOF-inlining trap documented in this module's header),
    then every signal is a codegen'd array/regex expression — zero
    shuffle, zero executor Python, `text` never leaves the scan
    projection. Ratios are rounded BEFORE threshold comparison so the
    verdict is reproducible across engines (the DuckDB oracle compares
    the same rounded values).
    """
    did = F.col(id_col)
    base = df.where(F.col(text_col).isNotNull()).select(
        did.alias("id"),
        ws_tokens(F.col(text_col)).alias("__toks"),
        F.split(F.col(text_col), r"\n").alias("__lines"),
        F.col(text_col).alias("__text"),
    )
    wc = F.size("__toks")
    # try_divide: zero-word docs yield NULL ratios (ANSI mode would
    # throw), and the final verdict coalesces NULL -> False
    mean_wl = F.round(F.try_divide(
        F.aggregate("__toks", F.lit(0.0),
                    lambda acc, t: acc + F.char_length(t)), wc), round_to)
    n_symbols = (F.regexp_count(F.col("__text"), F.lit(r"#"))
                 + F.regexp_count(F.col("__text"), F.lit(r"\.\.\.")))
    sym_ratio = F.round(F.try_divide(n_symbols, wc), round_to)
    n_lines = F.size("__lines")
    bullet_frac = F.round(
        F.size(F.filter("__lines",
                        lambda l: F.ltrim(l).rlike(r"^[-*•]")))
        / n_lines, round_to)
    ellipsis_frac = F.round(
        F.size(F.filter("__lines",
                        lambda l: F.rtrim(l).rlike(r"\.\.\.$")))
        / n_lines, round_to)
    alpha_frac = F.round(F.try_divide(
        F.size(F.filter("__toks", lambda t: t.rlike("[A-Za-z]"))),
        wc), round_to)
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(
        F.transform("__toks", lambda t: F.lower(t)), stop_arr))
    sig = base.select(
        "id",
        wc.cast("long").alias("word_count"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_word_ratio"),
        F.when(n_lines > 0, bullet_frac).otherwise(0.0)
            .alias("bullet_line_frac"),
        F.when(n_lines > 0, ellipsis_frac).otherwise(0.0)
            .alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.cast("long").alias("n_stopwords"),
    )
    passes = (
        (F.col("word_count") >= min_words)
        & (F.col("word_count") <= max_words)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_frac") < 0.9)
        & (F.col("ellipsis_line_frac") < 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("n_stopwords") >= min_stopwords)
    )
    return sig.withColumn("passes_gopher", F.coalesce(passes, F.lit(False)))


def c4_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_kept_lines: int = 3,
    min_words_per_line: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """C4 page/line heuristics (Raffel et al. 2020, arXiv:1910.10683
    §2.2, the "Colossal Clean Crawled Corpus" cleaning recipe).
    Line-level: a line is KEPT iff it ends in terminal punctuation
    (. ! ? ") after right-trim AND contains >= ``min_words_per_line``
    whitespace words.  Page-level: the page passes iff it keeps >=
    ``min_kept_lines`` lines (C4's "at least 3 sentences" proxy) and
    contains none of the markers C4 drops pages for — '{' (code),
    'lorem ipsum' (boilerplate), or a line with the word 'javascript'
    (the paper's un-renderable-JS warning lines).

    Emits per page:
      (id, n_lines, n_kept_lines, kept_frac, has_brace, has_lorem,
       has_javascript_line, passes_c4)

    Scale shape: one projection materializes the line array; every
    signal is a codegen'd array/regex expression over it — zero
    shuffle, zero executor Python, `text` read once.  (The companion
    TRANSFORM — emitting the cleaned text itself — is
    ``array_join(filter(lines, kept), '\\n')`` over the same
    projection; this operator emits the signals so the verdict is
    hash-comparable.)
    """
    did = F.col(id_col)
    base = df.where(F.col(text_col).isNotNull()).select(
        did.alias("id"),
        F.split(F.col(text_col), r"\n").alias("__lines"),
        F.lower(F.col(text_col)).alias("__lower"),
    )

    def _kept(l: Column) -> Column:
        return F.rtrim(l).rlike(r'[.!?"]$') & (
            F.size(F.split(F.trim(l), r"\s+")) >= min_words_per_line)

    n_lines = F.size("__lines")
    n_kept = F.size(F.filter("__lines", _kept))
    sig = base.select(
        "id",
        n_lines.cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept_lines"),
        F.round(F.try_divide(n_kept, n_lines), round_to).alias("kept_frac"),
        F.col("__lower").contains("{").alias("has_brace"),
        F.col("__lower").contains("lorem ipsum").alias("has_lorem"),
        F.exists(
            "__lines", lambda l: F.lower(l).rlike(r"\bjavascript\b")
        ).alias("has_javascript_line"),
    )
    passes = (
        (F.col("n_kept_lines") >= min_kept_lines)
        & ~F.col("has_brace") & ~F.col("has_lorem")
        & ~F.col("has_javascript_line")
    )
    return sig.withColumn("passes_c4", F.coalesce(passes, F.lit(False)))


def token_entropy(df: DataFrame, id_col: str, text_col: str,
                  round_to: int = 6) -> DataFrame:
    """Per-document Shannon entropy of the token distribution, plus
    type-token ratio: (id, n_tokens, n_types, ttr, entropy,
    norm_entropy).

    Why: low token entropy is the information-theoretic repetitiveness
    signal — a doc that is one phrase looped scores near 0 bits while
    natural prose sits near its length ceiling; normalized entropy
    (H / log2(n_tokens)) makes the gate length-independent, and TTR is
    the classic lexical-diversity companion. Both are standard cheap
    pre-filters before validation/training.

    Scale shape: the token array materializes once and its SIZE rides
    the explode as ``dl`` (the bm25 trick), so per-token counts and
    the per-doc fold are TWO partial-aggregable groupBys with NO
    doc-level join and no window; the per-(doc, token) shuffle is the
    same volume dup_span_coverage already ships. The O(tokens^2)
    HOF-per-distinct-token shape (count each type via array scans) is
    the trap this module documents — not used.

    H = sum over types of (c/n) * log2(n/c)  (the log2(n/c) form makes
    a single-type doc exactly 0.0, no -0.0 edge); entropy and ttr
    round to ``round_to`` (cross-engine fp sum-order parity rule).
    Docs with no tokens (NULL/empty/whitespace text) carry no
    distribution and are omitted — gate them with c4/gopher rules.
    """
    did = F.col(id_col)
    toks = df.where(F.col(text_col).isNotNull()).select(
        did.alias("id"),
        ws_tokens(F.lower(F.col(text_col))).alias("__toks"),
    ).select("id", F.size("__toks").alias("dl"),
             F.explode("__toks").alias("tok"))
    counts = toks.groupBy("id", "dl", "tok").agg(
        F.count(F.lit(1)).alias("c"))
    h = F.sum((F.col("c") / F.col("dl"))
              * F.log2(F.col("dl") / F.col("c")))
    return (
        counts.groupBy("id", "dl")
        .agg(F.count(F.lit(1)).alias("n_types"),
             F.round(h, round_to).alias("entropy"))
        .select(
            F.col("id").alias(id_col),
            F.col("dl").alias("n_tokens"),
            "n_types",
            F.round(F.col("n_types") / F.col("dl"), round_to).alias("ttr"),
            "entropy",
            F.when(F.col("dl") > 1,
                   F.round(F.col("entropy") / F.log2(F.col("dl")),
                           round_to))
            .otherwise(F.lit(0.0)).alias("norm_entropy"),
        )
    )
