"""Vocabulary-scaling and fingerprint-selection analyses for web-text
corpora: Heaps'-law vocabulary growth, Zipf rank-frequency profile,
winnowing fingerprints (Schleimer, Wilkes & Aiken, SIGMOD 2003 — the
MOSS local fingerprinting scheme), and inverted-index postings.

Reference seam: the reference engine (fisxoj/json-schema,
src/validators.lisp) validates documents one at a time; these are the
corpus-level term statistics a validation pipeline needs at 100 TB to
*choose* its constraints (vocabulary caps, stop-term lists, fingerprint
schemes) — engine-native additions with no per-row counterpart to port.

Scale shapes, per operator:

* ``heaps_profile`` — ONE explode of the token arrays collapses
  immediately through a partial-aggregable ``groupBy(token)`` to the
  token's first-seen bucket; everything after runs on the
  vocabulary-sized table and the ``n_buckets``-row rollup.  The
  cumulative window is over ``n_buckets`` rows, never the corpus.
* ``zipf_profile`` — one partial-aggregable term count, then a
  ``TakeOrderedAndProject`` top-k (no global sort materializes); the
  rank window and the regression run on the k-row result.
* ``winnow_fingerprints`` — pure per-document array expressions
  (gram-hash array materialized ONCE per doc in its own projection —
  the quality.py HOF rule — then windows as lambdas over the
  materialized column): zero shuffle until the caller aggregates.
* ``build_postings`` — posexplode collapses through two
  partial-aggregable groupBys ((term, doc) then term); positions are
  sorted doc-locally.  Document-frequency banding prunes stop terms
  BEFORE postings ship anywhere (the stop-gram precedent from
  dedup.py's n-gram join).

Every arithmetic choice here (md5-derived 60-bit hashes, rightmost
tie-breaks, 0-based positions) is DuckDB-replicable so the driver
oracles value-check each operator end to end.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import ws_tokens

__all__ = [
    "heaps_profile",
    "zipf_profile",
    "pmi_collocations",
    "winnow_fingerprints",
    "winnow_near_dup",
    "build_postings",
]


def heaps_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 16,
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve over ``n_buckets`` cumulative
    corpus chunks.

    Chunk assignment is ``pmod(id, n_buckets)`` — a deterministic
    id-hash split, overflow-free for any 64-bit id (an id*k scaling
    formula overflows on xxhash64-derived ids).  Random chunk order is
    the standard way to draw a Heaps curve; "cumulative corpus after
    b chunks" means the union of buckets 0..b.

    Returns one row per non-empty bucket: (bucket, n_docs, n_tokens,
    tokens_cum, new_types, vocab_cum) where ``new_types`` counts
    vocabulary terms whose FIRST bucket (min over occurrences) is this
    one, so ``vocab_cum`` = |vocab(union of buckets 0..b)| exactly.
    """
    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.pmod(F.col(id_col), F.lit(n_buckets)).alias("bucket"),
            ws_tokens(F.lower(F.col(text_col))).alias("__toks"),
        )
    )
    per_bucket = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("__toks")).alias("n_tokens"),
    )
    first_seen = (
        toks.select("bucket", F.explode("__toks").alias("tok"))
        .groupBy("tok")
        .agg(F.min("bucket").alias("first_b"))
        .groupBy(F.col("first_b").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(first_seen, "bucket", "left")
        .select(
            "bucket", "n_docs", "n_tokens",
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
        .select(
            "bucket", "n_docs", "n_tokens",
            F.sum("n_tokens").over(w).alias("tokens_cum"),
            "new_types",
            F.sum("new_types").over(w).alias("vocab_cum"),
        )
    )


def zipf_profile(df: DataFrame, text_col: str, topk: int = 100) -> DataFrame:
    """Zipf rank-frequency profile: the ``topk`` most frequent tokens
    with rank and a log-log least-squares slope (regr_slope of ln(freq)
    on ln(rank) over the top-k), the classic power-law fit.

    Ties break by token ascending so rank assignment is deterministic
    and engine-independent.  The slope is the same value on every row
    (rounded to 6 so JVM/DuckDB libm last-bit differences cannot
    surface); a corpus obeying Zipf shows slope near -1.
    """
    counts = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok").asc())
        .limit(topk)
    )
    ranked = counts.select(
        F.row_number()
        .over(Window.orderBy(F.col("freq").desc(), F.col("tok").asc()))
        .alias("term_rank"),
        F.col("tok").alias("token"),
        "freq",
    # lazy reuse barrier (r6, guide §7.2): ranked feeds both the slope
    # regression and the output crossJoin — without it the corpus
    # explode + groupBy + top-k executes twice. topk rows.
    ).localCheckpoint(eager=False)
    slope = ranked.agg(
        F.round(
            F.regr_slope(F.log(F.col("freq")), F.log(F.col("term_rank"))), 6
        ).alias("zipf_slope")
    )
    return ranked.crossJoin(F.broadcast(slope))


def _hash60(gram: Column) -> Column:
    """60-bit gram hash from the md5 hex prefix — the dedup.py 'md5'
    recipe, computable verbatim in DuckDB:
    ``('0x' || substr(md5(g || ':w'), 1, 15))::BIGINT``."""
    return F.conv(
        F.substring(F.md5(F.concat(gram, F.lit(":w"))), 1, 15), 16, 10
    ).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkes & Aiken 2003):
    hash every character ``k``-gram of the normalized text, slide a
    window of ``w`` consecutive gram hashes, and in each window select
    the minimum hash — RIGHTMOST occurrence on ties, the paper's rule —
    recording each selected (position, hash) once.  Guarantees every
    shared substring of length >= k + w - 1 contributes at least one
    matching fingerprint between two documents, which is what makes the
    selected ~1/w subset sufficient for local (substring-level)
    near-dup and plagiarism detection where MinHash (global Jaccard)
    and SimHash (global cosine) are blind.

    Normalization: lowercase, whitespace runs collapsed to one space,
    trimmed.  Documents whose normalized text is shorter than ``k``
    characters yield no fingerprints; documents with fewer than ``w``
    gram hashes yield the single global minimum (the degenerate
    one-window case).

    Returns exploded rows (id, pos, fp): ``pos`` is the 0-based gram
    start offset in the normalized text, ``fp`` the 60-bit md5-derived
    gram hash (DuckDB-replicable; seeded ':w').

    Plan shape: the gram-hash array is materialized in its OWN
    projection before any window lambda touches it (quality.py rule —
    an inlined expression re-evaluates per lambda element, turning
    O(n·w) into O(n²·w)); window argmins are pure array expressions;
    zero shuffle, zero Python.
    """
    key = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    d1 = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), key.alias("__key"))
        .where(F.char_length("__key") >= k)
    )
    d2 = d1.select(
        id_col,
        F.transform(
            F.sequence(F.lit(1), F.char_length("__key") - (k - 1)),
            lambda i: _hash60(F.substr(F.col("__key"), i, F.lit(k))),
        ).alias("__h"),
    )
    h = F.col("__h")

    def argmin(j: Column, width: Column) -> Column:
        """Rightmost argmin of h[j .. j+width-1] (1-based j) as a
        (pos, fp) struct; pos is the 0-based gram index."""
        mn = F.array_min(F.slice(h, j, width))
        off = F.aggregate(
            F.sequence(F.lit(0), width - 1),
            F.lit(0),
            lambda acc, o: F.when(F.element_at(h, j + o) == mn, o)
            .otherwise(acc),
        )
        return F.struct(
            (j - 1 + off).cast("int").alias("pos"), mn.alias("fp")
        )

    nh = F.size(h)
    nw = nh - (w - 1)
    fps = F.when(
        nw >= 1,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), nw), lambda j: argmin(j, F.lit(w)))
        ),
    ).otherwise(F.array(argmin(F.lit(1), nh)))
    return (
        d2.select(id_col, F.explode(fps).alias("s"))
        .select(F.col(id_col), F.col("s.pos").alias("pos"),
                F.col("s.fp").alias("fp"))
    )


def winnow_near_dup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = None,
) -> DataFrame:
    """MOSS-style near-duplicate pairs: documents ranked by SHARED
    winnowing fingerprints — the local-similarity report layered on
    :func:`winnow_fingerprints` (every shared substring >= k+w-1 chars
    contributes a shared fingerprint, so heavy overlap is impossible
    to miss and the share count approximates covered length / w).

    Returns (doc_a, doc_b, n_shared, overlap): ``overlap`` is the
    Jaccard of the two fingerprint SETS (n_shared / (|A|+|B|-n_shared),
    rounded to 6), ``doc_a < doc_b``.

    Scale shape: positions drop first (distinct (doc, fp) — matching
    cares about which fingerprints, not where); ``max_fp_df`` prunes
    boilerplate fingerprints appearing in more than that many docs
    BEFORE the self-join (the dedup.py stop-gram rule: the df head is
    quadratic in the join and means "boilerplate", not "copied");
    fp-df 1 rows are dropped always (they cannot pair).  The pair
    groupBy and both size lookups are partial-aggregable.
    """
    fps = (
        winnow_fingerprints(df, id_col, text_col, k=k, w=w)
        .select(F.col(id_col).alias("doc"), "fp")
        .distinct()
        # three consumers (fp-df prune, the self-join side, sizes) —
        # without a barrier each one re-runs the fingerprint explode
        # over the corpus (measured: three identical scan stages in
        # the 1M soak); the lazy localCheckpoint is the sanctioned
        # reuse barrier (dedup.py / pipeline_web_curation precedent)
        .localCheckpoint(eager=False)
    )
    fp_df = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
    keep = fp_df.where(F.col("__df") >= 2)
    if max_fp_df is not None:
        keep = keep.where(F.col("__df") <= max_fp_df)
    pruned = fps.join(keep.select("fp"), "fp")
    a, b = pruned.alias("a"), pruned.alias("b")
    pairs = (
        a.join(b, on=[F.col("a.fp") == F.col("b.fp"),
                      F.col("a.doc") < F.col("b.doc")])
        .groupBy(F.col("a.doc").alias("doc_a"),
                 F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    sizes = fps.groupBy("doc").agg(F.count(F.lit(1)).alias("__n"))
    return (
        pairs.join(sizes.withColumnRenamed("doc", "doc_a")
                   .withColumnRenamed("__n", "__na"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b")
              .withColumnRenamed("__n", "__nb"), "doc_b")
        .select(
            "doc_a", "doc_b", "n_shared",
            F.round(F.col("n_shared") /
                    (F.col("__na") + F.col("__nb") - F.col("n_shared")),
                    6).alias("overlap"),
        )
    )


def build_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Positional inverted-index postings: one row per (term, doc)
    with the term's document frequency, within-doc occurrence count,
    and the sorted 0-based token positions as a comma-joined string.

    Document-frequency banding ([min_df, max_df]) prunes hapaxes and
    stop terms BEFORE postings go anywhere — at web scale the df>cap
    head is exactly the stop-gram set dedup.py prunes from its n-gram
    join, and an index without the band ships its heaviest, least
    selective rows for nothing.

    Plan shape: posexplode -> partial-aggregable groupBy(term, doc)
    (positions collected then sorted doc-locally — collect_list order
    is undefined across retries, so sort_array pins it) -> term df by
    a second partial-aggregable groupBy; the df band re-enters as a
    join on term.  No window over the corpus, no global sort.
    """
    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            ws_tokens(F.lower(F.col(text_col))).alias("__toks"),
        )
    )
    occ = toks.select(
        "doc_id", F.posexplode("__toks").alias("pos", "term")
    )
    postings = occ.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.array_join(F.sort_array(F.collect_list("pos")), ",")
        .alias("positions"),
    )
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("term_df"))
    band = dfreq.where(F.col("term_df") >= min_df)
    if max_df is not None:
        band = band.where(F.col("term_df") <= max_df)
    return postings.join(band, "term").select(
        "term", "term_df", "doc_id", "n_occ", "positions"
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
    topk: int = 50,
    round_to: int = 6,
) -> DataFrame:
    """Top-``topk`` bigram collocations by pointwise mutual information
    (Church & Hanks 1990): (w1, w2, n_pair, n_w1, n_w2, pmi, rank).

    PMI = log2( (c12/B) / ((c1/N) * (c2/N)) ) with N = corpus token
    count, B = corpus bigram (adjacency) count; bigrams never cross
    document boundaries.  High-PMI pairs are multi-word expressions —
    the standard corpus-linguistics signal for tokenizer vocabulary
    curation (which word pairs deserve a merged token) and for spotting
    templated/boilerplate phrasing.  ``min_count`` floors c12 (PMI of
    hapax pairs is pure noise and maximal — the classic failure mode).

    Scale shape: ONE tokenize projection feeds both explodes; unigram
    and bigram counts are partial-aggregable groupBys; the unigram
    table re-joins the (min_count-floored, so already small) bigram
    table by plain shuffle joins on the token key — vocabulary-sized
    inputs, NOT corpus-sized, and AQE broadcasts them when small;
    corpus scalars (N, B) re-enter as one broadcast row.  The final
    top-k is TakeOrdered on (pmi desc, w1, w2) over rounded PMI —
    deterministic and engine-independent.
    """
    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(ws_tokens(F.lower(F.col(text_col))).alias("__toks"))
        # lazy reuse barrier (r6, guide §7.2): three consumers (unigram
        # counts, bigram pairs, corpus scalars) — without it the
        # tokenize projection scans the corpus once per consumer.
        # Materializes the token arrays once, ~text-sized, linear.
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    uni = (
        toks.select(F.explode("__toks").alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    )
    pairs = (
        toks.where(F.size("__toks") >= 2)
        .select(F.explode(F.arrays_zip(
            F.slice(F.col("__toks"), 1, F.size("__toks") - 1).alias("w1"),
            F.slice(F.col("__toks"), 2, F.size("__toks") - 1).alias("w2"),
        )).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    big = (
        pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
    )
    scal = toks.agg(
        F.sum(F.size("__toks")).alias("n_corpus"),
        F.sum(F.greatest(F.size("__toks") - 1, F.lit(0))).alias("b_corpus"),
    )
    scored = (
        big.join(uni.select(F.col("tok").alias("w1"),
                            F.col("n_tok").alias("n_w1")), "w1")
        .join(uni.select(F.col("tok").alias("w2"),
                         F.col("n_tok").alias("n_w2")), "w2")
        .crossJoin(F.broadcast(scal))
        .select(
            "w1", "w2", "n_pair", "n_w1", "n_w2",
            F.round(F.log2(
                (F.col("n_pair") / F.col("b_corpus"))
                / ((F.col("n_w1") / F.col("n_corpus"))
                   * (F.col("n_w2") / F.col("n_corpus")))), round_to)
            .alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(topk)
    )
    return scored.select(
        "*",
        F.row_number().over(Window.orderBy(
            F.desc("pmi"), F.asc("w1"), F.asc("w2"))).alias("rank"))
