"""CCNet-style language-model perplexity scoring (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data"): score every document by its perplexity under a bigram LM
trained on a REFERENCE slice of the same corpus (CCNet trains KenLM on
Wikipedia; here the reference slice is a column predicate).  Low
perplexity ≈ reference-like prose; the canonical quality signal used
to bucket web text into head/middle/tail.

Reference scope note: the reference engine (fisxoj/json-schema) stops
at per-document keyword validation; this is a §2.8 training-pipeline
extension.

Scale shape (the 100 TB posture): tokens are materialized once (the
O(tokens²) HOF trap, see operators/quality.py); bigram and context
counts come from ONE pass over the reference slice (two combinable
groupBys on narrow keys); with ``n_buckets`` set, both the
(prev, cur) pair table and the context table hash into fixed md5
feature spaces, so the LM tables are BOUNDED (<= n_buckets rows) and
re-enter as BROADCAST joins — the corpus never shuffles on
vocabulary.  The exact-token variant (n_buckets=None) shuffle-joins on
the pair and exists for small-corpus / oracle work.  md5 bucketing
(not xxhash) so the DuckDB oracle reproduces every score.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _bucket
from .textstats import ws_tokens


def bigram_lm_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_reference: Column,
    alpha: float = 1.0,
    n_buckets: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-document bigram perplexity under a Laplace-smoothed LM
    trained on the ``is_reference`` rows:

        logp(cur | prev) = ln((c(prev,cur) + a) / (c(prev) + a*V))
        perplexity(d)    = exp(-mean over d's bigram positions of logp)

    V is the reference's distinct-unigram count (the smoothing
    denominator's vocabulary).  Bigrams never seen in the reference
    back off to the Laplace floor; a wholly unseen context scores
    ln(a / (a*V)) = -ln(V).  Documents with < 2 tokens are emitted
    with NULL perplexity (no bigram evidence), matching CCNet's
    undefined-score convention.

    Emits (id, n_bigrams, perplexity).

    Plan-shape note (measured at sf0.1, 5-rep medians): this layout —
    separate pair/context groupBys plus a broadcast id re-attach —
    runs ~0.6 s.  Two "obvious" improvements were tried and REVERTED
    as ~2x slower: (a) deriving both marginals from one
    (pair, ctx)-keyed gram shuffle (Spark does not reuse the gram
    exchange across the two marginal branches, so it pays the extra
    corpus-wide shuffle and still rescans), and (b) an explode_outer
    id spine with when()-guarded hash keys (the conditional around
    md5/conv blocks whole-stage-codegen subexpression sharing — the
    same branch-free lesson as BENCH/BASELINE.md's NULL-gate finding).
    At real scale the id re-attach join shuffles; if that matters,
    persist the tokenized projection and feed both branches from it.
    """
    did = F.col(id_col)
    toks = df.where(F.col(text_col).isNotNull()).select(
        did.alias("id"),
        is_reference.cast("boolean").alias("__ref"),
        ws_tokens(F.lower(F.col(text_col))).alias("__toks"),
    # lazy reuse barrier (r6, guide §7.2 — the docstring's "persist
    # the tokenized projection" note, now done): toks feeds the bigram
    # explode, the vocabulary scalar and the id spine — three corpus
    # tokenize scans without it. Token arrays, ~text-sized, linear.
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    # bigram positions: (prev, cur) for i in [0, n-2]; empty for n < 2
    pairs = toks.select(
        "id", "__ref",
        F.explode(
            F.when(
                F.size("__toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__toks") - 1),
                    lambda i: F.struct(
                        F.col("__toks")[i - 1].alias("prev"),
                        F.col("__toks")[i].alias("cur"),
                    ),
                ),
            ).otherwise(F.array().cast(
                "array<struct<prev:string,cur:string>>")),
        ).alias("bg"),
    ).select("id", "__ref", F.col("bg.prev").alias("prev"),
             F.col("bg.cur").alias("cur"))

    if n_buckets:
        pk = _bucket(F.concat_ws("\x1f", F.col("prev"), F.col("cur")),
                     seed=2, buckets=n_buckets)
        ck = _bucket(F.col("prev"), seed=3, buckets=n_buckets)
    else:
        pk = F.concat_ws("\x1f", F.col("prev"), F.col("cur"))
        ck = F.col("prev")
    # lazy reuse barrier (r6, guide §7.2): the keyed positions feed the
    # two reference count tables AND the scoring join — without it the
    # bigram explode plus its two md5 bucketings per position execute
    # three times. (id, ref, 2 keys) ≈ 26 bytes/position, linear.
    pairs = pairs.select("id", "__ref", pk.alias("pair_key"),
                         ck.alias("ctx_key")).localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)

    ref = pairs.where(F.col("__ref"))
    pair_counts = ref.groupBy("pair_key").agg(
        F.count(F.lit(1)).alias("c_pair"))
    ctx_counts = ref.groupBy("ctx_key").agg(
        F.count(F.lit(1)).alias("c_ctx"))
    # vocabulary: distinct reference unigrams (exact, not bucketed —
    # it is ONE scalar, and the smoothing mass should not shrink with
    # the feature-space size)
    vocab = (
        toks.where(F.col("__ref"))
        .select(F.explode("__toks").alias("t"))
        .agg(F.count_distinct("t").alias("v_size"))
    )
    if n_buckets:  # bounded tables -> broadcast; corpus never shuffles
        pair_counts = F.broadcast(pair_counts)
        ctx_counts = F.broadcast(ctx_counts)

    scored = (
        pairs.join(pair_counts, "pair_key", "left")
        .join(ctx_counts, "ctx_key", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            (
                F.log(
                    (F.coalesce(F.col("c_pair"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("c_ctx"), F.lit(0))
                       + F.lit(alpha) * F.col("v_size"))
                )
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.exp(-F.avg("logp")), round_to).alias("perplexity"),
    )
    # docs with < 2 tokens: no bigram rows — re-attach with NULLs
    all_ids = toks.select("id", F.size("__toks").alias("__n"))
    return (
        all_ids.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "perplexity",
        )
    )


def stupid_backoff_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_reference: Column,
    backoff: float = 0.4,
    n_buckets: int | None = None,
    round_to: int = 6,
    hash_fn: str = "xxhash",
) -> DataFrame:
    """Per-document trigram score under a stupid-backoff LM (Brants et
    al. 2007, "Large Language Models in Machine Translation" — the
    web-scale LM recipe: no discounting, no normalization, just counts
    and a constant backoff factor) trained on the ``is_reference``
    rows:

        S(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)        if trigram seen
                      = 0.4  * c(w2 w3) / c(w2)       elif bigram seen
                      = 0.4² * (c(w3) + 1) / (N + V)  else (add-one
                        floor so unseen words score > 0 — documented
                        deviation from the paper's c(w)/N, which is 0
                        on OOV)

    score(d) = exp(-mean over d's trigram positions of ln S); docs
    with < 3 tokens emit NULL (no trigram evidence), the same
    convention as bigram_lm_perplexity.  Emits (id, n_trigrams,
    sb_score).

    Scale shape: identical to bigram_lm_perplexity — tokens
    materialized once; trigram/bigram/unigram count tables come from
    partial-aggregable groupBys over the reference slice; with
    ``n_buckets`` every table hashes into a fixed md5 feature space
    (seeds #5/#6/#7), stays BOUNDED, and re-enters as a broadcast, so
    the corpus never shuffles on vocabulary; N and V are two broadcast
    scalars.  One bigram table serves both the trigram denominator
    (w1 w2) and the backoff numerator (w2 w3) — two lookups, one
    table.  The backoff CASE is null-gated on the LEFT-join results,
    branch-free per level.

    ``hash_fn``: 'xxhash' (the default since r6 — VERDICT r5 #5: md5
    burns 5 digests per trigram position and measured 2.6x slower at
    the 1M soak) keys the five bucket tables with JVM xxhash64 — the
    dedup family's fast-path recipe (same model, same plan shapes, no
    SQL twin); 'md5' is the DuckDB-reproducible ORACLE TWIN that
    q_stupid_backoff pins explicitly.  Ignored in exact mode
    (n_buckets=None).
    """
    if hash_fn not in ("md5", "xxhash"):
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash': {hash_fn}")
    did = F.col(id_col)
    toks = df.where(F.col(text_col).isNotNull()).select(
        did.alias("id"),
        is_reference.cast("boolean").alias("__ref"),
        ws_tokens(F.lower(F.col(text_col))).alias("__toks"),
    # lazy reuse barrier (r6, guide §7.2): toks feeds the trigram
    # explode, the reference bigram/unigram explodes and the id spine —
    # four corpus tokenize scans without it. Token arrays, linear.
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    sep = "\x1f"

    def _tri(t):  # trigram position structs, empty for n < 3
        return F.when(
            F.size(t) >= 3,
            F.transform(
                F.sequence(F.lit(2), F.size(t) - 1),
                lambda i: F.struct(
                    t[i - 2].alias("w1"), t[i - 1].alias("w2"),
                    t[i].alias("w3")),
            ),
        ).otherwise(F.array().cast(
            "array<struct<w1:string,w2:string,w3:string>>"))

    def _bi(t):  # bigram position structs, empty for n < 2
        return F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.struct(t[i - 1].alias("p"), t[i].alias("c")),
            ),
        ).otherwise(F.array().cast("array<struct<p:string,c:string>>"))

    def _k(col: Column, seed: int) -> Column:
        if not n_buckets:
            return col
        if hash_fn == "xxhash":
            return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(n_buckets))
        return _bucket(col, seed=seed, buckets=n_buckets)

    tri = toks.select(
        "id", "__ref", F.explode(_tri(F.col("__toks"))).alias("g"),
    ).select(
        "id", "__ref",
        _k(F.concat_ws(sep, "g.w1", "g.w2", "g.w3"), 5).alias("tri_key"),
        _k(F.concat_ws(sep, "g.w1", "g.w2"), 6).alias("ctx2_key"),
        _k(F.concat_ws(sep, "g.w2", "g.w3"), 6).alias("bi_key"),
        _k(F.col("g.w2"), 7).alias("w2_key"),
        _k(F.col("g.w3"), 7).alias("w3_key"),
    # lazy reuse barrier (r6, guide §7.2): tri feeds the reference
    # trigram count table AND the scoring join — without it the
    # trigram explode with its five bucket hashes per position (the
    # measured cost center of this operator) executes twice.
    # (id, ref, 5 keys) ≈ 50 bytes/position, linear.
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    ref_bi = toks.where(F.col("__ref")).select(
        F.explode(_bi(F.col("__toks"))).alias("b"))
    ref_uni = toks.where(F.col("__ref")).select(
        F.explode("__toks").alias("t"))
    c3 = tri.where(F.col("__ref")).groupBy("tri_key").agg(
        F.count(F.lit(1)).alias("c3"))
    c2 = ref_bi.select(
        _k(F.concat_ws(sep, "b.p", "b.c"), 6).alias("bi_key"),
    ).groupBy("bi_key").agg(F.count(F.lit(1)).alias("c2"))
    c1 = ref_uni.select(_k(F.col("t"), 7).alias("uni_key")).groupBy(
        "uni_key").agg(F.count(F.lit(1)).alias("c1"))
    scal = ref_uni.agg(
        F.count(F.lit(1)).alias("n_ref"),
        F.count_distinct("t").alias("v_size"))
    if n_buckets:  # bounded tables -> broadcast; corpus never shuffles
        c3, c2, c1 = F.broadcast(c3), F.broadcast(c2), F.broadcast(c1)

    logs = (
        tri.join(c3, "tri_key", "left")
        .join(c2.select(F.col("bi_key").alias("ctx2_key"),
                        F.col("c2").alias("c_ctx2")), "ctx2_key", "left")
        .join(c2, "bi_key", "left")
        .join(c1.select(F.col("uni_key").alias("w2_key"),
                        F.col("c1").alias("c_w2")), "w2_key", "left")
        .join(c1.select(F.col("uni_key").alias("w3_key"),
                        F.col("c1").alias("c_w3")), "w3_key", "left")
        .crossJoin(F.broadcast(scal))
        .select(
            "id",
            F.when(F.col("c3").isNotNull(),
                   F.log(F.col("c3") / F.col("c_ctx2")))
            .when(F.col("c2").isNotNull(),
                  F.log(backoff * F.col("c2") / F.col("c_w2")))
            .otherwise(F.log(
                (backoff * backoff)
                * (F.coalesce(F.col("c_w3"), F.lit(0)) + 1)
                / (F.col("n_ref") + F.col("v_size"))))
            .alias("logs"),
        )
    )
    per_doc = logs.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.round(F.exp(-F.avg("logs")), round_to).alias("sb_score"))
    all_ids = toks.select("id")
    return (
        all_ids.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_trigrams"), F.lit(0)).alias("n_trigrams"),
            "sb_score",
        )
    )
