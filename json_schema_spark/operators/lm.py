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
    )
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
    pairs = pairs.select("id", "__ref", pk.alias("pair_key"),
                         ck.alias("ctx_key"))

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
