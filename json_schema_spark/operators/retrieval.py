"""Corpus retrieval scoring for training-data pipelines: BM25 top-k.

Why an analytics engine needs this: targeted-corpus construction
(e.g. "pull the 10k documents most relevant to these seed terms")
and contamination forensics both reduce to scoring every document in
a web-scale corpus against a SMALL query-term set and keeping the
top-k.  At 10^12 documents a search index is not available mid-
pipeline — but BM25 against a fixed term list is expressible as two
aggregates over one tokenized projection, which Spark executes as a
scan + map-side-filtered shuffle of only the MATCHING (doc, term)
pairs.

Scale shape (the whole point):
- the corpus text is tokenized ONCE into a materialized array column
  (the O(tokens^2) repeated-split trap documented in quality.py);
- the query-term list broadcasts; the explode is filtered by that
  broadcast join BEFORE any shuffle, so the only rows that ever
  shuffle are (doc, matching-term) pairs — for realistic term lists
  that is a vanishing fraction of 100 TB;
- corpus scalars (N, avgdl) and per-term document frequencies are
  aggregate-sized one-row / |terms|-row tables that re-enter as
  broadcasts, never a wide join;
- the final top-k is orderBy+limit, which Spark executes as a
  per-partition TakeOrdered + driver merge of k rows — no global sort.

The scoring function is classic Okapi BM25 (Robertson/Sparck Jones;
the +1 idf smoothing variant used by Lucene so idf is never
negative).  No counterpart exists in the reference (a JSON-Schema
validator, fisxoj/json-schema) — this is part of the LLM-pipeline
surface layered on the same engine.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import ws_tokens

__all__ = ["bm25_topk", "retrieval_eval"]


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Score every document against ``query_terms`` with Okapi BM25
    and return the top ``k`` as (id, score, n_matched_terms).

    score(d) = sum over query terms t of
        idf(t) * tf(t,d) * (k1+1) / (tf(t,d) + k1 * (1 - b + b*dl/avgdl))
    with idf(t) = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5)).

    Case-insensitive whitespace tokenization (``textstats.ws_tokens``
    over ``lower()``), so the DuckDB oracle reproduces every number;
    scores round to ``round_to`` and ties break on id so the top-k
    cut is deterministic across engines.  Only documents matching at
    least one query term can appear (BM25 of a non-matching doc is 0).
    """
    did, terms = F.col(id_col), sorted(set(t.lower() for t in query_terms))
    spark = df.sparkSession
    # tokenize once; dl = whitespace token count of the full document
    toks = df.where(F.col(text_col).isNotNull()).select(
        did.alias("id"),
        ws_tokens(F.lower(F.col(text_col))).alias("__toks"),
    ).select("id", "__toks", F.size("__toks").alias("dl")) \
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    # ^ lazy reuse barrier (r6, guide §7.2): toks feeds the corpus
    # scalars and the term-filtered explode — two tokenize scans
    # without it. Token arrays, ~text-sized, linear.
    # corpus scalars: one partially-aggregated pass, re-enters as a
    # broadcast 1-row table (never a collect)
    corpus = toks.agg(
        F.count(F.lit(1)).alias("n_corpus"),
        F.avg("dl").alias("avgdl"),
    )
    term_df = F.broadcast(
        spark.createDataFrame([(t,) for t in terms], "term string"))
    # explode filtered by the broadcast term list BEFORE the tf/df
    # shuffles: only matching (doc, term) pairs leave the scan stage
    matches = (
        toks.select("id", "dl", F.explode("__toks").alias("term"))
        .join(term_df, "term")
    )
    tf = matches.groupBy("id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    # df(t): |terms|-row aggregate -> broadcast back onto tf
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(1.0 + (F.col("n_corpus") - F.col("df_t") + 0.5)
                  / (F.col("df_t") + 0.5)),
        )
        .withColumn(
            "contrib",
            F.col("idf") * F.col("tf") * (k1 + 1.0)
            / (F.col("tf")
               + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.round(F.sum("contrib"), round_to).alias("score"),
            F.count(F.lit(1)).alias("n_matched_terms"),
        )
        # TakeOrdered of k rows, not a global sort
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )


def retrieval_eval(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: dict[str, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    score_round: int = 4,
    metric_round: int = 6,
    salted: bool = False,
    n_salts: int = 16,
) -> DataFrame:
    """Graded-relevance retrieval quality metrics (precision / recall /
    MRR / NDCG at ``k``) for multi-query BM25 rankings over the corpus.

    Why an analytics engine needs this: after building a filtered /
    deduplicated corpus, the standard acceptance check is "does ranked
    retrieval over the corpus still surface the right documents?" —
    i.e. score a panel of benchmark queries, rank, and compare the
    ranking against relevance labels.  Here the labels are derived
    deterministically from term coverage, so the whole evaluation is
    self-contained and cross-engine reproducible:

        rel(d, q) = 2  if d contains ALL  |q| distinct query terms
                    1  if d contains >= ceil(|q|/2) of them
                    0  otherwise

    Per query, documents are ranked by BM25 score (rounded to
    ``score_round`` BEFORE ranking, ties broken on id, so the cut is
    deterministic across engines), and the output is one row per qid:

        qid, n_cand, n_rel, hits_at_k, precision_at_k, recall_at_k,
        mrr_at_k, ndcg_at_k

    with DCG = sum(rel_i / log2(i + 1)) over the top-k positions and
    IDCG over the first k positions of the rel-descending ideal
    ordering.  Metrics round to ``metric_round`` (cross-engine fp sum
    order differs at ~1 ulp; round-6 parity is the house rule).

    Scale shape:
    - the corpus tokenizes ONCE; the (qid, term) panel broadcasts and
      filters the explode BEFORE any shuffle, so only matching
      (doc, term, qid) pairs leave the scan stage — everything after
      is proportional to match volume, not corpus volume;
    - per-(qid, term) document frequencies and per-qid term counts are
      aggregate-sized tables re-entering as broadcasts;
    - both ranking windows partition by qid, which at 10^12 docs is a
      hot-key risk: with ``salted=True``, a two-stage salted top-k
      (rank within (qid, md5-salt), keep k per bucket, then the real
      window over <= k * n_salts rows per qid) bounds any one task —
      same pigeonhole argument as sampling.per_domain_cap, and
      value-identical because the global top-k is contained in the
      union of per-salt top-ks.  The ideal-ordering window gets the
      same treatment (rank on (rel desc, id)).  n_cand / n_rel / MRR
      need no window at all — they are plain aggregates.

    No counterpart in the reference (a JSON-Schema validator); this is
    the LLM-pipeline evaluation surface on the same engine.
    """
    did = F.col(id_col)
    spark = df.sparkSession
    qrows = sorted(
        (qid, t)
        for qid, terms in queries.items()
        for t in sorted({x.lower() for x in terms})
    )
    qdf = F.broadcast(spark.createDataFrame(qrows, "qid string, term string"))
    mdf = F.broadcast(spark.createDataFrame(
        sorted((qid, len({x.lower() for x in terms}))
               for qid, terms in queries.items()),
        "qid string, m int"))
    toks = df.where(F.col(text_col).isNotNull()).select(
        did.alias("id"),
        ws_tokens(F.lower(F.col(text_col))).alias("__toks"),
    ).select("id", "__toks", F.size("__toks").alias("dl")) \
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    # ^ lazy reuse barrier (r6, guide §7.2): same two-consumer shape
    # as bm25_topk (corpus scalars + the panel-filtered explode)
    corpus = toks.agg(
        F.count(F.lit(1)).alias("n_corpus"),
        F.avg("dl").alias("avgdl"),
    )
    # broadcast-filtered explode: only matching (doc, term, qid) rows
    # ever shuffle
    matches = (
        toks.select("id", "dl", F.explode("__toks").alias("term"))
        .join(qdf, "term")
    )
    tf = matches.groupBy("qid", "id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("qid", "term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        tf.join(F.broadcast(dft), ["qid", "term"])
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "contrib",
            # parenthesization mirrored in the DuckDB oracle (same fp
            # op order); ln() differs at <= 1 ulp, invisible at round-4
            (F.log(1.0 + (F.col("n_corpus") - F.col("df_t") + 0.5)
                   / (F.col("df_t") + 0.5)) * F.col("tf") * (k1 + 1.0))
            / (F.col("tf")
               + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    cand = (
        scored.groupBy("qid", "id")
        .agg(
            F.round(F.sum("contrib"), score_round).alias("score"),
            F.count(F.lit(1)).alias("matched"),
        )
        .join(mdf, "qid")
        .withColumn(
            "rel",
            F.when(F.col("matched") == F.col("m"), F.lit(2))
            .when(F.col("matched") * 2 >= F.col("m"), F.lit(1))
            .otherwise(F.lit(0)),
        )
        # three consumers below (ranking window, ideal window, base
        # aggregates) — without a reuse barrier each re-runs the whole
        # tokenize+explode+double-groupBy pipeline (ReusedExchange does
        # NOT fire across separate actionsless branches; measured 3x
        # ~13 s stages at the 1M-doc soak). cand is the post-aggregation
        # (qid, matching-doc) table — bounded by query selectivity, the
        # operator's documented scale contract.
        .localCheckpoint(eager=False)
    )

    def _topk(cdf: DataFrame, order_cols: list, rank_name: str) -> DataFrame:
        out = cdf
        if salted:
            out = out.withColumn(
                "__salt",
                F.pmod(F.conv(F.substring(F.md5(
                    F.col("id").cast("string")), 1, 15), 16, 10)
                    .cast("bigint"), F.lit(n_salts)))
            w1 = Window.partitionBy("qid", "__salt").orderBy(*order_cols)
            out = (out.withColumn("__r1", F.row_number().over(w1))
                   .where(F.col("__r1") <= k).drop("__r1", "__salt"))
        w = Window.partitionBy("qid").orderBy(*order_cols)
        return (out.withColumn(rank_name, F.row_number().over(w))
                .where(F.col(rank_name) <= k))

    top = _topk(cand, [F.desc("score"), F.asc("id")], "rank")
    ideal = _topk(cand.where(F.col("rel") > 0),
                  [F.desc("rel"), F.asc("id")], "irank")
    idcg = ideal.groupBy("qid").agg(
        F.sum(F.col("rel") / F.log2(F.col("irank") + F.lit(1.0)))
        .alias("idcg"))
    base = cand.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_cand"),
        F.sum((F.col("rel") > 0).cast("long")).alias("n_rel"))
    topagg = top.groupBy("qid").agg(
        F.sum((F.col("rel") > 0).cast("long")).alias("hits_at_k"),
        F.sum(F.col("rel") / F.log2(F.col("rank") + F.lit(1.0)))
        .alias("dcg"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("frank"))
    return (
        base.join(topagg, "qid", "left").join(idcg, "qid", "left")
        .select(
            "qid", "n_cand", "n_rel",
            F.coalesce(F.col("hits_at_k"), F.lit(0)).alias("hits_at_k"),
            F.round(F.coalesce(F.col("hits_at_k"), F.lit(0))
                    / F.lit(float(k)), metric_round)
            .alias("precision_at_k"),
            F.when(F.col("n_rel") > 0,
                   F.round(F.coalesce(F.col("hits_at_k"), F.lit(0))
                           / F.col("n_rel").cast("double"), metric_round))
            .otherwise(F.lit(0.0)).alias("recall_at_k"),
            F.when(F.col("frank").isNotNull(),
                   F.round(F.lit(1.0) / F.col("frank"), metric_round))
            .otherwise(F.lit(0.0)).alias("mrr_at_k"),
            F.when(F.coalesce(F.col("idcg"), F.lit(0.0)) > 0.0,
                   F.round(F.coalesce(F.col("dcg"), F.lit(0.0))
                           / F.col("idcg"), metric_round))
            .otherwise(F.lit(0.0)).alias("ndcg_at_k"),
        )
    )
