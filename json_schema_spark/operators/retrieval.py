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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import ws_tokens

__all__ = ["bm25_topk"]


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
    ).select("id", "__toks", F.size("__toks").alias("dl"))
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
