"""Sequence packing: assign documents to fixed-token-budget packs —
the pretraining step that turns a cleaned corpus into dense
fixed-context training rows (pack to a 2k/4k/8k window, minimal
padding).

Spark shape (100 TB posture): a GLOBAL greedy pack would need one
total ordering — a single sort, a non-starter at corpus scale.
Instead documents hash into ``n_shards`` independent shards and pack
CONTIGUOUSLY within their shard in deterministic (id) order: one
window (cumulative token sum) per shard, all shards in parallel, one
shuffle total.  Pack quality is statistically identical to global
packing for any corpus whose length distribution is shard-stationary
(hash sharding guarantees it), and the assignment is reproducible on
any cluster size — same property the deterministic sampler
(operators/sampling.py) provides.

A document longer than the budget is truncated to one full pack (its
``packed_tokens`` caps at the budget) — the standard behavior; the
row keeps ``n_tokens`` so the truncation is auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _bucket
from .textstats import token_count, ws_tokens

__all__ = ["pack_assignments", "pack_summary", "chunk_tokens"]


def pack_assignments(
    df: DataFrame, id_col: str, text_col: str,
    budget: int = 2048, n_shards: int = 64,
) -> DataFrame:
    """Per-document pack assignment:
    (id, n_tokens, packed_tokens, shard, pack_id, pack_key).

    ``pack_id`` is the budget window the document's START offset lands
    in within its shard's id-ordered token stream — contiguous-fill
    packing: floor((running_sum - packed_tokens) / budget).  Documents
    with NULL text or zero tokens pack as zero-width (they join the
    pack at their offset and consume nothing).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks = F.coalesce(token_count(F.col(text_col)), F.lit(0))
    base = df.select(
        F.col(id_col),
        toks.cast("long").alias("n_tokens"),
        F.least(toks, F.lit(budget)).cast("long").alias("packed_tokens"),
        # md5-derived shard (the sampler's _bucket): content-keyed,
        # partitioning-independent, and reproducible by the DuckDB
        # oracle verbatim (xxhash64 has no DuckDB twin)
        _bucket(F.col(id_col), seed=0, buckets=n_shards).alias("shard"),
    )
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return base.select(
        id_col, "n_tokens", "packed_tokens", "shard",
        F.floor((F.sum("packed_tokens").over(w) - F.col("packed_tokens"))
                / budget).cast("long").alias("pack_id"),
    ).withColumn(
        "pack_key",
        F.concat(F.col("shard").cast("string"), F.lit("#"),
                 F.col("pack_id").cast("string")),
    )


def pack_summary(
    df: DataFrame, id_col: str, text_col: str,
    budget: int = 2048, n_shards: int = 64,
) -> DataFrame:
    """Per-pack roll-up: (shard, pack_id, n_docs, pack_tokens,
    fill_ratio).  One aggregate over :func:`pack_assignments` — the
    padding-waste report a packing run is judged by.  Note a pack's
    token sum may exceed ``budget`` (the last document in a pack
    straddles the boundary by design — contiguous fill never splits a
    document except for over-budget singletons); ``fill_ratio`` is
    measured against the budget, so straddlers report > 1.0.
    """
    return (
        pack_assignments(df, id_col, text_col, budget, n_shards)
        .groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("packed_tokens").alias("pack_tokens"),
            F.round(F.sum("packed_tokens") / budget, 9).alias("fill_ratio"),
        )
    )


def chunk_tokens(
    df: DataFrame, id_col: str, text_col: str,
    window: int = 64, overlap: int = 16,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG/long-context
    complement to packing: split each document's token stream into
    windows of ``window`` tokens advancing by ``window - overlap``
    (every chunk after the first re-reads ``overlap`` tokens of
    context; the final chunk may be shorter but always holds more than
    ``overlap`` tokens, so no chunk is pure repetition).

    Emits (id, chunk_seq, start_tok, n_tokens, chunk_md5) — the md5 is
    over the space-joined window, so an oracle re-deriving chunks from
    the same text value-checks every boundary byte-exactly.

    Spark shape (100 TB posture): tokens materialize ONCE per row
    (the O(tokens^2) higher-order-function trap measured in
    operators/quality.py), chunk starts are one ``sequence`` + one
    ``posexplode`` — a pure codegen projection, ZERO shuffle; output
    is linear in token count times (1 + overlap/(window-overlap)).
    """
    if not 0 <= overlap < window:
        raise ValueError(f"need 0 <= overlap < window, got {overlap}/{window}")
    step = window - overlap
    toks = ws_tokens(F.col(text_col))
    n = F.size(F.col("__t"))
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)),
                        F.lit(step))
    base = (
        df.select(F.col(id_col).alias("id"), toks.alias("__t"))
        .where(F.size(F.col("__t")) > 0)
        .select("id", "__t",
                F.posexplode(starts).alias("chunk_seq", "start_tok"))
    )
    sl = F.slice(F.col("__t"), F.col("start_tok"), window)
    return base.select(
        "id", F.col("chunk_seq").cast("int").alias("chunk_seq"),
        "start_tok",
        F.size(sl).alias("n_tokens"),
        F.md5(F.array_join(sl, " ")).alias("chunk_md5"),
    )
