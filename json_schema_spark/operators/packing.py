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
from .textstats import token_count

__all__ = ["pack_assignments", "pack_summary"]


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
