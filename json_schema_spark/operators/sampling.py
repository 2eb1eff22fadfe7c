"""Deterministic sampling for training-data pipelines.

At 10^12 rows, `df.sample()` is unusable for anything that must be
reproducible or joinable across runs/tables (it depends on partition
layout and RNG seeding per task).  Hash-based sampling keys the
decision on the ROW CONTENT: the same (key, seed, rate) always selects
the same rows on any cluster, any partitioning, any engine — so an
eval holdout carved this way stays stable across reruns and can be
reproduced by any other system (the DuckDB oracle computes the same
md5 decision verbatim).

All pure built-ins; selection is a narrow filter (no shuffle), and the
per-stratum variant broadcasts only the rate table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, seed: int, buckets: int = 1_000_000) -> Column:
    """Stable [0, buckets) bucket from the md5 of key+seed (md5 so the
    oracle can reproduce it; 15 hex chars = 60 bits, unbiased for
    bucket counts << 2^60)."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"#{seed}"))), 1, 15),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(buckets))


def hash_sample(
    df: DataFrame, key: str | Column, rate: float, seed: int = 42,
) -> DataFrame:
    """Deterministic Bernoulli-by-content sample: keep a row iff
    bucket(key, seed) < rate * buckets. Same inputs -> same rows,
    independent of partitioning; a narrow filter that pushes down."""
    k = F.col(key) if isinstance(key, str) else key
    return df.where(_bucket(k, seed) < F.lit(round(rate * 1_000_000)))


def stratified_sample(
    df: DataFrame, key: str | Column, stratum: str | Column,
    rates: dict[str, float], default_rate: float = 0.0, seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-lang rates to
    rebalance a corpus): the rate table joins in as a broadcast; rows
    in strata without an entry fall back to ``default_rate``.

    Scale shape: one broadcast hash join + narrow filter — the corpus
    never shuffles, hot strata cost nothing extra.
    """
    k = F.col(key) if isinstance(key, str) else key
    s = F.col(stratum) if isinstance(stratum, str) else stratum
    spark = df.sparkSession
    rate_rows = [(name, round(r * 1_000_000)) for name, r in sorted(rates.items())]
    rate_df = F.broadcast(
        spark.createDataFrame(rate_rows, "stratum_key string, keep_below int"))
    joined = df.withColumn("__stratum", s).join(
        rate_df, F.col("__stratum") == F.col("stratum_key"), "left")
    return (
        joined.where(
            _bucket(k, seed)
            < F.coalesce(F.col("keep_below"),
                         F.lit(round(default_rate * 1_000_000)))
        )
        .drop("__stratum", "stratum_key", "keep_below")
    )
