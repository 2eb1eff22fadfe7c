"""Referential checks via anti-joins (SURVEY.md §2.4).

Generalizes ``$ref`` resolution failure (a lookup miss returns
``values nil nil`` — /root/reference/src/reference.lisp:408-465) to a
set-membership check against a dimension table: rows whose key has no
match in the dimension are violation rows.

Scale posture: ``left_anti`` join; the dimension side is explicitly
``broadcast()`` when small (allow-lists, ISO code tables) so the fact
table never shuffles. For large dimensions (50k+ domains) we leave the
strategy to Catalyst/AQE (sort-merge with skew splitting) — pass
``broadcast_dim=False``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_violations(
    df: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Rows of ``df`` whose ``key`` is non-null but absent from
    ``dim.dim_key`` (NULL keys are `required`'s business, not a
    referential miss)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return (
        df.where(F.col(key).isNotNull())
        .join(d, on=df[key] == d[dim_key], how="left_anti")
    )


def referential_verdict(
    df: DataFrame, dim: DataFrame, key: str, dim_key: str, **kw
) -> DataFrame:
    miss = referential_violations(df, dim, key, dim_key, **kw)
    return miss.agg(
        F.lit(f"ref({key}->{dim_key})").alias("check"),
        (F.count(F.lit(1)) == 0).alias("pass"),
        F.count(F.lit(1)).alias("n_violations"),
    )
