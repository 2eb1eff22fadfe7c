"""Custom join operators Spark's API lacks.

As-of join (the canonical example of a missing relational operator):
for every left row, the LATEST right row with right.ts <= left.ts
within the same key — the backbone of event/state alignment (price at
order time, last config before request, latest prior view per click).

Spark has no ASOF JOIN; the naive theta-join
``l.key = r.key AND r.ts <= l.ts`` explodes to all preceding pairs and
re-ranks them.  This implementation is the UNION + WINDOW composition:
tag both sides, sort once per key over the merged stream, and carry the
last-seen right row forward with ``last(..., ignorenulls=True)`` — ONE
shuffle on the key, one sort, zero fan-out, which is exactly the merge
semantics a native as-of join would plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row plus the latest (by ``on``
    ordering, ties included) preceding right row of the same ``by``
    key; right columns come back suffixed, NULL when no right row
    precedes.

    Right rows order BEFORE left rows at equal ``on`` values, so an
    exactly-simultaneous right row matches (ASOF ``<=`` semantics,
    matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``).
    """
    # a NULL right `on` value has no position on the timeline; it would
    # sort NULLS FIRST and be carried as the "earliest" match for every
    # left row.  DuckDB's ASOF (l.on >= r.on) never matches NULL — drop.
    right = right.where(F.col(on).isNotNull())
    lcols = left.columns
    l_tag = left.select(
        F.col(on).alias("__on"), F.col(by).alias("__by"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols if c not in (on, by)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols],
    )
    r_tag = right.select(
        F.col(on).alias("__on"), F.col(by).alias("__by"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (on, by)],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    merged = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("__by")
        .orderBy(F.col("__on"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the whole right row as ONE struct — carrying columns
    # independently would splice values from different right rows
    # whenever a right column is genuinely NULL
    rstruct = F.when(
        F.col("__is_left") == 0,
        F.struct(*[F.col(f"__r_{c}").alias(c) for c in right_cols]),
    )
    carried = merged.select(
        "*", F.last(rstruct, ignorenulls=True).over(w).alias("__rrow"))
    return (
        carried.where(F.col("__is_left") == 1)
        .select(
            F.col("__on").alias(on), F.col("__by").alias(by),
            *[F.col(c) for c in lcols if c not in (on, by)],
            *[F.col("__rrow").getField(c).alias(f"{c}{suffix}")
              for c in right_cols],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bucket_width: int | None = None,
) -> DataFrame:
    """Point-in-interval join: left rows paired with every right row
    where ``lo <= point < hi``.

    Spark plans a raw inequality join as BroadcastNestedLoopJoin (all
    pairs when the right side is big).  The scale path here is the
    standard bucketization: explode each interval into the fixed-width
    buckets it covers, bucket each point, equi-join on the bucket (a
    plain shuffled hash join), then re-verify the exact predicate.
    Join work becomes O(rows x intervals-per-bucket) instead of
    O(left x right).

    ``bucket_width`` defaults to the average interval length (computed
    in one aggregate-sized pass) — wider means fewer duplicate interval
    rows, narrower means fewer false candidates.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"range_join: left and right share column names {sorted(overlap)}"
            " — rename one side (output carries both tables' columns)")
    if "__bucket" in left.columns or "__bucket" in right.columns:
        raise ValueError("range_join: '__bucket' is a reserved column name")
    if bucket_width is None:
        row = right.agg(
            F.ceil(F.avg(F.col(hi) - F.col(lo))).alias("w")).collect()[0]
        bucket_width = max(1, int(row["w"] or 1))
    w = F.lit(bucket_width)

    r = right.where(F.col(lo).isNotNull() & F.col(hi).isNotNull()
                    & (F.col(hi) > F.col(lo)))
    # interval -> every bucket it overlaps: floor(lo/w) .. ceil(hi/w)-1
    # (NOT floor((hi-1)/w), which assumes integer bounds and silently
    # drops the last bucket for fractional hi — e.g. [0.5, 1.2) covers
    # bucket 1 at w=1)
    r_b = r.select(
        "*",
        F.explode(
            F.sequence(F.floor(F.col(lo) / w),
                       F.ceil(F.col(hi) / w) - F.lit(1))
        ).alias("__bucket"),
    )
    l_b = left.where(F.col(point).isNotNull()).select(
        "*", F.floor(F.col(point) / w).alias("__bucket"))
    return (
        l_b.join(r_b, "__bucket")
        .where((F.col(lo) <= F.col(point)) & (F.col(point) < F.col(hi)))
        .drop("__bucket")
    )
