"""Shared two-stage sketch scaffold (tdigest / HLL / Misra-Gries).

Every storable sketch in this engine has the same plan: fold each
Arrow batch into one sketch row per partition-value it contains
(mapInPandas — before any shuffle), then merge a partition's
batch-sketches (groupBy.applyInPandas — the shuffle carries sketches,
not rows). Keeping the scaffold in one place means edge-case fixes
(empty batches, partition grouping) apply to all sketch kinds at once.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def two_stage_sketch(
    base: DataFrame,
    schema: str,
    columns: list[str],
    fold_group: Callable[[str, pd.DataFrame], tuple],
    merge_group: Callable[[pd.DataFrame], tuple],
) -> DataFrame:
    """``base`` must have a string ``partition`` column plus payload
    columns. ``fold_group(partition_value, batch_slice)`` returns one
    sketch row (tuple, ``columns`` order); ``merge_group(all_rows)``
    merges a partition's sketch rows into one."""

    def batch_fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # dropna=False: callers usually pre-filter null partitions,
            # but the scaffold must not silently drop rows if they don't
            # (Spark's own groupBy would keep a null group)
            rows = [fold_group(pv, grp)
                    for pv, grp in pdf.groupby("partition", sort=False,
                                               dropna=False)]
            if rows:
                yield pd.DataFrame(rows, columns=columns)

    partial = base.mapInPandas(batch_fold, schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([merge_group(pdf)], columns=columns)

    return partial.groupBy("partition").applyInPandas(merge, schema)
