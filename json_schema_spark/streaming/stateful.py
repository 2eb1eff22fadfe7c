"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming surface; these extend its dedup
semantics (exact_duplicates, operators/dedup.py) across an UNBOUNDED
stream: the state store remembers what each key has already emitted, so
a duplicate arriving in a later micro-batch is still suppressed —
something no stateless projection or watermark window can do.

Scale shape: state is keyed by content hash, partitioned by the normal
groupBy shuffle, and bounded by a processing-time timeout — at
10^12-document scale the seen-set lives in the distributed state store
(RocksDB in production), never on any single executor.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup_first_seen(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Cross-micro-batch exact dedup: emit one row per DISTINCT text
    hash, the first time it is seen; every later duplicate (same batch
    or any later one) is suppressed by the state store.

    Returns a stream of (text_hash, first_id, n_dups_so_far) where
    n_dups_so_far counts the rows folded into this hash at emit time.
    ``state_timeout_ms`` bounds state for unbounded key domains: a key
    idle longer than the timeout is evicted (and would re-emit if seen
    again) — the standard memory/completeness trade.
    """
    import pandas as pd

    hashed = stream.where(F.col(text_col).isNotNull()).select(
        F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col).alias("id"))

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_timeout_ms else GroupStateTimeout.NoTimeout)

    def fn(key: Any, pdfs: Iterator["pd.DataFrame"],
           state: GroupState) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.get[0] if state.exists else 0
        first_id, total = None, 0
        for pdf in pdfs:
            total += len(pdf)
            if seen == 0 and len(pdf):
                # min across ALL chunks of this group batch — a key can
                # span multiple Arrow record batches, and the survivor
                # must match exact_duplicates' min-id semantics
                # regardless of chunking
                chunk_min = int(pdf["id"].min())
                first_id = chunk_min if first_id is None else min(first_id, chunk_min)
        state.update((seen + total,))
        if state_timeout_ms:
            state.setTimeoutDuration(state_timeout_ms)
        if seen == 0 and first_id is not None:
            yield pd.DataFrame({
                "text_hash": [key[0]],
                "first_id": [first_id],
                "n_dups_so_far": [total],
            })

    return hashed.groupBy("text_hash").applyInPandasWithState(
        fn,
        outputStructType="text_hash string, first_id long, n_dups_so_far long",
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=timeout,
    )
