"""Cross-snapshot incremental deduplication — the per-crawl ledger.

The production shape for Common-Crawl-scale pipelines: every new crawl
snapshot is deduplicated against ALL prior crawls without rescanning
raw history.  History is collapsed into a fingerprint LEDGER — one row
per distinct fingerprint ever seen, stored in the Iceberg-style
snapshot table (:mod:`json_schema_spark.sources.icetable`) partitioned
by the snapshot that FIRST saw the fingerprint — so a new snapshot's
pass costs O(new + ledger probe), never O(raw history).

Semantics (deterministic, order-defined): a row of snapshot ``s``
survives iff its fingerprint never appeared in snapshots ``< s`` AND it
carries the minimum id among same-fingerprint rows within ``s``.
Processing snapshots ``0..k`` one at a time therefore yields EXACTLY
the one-shot global keep-first rule (min over ``(snap, id)``) — pinned
bit-for-bit by ``tests/test_incremental_dedup.py``.

Scale posture (10^12 docs, BASELINE.json north rule):

* the ledger carries one md5 + keeper id per DISTINCT fingerprint —
  orders of magnitude smaller than raw history and the ONLY thing a
  probe reads; raw snapshots are never rescanned;
* the within-snapshot rollup is one map-side-combinable hash
  aggregation (the same salted-agg family as ``unique.py``); the
  history probe is a single fingerprint-width left join feeding ONE
  aggregate — no row of ``text`` ever crosses the probe shuffle.  A
  deployment that probes repeatedly bucket-sorts the ledger on ``fp``
  (``sources/tables.write_bucketed``) so the ledger side plans with
  zero Exchange;
* redo of snapshot ``s`` = IceTable dynamic-partition OVERWRITE of
  partition ``snap=s`` — byte-idempotent (same ledger rows, same
  stats; pytest-pinned), the same checkpoint-resume primitive
  ``plans/runner.py`` uses.  Snapshots are processed in order; like
  any incremental checkpoint, redoing ``s`` invalidates ``s+1..``
  (re-run their partitions);
* probes prune at the METADATA level: ``snap < s`` planning touches
  only prior-snapshot manifests (pytest asserts the planned file set),
  and per-file Bloom sidecars on ``fp`` answer ad-hoc "seen this
  document before?" point lookups without data IO.

Reference seam: fisxoj/json-schema validates one document at a time
and keeps no cross-document state (src/json-schema.lisp:23-38); the
cross-snapshot uniqueness ledger is the dataset-level generalization
the north rule adds on top (SURVEY.md §2.4).  Within-table uniqueness
lives in ``operators/unique.py``; the micro-batch sibling of the same
suppress-across-time semantics is ``streaming/stateful.py``.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _norm_text
from ..sources.icetable import IceTable

__all__ = [
    "create_dedup_ledger",
    "create_minhash_ledger",
    "incremental_dedup_snapshot",
    "incremental_minhash_snapshot",
    "snapshot_survivors",
    "snapshot_diff",
]


def create_dedup_ledger(spark: SparkSession, root: str,
                        id_type: str = "bigint") -> IceTable:
    """Create the fingerprint ledger: ``(fp, keep_id, snap)`` partitioned
    by first-seen snapshot, with a per-file Bloom sidecar on ``fp`` for
    point-lookup pruning."""
    return IceTable.create(
        spark, root,
        f"fp string, keep_id {id_type}, snap int",
        partition_by=["snap"], bloom_cols=["fp"])


def _fp_col(text_col: str, normalized: bool):
    col = F.col(text_col)
    return F.md5(_norm_text(col) if normalized else col)


def _snapshot_rollup(new_df: DataFrame, id_col: str, text_col: str,
                     normalized: bool) -> DataFrame:
    """Per-fingerprint within-snapshot rollup: (fp, keep_id, n_rows).
    One map-side-combinable hash aggregation; ``text`` is projected
    away before the shuffle (fingerprints are hash-width)."""
    return (
        new_df.where(F.col(text_col).isNotNull())
        .select(_fp_col(text_col, normalized).alias("fp"),
                F.col(id_col).alias("_id"))
        .groupBy("fp")
        .agg(F.min("_id").alias("keep_id"),
             F.count(F.lit(1)).alias("n_rows"))
    )


def incremental_dedup_snapshot(
    new_df: DataFrame,
    ledger: IceTable,
    id_col: str,
    text_col: str,
    snap: int,
    *,
    normalized: bool = False,
    update_ledger: bool = True,
) -> DataFrame:
    """Process one crawl snapshot against the ledger.

    Commits the snapshot's first-seen fingerprints to ledger partition
    ``snap=s`` (dynamic-partition overwrite — redo-idempotent) and
    returns the 1-row stats DataFrame::

        (snap, n_rows, n_new_unique, n_dup_within, n_dup_history)

    where ``n_rows = n_new_unique + n_dup_within + n_dup_history``.
    History is pinned BEFORE the commit (``scan`` resolves its file
    list eagerly), so the lazy stats read a consistent ledger era even
    after later snapshots commit.
    """
    # NO reuse barrier on the rollup, deliberately (r6): a lazy
    # localCheckpoint here was tried and REVERTED — the exact-
    # fingerprint rollup is one cheap hash-aggregate, and forcing the
    # commit job to materialize+serialize it cost a consistent
    # ~0.3-0.5 s per bench run while the probe's recompute rides a job
    # that is running anyway. (Contrast incremental_minhash_snapshot
    # below, where the recomputed pass is a full shingle+minhash
    # signature scan and the barrier pays for itself.)
    day = _snapshot_rollup(new_df, id_col, text_col, normalized)
    # metadata-pruned probe: only manifests/files of snap < s planned
    history = ledger.scan([("snap", "<", int(snap))]).select("fp")

    if update_ledger:
        fresh = day.join(history, "fp", "left_anti")
        ledger.overwrite_partitions(
            fresh.select("fp", "keep_id",
                         F.lit(int(snap)).cast("int").alias("snap")))

    probe = day.join(history.withColumn("_hist", F.lit(True)), "fp", "left")
    zero = F.lit(0).cast("long")
    stats = probe.agg(
        F.coalesce(F.sum("n_rows"), zero).alias("n_rows"),
        F.coalesce(F.sum(F.when(F.col("_hist").isNull(), 1).otherwise(0)),
                   zero).alias("n_new_unique"),
        F.coalesce(
            F.sum(F.when(F.col("_hist").isNull(),
                         F.col("n_rows") - 1).otherwise(0)),
            zero).alias("n_dup_within"),
        F.coalesce(
            F.sum(F.when(F.col("_hist").isNotNull(),
                         F.col("n_rows")).otherwise(0)),
            zero).alias("n_dup_history"),
    )
    return stats.select(
        F.lit(int(snap)).cast("int").alias("snap"),
        "n_rows", "n_new_unique", "n_dup_within", "n_dup_history")


def snapshot_survivors(
    new_df: DataFrame,
    ledger: IceTable,
    id_col: str,
    text_col: str,
    snap: int,
    *,
    normalized: bool = False,
) -> DataFrame:
    """Rows of snapshot ``s`` the incremental rule KEEPS, read straight
    off the committed ledger: survivors are exactly the rows matching
    ``(fp, keep_id)`` in partition ``snap=s``.  A left-semi join — the
    input rows pass through untouched, so ``text`` stays byte-identical
    (the north-rule per-row invariant)."""
    keepers = ledger.scan([("snap", "=", int(snap))]) \
        .select("fp", F.col("keep_id").alias("_keep"))
    return (
        new_df.withColumn("_fp", _fp_col(text_col, normalized))
        .join(keepers,
              (F.col("_fp") == F.col("fp"))
              & (F.col(id_col) == F.col("_keep")),
              "left_semi")
        .drop("_fp")
    )


# ---------------------------------------------------------------------------
# Cross-snapshot NEAR-dup: the MinHash band-bucket ledger
# ---------------------------------------------------------------------------

def create_minhash_ledger(spark: SparkSession, root: str) -> IceTable:
    """Create the LSH band-bucket ledger: ``(band, bucket, snap)``
    partitioned by first-seen snapshot.  One row per distinct
    (band, bucket) ever seen — the cross-crawl generalization of
    RefinedWeb-style "dedup against prior dumps": a new snapshot's
    near-dup check probes this instead of re-minhashing history."""
    return IceTable.create(
        spark, root, "band int, bucket bigint, snap int",
        partition_by=["snap"])


def incremental_minhash_snapshot(
    new_df: DataFrame,
    ledger: IceTable,
    id_col: str,
    text_col: str,
    snap: int,
    *,
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    hash_fn: str = "xxhash64",
    min_bands: int = 1,
    update_ledger: bool = True,
    banded: DataFrame | None = None,
) -> DataFrame:
    """Flag each document of snapshot ``s`` as a near-duplicate of
    PRIOR snapshots iff at least ``min_bands`` of its LSH band buckets
    were seen in snapshots ``< s``.  Returns per-doc rows::

        (snap, id, n_hist_bands, is_hist_near_dup)

    and commits the snapshot's first-seen (band, bucket) pairs to
    ledger partition ``snap=s`` (dynamic-partition overwrite —
    redo-idempotent, same contract as the fingerprint ledger).

    Scale shape: signatures are the one wide op (dedup.py's explode +
    k partial-aggregable mins); banding is a narrow explode to
    ``bands`` rows/doc; the history probe is a band+bucket-width left
    join feeding one groupBy(doc) — raw history text is never
    rescanned, and the ledger holds one 12-byte row per distinct
    bucket (orders of magnitude below doc count on boilerplate-heavy
    corpora, at most bands x docs above it).

    Semantics notes: ALL of a snapshot's buckets commit (suppressed
    docs' too) — suppression means "similar to anything previously
    SEEN", which keeps the rule order-independent per bucket and the
    oracle window-expressible.  Within-snapshot near-dups are out of
    scope here (run :func:`dedup.minhash_candidates` inside the
    snapshot for those).  Like all MinHash LSH, the flag is
    probabilistic in the banding sense: band collision == identical
    signature slice, so ``min_bands=1`` matches the batch candidate
    rule.
    """
    from .dedup import band_buckets, minhash_signatures

    if banded is None:
        sig = minhash_signatures(
            new_df.select(F.col(id_col), F.col(text_col)),
            id_col, text_col, n=n, k=k, hash_fn=hash_fn)
        # lazy checkpoint (r6, guide §2.4/§5): the banded buckets feed
        # BOTH the ledger write and the history probe — without it the
        # whole minhash-signature pass over the snapshot's text
        # executes twice (once in the commit job, once at the caller's
        # action). The commit job materializes it; band+bucket rows
        # are 12 bytes/doc/band.
        banded = band_buckets(sig, k, bands) \
            .select("doc", "band", "bucket") \
            .localCheckpoint(eager=False,
                             storageLevel=StorageLevel.MEMORY_AND_DISK)
    else:
        # caller-precomputed (doc, band, bucket) rows for THIS
        # snapshot's docs (r6, guide §2.4): a multi-snapshot driver can
        # run ONE corpus-wide signature pass and slice it per snapshot
        # instead of paying a separate scan+explode job per snapshot;
        # values are per-doc, so sliced-from-union == computed-per-
        # snapshot identically.
        banded = banded.select("doc", "band", "bucket")
    history = ledger.scan([("snap", "<", int(snap))]) \
        .select("band", "bucket")

    if update_ledger:
        fresh = (banded.select("band", "bucket").distinct()
                 .join(history, ["band", "bucket"], "left_anti"))
        ledger.overwrite_partitions(
            fresh.select("band", "bucket",
                         F.lit(int(snap)).cast("int").alias("snap")))

    probe = banded.join(history.withColumn("_hist", F.lit(True)),
                        ["band", "bucket"], "left")
    return (
        probe.groupBy(F.col("doc").alias(id_col))
        .agg(F.sum(F.when(F.col("_hist").isNotNull(), 1).otherwise(0))
             .cast("long").alias("n_hist_bands"))
        .select(
            F.lit(int(snap)).cast("int").alias("snap"),
            id_col,
            "n_hist_bands",
            (F.col("n_hist_bands") >= min_bands).alias("is_hist_near_dup"),
        )
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key_col: str, content_col: str,
) -> DataFrame:
    """Crawl-over-crawl CONTENT diff — the dump-to-dump change report
    (added / removed / changed / unchanged by key and content hash)
    that decides how much of a new snapshot actually needs
    reprocessing.  Complements the dedup ledger above: the ledger
    answers "seen anywhere before?", this answers "what happened to
    each URL between two specific snapshots?".

    Returns one row per key in either snapshot:
    (key, status, old_chars, new_chars) with status in
    {'added','removed','changed','unchanged'}.

    Scale shape: both sides project to (key, md5(content), chars)
    BEFORE the join — content never shuffles, only hash-width rows —
    then ONE full outer sort-merge join on key.  At 10^12 rows both
    sides bucket/cluster by key in storage (IceTable
    compact(cluster_by=key)) and the join co-locates; the output is
    usually consumed as the partial-aggregable per-status rollup."""
    def prep(df: DataFrame, tag: str) -> DataFrame:
        c = F.col(content_col)
        # explicit presence marker: md5(NULL content) is NULL, so the
        # hash alone cannot distinguish "key absent" from "key present
        # with null content"
        return df.select(
            F.col(key_col).alias("key"),
            F.lit(True).alias(f"{tag}_present"),
            F.md5(c).alias(f"{tag}_h"),
            F.char_length(c).alias(f"{tag}_chars"),
        )

    o, n = prep(old, "old"), prep(new, "new")
    j = o.join(n, "key", "full_outer")
    status = (
        F.when(F.col("old_present").isNull(), F.lit("added"))
        .when(F.col("new_present").isNull(), F.lit("removed"))
        .when(F.col("old_h").eqNullSafe(F.col("new_h")),
              F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("key", status.alias("status"), "old_chars",
                    "new_chars")
