"""Cross-snapshot incremental dedup (operators/incremental_dedup.py).

Pins the three contracts the module documents:
* incremental snapshot-by-snapshot == one-shot global keep-first rule
  (min over (snap, id)), bit-for-bit — stats AND survivor rows;
* redo of a snapshot is byte-idempotent (ledger rows and stats);
* the history probe plans only prior-snapshot ledger files (metadata
  pruning), and survivors keep text byte-identical.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_schema_spark.operators.incremental_dedup import (
    create_dedup_ledger,
    incremental_dedup_snapshot,
    snapshot_survivors,
)

# deterministic corpus: 200 docs, texts from a 121-string pool so dups
# land both within and across snapshots AND every snapshot introduces
# first-seen texts (121 is coprime to the snap modulus 3, so i and
# i+121 land in different snaps); a few adversarial texts (unicode,
# vertical tab, leading/trailing space) pin byte identity
POOL = (
    [f"document body number {i} with some words" for i in range(114)]
    + ["café déjà-vu ☃ unicode", "tab\x0bvertical", " leading space",
       "trailing space ", "a", "", "multi\nline\ntext"]
)
N_DOCS = 200
N_SNAPS = 3


def _rows():
    # text pool index chosen by a fixed affine map -> deterministic
    # cross-snapshot dups; docs 30/61/92/150 reuse the text of doc i-6
    # (same snap, since 6 % 3 == 0) -> within-snapshot dups as well
    def pidx(i):
        if i in (30, 61, 92, 150):
            i -= 6
        return (i * 7 + 3) % len(POOL)

    return [(i, POOL[pidx(i)], i % N_SNAPS) for i in range(N_DOCS)]


def _expected():
    """Pure-Python global keep-first rule: keeper of a text = min
    (snap, id); per-snap stats derived from first-seen snapshot."""
    first = {}  # text -> (snap, id)
    for i, t, s in sorted(_rows(), key=lambda r: (r[2], r[0])):
        first.setdefault(t, (s, i))
    stats = {s: {"n_rows": 0, "n_new_unique": 0, "n_dup_within": 0,
                 "n_dup_history": 0} for s in range(N_SNAPS)}
    keepers = set()
    for i, t, s in _rows():
        stats[s]["n_rows"] += 1
        fs, fid = first[t]
        if s > fs:
            stats[s]["n_dup_history"] += 1
        elif i == fid:
            stats[s]["n_new_unique"] += 1
            keepers.add(i)
        else:
            stats[s]["n_dup_within"] += 1
    return stats, keepers


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(_rows(), "doc_id long, text string, snap int")
    df.persist()
    df.count()
    yield df
    df.unpersist()


def _run_all(spark, corpus, tmp):
    ledger = create_dedup_ledger(spark, str(tmp))
    stats = {}
    for s in range(N_SNAPS):
        day = corpus.where(F.col("snap") == s).drop("snap")
        stats[s] = incremental_dedup_snapshot(
            day, ledger, "doc_id", "text", s).collect()[0].asDict()
    return ledger, stats


def test_incremental_equals_global(spark, corpus, tmp_path):
    ledger, stats = _run_all(spark, corpus, tmp_path / "led")
    exp_stats, exp_keepers = _expected()
    for s in range(N_SNAPS):
        assert stats[s] == {"snap": s, **exp_stats[s]}, f"snap {s}"
        # conservation: every row lands in exactly one bucket
        assert (stats[s]["n_rows"] == stats[s]["n_new_unique"]
                + stats[s]["n_dup_within"] + stats[s]["n_dup_history"])

    got_keepers = set()
    for s in range(N_SNAPS):
        day = corpus.where(F.col("snap") == s).drop("snap")
        surv = snapshot_survivors(day, ledger, "doc_id", "text", s)
        rows = surv.collect()
        got_keepers |= {r.doc_id for r in rows}
        # byte-identical text + schema passthrough
        orig = dict(day.select("doc_id", "text").collect())
        assert all(orig[r.doc_id] == r.text for r in rows)
        assert surv.columns == ["doc_id", "text"]
    assert got_keepers == exp_keepers


def test_redo_is_idempotent(spark, corpus, tmp_path):
    ledger = create_dedup_ledger(spark, str(tmp_path / "led"))
    for s in range(2):
        day = corpus.where(F.col("snap") == s).drop("snap")
        incremental_dedup_snapshot(day, ledger, "doc_id", "text", s) \
            .collect()
    before = sorted(map(tuple, ledger.scan().collect()))
    day1 = corpus.where(F.col("snap") == 1).drop("snap")
    redo = incremental_dedup_snapshot(
        day1, ledger, "doc_id", "text", 1).collect()[0].asDict()
    after = sorted(map(tuple, ledger.scan().collect()))
    assert after == before  # overwrite replaced snap=1 with equal rows
    exp_stats, _ = _expected()
    assert redo == {"snap": 1, **exp_stats[1]}


def test_probe_plans_only_prior_snapshots(spark, corpus, tmp_path):
    ledger, _ = _run_all(spark, corpus, tmp_path / "led")
    planned = ledger.plan_files([("snap", "<", 2)])
    assert planned, "history files must be planned"
    assert all(int(e["partition"]["snap"]) < 2 for e in planned)
    # and the full plan DOES include snap=2 files (pruning, not absence)
    full = ledger.plan_files()
    assert any(int(e["partition"]["snap"]) == 2 for e in full)


def test_ledger_holds_one_row_per_fingerprint(spark, corpus, tmp_path):
    ledger, _ = _run_all(spark, corpus, tmp_path / "led")
    led = ledger.scan().collect()
    fps = [r.fp for r in led]
    assert len(fps) == len(set(fps))
    # every distinct text in the corpus appears exactly once
    n_texts = corpus.where(F.col("text").isNotNull()) \
        .select("text").distinct().count()
    assert len(fps) == n_texts


def test_normalized_fingerprint_mode(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "unrelated")],
        "doc_id long, text string")
    ledger = create_dedup_ledger(spark, str(tmp_path / "led"))
    stats = incremental_dedup_snapshot(
        df, ledger, "doc_id", "text", 0, normalized=True) \
        .collect()[0].asDict()
    assert stats == {"snap": 0, "n_rows": 3, "n_new_unique": 2,
                     "n_dup_within": 1, "n_dup_history": 0}


def test_recrawl_snapshot_entirely_duplicate(spark, tmp_path):
    """A re-crawl whose every page was already seen: zero fresh
    fingerprints, zero survivors, an EMPTY (but committed) ledger
    partition — and stats say all-history."""
    df = spark.createDataFrame(
        [(1, "page one"), (2, "page two")], "doc_id long, text string")
    re_df = spark.createDataFrame(
        [(11, "page one"), (12, "page two")], "doc_id long, text string")
    ledger = create_dedup_ledger(spark, str(tmp_path / "led"))
    incremental_dedup_snapshot(df, ledger, "doc_id", "text", 0).collect()
    stats = incremental_dedup_snapshot(
        re_df, ledger, "doc_id", "text", 1).collect()[0].asDict()
    assert stats == {"snap": 1, "n_rows": 2, "n_new_unique": 0,
                     "n_dup_within": 0, "n_dup_history": 2}
    assert snapshot_survivors(
        re_df, ledger, "doc_id", "text", 1).count() == 0
    assert ledger.scan([("snap", "=", 1)]).count() == 0
