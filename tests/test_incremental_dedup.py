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


# ---------------------------------------------------------------------------
# MinHash band-bucket ledger (cross-snapshot NEAR-dup)
# ---------------------------------------------------------------------------

from json_schema_spark.operators.incremental_dedup import (  # noqa: E402
    create_minhash_ledger,
    incremental_minhash_snapshot,
)

MH = dict(n=3, k=8, bands=4)


def _mh_run(spark, tmp, snaps):
    """snaps: list of [(id, text), ...] per snapshot. Returns
    {snap: {id: row}} of the per-doc flag frames."""
    ledger = create_minhash_ledger(spark, str(tmp))
    out = {}
    for s, rows in enumerate(snaps):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        flags = incremental_minhash_snapshot(
            df, ledger, "doc_id", "text", s, **MH).collect()
        out[s] = {r.doc_id: r for r in flags}
    return ledger, out


def test_minhash_ledger_flags_cross_snapshot_copies(spark, tmp_path):
    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different words about spark iceberg ledgers here"
    third = "yet another unrelated document mentioning nothing shared"
    ledger, out = _mh_run(spark, tmp_path / "mh", [
        [(1, base), (2, other)],
        [(11, base), (12, third)],          # 11 = exact re-crawl of 1
        [(21, other), (22, base)],          # both seen before
    ])
    assert out[0][1].n_hist_bands == 0 and not out[0][1].is_hist_near_dup
    assert out[1][11].n_hist_bands == 4 and out[1][11].is_hist_near_dup
    assert out[1][12].n_hist_bands == 0 and not out[1][12].is_hist_near_dup
    assert out[2][21].is_hist_near_dup and out[2][22].is_hist_near_dup
    # ledger holds each distinct (band, bucket) exactly once
    led = ledger.scan().collect()
    assert len({(r.band, r.bucket) for r in led}) == len(led)


def test_minhash_ledger_within_snapshot_not_flagged(spark, tmp_path):
    """Within-snapshot dups are out of scope (minhash_candidates
    covers them): two identical docs in the SAME snapshot both pass."""
    text = "identical twins inside one single crawl snapshot body"
    _, out = _mh_run(spark, tmp_path / "mh", [[(1, text), (2, text)]])
    assert not out[0][1].is_hist_near_dup
    assert not out[0][2].is_hist_near_dup


def test_minhash_ledger_redo_idempotent(spark, tmp_path):
    base = "some web page text shared across two crawls of the corpus"
    ledger = create_minhash_ledger(spark, str(tmp_path / "mh"))
    df0 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    df1 = spark.createDataFrame(
        [(11, base), (12, "fresh page")], "doc_id long, text string")
    incremental_minhash_snapshot(
        df0, ledger, "doc_id", "text", 0, **MH).collect()
    first = incremental_minhash_snapshot(
        df1, ledger, "doc_id", "text", 1, **MH).collect()
    before = sorted(map(tuple, ledger.scan().collect()))
    redo = incremental_minhash_snapshot(
        df1, ledger, "doc_id", "text", 1, **MH).collect()
    after = sorted(map(tuple, ledger.scan().collect()))
    assert after == before
    assert sorted(map(tuple, redo)) == sorted(map(tuple, first))


def test_minhash_ledger_min_bands_threshold(spark, tmp_path):
    """min_bands > matched bands suppresses the flag; the count column
    is unchanged."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ledger = create_minhash_ledger(spark, str(tmp_path / "mh"))
    df0 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    df1 = spark.createDataFrame([(11, base)], "doc_id long, text string")
    incremental_minhash_snapshot(
        df0, ledger, "doc_id", "text", 0, **MH).collect()
    strict = incremental_minhash_snapshot(
        df1, ledger, "doc_id", "text", 1, min_bands=5, update_ledger=False,
        **MH).collect()[0]
    assert strict.n_hist_bands == 4 and not strict.is_hist_near_dup


def test_snapshot_diff_statuses_and_null_content(spark):
    """Every status on a hand fixture, including the null-content
    edges: NULL text present on both sides is unchanged (eqNullSafe),
    NULL -> value is changed, and presence is judged by the KEY, never
    by the content hash."""
    from json_schema_spark.operators.incremental_dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone"), (5, None), (6, None)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh"), (5, None), (6, "now")],
        "doc_id long, text string")
    got = {r["key"]: (r["status"], r["old_chars"], r["new_chars"])
           for r in snapshot_diff(old, new, "doc_id", "text").collect()}
    assert got == {
        1: ("unchanged", 4, 4),
        2: ("changed", 6, 5),
        3: ("removed", 4, None),
        4: ("added", None, 5),
        5: ("unchanged", None, None),   # null content, present both
        6: ("changed", None, 3),        # null -> value
    }
