"""t-digest sketch: accuracy vs exact quantiles, mergeability, KS
agreement with the exact operator, and the incremental cross-run drift
path through the IceTable results seam."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from json_schema_spark.operators import tdigest as td
from json_schema_spark.operators.drift import ks_by_partition
from json_schema_spark.sources import tables as tb


def _skewed(n, seed=7):
    rng = np.random.RandomState(seed)
    return np.exp(rng.normal(3.0, 1.0, n))  # lognormal: hard tails


def test_quantile_accuracy_vs_exact():
    v = _skewed(50_000)
    d = td.build(v, compression=100)
    qs = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    est = td.quantile(d, qs)
    # t-digest guarantee is on CDF error, so measure there: the exact
    # CDF at each estimated quantile must be within 1% of the target
    for q, x in zip(qs, est):
        assert abs((v <= x).mean() - q) < 0.01, q
    # digest is compact
    assert len(d["means"]) < 2 * 100


def test_merge_associative_and_equivalent():
    v = _skewed(30_000)
    parts = np.array_split(v, 7)
    whole = td.build(v)
    merged = td.merge([td.build(p) for p in parts])
    m2 = td.merge([td.merge([td.build(p) for p in parts[:3]]),
                   td.merge([td.build(p) for p in parts[3:]])])
    qs = np.linspace(0.05, 0.95, 19)
    for other in (merged, m2):
        assert other["n"] == whole["n"]
        gap = np.max(np.abs(td.cdf(whole, td.quantile(other, qs))
                            - td.cdf(other, td.quantile(other, qs))))
        assert gap < 0.02


def test_determinism():
    v = _skewed(10_000)
    a, b = td.build(v.copy()), td.build(v.copy())
    assert np.array_equal(a["means"], b["means"])
    assert np.array_equal(a["weights"], b["weights"])


def test_constant_column_and_empty():
    d = td.build(np.full(100, 5.0))
    assert td.quantile(d, np.array([0.5]))[0] == 5.0
    assert td.cdf(d, np.array([4.0, 6.0])).tolist() == [0.0, 1.0]
    e = td.build(np.array([]))
    assert e["n"] == 0 and np.isnan(td.ks_between(e, e))


@pytest.fixture()
def drifted(spark):
    """8 daily partitions of a uniform-ish numeric column; day 7's
    distribution is shifted+stretched (strong KS-positive drift)."""
    df = spark.range(0, 40_000).select(
        F.pmod(F.col("id"), F.lit(8)).cast("string").alias("day"),
        F.pmod(F.abs(F.xxhash64("id")), F.lit(1000)).cast("double").alias("v"),
    )
    return df.withColumn(
        "v", F.when(F.col("day") == "7", F.col("v") * 1.5 + 200).otherwise(F.col("v")))


def test_spark_digest_matches_local_and_ks_matches_exact(spark, drifted):
    """Two-stage Spark digest ≈ driver-side digest; per-partition
    sketch KS tracks the exact KS and flags the drifted day."""
    digests = td.digest_by_partition(drifted, "v", "day").collect()
    assert len(digests) == 8

    # spark path vs local build for one partition
    day0 = sorted(digests, key=lambda r: r["partition"])[0]
    local_vals = np.array(
        [r["v"] for r in drifted.where(F.col("day") == day0["partition"]).collect()])
    local = td.build(local_vals)
    assert day0["n"] == local["n"]
    qs = np.linspace(0.1, 0.9, 9)
    spark_d = td._row_to_digest(day0)
    assert np.max(np.abs(td.quantile(spark_d, qs) - td.quantile(local, qs))) \
        < 0.03 * (local["vmax"] - local["vmin"])

    # sketch KS vs exact KS (ks_by_partition is exact on this domain)
    sketch = {p: ks for p, _, ks in td.ks_by_partition_tdigest(
        [dict(td._row_to_digest(r), partition=r["partition"]) for r in digests])}
    exact = {r["partition"]: r["ks"]
             for r in ks_by_partition(drifted, "v", "day").collect()}
    assert set(sketch) == set(exact)
    for p in exact:
        assert abs(sketch[p] - exact[p]) < 0.05, p
    assert max(sketch, key=sketch.get) == "7"


def test_incremental_drift_from_stored_digests(spark, drifted, tmp_path):
    """The 100 TB daily-monitoring path: history lives as digests in an
    IceTable; a new day's drift check scans ONLY the new day and merges
    stored digests — and still flags the drifted day."""
    from json_schema_spark.sources.icetable import IceTable

    store = IceTable.create(spark, str(tmp_path / "digests"),
                            td.DIGEST_SCHEMA, ["partition"])
    hist_days = [str(d) for d in range(7)]
    new_day = "7"  # the drifted one

    # history accumulates one commit per day (as a daily run would)
    for day in hist_days:
        store.append(td.digest_by_partition(
            drifted.where(F.col("day") == day), "v", "day"))
    assert len(store.snapshots()) == len(hist_days)

    # day D+1 arrives: one scan of the NEW day only
    new_digest_rows = td.digest_by_partition(
        drifted.where(F.col("day") == new_day), "v", "day").collect()
    hist_rows = store.scan().collect()
    hist = td.merge([td._row_to_digest(r) for r in hist_rows])
    new = td._row_to_digest(new_digest_rows[0])
    ks_new = td.ks_between(new, hist)

    # control: a non-drifted day against the rest of history
    ctl = td._row_to_digest(
        [r for r in hist_rows if r["partition"] == hist_days[0]][0])
    rest = td.merge([td._row_to_digest(r) for r in hist_rows
                     if r["partition"] != hist_days[0]])
    ks_ctl = td.ks_between(ctl, rest)

    assert ks_new > 5 * ks_ctl and ks_new > 0.2  # planted drift dominates


def test_cdf_duplicate_heavy_values():
    """Review regression: repeated cluster means carry real mass —
    first-occurrence dedup dropped it (cdf at 0 read 0.0 for [0,0,0,1])."""
    d = td.build(np.array([0.0, 0.0, 0.0, 1.0]))
    # midpoint rule: a point cluster shows HALF its mass at its mean
    # (0.375 here) and all of it just past — the old bug read 0.0
    assert td.cdf(d, np.array([0.0]))[0] >= 0.35
    assert td.cdf(d, np.array([0.4]))[0] > 0.5
    assert td.cdf(d, np.array([-0.1]))[0] == 0.0  # below vmin stays 0
    a = td.build(np.array([0.0] * 30 + [1.0] * 10))
    b = td.build(np.array([0.5] * 30 + [1.0] * 10))
    ks = td.ks_between(a, b)
    assert ks > 0.5  # true two-sample KS is 0.75; old code read ~0.44


def test_ks_by_partition_prefix_suffix_equivalence():
    """The O(P) prefix/suffix rest-merge must agree with the naive
    leave-one-out merge within sketch noise."""
    rng = np.random.RandomState(11)
    ds = []
    for p in range(6):
        v = rng.normal(p * 0.2, 1.0, 2000)
        ds.append(dict(td.build(v), partition=str(p)))
    fast = dict((p, ks) for p, _, ks in td.ks_by_partition_tdigest(ds))
    for i, d in enumerate(ds):
        rest = td.merge([o for j, o in enumerate(ds) if j != i])
        naive = td.ks_between(d, rest)
        assert abs(fast[d["partition"]] - naive) < 0.02, i


def test_compress_allocation_independent_of_compression():
    """ADVICE r2: bincount over raw k1 bucket ids allocates
    O(compression) slots even for a 3-point batch — fatal when
    compression is sized to the table (q_tdigest_exact uses 8n, so a
    10^9-row table meant ~4 GB per Arrow batch). After densifying via
    np.unique(return_inverse=True) the allocation is O(distinct
    clusters); with compression=1e9 this either finishes instantly or
    would have tried to allocate ~8 GB."""
    import time
    m = np.array([1.0, 2.0, 3.0])
    w = np.ones(3)
    t0 = time.monotonic()
    mm, ww = td.compress(m, w, 1e9)
    assert time.monotonic() - t0 < 1.0
    # exact regime: every point is its own cluster, order preserved
    assert mm.tolist() == [1.0, 2.0, 3.0]
    assert ww.tolist() == [1.0, 1.0, 1.0]


def test_compress_output_unchanged_by_densify():
    """The densified bincount must produce byte-identical digests to
    the per-bucket semantics (empty buckets never contributed)."""
    rng = np.random.default_rng(7)
    v = rng.normal(size=5000)
    uniq, counts = np.unique(v, return_counts=True)
    m, w = td.compress(uniq, counts.astype(float), 100.0)
    assert float(w.sum()) == 5000.0
    assert np.all(np.diff(m) > 0)          # strictly increasing means
    assert m.size <= 100                   # respects the size bound
    d = td.build(v, 100.0)
    q = td.quantile(d, np.array([0.25, 0.5, 0.75]))
    exact = np.quantile(v, [0.25, 0.5, 0.75])
    assert np.all(np.abs(q - exact) < 0.05)
