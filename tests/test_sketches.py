"""HLL + Misra-Gries storable sketches: accuracy vs exact, bit-exact /
bounded merge properties, Spark two-stage path, incremental store."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from json_schema_spark.operators import sketches as sk


# ---------------------------------------------------------------- HLL core

def _hashes(n, seed=1):
    rng = np.random.RandomState(seed)
    return rng.randint(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_hll_accuracy():
    for true_n in (50, 1_000, 100_000):
        h = np.unique(_hashes(true_n, seed=true_n))
        est = sk.hll_estimate(sk.hll_from_hashes(h))
        assert abs(est - len(h)) / len(h) < 0.05, true_n


def test_hll_duplicates_dont_count():
    h = _hashes(1_000)
    dup = np.concatenate([h] * 20)  # 20x duplicated stream
    a = sk.hll_from_hashes(h)
    b = sk.hll_from_hashes(dup)
    assert np.array_equal(a, b)


def test_hll_merge_bit_identical_to_whole():
    h = _hashes(30_000)
    whole = sk.hll_from_hashes(h)
    parts = [sk.hll_from_hashes(c) for c in np.array_split(h, 7)]
    assert np.array_equal(sk.hll_merge(parts), whole)


# ---------------------------------------------------------- Misra-Gries core

def _zipf_counts():
    # heavy head: item-i has count 2000/(i+1) for i<10, tail of 1s
    counts = {f"hot{i}": 2000 // (i + 1) for i in range(10)}
    counts.update({f"cold{i}": 1 for i in range(500)})
    return counts


def test_mg_guarantee_and_error_bound():
    counts = _zipf_counts()
    n = sum(counts.values())
    red, off = sk.mg_reduce(counts, m=64)
    assert off <= n // (64 + 1)
    # every item with true freq > n/(m+1) survives
    for k, v in counts.items():
        if v > n / 65:
            assert k in red
            assert red[k] <= v <= red[k] + off  # undercount bounded


def test_mg_merge_preserves_heavy_hitters():
    counts = _zipf_counts()
    items = [k for k, v in counts.items() for _ in range(v)]
    rng = np.random.RandomState(3)
    rng.shuffle(items)
    chunks = np.array_split(np.array(items), 9)
    summs = []
    for c in chunks:
        vals, cnts = np.unique(c, return_counts=True)
        summs.append(sk.mg_reduce(dict(zip(vals.tolist(), cnts.tolist())), 64))
    merged, off = sk.mg_merge(summs, 64)
    n = len(items)
    assert off <= n // 65 * 9 + 9  # offsets add (per-chunk bound)
    top5_true = sorted(counts, key=counts.get, reverse=True)[:5]
    top5_mg = sorted(merged, key=merged.get, reverse=True)[:5]
    assert top5_mg == top5_true


# ------------------------------------------------------------- Spark paths

@pytest.fixture()
def valued(spark):
    """8 partitions; partition p has exactly 1000*(p+1) distinct urls,
    with every url appearing twice (dup-heavy stream)."""
    df = spark.range(0, 72_000).select(
        (F.col("id") % 8).alias("p"),
        (F.col("id") % 36_000).alias("u"),
    )
    # distincts per partition p: urls are u = p + 8k -> 4500 distinct
    # per partition; rows 9000 each. Simpler: assert vs computed exact.
    return df.select(F.col("p").cast("string").alias("p"),
                     F.concat(F.lit("url-"), F.col("u")).alias("u"))


def test_hll_by_partition_vs_exact(spark, valued):
    rows = sk.hll_by_partition(valued, "u", "p").collect()
    exact = {r["p"]: r["d"] for r in valued.groupBy("p")
             .agg(F.countDistinct("u").alias("d")).collect()}
    assert len(rows) == 8
    for r in rows:
        est = sk.hll_estimate(np.asarray(r["registers"], dtype=np.int32))
        assert abs(est - exact[r["partition"]]) / exact[r["partition"]] < 0.05
        assert r["n_rows"] == 9000


def test_mg_by_partition_vs_exact_topk(spark):
    # skewed stream: per partition, 'dom0'..'dom4' hot, 200 cold singles
    df = spark.range(0, 40_000).select(
        (F.col("id") % 4).cast("string").alias("p"),
        F.when(F.col("id") % 10 < 7,
               F.concat(F.lit("dom"), (F.col("id") % 5)))
         .otherwise(F.concat(F.lit("cold"), F.col("id"))).alias("v"),
    )
    rows = sk.mg_topk_by_partition(df, "v", "p", m=32).collect()
    from pyspark.sql import Window
    w = Window.partitionBy("p").orderBy(F.desc("cnt"), "v")
    exact_top = {
        (r["p"], r["v"]) for r in
        df.groupBy("p", "v").agg(F.count("*").alias("cnt"))
        .withColumn("rk", F.row_number().over(w)).where("rk <= 5").collect()
    }
    for r in rows:
        summ = dict(zip(r["items"], r["counts"]))
        top5 = sorted(summ, key=summ.get, reverse=True)[:5]
        for v in top5:
            assert (r["partition"], v) in exact_top
        assert len(r["items"]) <= 32


def test_incremental_union_from_stored_hll(spark, valued, tmp_path):
    """Distinct-over-all-history from stored sketches: bit-identical to
    sketching the whole table at once — no history rescan."""
    from json_schema_spark.sources.icetable import IceTable

    store = IceTable.create(spark, str(tmp_path / "hll"), sk.HLL_SCHEMA,
                            ["partition"])
    for p in range(8):
        store.append(sk.hll_by_partition(
            valued.where(F.col("p") == str(p)), "u", "p"))
    merged = sk.hll_merge([np.asarray(r["registers"], dtype=np.int32)
                           for r in store.scan().collect()])
    whole_rows = sk.hll_by_partition(
        valued.withColumn("p", F.lit("all")), "u", "p").collect()
    assert np.array_equal(merged, np.asarray(whole_rows[0]["registers"],
                                             dtype=np.int32))
    exact_total = valued.select("u").distinct().count()
    assert abs(sk.hll_estimate(merged) - exact_total) / exact_total < 0.05
