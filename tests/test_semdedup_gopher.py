"""Value-level tests for the r5 SemDeDup and Gopher-rules operators —
hand-constructed fixtures where the cluster assignment, keep order,
and every rule boolean are known in advance.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from json_schema_spark.operators.quality import gopher_rules
from json_schema_spark.operators.similarity import (
    seeded_unit_centroids,
    semdedup,
)

# two orthogonal unit centroids: cluster 0 = x-axis, cluster 1 = y-axis
CENTS = [[1.0, 0.0], [0.0, 1.0]]


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(y * y for y in b)))


@pytest.fixture(scope="module")
def tiny_vecs(spark):
    rows = [
        (1, [10.0, 1.0]),    # cluster 0, sim_c = cos((10,1),(1,0))
        (2, [10.0, 2.0]),    # cluster 0, lower sim_c than 1; cos(1,2) high
        (3, [0.5, 9.0]),     # cluster 1, alone above threshold with 4
        (4, [0.4, 9.1]),     # cluster 1, near-dup of 3
        (5, [-8.0, 0.5]),    # cluster 1 (cos with x-axis negative), far
        (6, [10.0, 1.0]),    # exact tie with 1: same sim_c, higher id
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_keeps_lowest_centroid_similarity(tiny_vecs):
    out = {r["id"]: r for r in
           semdedup(tiny_vecs, CENTS, threshold=0.95).collect()}
    assert len(out) == 6
    assert out[1]["cluster_id"] == 0 and out[2]["cluster_id"] == 0
    assert out[3]["cluster_id"] == 1 and out[4]["cluster_id"] == 1
    assert out[5]["cluster_id"] == 1
    # sim_centroid matches hand math at round(6)
    assert out[1]["sim_centroid"] == pytest.approx(
        round(_cos([10.0, 1.0], [1.0, 0.0]), 6), abs=1e-9)
    # pair (1,2): cos ≈ 0.9983 >= 0.95; 2 has the LOWER sim_c -> kept,
    # 1 is the duplicate (SemDeDup keeps lowest similarity-to-centroid)
    assert _cos([10.0, 1.0], [10.0, 2.0]) >= 0.95
    assert out[2]["sim_centroid"] < out[1]["sim_centroid"]
    assert not out[2]["is_dup"] and out[1]["is_dup"]
    # pair (3,4): 4 has lower sim_c to y-axis? cos((0.5,9),(0,1)) vs
    # cos((0.4,9.1),(0,1)) — whichever is lower survives
    lo, hi = (3, 4) if out[3]["sim_centroid"] < out[4]["sim_centroid"] else (4, 3)
    assert not out[lo]["is_dup"] and out[hi]["is_dup"]
    # 5 is in cluster 1 but far from 3/4 (negative x) -> kept
    assert not out[5]["is_dup"]
    # exact tie (6 == 1's vector): same sim_c, lower id 1 wins the tie
    # ordering — but 1 is already dropped by 2; 6 is dropped by both
    assert out[6]["is_dup"]


def test_semdedup_no_dups_below_threshold(tiny_vecs):
    out = semdedup(tiny_vecs, CENTS, threshold=1.1)
    assert out.where("is_dup").count() == 0


def test_seeded_centroids_deterministic_and_unit():
    a = seeded_unit_centroids(64, 8, seed=7)
    b = seeded_unit_centroids(64, 8, seed=7)
    assert a == b and len(a) == 8 and len(a[0]) == 64
    for c in a:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-4  # rounded to 6dp


GOOD = ("the cat sat on the mat with all of its friends and that was "
        "fine because everyone could have tea " * 3)  # >50 words, stopwordy


@pytest.fixture(scope="module")
def tiny_texts(spark):
    rows = [
        (1, GOOD),                                     # passes everything
        (2, "too short to pass the word count rule"),  # wc < 50
        (3, "\n".join("- bullet line" for _ in range(10))
            + "\n" + GOOD),                            # >90% bullet lines
        (4, "\n".join(f"trailing off number {i}..." for i in range(10))
            + "\n" + GOOD),                            # >30% ellipsis lines
        (5, " ".join("123456" for _ in range(60))),    # no alpha words
        (6, GOOD + " " + " ".join("#" for _ in range(20))),  # symbol ratio
        (7, ""),                                       # empty
        (8, None),                                     # null text dropped
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rules_battery(tiny_texts):
    out = {r["id"]: r for r in gopher_rules(tiny_texts).collect()}
    assert 8 not in out and len(out) == 7
    r1 = out[1]
    assert r1["passes_gopher"]
    assert r1["word_count"] == 60
    assert r1["n_stopwords"] >= 2
    assert r1["alpha_word_frac"] == 1.0
    assert not out[2]["passes_gopher"] and out[2]["word_count"] == 8
    assert out[3]["bullet_line_frac"] > 0.9 and not out[3]["passes_gopher"]
    assert out[4]["ellipsis_line_frac"] == pytest.approx(10.0 / 11, abs=1e-6)
    assert not out[4]["passes_gopher"]
    assert out[5]["alpha_word_frac"] == 0.0 and not out[5]["passes_gopher"]
    assert out[6]["symbol_word_ratio"] > 0.1 and not out[6]["passes_gopher"]
    # empty text: zero words, every wc-ratio NULL, verdict coalesces False
    r7 = out[7]
    assert r7["word_count"] == 0 and r7["mean_word_len"] is None
    assert not r7["passes_gopher"]


def test_gopher_mean_word_len_hand_value(spark):
    df = spark.createDataFrame(
        [(1, "the of aaaa bbbbbb " * 20)], "doc_id long, text string")
    r = gopher_rules(df).collect()[0]
    # words cycle (3,2,4,6) chars -> mean 3.75
    assert r["mean_word_len"] == pytest.approx(3.75)
    assert r["word_count"] == 80
    assert r["n_stopwords"] == 2
    assert r["passes_gopher"]


# ---------------------------------------------------------------------------
# embedding_outliers: MAD / modified-z norm sanity gate
# ---------------------------------------------------------------------------

def test_embedding_outliers_hand_values(spark):
    from json_schema_spark.operators.similarity import embedding_outliers

    # 5 unit-ish norms and one corrupt 100x vector
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.1]), (3, [0.9, 0.0]),
            (4, [1.0, 0.2]), (5, [0.0, 0.95]), (6, [100.0, 0.0]),
            (7, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.id: r for r in embedding_outliers(
        df, "vec_id", "embedding").collect()}
    assert 7 not in got                       # NULL vector never enters
    assert got[6].is_outlier and got[6].norm == 100.0
    assert not any(got[i].is_outlier for i in (1, 2, 3, 4, 5))
    # norms sorted: .9 .95 1.0 1.0198 1.1 100 -> med = (1.0+1.0198)/2
    import math
    n4 = round(math.sqrt(1.0 + 0.04), 6)
    med = round((1.0 + n4) / 2, 6)
    assert got[1].med_norm == med
    # MAD from the rounded median; z uses rounded med and mad
    devs = sorted(abs(round(x, 6) - med) for x in
                  (1.0, 1.1, 0.9, n4, 0.95, 100.0))
    mad = round((devs[2] + devs[3]) / 2, 6)
    assert got[1].mad_norm == mad
    assert got[6].z == round(0.6745 * (100.0 - med) / mad, 6)


def test_embedding_outliers_constant_norms_no_flags(spark):
    from json_schema_spark.operators.similarity import embedding_outliers

    df = spark.createDataFrame(
        [(i, [3.0, 4.0]) for i in range(10)],
        "vec_id long, embedding array<double>")
    got = embedding_outliers(df, "vec_id", "embedding").collect()
    # MAD == 0 -> defined: z = 0, no outliers
    assert all(r.z == 0.0 and not r.is_outlier for r in got)
    assert all(r.norm == 5.0 for r in got)


def test_embedding_outliers_approx_mode_same_flags(spark):
    from json_schema_spark.operators.similarity import embedding_outliers

    rows = [(i, [1.0 + (i % 7) / 100.0, 0.0]) for i in range(200)] + [
        (999, [50.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ex = {r.id: r.is_outlier for r in embedding_outliers(
        df, "vec_id", "embedding", exact=True).collect()}
    ap = {r.id: r.is_outlier for r in embedding_outliers(
        df, "vec_id", "embedding", exact=False).collect()}
    # the scale path (percentile_approx) flags the same gross outlier
    assert ex[999] and ap[999]
    assert sum(ex.values()) == sum(ap.values()) == 1
