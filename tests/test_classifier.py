"""hashed_linear_score: fastText-style quality classifier inference.

Every expectation below is computed in pure Python (hashlib.md5) —
independent of both Spark and DuckDB — so the engine, the oracle SQL,
and this file triangulate the same numbers.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from json_schema_spark.operators.classifier import hashed_linear_score

N_BUCKETS = 4096


def py_bucket(key: str, seed: int = 7, buckets: int = N_BUCKETS) -> int:
    h = int(hashlib.md5(f"{key}#{seed}".encode()).hexdigest()[:15], 16)
    return h % buckets


def py_weight(bucket: int) -> float:
    h = int(hashlib.md5(f"w#{bucket}".encode()).hexdigest()[:15], 16)
    return h / 2**60 * 2 - 1


def py_score(text: str, gain: float = 12.0):
    toks = text.strip().lower().split()
    grams = toks + ["\x1f".join(p) for p in zip(toks, toks[1:])]
    if not grams:
        return 0, None, None, None
    raw = sum(py_weight(py_bucket(g)) for g in grams) / len(grams)
    return (len(grams), round(raw, 6),
            round(1 / (1 + math.exp(-gain * raw)), 6),
            round(raw, 6) > 0)


DOCS = [
    ("d1", "The quick brown Fox jumps"),
    ("d2", "   "),                      # blank -> zero grams, NULL verdicts
    ("d3", "hello"),                    # single token -> no bigrams
    ("d4", None),                       # null text -> dropped
    ("d5", "data data data"),           # repeated gram reuses its bucket
]


def test_scores_match_pure_python_replication(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = {r["id"]: r for r in
           hashed_linear_score(df, "doc_id", "text").collect()}
    assert set(out) == {"d1", "d2", "d3", "d5"}  # d4 (null text) dropped
    for did, text in DOCS:
        if text is None:
            continue
        n, score, prob, keep = py_score(text)
        row = out[did]
        assert row["n_grams"] == n, did
        if n == 0:
            assert row["score"] is None and row["quality_prob"] is None
            assert row["keep"] is None
        else:
            assert row["score"] == pytest.approx(score, abs=1e-6), did
            assert row["quality_prob"] == pytest.approx(prob, abs=1e-6), did
            assert row["keep"] == keep, did


def test_trained_weights_override_placeholder(spark):
    df = spark.createDataFrame([("d3", "hello")], ["doc_id", "text"])
    b = py_bucket("hello")
    out = hashed_linear_score(
        df, "doc_id", "text", weights={b: 5.0}).collect()[0]
    # single gram, trained weight 5.0 -> raw = 5.0 exactly
    assert out["score"] == pytest.approx(5.0)
    assert out["quality_prob"] == pytest.approx(1.0)  # sigmoid(60)
    assert out["keep"] is True
    # a weight map that misses the bucket falls back to the placeholder
    out2 = hashed_linear_score(
        df, "doc_id", "text", weights={(b + 1) % N_BUCKETS: 5.0}).collect()[0]
    assert out2["score"] == pytest.approx(round(py_weight(b), 6), abs=1e-6)


def test_unigram_only_mode(spark):
    df = spark.createDataFrame([("d1", "a b c")], ["doc_id", "text"])
    out = hashed_linear_score(
        df, "doc_id", "text", use_bigrams=False).collect()[0]
    assert out["n_grams"] == 3
    exp = sum(py_weight(py_bucket(g)) for g in "a b c".split()) / 3
    assert out["score"] == pytest.approx(round(exp, 6), abs=1e-6)


def test_array_weight_table_is_bit_exact_vs_jvm(spark):
    """The precomputed driver-side weight table (hashlib) must equal
    the JVM conv/cast formula EXACTLY — not approximately — or the
    array-literal fast path would silently drift from the oracle."""
    from pyspark.sql import functions as F

    from json_schema_spark.operators.classifier import (
        _placeholder_weight,
        _placeholder_weight_py,
    )

    buckets = list(range(64)) + [511, 1024, 4095]
    jvm = (
        spark.range(1)
        .select([_placeholder_weight(F.lit(b)).alias(f"w{b}")
                 for b in buckets])
        .collect()[0]
    )
    for i, b in enumerate(buckets):
        assert jvm[i] == _placeholder_weight_py(b), b  # exact ==


def test_large_bucket_space_fallback_path(spark):
    """n_buckets > 65536 takes the in-lambda md5 path (no giant array
    literal); scores still match the pure-Python replication."""
    df = spark.createDataFrame([("d1", "alpha beta")], ["doc_id", "text"])
    n = 1 << 17
    out = hashed_linear_score(
        df, "doc_id", "text", n_buckets=n).collect()[0]
    toks = ["alpha", "beta", "alpha\x1fbeta"]
    exp = sum(py_weight(py_bucket(g, buckets=n)) for g in toks) / 3
    assert out["score"] == pytest.approx(round(exp, 6), abs=1e-6)


# ---------------------------------------------------------------- calibration
def _sweep(spark, rows, grid, **kw):
    from json_schema_spark.operators.classifier import calibration_sweep

    df = spark.createDataFrame(rows, "id INT, score DOUBLE, lab BOOLEAN")
    out = calibration_sweep(df, "score", "lab", grid, **kw)
    return {r["threshold"]: r.asDict() for r in out.collect()}


def test_calibration_hand_confusion_counts(spark):
    # scores/labels chosen so every cell is exercised at t=0.5:
    # preds: 0.9+,0.6+ | 0.4-,0.1- ; labels: T,F | T,F
    rows = [(1, 0.9, True), (2, 0.6, False), (3, 0.4, True),
            (4, 0.1, False)]
    got = _sweep(spark, rows, [0.0, 0.5, 1.0])
    assert (got[0.5]["tp"], got[0.5]["fp"], got[0.5]["fn"],
            got[0.5]["tn"]) == (1, 1, 1, 1)
    assert got[0.5]["precision"] == 0.5
    assert got[0.5]["recall"] == 0.5
    assert got[0.5]["f1"] == 0.5
    # t=0.0: everything predicted positive
    assert (got[0.0]["tp"], got[0.0]["fp"], got[0.0]["fn"],
            got[0.0]["tn"]) == (2, 2, 0, 0)
    assert got[0.0]["recall"] == 1.0


def test_calibration_null_edges(spark):
    rows = [(1, 0.3, True), (2, 0.2, False)]
    got = _sweep(spark, rows, [0.9])
    # nothing predicted positive -> precision NULL, f1 NULL
    r = got[0.9]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 0, 1, 1)
    assert r["precision"] is None and r["f1"] is None
    assert r["recall"] == 0.0
    # no positive labels anywhere -> recall NULL
    got2 = _sweep(spark, [(1, 0.3, False)], [0.0])
    assert got2[0.0]["recall"] is None and got2[0.0]["f1"] is None


def test_calibration_threshold_is_geq_and_rows_conserve(spark):
    rows = [(i, i / 10.0, i % 2 == 0) for i in range(11)]
    got = _sweep(spark, rows, [0.5, 0.50001])
    # score == threshold counts as predicted positive
    assert got[0.5]["tp"] + got[0.5]["fp"] == 6     # 0.5..1.0
    assert got[0.50001]["tp"] + got[0.50001]["fp"] == 5
    for r in got.values():
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == 11


def test_calibration_null_scores_and_labels(spark):
    rows = [(1, None, True), (2, 0.8, None), (3, 0.8, True)]
    got = _sweep(spark, rows, [0.5])
    r = got[0.5]
    # null score dropped; null label coalesces to False
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 1, 0, 0)
