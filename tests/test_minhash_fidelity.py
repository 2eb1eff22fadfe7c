"""LSH-configuration audit (dedup.py:minhash_fidelity): estimator
identities on hand corpora — identical docs, perturbed twins, and
disjoint docs that must never surface as candidates."""

from __future__ import annotations

from json_schema_spark.operators.dedup import minhash_fidelity


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = minhash_fidelity(df, "doc_id", "text", **kw)
    return {(r["doc_a"], r["doc_b"]): (r["est_jaccard"], r["exact_jaccard"],
                                       r["abs_err"])
            for r in out.collect()}


def test_identical_docs_estimate_and_exact_one(spark):
    rows = [(1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon")]
    got = _run(spark, rows, k=8, bands=4)
    assert got == {(1, 2): (1.0, 1.0, 0.0)}


def test_disjoint_docs_never_candidates(spark):
    rows = [(1, "alpha beta gamma delta epsilon"),
            (2, "one two three four five six")]
    got = _run(spark, rows, k=8, bands=4)
    assert got == {}


def test_perturbed_twin_high_but_not_one(spark):
    base = "w%d " * 30 % tuple(range(30))
    rows = [(1, base.strip()), (2, (base + "tail token added").strip())]
    got = _run(spark, rows, k=16, bands=4)
    assert (1, 2) in got
    est, exact, err = got[(1, 2)]
    # 28 shared trigrams of 28+3: exact = 28/31
    assert exact == round(28 / 31, 6)
    assert 0.0 < est <= 1.0
    assert err == round(abs(est - exact), 6)


def test_estimator_is_agreeing_fraction(spark):
    """est_jaccard must be m/k for integer m — the agreeing-component
    fraction, nothing interpolated."""
    rows = [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j zz")]
    got = _run(spark, rows, k=8, bands=2)
    for est, _, _ in got.values():
        assert round(est * 8, 6) == int(round(est * 8))
