"""Spec `dataset` block execution (FIXTURES.md §3): unique + ref +
drift checks driven entirely by the constraint-spec JSON."""

from __future__ import annotations

import pytest

from json_schema_spark.plans.runner import ValidationRunner
from json_schema_spark.sources import tables as tb

FULL_SPEC = {
    "$id": "https://example.com/webpage-constraints.json",
    "draft": "draft7",
    "columns": {
        "url": {"type": "string", "format": "uri", "pattern": "^https?://"},
        "lang": {"enum": tb.ALLOWED_LANGS},
        "text": {"type": "string", "minLength": 1},
    },
    "required": ["url", "warc_ts", "text", "lang"],
    "dataset": {
        "unique": ["url"],
        "ref": [{"column": "lang", "table": "lang_dim", "key": "lang_code"}],
        "drift": [
            {"column": "lang", "test": "chi2", "by": "days(warc_ts)"},
            {"column": "char_length(text)", "test": "ks", "by": "days(warc_ts)"},
            {"column": "char_length(text)", "test": "tdigest",
             "by": "days(warc_ts)"},
        ],
        "dedup": [
            {"column": "text", "id": "url", "method": "exact",
             "max_dup_frac": 0.001},
            {"column": "text", "id": "url", "method": "fingerprint",
             "max_dup_frac": 0.5},
        ],
    },
}


def test_dataset_block(spark, webpages, tmp_path):
    runner = ValidationRunner(spark, FULL_SPEC, str(tmp_path / "res"), run_id="ds")
    res = runner.run_dataset_checks(webpages, dims={"lang_dim": tb.lang_dim(spark)})
    rows = {r["check"]: r for r in res.collect()}

    assert rows["unique(url)"]["pass"] is False  # planted dup urls
    assert rows["unique(url)"]["n_violations"] > 0

    assert rows["ref(lang->lang_code)"]["pass"] is False  # planted 'xx'
    assert rows["ref(lang->lang_code)"]["n_violations"] > 0

    # dedup checks: planted exact dups (~1/DUP_TEXT_MOD of rows) exceed
    # the 0.1% cap but sit far under the 50% one
    assert rows["dedup_exact(text)"]["pass"] is False
    assert rows["dedup_exact(text)"]["n_violations"] > 0
    assert rows["dedup_fingerprint(text)"]["pass"] is True
    assert rows["dedup_fingerprint(text)"]["metric"] >= \
        rows["dedup_exact(text)"]["metric"]  # normalization only merges

    chi2 = rows["drift_chi2(lang by days(warc_ts))"]
    assert chi2["pass"] is False  # DRIFT_DAY has a shifted distribution
    assert chi2["metric"] > 0

    ks = rows["drift_ks(char_length(text) by days(warc_ts))"]
    tdg = rows["drift_tdigest(char_length(text) by days(warc_ts))"]
    # sketch verdict agrees with the exact KS verdict and its statistic
    # lands within sketch tolerance
    assert tdg["pass"] == ks["pass"]
    assert abs(tdg["metric"] - ks["metric"]) < 0.05
    assert ks["pass"] is True  # text lengths share one generator
    assert 0 <= ks["metric"] < 0.2


def test_dataset_block_missing_dim_raises(spark, webpages, tmp_path):
    runner = ValidationRunner(spark, FULL_SPEC, str(tmp_path / "res2"), run_id="ds2")
    with pytest.raises(ValueError, match="lang_dim"):
        runner.run_dataset_checks(webpages, dims={})
