"""draft3 format-table parity (src/formats.lisp:192-204): host-name
spelling, loose time, json-pointer, idn-email alias — through BOTH the
pure-Python checkers and the compiled Column expressions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_schema_spark.functions import formats as colfmt
from json_schema_spark import pyvalidator as pv

CASES = {
    # format -> [(value, expected)]
    "time": [  # draft3-timep (src/formats.lisp:87-98): loose, unanchored
        ("12:34:56", True),
        ("24:00:00", True),       # hour 24 allowed
        ("25:00:00", False),      # hour parse > 24
        ("9:15:00", True),        # single-digit hour
        ("noon at 12:34:56 pm", True),  # unanchored search
        ("12:34", False),
        ("not a time", False),
    ],
    "json-pointer": [
        ("", True), ("/a/b", True), ("/a~0b", True), ("/a~1b", True),
        ("/a~2b", False), ("a/b", False), ("/a~", False),
    ],
    "idn-email": [  # alias of the loose email check
        ("a@b", True), ("no-at-sign", False), ("über@straße.de", True),
    ],
    "host-name": [
        ("example.com", True),
        # reference checks trailing '-' on the WHOLE string only
        # (src/formats.lisp:52) — a '-' ending an inner label passes
        ("bad-.com", True),
        ("bad.com-", False),
        ("x" * 64 + ".com", False),
    ],
    "ipv4": [
        ("1.2.3.4", True), ("256.1.1.1", False), ("1.2.3", False),
    ],
    "date": [("2020-02-29", True), ("2021-02-29", False)],
}


@pytest.mark.parametrize("fmt", sorted(CASES))
def test_draft3_python_table(fmt):
    checker = pv.FORMAT_TABLES["draft3"][fmt]
    for value, expected in CASES[fmt]:
        assert checker(value) == expected, (fmt, value)


def test_draft3_column_table_matches_python(spark):
    rows, preds = [], []
    for j, fmt in enumerate(sorted(CASES)):
        for value, expected in CASES[fmt]:
            rows.append((len(rows), j, value, expected))
    df = spark.createDataFrame(rows, "i long, f long, v string, expected boolean")
    sel = [F.col("i"), F.col("f"), F.col("expected")] + [
        colfmt.FORMAT_TABLES["draft3"][fmt](F.col("v")).alias(f"c{j}")
        for j, fmt in enumerate(sorted(CASES))
    ]
    for r in df.select(*sel).collect():
        assert bool(r[f"c{r['f']}"]) == r["expected"], (r["i"], r["f"])


def test_draft3_table_keys_mirror_reference():
    expect = {"date", "date-time", "email", "idn-email", "host-name",
              "ipv4", "ipv6", "json-pointer", "regex", "time", "uri"}
    assert set(pv.FORMAT_TABLES["draft3"]) == expect
    assert set(colfmt.FORMAT_TABLES["draft3"]) == expect
