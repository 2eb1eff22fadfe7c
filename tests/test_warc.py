"""WARC record parsing (sources/warc.py): Content-Length arithmetic
over bytes, hostile payloads, loud failure on malformed segments."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_schema_spark.sources.warc import (
    _parse_segment,
    assemble_segments,
    parse_warc_records,
    warc_record,
)


def _rec(payload: str, uri: str = "https://h/x",
         rec_id: str = "<urn:1>") -> str:
    body = payload.encode("utf-8")
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Record-ID: {rec_id}\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n" + payload + "\r\n\r\n"
    )


def test_parse_single_record():
    recs = list(_parse_segment(_rec("hello world")))
    assert recs == [("response", "https://h/x", "<urn:1>", 11,
                     "hello world")]


def test_payload_with_fake_warc_header_is_one_record():
    """The whole reason delimiter splitting is wrong: a payload that
    CONTAINS a byte-perfect WARC header block must stay one payload."""
    evil = ("before\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n"
            "Content-Length: 3\r\n\r\nxyz\r\n\r\nafter")
    recs = list(_parse_segment(_rec(evil) + _rec("second")))
    assert len(recs) == 2
    assert recs[0][4] == evil
    assert recs[1][4] == "second"


def test_multibyte_payload_content_length_is_bytes():
    payload = "café â 世界"
    recs = list(_parse_segment(_rec(payload)))
    (wtype, uri, rid, clen, got), = recs
    assert got == payload
    assert clen == len(payload.encode("utf-8"))
    assert clen > len(payload)  # bytes, not chars


def test_multi_record_order_preserved():
    seg = "".join(_rec(f"p{i}", uri=f"https://h/{i}") for i in range(5))
    recs = list(_parse_segment(seg))
    assert [r[4] for r in recs] == [f"p{i}" for i in range(5)]
    assert [r[1] for r in recs] == [f"https://h/{i}" for i in range(5)]


@pytest.mark.parametrize("broken, msg", [
    (_rec("abc")[:-6], "not terminated"),           # truncated payload
    ("WARC/1.0\r\nContent-Length: 3\r\nno-blank", "no header terminator"),
    ("HTTP/1.1 200\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n",
     "bad version line"),
    ("WARC/1.0\r\nWARC-Type: response\r\n\r\nabc\r\n\r\n",
     "bad Content-Length"),
])
def test_malformed_segment_raises(broken, msg):
    with pytest.raises(ValueError, match=msg):
        list(_parse_segment(broken))


def test_spark_roundtrip_byte_identity(spark):
    """Column-built records -> assembled segments -> mapInPandas parse
    recovers every payload byte-for-byte, in order, with byte-correct
    Content-Length (multibyte payloads included)."""
    rows = [(i, f"text-{i} café 世界 " + "x" * i)
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    i = F.col("doc_id")
    uri = F.concat(F.lit("https://h/d/"), i.cast("string"))
    rid = F.concat(F.lit("<urn:"), i.cast("string"), F.lit(">"))
    recs = df.select(
        i, "text",
        warc_record(F.col("text"), uri, rid).alias("rec"))
    segs = assemble_segments(recs, (i % 3).alias("c"), i)
    parsed = parse_warc_records(segs)
    got = {r["uri"]: r for r in parsed.collect()}
    assert len(got) == 20
    for i_, text in rows:
        r = got[f"https://h/d/{i_}"]
        assert r["payload"] == text
        assert r["content_length"] == len(text.encode("utf-8"))
        assert r["rec_id"] == f"<urn:{i_}>"
        assert r["warc_type"] == "response"
    # rec_seq follows doc_id order within each chunk
    by_chunk: dict = {}
    for r in got.values():
        by_chunk.setdefault(r["chunk_id"], []).append(
            (r["rec_seq"], int(r["uri"].rsplit("/", 1)[1])))
    for seqs in by_chunk.values():
        seqs.sort()
        assert [s for s, _ in seqs] == list(range(len(seqs)))
        ids = [d for _, d in seqs]
        assert ids == sorted(ids)
