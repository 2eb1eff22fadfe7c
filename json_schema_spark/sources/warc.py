"""WARC (Web ARChive, ISO 28500) record parsing — the raw Common Crawl
input format, upstream even of HTML extraction (WARC -> WET is the
classic CC derivation; `html_extract` is the WET side, this is the
WARC side).

A WARC segment file is a byte stream of concatenated records::

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: https://host/path\r\n
    WARC-Record-ID: <urn:...>\r\n
    Content-Length: <N bytes>\r\n
    \r\n
    <N payload bytes>\r\n
    \r\n

The ONLY correct parse is Content-Length arithmetic over BYTES: the
payload may contain anything, including lines that look exactly like a
WARC header block, so delimiter splitting (regexp or otherwise) is
wrong by construction.  That sequential byte walk is inherently
imperative — this is the sanctioned Arrow-batched ``mapInPandas`` use
case (per-partition Python over opaque blobs, like
``operators/multimodal.py``), NOT a per-row UDF.

Scale shape: one ``mapInPandas`` pass over segment rows, zero shuffle,
zero regex over payload bytes; each task emits records linear in its
input bytes.  At 10^12 documents a segment row is one WARC file chunk
(~1 GiB in real CC dumps) and the parse stays embarrassingly parallel.

Reference seam: the reference validates documents it is handed
(validators.lisp keyword dispatch); WARC ingestion is the outermost
upstream stage that produces those documents, mirrored here so the
engine covers crawl-archive -> page -> text -> validation end to end.
Like extraction (html_extract.py), the parser must never alter payload
bytes — the oracle compares md5(payload) against an independently
built page, so a single flipped byte diverges.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"
_HDR_END = b"\r\n\r\n"
_REC_TERM = b"\r\n\r\n"

PARSED_SCHEMA = (
    "chunk_id long, rec_seq int, warc_type string, uri string, "
    "rec_id string, content_length long, payload string"
)


def warc_record(payload: Column, uri: Column, rec_id: Column) -> Column:
    """One WARC/1.0 response record as a string Column.  Content-Length
    is ``octet_length`` (BYTES, per the spec) — not char_length — so
    multibyte payloads round-trip."""
    return F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(CRLF),
        F.lit("WARC-Record-ID: "), rec_id, F.lit(CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"), F.lit(CRLF),
        F.lit(CRLF), payload, F.lit(CRLF + CRLF),
    )


def assemble_segments(
    records: DataFrame, chunk_id: Column, order_key: Column,
    record_col: str = "rec",
) -> DataFrame:
    """Concatenate records into multi-record segment strings, ordered
    by ``order_key`` within each chunk (deterministic synthesis — the
    TEST-FIXTURE direction; production reads segments, it does not
    build them).  One groupBy shuffle of record strings."""
    return (
        records.groupBy(chunk_id.alias("chunk_id"))
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(order_key.alias("k"),
                                 F.col(record_col).alias("r")))),
                    lambda s: s["r"],
                ),
            ).alias("segment")
        )
    )


def _parse_segment(seg: str) -> Iterator[tuple]:
    """Walk one segment's bytes by Content-Length arithmetic.  Raises
    ValueError loudly on malformed input (truncation, missing
    terminator, non-numeric length) — a quietly skipped record is a
    silently smaller corpus."""
    buf = seg.encode("utf-8")
    pos, n = 0, len(buf)
    while pos < n:
        hdr_end = buf.find(_HDR_END, pos)
        if hdr_end < 0:
            raise ValueError(f"WARC: no header terminator at byte {pos}")
        lines = buf[pos:hdr_end].decode("utf-8").split(CRLF)
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"WARC: bad version line {lines[0]!r}")
        hdrs = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"WARC: bad Content-Length in {lines[0]!r}")
        body_start = hdr_end + len(_HDR_END)
        body_end = body_start + clen
        if buf[body_end:body_end + len(_REC_TERM)] != _REC_TERM:
            raise ValueError(
                f"WARC: record at byte {pos} not terminated after "
                f"Content-Length={clen}")
        yield (
            hdrs.get("warc-type", ""),
            hdrs.get("warc-target-uri", ""),
            hdrs.get("warc-record-id", ""),
            clen,
            buf[body_start:body_end].decode("utf-8"),
        )
        pos = body_end + len(_REC_TERM)


def parse_warc_records(
    segments: DataFrame, segment_col: str = "segment",
    chunk_col: str = "chunk_id",
) -> DataFrame:
    """Arrow-batched WARC parse: segments DataFrame ->
    (chunk_id, rec_seq, warc_type, uri, rec_id, content_length,
    payload) with ``rec_seq`` the record's position within its
    segment.  One mapInPandas, zero shuffle."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["chunk_id", "rec_seq", "warc_type", "uri", "rec_id",
                "content_length", "payload"]
        for pdf in batches:
            rows = []
            for cid, seg in zip(pdf[chunk_col], pdf[segment_col]):
                for j, rec in enumerate(_parse_segment(seg)):
                    rows.append((cid, j, *rec))
            yield pd.DataFrame(rows, columns=cols)

    return segments.mapInPandas(gen, PARSED_SCHEMA)
