"""Unicode normalization audit for web-text corpora.

Web crawls mix NFC and NFD encodings of the same glyphs (combining
accents from Mac filesystems, decomposed forms from OCR and legacy
CMSes), which silently breaks exact dedup, token counting, and every
hash-keyed operator — 'café' (é precomposed U+00E9) and 'café'
(e + combining acute U+0301) are different strings with the same
rendering.  The standard pipeline fix is to canonicalize to NFC before
anything hashes text.

Reference seam: json-schema's string validators
(src/validators.lisp:length checks) count code points of the input
as-is; this operator is the corpus-side stage that makes those counts
(and the byte-identity invariant) well-defined in the first place.

Spark has no built-in Unicode normalization, so this is the sanctioned
slow path done right (compression_ratio precedent): ONE Arrow-batched
``mapInPandas`` over a pruned (id, text) projection — per-batch Python
calling ``unicodedata.normalize`` (CPython's C implementation), zero
shuffle, projection-parallel.  Everything derivable JVM-side (md5,
char/byte lengths, changed flag) is computed AFTER the UDF as built-in
columns so the Python stage stays minimal.

Oracle: DuckDB ships ``nfc_normalize`` natively, so for form='NFC' the
driver value-checks every output column — including the md5 of the
normalized text (the byte-identity pin) — against an independent C
implementation (utf8proc) of the same Unicode algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["nfc_audit"]


def nfc_audit(
    df: DataFrame, id_col: str, text_col: str, form: str = "NFC",
) -> DataFrame:
    """Per-document normalization audit: (id, changed, chars_before,
    chars_after, bytes_before, bytes_after, norm_md5).

    ``changed`` is true iff normalization altered the string; the
    md5 of the normalized text is the cross-engine byte-identity pin.
    NULL text rows are preserved with NULL metrics (changed = false —
    normalization is the identity on missing values).
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form}")

    out_schema = T.StructType([
        T.StructField("__id", df.schema[id_col].dataType),
        T.StructField("__text", T.StringType()),
        T.StructField("__norm", T.StringType()),
    ])

    def _norm(batches):
        import unicodedata

        import pandas as pd

        for pdf in batches:
            norm = [
                None if v is None or (isinstance(v, float) and pd.isna(v))
                else unicodedata.normalize(form, v)
                for v in pdf[text_col]
            ]
            yield pd.DataFrame({
                "__id": pdf[id_col],
                "__text": pdf[text_col],
                "__norm": norm,
            })

    normed = (
        df.select(id_col, text_col)
        .mapInPandas(_norm, schema=out_schema)
    )
    return normed.select(
        F.col("__id").alias(id_col),
        F.coalesce(~F.col("__text").eqNullSafe(F.col("__norm")),
                   F.lit(False)).alias("changed"),
        F.char_length("__text").alias("chars_before"),
        F.char_length("__norm").alias("chars_after"),
        F.octet_length("__text").alias("bytes_before"),
        F.octet_length("__norm").alias("bytes_after"),
        F.md5("__norm").alias("norm_md5"),
    )
