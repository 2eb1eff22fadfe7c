"""Multimodal (image/audio/video) column plumbing.

Media lives as opaque BINARY columns with typed metadata structs.
Everything Spark-side is REAL — schemas, Arrow batch shapes,
mapInPandas signatures, partitioning — while the actual codec calls
are stubbed behind an import-try (the decode libraries are not in this
container): with no codec available the deterministic fake featurizer
runs, so tests pin the full distributed path end to end.

JVM-only metadata (length, magic bytes, content hash) needs no Python
at all; only decode/feature-extraction crosses into Arrow-batched
pandas iterators (`mapInPandas` — per-BATCH Python, never per-row
loops over Spark rows).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-byte prefixes -> media kind (JVM-side dispatch)
_MAGIC = {
    "89504e47": "png",
    "ffd8ff": "jpeg",
    "47494638": "gif",
    "52494646": "riff",   # wav/avi container
    "494433": "mp3",
    "1a45dfa3": "mkv/webm",
}


def binary_meta(col: Column) -> Column:
    """Typed metadata struct for a binary column — pure built-ins:
    byte length, magic prefix, detected kind, content hash."""
    magic = F.lower(F.hex(F.substring(col, 1, 4)))
    kind = F.lit("unknown")
    for prefix, name in _MAGIC.items():
        kind = F.when(magic.startswith(prefix.upper()) | magic.startswith(prefix),
                      F.lit(name)).otherwise(kind)
    return F.struct(
        F.length(col).alias("n_bytes"),
        magic.alias("magic"),
        kind.alias("kind"),
        F.md5(col).alias("content_md5"),
    )


def _try_real_decoder(n_dims: int = 8) -> Callable | None:
    """Import-try for a real image decoder (PIL not present in this
    container — the deterministic fake below carries the plumbing
    when this returns None)."""
    try:
        import io

        from PIL import Image

        def _decode(data: bytes) -> list[float] | None:
            # decode -> normalize size -> features: 3 channel means +
            # grayscale row/column band means, padded with the overall
            # mean to EXACTLY n_dims (the fake path also emits n_dims —
            # mixed corpora must never produce ragged arrays).
            # Per-row tolerance: an undecodable blob yields NULL
            # features, it must not abort a 10^12-row job.
            try:
                img = Image.open(io.BytesIO(data)).convert("RGB").resize((8, 8))
                px = list(img.getdata())
            except Exception:
                return None
            chan = [
                sum(p[c] for p in px) / (len(px) * 255.0) for c in range(3)
            ]
            gray = [(p[0] + p[1] + p[2]) / (3 * 255.0) for p in px]
            rows = [sum(gray[i * 8:(i + 1) * 8]) / 8 for i in range(8)]
            cols = [sum(gray[i::8]) / 8 for i in range(8)]
            feats = chan + rows + cols
            mean = sum(gray) / len(gray)
            while len(feats) < n_dims:
                feats.append(mean)
            return feats[:n_dims]

        return _decode
    except ImportError:
        return None


def _fake_features(data: bytes, n_dims: int = 8) -> list[float]:
    """Deterministic stand-in featurizer: md5-chained floats in [0,1).
    Same bytes -> same features on every executor/retry."""
    out, h = [], hashlib.md5(data or b"").digest()
    while len(out) < n_dims:
        out.append(int.from_bytes(h[:8], "little") / 2**64)
        h = hashlib.md5(h).digest()
    return out[:n_dims]


FEATURE_SCHEMA = (
    "id long, n_bytes long, features array<double>, decoder string"
)


def extract_features(
    df: DataFrame, id_col: str, binary_col: str, n_dims: int = 8,
) -> DataFrame:
    """Decode/feature-extract binary media via mapInPandas.

    The iterator-of-batches signature keeps peak memory at one Arrow
    batch per worker regardless of partition size — the shape that
    holds at 100 TB (html/binary bytes never concatenate driver-side).
    """
    import pandas as pd

    real = _try_real_decoder(n_dims)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = real or (lambda b: _fake_features(b, n_dims))
        name = "real" if real else "fake-md5"
        for pdf in batches:
            blobs = pdf[binary_col]
            feats = [None if b is None else decode(bytes(b)) for b in blobs]
            yield pd.DataFrame({
                "id": pdf[id_col],
                "n_bytes": [0 if b is None else len(bytes(b)) for b in blobs],
                "features": feats,
                "decoder": name,
            })

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = (
    "id long, width int, height int, resized binary, resizer string"
)


def resize_images(
    df: DataFrame, id_col: str, binary_col: str,
    width: int = 64, height: int = 64,
) -> DataFrame:
    """Resize binary images via mapInPandas — same contract as
    :func:`extract_features`: the Spark plumbing (Arrow batch
    iterator, output schema, NULL tolerance) is real; the codec is
    PIL when importable, else a DETERMINISTIC FAKE that emits an
    md5-seeded RGB byte plane of exactly width*height*3 bytes, so
    downstream stages (re-encode, feature extract, sink) see the
    correct shapes either way. Undecodable blobs yield NULL, never
    an aborted job."""
    import pandas as pd

    try:
        import io

        from PIL import Image

        def _resize(data: bytes) -> bytes | None:
            try:
                img = Image.open(io.BytesIO(data)).convert("RGB")
                return img.resize((width, height)).tobytes()
            except Exception:
                return None

        name = "real"
    except ImportError:
        n_out = width * height * 3

        def _resize(data: bytes) -> bytes | None:
            out, h = bytearray(), hashlib.md5(data or b"").digest()
            while len(out) < n_out:
                out.extend(h)
                h = hashlib.md5(h).digest()
            return bytes(out[:n_out])

        name = "fake-md5"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[binary_col]
            yield pd.DataFrame({
                "id": pdf[id_col],
                "width": width,
                "height": height,
                "resized": [None if b is None else _resize(bytes(b))
                            for b in blobs],
                "resizer": name,
            })

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


def frame_sample_plan(
    df: DataFrame, id_col: str, binary_col: str, every_n: int = 10,
) -> DataFrame:
    """Video frame-sampling PLAN: emits (id, frame_idx) rows for the
    frames a decoder would extract — the partition/explode shape is
    real; the decoder itself is the stub above. Frame count is derived
    deterministically from byte length (fake container parse)."""
    n_frames = (F.length(F.col(binary_col)) / 16).cast("int")
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.sequence(F.lit(0), F.greatest((n_frames / every_n).cast("int") - 1, F.lit(0)))
        ).alias("sample_slot"),
    ).withColumn("frame_idx", F.col("sample_slot") * every_n)
