"""Similarity search over embedding columns (array<float>).

Two paths, same cosine core (all built-in higher-order functions —
`zip_with` products, `aggregate` sum — JVM-side, no UDF):

* **brute force** — broadcast the (small) query set, crossJoin, rank
  with a per-query window. Exact; the baseline every ANN variant is
  measured against. Scales in corpus size (narrow scan + broadcast),
  not in query count.
* **LSH-bucketed** — random-hyperplane signatures (deterministic
  planes derived from a seed via md5, generated driver-side as
  literals) bucket the corpus once; each query probes its own bucket
  plus all 1-bit-flip neighbors (multiprobe) so recall degrades
  gracefully. The corpus-side shuffle is ONE groupBy-free repartition
  by bucket; at 10^12 rows this is the only shape that avoids the
  full scan per query.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two float arrays (cast each
    product to double before summing so engines agree)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def ann_bruteforce_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "vec_id", qvec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query:
    (query_id, neighbor_id, cos_sim, rank). Query side is broadcast —
    the corpus never shuffles; ranking uses one window keyed by query.
    Ties broken by neighbor id for determinism."""
    q = F.broadcast(
        queries.select(F.col(qid_col).alias("query_id"),
                       F.col(qvec_col).alias("qvec"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5(seed, p, d) —
    reproducible across sessions/partitions with no RNG state."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()
            (u,) = struct.unpack("<Q", h[:8])
            row.append((u / 2**64) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection bucket id (int) for a vector column."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        proj = dot(vec, lit_plane)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 8, dim: int = 64, seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket (plus 1-bit-flip neighbor buckets when ``multiprobe``).

    Scale path: corpus bucketed once (narrow projection), join on
    bucket instead of crossJoin — per-query work drops from |corpus| to
    |corpus| / 2^n_planes * (1 + n_planes).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        lsh_bucket(F.col(vec_col), planes).alias("qbucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[F.col("qbucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
        )
    else:
        probes = F.array(F.col("qbucket"))
    q = F.broadcast(qb.select("query_id", "qvec", F.explode(probes).alias("bucket")))

    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_duplicates(
    df: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 8, dim: int = 64, seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cos >= threshold)
    via LSH bucketing + multiprobe: candidate pairs only within a
    bucket or across 1-bit-adjacent buckets, then exact-cosine verify.
    High-cosine pairs land in the same/adjacent buckets w.h.p."""
    planes = _hyperplanes(dim, n_planes, seed)
    base = df.select(
        F.col(id_col).alias("doc"), F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    probed = base.select(
        "doc", "vec",
        F.explode(F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
        )).alias("probe"),
    )
    a = probed.alias("a")
    b = base.select(F.col("doc").alias("doc_b"), F.col("vec").alias("vec_b"),
                    F.col("bucket").alias("probe")).alias("b")
    return (
        a.join(b, on=["probe"])
        .where(F.col("a.doc") < F.col("doc_b"))
        .select(F.col("a.doc").alias("doc_a"), F.col("doc_b"),
                F.round(cosine(F.col("a.vec"), F.col("vec_b")), 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
        .groupBy("doc_a", "doc_b")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )


def embedding_near_duplicates_exact(
    df: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force O(n^2) verify path (oracle baseline; fine at test
    scale, the LSH path above is the scale path)."""
    a = df.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("vec_a"))
    b = df.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b",
                F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )
