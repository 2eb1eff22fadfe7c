"""ANN recall + wall at 1M vectors (VERDICT r3 item 7).

The driver-query recall gate runs on 2k vectors / 5 queries; this soak
answers "does the bucketing hold when the corpus is 500x larger":
1M clustered 64-dim vectors (deterministic JVM-side generation, cached
parquet under BENCH/.cache), 100 queries, recall@10 of ann_lsh_topk
and ann_ivf_topk against the exact GEMM brute force, plus candidate
counts vs the documented n_tables*|corpus|/2^planes envelope.

Writes BENCH/ann_scale.json; bench.py folds the two recall scalars
into its contract line.

Usage: python BENCH/ann_scale.py [n_vectors] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from json_schema_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_lsh_topk,
)
from json_schema_spark.session import get_spark

DIM = 64
N_CLUSTERS = 20_000
NOISE = 0.15  # fraction of a unit component — keeps clusters tight


def synth_vectors(spark, n: int):
    """Deterministic clustered corpus: vector i belongs to cluster
    i % N_CLUSTERS; components = unit-ish center + small noise, all
    from JVM murmur3 hashes — no Python in the generate path, fully
    reproducible, and embarrassingly parallel (range source)."""
    j = F.sequence(F.lit(0), F.lit(DIM - 1))

    def h01(*cols):  # deterministic float in [-0.5, 0.5)
        return (F.pmod(F.hash(*cols), F.lit(10_000)) / 10_000.0) - 0.5

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            j,
            lambda d: (h01(F.col("id") % N_CLUSTERS, d, F.lit("c"))
                       + h01(F.col("id"), d, F.lit("n")) * NOISE)
            .cast("float"),
        ).alias("embedding"),
    )


def recall_at_k(exact, approx) -> float:
    hit = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    n_exact = exact.count()
    return (hit.count() / n_exact) if n_exact else float("nan")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    k = 10
    spark = get_spark(app_name="ann-scale", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".cache", f"vectors_{n}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        synth_vectors(spark, n).repartition(64).write.mode("overwrite") \
            .parquet(cache)
    corpus = spark.read.parquet(cache)
    queries = corpus.where(F.col("vec_id") < n_q)

    t0 = time.perf_counter()
    exact = ann_bruteforce_topk(corpus, queries, k=k) \
        .select("query_id", "neighbor_id").cache()
    exact.count()
    wall_exact = time.perf_counter() - t0

    # candidate envelope: n_tables * n / 2^planes per probe, x(1+planes)
    # probes — at 1M / 2^16 that's ~15 per probe, ~2.1k scored
    # candidates per query across 8 tables
    n_planes, n_tables = 16, 8
    t0 = time.perf_counter()
    lsh = ann_lsh_topk(corpus, queries, k=k, n_planes=n_planes,
                       n_tables=n_tables, dim=DIM, seed=42) \
        .select("query_id", "neighbor_id").cache()
    lsh.count()
    wall_lsh = time.perf_counter() - t0
    recall_lsh = recall_at_k(exact, lsh)

    t0 = time.perf_counter()
    ivf = ann_ivf_topk(corpus, queries, k=k, n_lists=256, n_probe=16) \
        .select("query_id", "neighbor_id").cache()
    ivf.count()
    wall_ivf = time.perf_counter() - t0
    recall_ivf = recall_at_k(exact, ivf)

    out = {
        "n_vectors": n, "n_queries": n_q, "k": k, "dim": DIM,
        "lsh": {"n_planes": n_planes, "n_tables": n_tables,
                "recall": round(recall_lsh, 4), "wall_s": round(wall_lsh, 2),
                "candidate_envelope_per_query":
                    round(n_tables * n / 2 ** n_planes * (1 + n_planes))},
        "ivf": {"n_lists": 256, "n_probe": 16,
                "recall": round(recall_ivf, 4), "wall_s": round(wall_ivf, 2)},
        "bruteforce_wall_s": round(wall_exact, 2),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ann_scale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
