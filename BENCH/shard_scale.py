"""shard_plan soak at 64M rows (r5): does the no-global-sort shape hold
when the corpus is 128,000x the driver-query fixture?

The driver query ranks 500 docs; this soak builds the full training
read order for 64M synthetic doc ids into 1024 shards and checks the
invariants that matter at 10^12 scale: one hash exchange (never range
partitioning), per-shard positions contiguous 1..count, balanced shard
sizes (uniform md5 key), and throughput.

Writes BENCH/shard_scale.json (side artifact; not in the bench line).

Usage: python BENCH/shard_scale.py [n_rows] [n_shards]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from json_schema_spark.operators.sampling import shard_plan
from json_schema_spark.session import get_spark


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    spark = get_spark(app_name="shard-scale", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(0, n_rows).withColumnRenamed("id", "doc_id")
    planned = shard_plan(df, "doc_id", n_shards=n_shards)

    plan = planned._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), "global sort crept in"

    t0 = time.perf_counter()
    # one aggregate over the full plan output: forces every shard's
    # window to execute; validates contiguity + balance in the same job
    agg = planned.groupBy("shard_id").agg(
        F.count("*").alias("c"), F.max("pos").alias("mx"),
        F.count_distinct("pos").alias("d")).collect()
    wall = time.perf_counter() - t0

    sizes = [r["c"] for r in agg]
    assert len(agg) == n_shards
    assert all(r["mx"] == r["c"] == r["d"] for r in agg), "pos not contiguous"
    assert sum(sizes) == n_rows
    balance = max(sizes) / (n_rows / n_shards)
    out = {
        "n_rows": n_rows, "n_shards": n_shards, "wall_s": round(wall, 3),
        "rows_per_sec": round(n_rows / wall),
        "max_shard_over_mean": round(balance, 4),
        "contiguous_positions": True, "range_partitioning_in_plan": False,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "shard_scale.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
