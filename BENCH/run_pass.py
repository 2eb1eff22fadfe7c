"""Run the full constraint pass at a given parallelism; print JSON.

Usage: python BENCH/run_pass.py <n_cores> <n_docs>

Separate process per parallelism level because a JVM's master is fixed
at SparkContext creation — this is the sandbox stand-in for submitting
the same job to N- and 4N-executor clusters (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import constraint_pass_throughput
from json_schema_spark.session import get_spark


def main() -> None:
    n_cores, n_docs = int(sys.argv[1]), int(sys.argv[2])
    spark = get_spark(app_name=f"jss-scale-{n_cores}",
                      master=f"local[{n_cores}]",
                      shuffle_partitions=max(n_cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up pass: JIT + codegen + page cache, excluded from timing
    constraint_pass_throughput(spark, n_docs)
    docs_per_sec, wall = constraint_pass_throughput(spark, n_docs)
    print(json.dumps({
        "cores": n_cores, "n_docs": n_docs,
        "docs_per_sec": round(docs_per_sec), "wall_s": round(wall, 3),
    }))


if __name__ == "__main__":
    main()
