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

from bench import build_constraint_pass
from json_schema_spark.session import get_spark


def main() -> None:
    n_cores, n_docs = int(sys.argv[1]), int(sys.argv[2])
    # heap scales with cores unless the caller overrides (the cluster-
    # faithful model — see scaling.py). A direct 32-core invocation
    # under the 8 GB session default OOMs during corpus generation.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{2 * n_cores}g")
    spark = get_spark(app_name=f"jss-scale-{n_cores}",
                      master=f"local[{n_cores}]",
                      shuffle_partitions=max(n_cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    # Plan once (the engine's compile-once deployment shape), then
    # 3 warm-up passes (JIT + codegen + page cache) and the median of
    # 3 measured passes — single-digit-second Spark jobs are dominated
    # by JIT warm-up otherwise (observed 7x first-vs-steady-state).
    run = build_constraint_pass(spark, n_docs)
    for _ in range(3):
        run()
    # reps env knob: the 8M headline pass is ~2.5 s/rep, so bench.py
    # asks for 5 measured reps — the median then survives one of this
    # host's multi-second whole-VM stalls (measured: a rep flapping
    # 2.7 s -> 32.6 s with 0.13 s of GC and zero PSI/steal/load —
    # hypervisor-level, invisible to every guest metric). scaling.py
    # keeps the default 3: its 64M reps are 12-90 s and self-amortize.
    n_reps = int(os.environ.get("SPARK_GRAFT_PASS_REPS", "3"))
    runs = sorted(run() for _ in range(n_reps))
    docs_per_sec, wall = runs[len(runs) // 2]
    print(json.dumps({
        "cores": n_cores, "n_docs": n_docs,
        "docs_per_sec": round(docs_per_sec), "wall_s": round(wall, 3),
        "all_docs_per_sec": [round(r[0]) for r in runs],
    }))


if __name__ == "__main__":
    main()
