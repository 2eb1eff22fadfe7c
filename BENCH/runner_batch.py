"""Serial vs batched ValidationRunner wall time (VERDICT r2 item 5).

A 50-partition input run through runner.run() serially costs 50
sequential (violations write + verdict agg) job pairs; batch_size=K
turns that into ceil(50/K) grouped jobs with identical outputs
(equivalence is pytest-pinned in tests/test_runner_streaming.py).
At hundreds of warc_days, end-to-end latency is the fixed per-job
cost times P — this measures how much of it batching removes.

Usage: python BENCH/runner_batch.py [n_docs] [n_parts] [batch_size]
Writes BENCH/runner_batch.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from json_schema_spark.plans.runner import ValidationRunner  # noqa: E402
from json_schema_spark.session import get_spark  # noqa: E402
from json_schema_spark.sources.tables import synth_webpages  # noqa: E402

SPEC = {
    "draft": "draft7",
    "columns": {
        "url": {"type": "string", "pattern": "^https?://", "minLength": 12},
        "text": {"type": "string", "minLength": 1},
    },
    "required": ["url", "text"],
}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(app_name="jss-runner-batch")
    spark.sparkContext.setLogLevel("ERROR")

    src = os.path.join(HERE, ".cache", f"parts{n_parts}_{n_docs}")
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        (synth_webpages(spark, n_docs)
         .withColumn("pday", F.pmod(F.xxhash64("url"), F.lit(n_parts)))
         .write.mode("overwrite").partitionBy("pday").parquet(src))
    df = spark.read.parquet(src)

    out = {}
    for mode, bs in (("serial", 1), (f"batched_{batch}", batch)):
        work = tempfile.mkdtemp(prefix=f"rb_{mode}_")
        r = ValidationRunner(spark, SPEC, work, run_id=mode)
        t0 = time.monotonic()
        done = r.run(df, partition_col="pday", batch_size=bs)
        out[mode] = {"wall_s": round(time.monotonic() - t0, 2),
                     "partitions": len(done)}
        shutil.rmtree(work, ignore_errors=True)

    out["speedup"] = round(out["serial"]["wall_s"]
                           / out[f"batched_{batch}"]["wall_s"], 2)
    out["n_docs"], out["n_parts"], out["batch_size"] = n_docs, n_parts, batch
    with open(os.path.join(HERE, "runner_batch.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
