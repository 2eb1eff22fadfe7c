"""Round-6 optimization side-bench (bench.py is FROZEN for the driver;
this file exists so per-query isolation, noop-sink timing and plan
capture never touch the contract artifact — guide §1.1/§1.4/§1.5).

Usage:
    python bench_extra.py [--reps N] [--tag before|after] [--plans]
                          [--noop] [query ...]

- default timing methodology matches bench.py exactly (fresh DataFrame
  per rep, .collect(), median of N) so numbers are comparable to the
  driver's BENCH_r*.json;
- --noop additionally times df.write.format("noop") per rep (isolates
  computation from driver-side result collection);
- --plans dumps .explain("formatted") to plans/r06/<query>_<tag>.txt.

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and
$SPARK_GRAFT_CPUS (default 32), like bench.py.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from json_schema_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default=None,
                    help="dump plans to plans/r06/<q>_<tag>.txt")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="jss-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = args.queries or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # same throwaway warm-up as bench.py (JVM JIT + codegen compile)
    next(iter(qs.values()))(spark, sf_dir).collect()

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06")
    if args.tag:
        os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if args.tag:
            spark.sparkContext.setJobDescription(f"{name}: plan capture")
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"),
                      "w") as f:
                f.write(buf.getvalue())
        coll, noop = [], []
        if args.reps == 0:  # plan capture only
            results[name] = {}
            continue
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}: collect rep {r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            coll.append(time.perf_counter() - t0)
            if args.noop:
                spark.sparkContext.setJobDescription(f"{name}: noop rep {r}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                noop.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        coll.sort()
        entry = {"collect_median": round(coll[len(coll) // 2], 3),
                 "collect_all": [round(x, 3) for x in coll]}
        if noop:
            noop.sort()
            entry["noop_median"] = round(noop[len(noop) // 2], 3)
            entry["noop_all"] = [round(x, 3) for x in noop]
        results[name] = entry
        print(name, json.dumps(entry), flush=True)

    total = round(sum(r.get("collect_median", 0.0)
                      for r in results.values()), 3)
    print(json.dumps({"n": len(results), "sum_collect_median": total}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf": sf_dir, "cpus": cpus, "reps": args.reps,
                       "queries": results,
                       "sum_collect_median": total}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
