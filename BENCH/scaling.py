"""N-vs-4N scaling evidence for the north rule.

Runs the identical constraint-pass job at local[8] and local[32] on
the same cached input (fresh JVM per level), computes throughput at
both plus scaling efficiency = (thr_4N / thr_N) / 4, and rewrites
BENCH/BASELINE.md with the measurements.

Usage: python BENCH/scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_level(cores: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "run_pass.py"), str(cores), str(n_docs)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    lo = run_level(8, n_docs)
    hi = run_level(32, n_docs)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    result = {"N": lo, "fourN": hi, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    md = f"""# BENCH/BASELINE.md — measured engine numbers

## Constraint-pass throughput & N->4N scaling (north rule)

Full keyword-set constraint pass (verdict aggregation + violation
count; spec = url type/format/pattern/min-maxLength, lang enum, text
minLength, html minLength, 4x required) over {n_docs:,} deterministic
synthetic Common-Crawl-style pages (seed=42), cached partitioned
parquet, warm JVM (one discarded warm-up pass), identical input at
both levels. Sandbox stand-in for N vs 4N executors: local[8] vs
local[32] (one JVM per level).

| cores | docs/sec | wall s |
|---|---|---|
| 8 (N)   | {lo['docs_per_sec']:,} | {lo['wall_s']} |
| 32 (4N) | {hi['docs_per_sec']:,} | {hi['wall_s']} |

**Scaling efficiency (N->4N) = {result['scaling_efficiency']}** (target >= 0.8).

Reference single-node baseline (BASELINE.md): ~1,210 validations/s
cached / ~4.9/s uncached (single document, single core, Common Lisp).

_Measured {date.today().isoformat()} on local[8]/local[32], 32-core
container, PySpark 4.1.2._
"""
    with open(os.path.join(HERE, "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
