"""Write-audit-publish: constraint-gated appends to the snapshot table.

The reference validates documents you already hold
(/root/reference/src/json-schema.lisp:20-38); a 10^12-doc pipeline
wants the dual: no document LANDS in the table without passing the
spec. ``audited_append`` composes the two halves of this engine —
the compiled Column predicates (compiler.py) and the Iceberg-style
results seam (sources/icetable.py) — into the WAP pattern:

* rows passing EVERY keyword check commit to the target table, with
  the audit tallies recorded in the snapshot summary (the publish);
* failing rows become structured violation rows (same shape as the
  batch/streaming paths — column, keyword, message, id columns) in a
  QUARANTINE table, so nothing is silently dropped and every reject is
  explainable row-by-row.

Plan shape: the fused all-checks predicate is one Column, so the
clean/dirty split is two filtered scans of the (cached) input — no
shuffle is added beyond the writes themselves; predicates stay in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from json_schema_spark.compiler import CompiledSpec, compile_spec, violations_df
from json_schema_spark.sources.icetable import IceTable
from json_schema_spark.spec import ConstraintSpec


def _committed_run(t: IceTable, run_id: str) -> bool:
    return any(s["summary"].get("audit_run_id") == run_id
               for s in t.snapshots())


def audited_append(
    table: IceTable,
    quarantine: IceTable,
    df: DataFrame,
    spec: ConstraintSpec | dict | CompiledSpec,
    id_cols: tuple[str, ...] = ("url",),
    *,
    run_id: str,
) -> dict:
    """Append only spec-passing rows to ``table``; quarantine the rest
    as violation rows. Returns the audit summary dict (also recorded
    in both snapshots' summaries).

    Idempotent per ``run_id``: each half checks its own snapshot log
    before committing, so a retry after a mid-call failure (e.g. a
    CommitConflict on one of the two appends) completes the missing
    half without duplicating the finished one.
    """
    compiled = spec if isinstance(spec, CompiledSpec) else compile_spec(spec, df)
    all_pass = F.lit(True)
    for c in compiled.checks:
        all_pass = all_pass & c.predicate

    df = df.cache()  # both halves read it; one materialization
    try:
        clean = df.where(all_pass)
        dirty_rows = df.where(~all_pass)
        viol = violations_df(dirty_rows, compiled, id_cols=list(id_cols),
                             run_id=run_id)
        n_quarantined = viol.count()
        summary = {
            "audit_run_id": run_id,
            "audit_quarantined_rows": int(dirty_rows.count()),
            "audit_violation_rows": int(n_quarantined),
        }
        # target first: its summary is the audit record of truth
        if not _committed_run(table, run_id):
            summary["snapshot_id"] = table.append(clean, summary=summary)
        if n_quarantined and not _committed_run(quarantine, run_id):
            quarantine.append(viol, summary={"audit_run_id": run_id})
        return summary
    finally:
        df.unpersist()
