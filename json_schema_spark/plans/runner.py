"""Checkpoint-resumable per-partition validation runs (SURVEY.md §2.4).

The reference's reusable ``context`` ("mutable, build up state as they
go", README.rst:144; make-context src/reference.lisp:103-119) becomes:
compile the spec ONCE, then validate partition after partition,
recording a verdict/metrics/lineage row per (partition, check) in a
results table. A run interrupted after K partitions resumes by
skipping the partitions already in the manifest — no duplicated
results, identical final verdicts.

Storage layout (Iceberg-compatible partitioned Parquet + a JSON
manifest standing in for Iceberg snapshot state; a real Iceberg
catalog would replace ``_Manifest`` with MERGE semantics behind the
same ``TableIO`` seam):

    <results_dir>/violations/part=<P>/*.parquet
    <results_dir>/verdicts/part=<P>/*.parquet
    <results_dir>/manifest.json       {run_id, completed: {P: metrics}}

Verdict row schema (FIXTURES.md §5):
    run_id, partition, check, pass, n_rows, n_violations,
    metrics MAP<STRING,DOUBLE>, input_files ARRAY<STRING>, wall_ms
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from json_schema_spark.compiler import CompiledSpec, compile_spec, violations_df
from json_schema_spark.spec import ConstraintSpec


class _Manifest:
    """Atomic JSON manifest (write-tmp + rename). The checkpoint unit
    is one partition value; idempotent re-marks are fine."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {"completed": {}}

    def mark(self, partition: str, info: dict) -> None:
        state = self.load()
        state["completed"][partition] = info
        self.save(state)

    def save(self, state: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1, default=str)
        os.replace(tmp, self.path)  # atomic on POSIX

    def completed(self) -> set[str]:
        return set(self.load()["completed"].keys())


@dataclass
class ValidationRunner:
    spark: SparkSession
    spec: ConstraintSpec | dict
    results_dir: str
    run_id: str = "run-0"
    id_cols: tuple[str, ...] = ("url",)
    compiled: CompiledSpec | None = field(default=None)
    use_icetable: bool = False

    _VERDICT_DDL = (
        "run_id string, partition string, check string, pass boolean, "
        "n_rows long, n_violations long, metrics map<string,double>, "
        "input_files array<string>, wall_ms long"
    )

    def __post_init__(self):
        os.makedirs(self.results_dir, exist_ok=True)
        self.manifest = _Manifest(os.path.join(self.results_dir, "manifest.json"))
        self._verdict_table = None
        if self.use_icetable:
            # verdict rows land in an Iceberg-style snapshot table: one
            # dynamic-partition-overwrite commit per validated partition,
            # so a redo after interruption replaces (never duplicates)
            # that partition's rows and the snapshot log IS the lineage
            # history (north-rule "results written to an Iceberg table").
            from json_schema_spark.sources.icetable import IceTable

            vroot = os.path.join(self.results_dir, "verdicts_ice")
            if os.path.exists(os.path.join(vroot, "metadata", "version-hint.text")):
                self._verdict_table = IceTable(self.spark, vroot)
            else:
                self._verdict_table = IceTable.create(
                    self.spark, vroot, self._VERDICT_DDL, ["partition"])

    # -- helpers ----------------------------------------------------------
    def _compile(self, df: DataFrame) -> CompiledSpec:
        if self.compiled is None:  # compile once, validate many (§4.1)
            self.compiled = compile_spec(self.spec, df)
        return self.compiled

    @staticmethod
    def partition_values(df: DataFrame, partition_col: str) -> list[str]:
        """Distinct non-null partition values as strings (the shared
        normalization every partition-set computation uses)."""
        return sorted(
            str(r[0])
            for r in df.select(partition_col).distinct().collect()
            if r[0] is not None
        )

    def pending_partitions(self, df: DataFrame, partition_col: str) -> list[str]:
        """All partition values minus completed ones. The distinct() is
        partition-metadata-sized; on a partitioned source Catalyst
        answers it from file listing, not a scan."""
        done = self.manifest.completed()
        return [v for v in self.partition_values(df, partition_col)
                if v not in done]

    # -- the per-partition pass --------------------------------------------
    def run(
        self,
        df: DataFrame,
        partition_col: str = "warc_day",
        max_partitions: int | None = None,
        slice_factory=None,
        batch_size: int = 1,
        batch_slice_factory=None,
    ) -> list[str]:
        """Validate pending partitions; returns the partitions processed.

        ``max_partitions`` exists for tests (simulated interruption)
        and for budgeted incremental runs. ``slice_factory(part)``,
        when given, supplies each partition's DataFrame instead of
        ``df.where(...)`` — the snapshot-incremental path uses it to
        validate a re-touched partition's FULL current content through
        a manifest-pruned read while the pending set still comes from
        the (smaller) diff.

        ``batch_size`` > 1 processes K pending partitions per Spark
        job (VERDICT r2 item 5): the verdict aggregation groups by
        partition and violations land in ONE dynamic-partition-
        overwrite write, so end-to-end latency is O(P / K) sequential
        jobs instead of O(P) — while the manifest stays per-partition
        (the checkpoint/resume granularity is unchanged; a crash mid-
        chunk redoes only that chunk, idempotently). A caller whose
        slices need a custom read (the snapshot-incremental path's
        pruned source scans) supplies ``batch_slice_factory(parts) ->
        DataFrame`` as the chunk-level twin of ``slice_factory``."""
        compiled = self._compile(df)
        pending = self.pending_partitions(df, partition_col)
        if max_partitions is not None:
            pending = pending[:max_partitions]

        if batch_size > 1 and slice_factory is not None \
                and batch_slice_factory is None:
            # ADVICE r3: silently falling back to the serial loop gave
            # a batching caller O(P) jobs with no signal
            raise ValueError(
                "batch_size > 1 with slice_factory requires a "
                "batch_slice_factory (chunk-level slice reader); "
                "pass one or drop batch_size to run serially")
        if batch_size > 1 and (slice_factory is None
                               or batch_slice_factory is not None):
            for i in range(0, len(pending), batch_size):
                self._run_chunk(df, compiled, partition_col,
                                pending[i:i + batch_size],
                                batch_slice_factory)
            return pending

        for part in pending:
            t0 = time.monotonic()
            if slice_factory is not None:
                slice_df = slice_factory(part)
            else:
                slice_df = df.where(F.col(partition_col).cast("string") == part)
            # two actions read the slice (violation rows + verdict agg):
            # cache it — but project input_file_name() FIRST, because it
            # returns '' once rows come from the InMemoryRelation
            slice_df = slice_df.withColumn("__file", F.input_file_name()).cache()

            # unpersist in finally: a mid-partition failure (commit
            # conflict, write error) must not leak the cached slice —
            # retries would otherwise accumulate cached DataFrames in
            # executor memory for the rest of the session
            try:
                viol = violations_df(
                    slice_df, compiled, id_cols=list(self.id_cols),
                    partition_col=F.lit(part), run_id=self.run_id,
                )
                viol_path = os.path.join(self.results_dir, "violations", f"part={part}")
                viol.write.mode("overwrite").parquet(viol_path)  # idempotent redo

                # single-pass verdict agg + lineage over the SAME slice.
                # input_file_name() is nondeterministic — project it to a
                # column BEFORE aggregating (aggregates reject it inline).
                aggs = [
                    F.sum((~c.predicate).cast("long")).alias(f"v{i}")
                    for i, c in enumerate(compiled.checks)
                ] + [
                    F.count(F.lit(1)).alias("n_rows"),
                    F.collect_set(F.col("__file")).alias("files"),
                ]
                row = (
                    slice_df
                    .agg(*aggs).collect()[0]
                )
                wall_ms = int((time.monotonic() - t0) * 1000)

                verdicts = [
                    (
                        self.run_id, part, f"{c.column}/{c.keyword}",
                        row[f"v{i}"] == 0, row["n_rows"], row[f"v{i}"],
                        {"violation_rate": (row[f"v{i}"] / row["n_rows"]) if row["n_rows"] else 0.0},
                        [f for f in row["files"] if f],
                        wall_ms,
                    )
                    for i, c in enumerate(compiled.checks)
                ]
                vdf = self.spark.createDataFrame(verdicts, self._VERDICT_DDL)
                if self._verdict_table is not None:
                    self._verdict_table.overwrite_partitions(vdf.coalesce(1))
                else:
                    vpath = os.path.join(self.results_dir, "verdicts", f"part={part}")
                    vdf.coalesce(1).write.mode("overwrite").parquet(vpath)

                self.manifest.mark(part, {
                    "run_id": self.run_id, "n_rows": row["n_rows"], "wall_ms": wall_ms,
                })
            finally:
                slice_df.unpersist()
        return pending

    def _run_chunk(self, df: DataFrame, compiled: CompiledSpec,
                   partition_col: str, chunk: list[str],
                   batch_slice_factory=None) -> None:
        """One Spark job for K partitions: grouped verdict agg + one
        dynamic-partition-overwrite violations write. Produces the
        exact same files/rows the serial path writes per partition."""
        t0 = time.monotonic()
        base = (batch_slice_factory(list(chunk))
                if batch_slice_factory is not None
                else df.where(
                    F.col(partition_col).cast("string").isin(list(chunk))))
        slice_df = (
            base
            .withColumn("__file", F.input_file_name())
            .withColumn("__part", F.col(partition_col).cast("string"))
            .cache()
        )
        try:
            viol = violations_df(
                slice_df, compiled, id_cols=list(self.id_cols),
                partition_col=F.col("__part"), run_id=self.run_id,
            )
            # same part=<P> dir layout the serial path writes, via ONE
            # dynamic overwrite (only the chunk's partitions replaced)
            (viol.withColumn("part", F.col("partition"))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("part")
             .parquet(os.path.join(self.results_dir, "violations")))

            aggs = [
                F.sum((~c.predicate).cast("long")).alias(f"v{i}")
                for i, c in enumerate(compiled.checks)
            ] + [
                F.count(F.lit(1)).alias("n_rows"),
                F.collect_set(F.col("__file")).alias("files"),
            ]
            rows = {r["__part"]: r
                    for r in slice_df.groupBy("__part").agg(*aggs).collect()}
            wall_ms = int((time.monotonic() - t0) * 1000)

            # ADVICE r3 (medium): dynamic overwrite replaces only the
            # partitions PRESENT in viol — a chunk partition with zero
            # violation rows keeps its stale part=<P> files from a
            # prior pass (the serial path overwrites every dir
            # unconditionally, and violations() does no run_id filter).
            # Explicitly overwrite those dirs with an empty frame so
            # batched output == serial output row-for-row. Zero-viol
            # partitions are read off the already-collected verdict
            # aggregate — no extra scan of viol.
            empty_viol = self.spark.createDataFrame([], viol.schema)
            for part in chunk:
                row = rows.get(part)
                if row is None or all(
                        (row[f"v{i}"] or 0) == 0
                        for i in range(len(compiled.checks))):
                    empty_viol.write.mode("overwrite").parquet(
                        os.path.join(self.results_dir, "violations",
                                     f"part={part}"))

            verdicts = []
            for part in chunk:
                row = rows.get(part)
                n = row["n_rows"] if row else 0
                files = [f for f in (row["files"] if row else []) if f]
                for i, c in enumerate(compiled.checks):
                    nv = row[f"v{i}"] if row else 0
                    verdicts.append((
                        self.run_id, part, f"{c.column}/{c.keyword}",
                        nv == 0, n, nv,
                        {"violation_rate": (nv / n) if n else 0.0},
                        files, wall_ms,
                    ))
            vdf = self.spark.createDataFrame(verdicts, self._VERDICT_DDL)
            if self._verdict_table is not None:
                self._verdict_table.overwrite_partitions(vdf.coalesce(1))
            else:
                (vdf.withColumn("part", F.col("partition"))
                 .coalesce(1).write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("part")
                 .parquet(os.path.join(self.results_dir, "verdicts")))

            for part in chunk:
                row = rows.get(part)
                self.manifest.mark(part, {
                    "run_id": self.run_id,
                    "n_rows": row["n_rows"] if row else 0,
                    "wall_ms": wall_ms,
                })
        finally:
            slice_df.unpersist()

    # -- snapshot-incremental pass (source is an IceTable) ------------------
    def run_snapshot_increment(
        self,
        source,  # IceTable
        partition_col: str = "warc_day",
        max_partitions: int | None = None,
        batch_size: int = 1,
    ) -> dict:
        """Continuous validation against an IceTable source: validate
        ONLY the rows in data files added since the last validated
        snapshot (scan_added_since), then advance the watermark.

        Complements :meth:`run`'s partition-manifest resume — which
        skips completed partitions and would therefore miss LATE
        files landing in them. The watermark lives in the same results
        manifest (key ``__snapshot_watermark``), so a crash between
        validate and advance just re-validates the same diff
        (idempotent: verdicts overwrite per partition).

        Verdict semantics: a re-validated partition's verdict row
        reflects the LATEST increment's rows; with ``use_icetable``
        the previous verdicts remain readable via the verdict table's
        snapshot history (time travel), so nothing is lost.

        ``max_partitions`` budgets one invocation; the watermark only
        advances once the WHOLE diff is drained, so budgeted runs
        continue the same diff. An expired watermark snapshot (source
        history truncated past it) falls back to a full re-validation
        rather than failing every subsequent run.
        Returns {"snapshot": <new watermark>, "partitions": [...]}.
        """
        state = self.manifest.load()
        last = state.get("__snapshot_watermark")
        cur = source._read_meta()["current_snapshot_id"]
        if cur is None or cur == last:
            return {"snapshot": last, "partitions": []}
        if last is not None:
            try:
                df = source.scan_added_since(last)
            except FileNotFoundError:
                # the watermark snapshot was expired from the source's
                # history: the diff is unrecoverable — fall back to a
                # full re-validation instead of wedging every run
                last = None
                df = source.scan()
        else:
            df = source.scan()
        df = df.cache()  # distinct-partitions probe + run() both read it
        try:
            # the diff may re-touch completed partitions: clear their
            # completion marks so run() re-validates them over the diff
            # — but NOT when continuing the identical diff (a budgeted
            # previous invocation): its marks ARE this diff's progress
            diff_id = f"{last}->{cur}"
            if state.get("__diff_id") != diff_id:
                for p in self.partition_values(df, partition_col):
                    state["completed"].pop(p, None)
                state["__diff_id"] = diff_id
            state["__snapshot_watermark"] = last
            self.manifest.save(state)

            # a re-touched partition is validated over its FULL current
            # content (manifest-pruned read) — diff-only validation
            # would overwrite its verdict/violations with late-rows-only
            # results, silently flipping a failing partition to pass
            processed = self.run(
                df, partition_col=partition_col,
                max_partitions=max_partitions,
                slice_factory=lambda p: source.scan(
                    [(partition_col, "=", p)], snapshot_id=cur),
                batch_size=batch_size,
                batch_slice_factory=lambda parts: source.scan(
                    [(partition_col, "in", list(parts))], snapshot_id=cur),
            )
            drained = not self.pending_partitions(df, partition_col)
        finally:
            df.unpersist()
        state = self.manifest.load()
        # advance only once the whole diff is validated: a budgeted
        # (max_partitions) run leaves the watermark so the next
        # invocation continues the SAME diff from its partition marks
        new_mark = cur if drained else last
        state["__snapshot_watermark"] = new_mark
        if drained:
            state.pop("__diff_id", None)
        self.manifest.save(state)
        return {"snapshot": new_mark, "partitions": processed}

    # -- dataset-level checks (spec "dataset" block, FIXTURES.md §3) -------
    def run_dataset_checks(
        self,
        df: DataFrame,
        dims: dict[str, DataFrame] | None = None,
    ) -> DataFrame:
        """Execute the spec's table-level block:

            "dataset": {"unique": ["url"],
                        "ref":   [{"column","table","key"}, ...],
                        "fd":    [{"determinant","dependent",
                                   "max_violating_frac"}, ...],
                        "drift": [{"column","test","by"}, ...],
                        "dedup": [{"column","id","method","max_dup_frac"}, ...],
                        "blocklist": [{"column","domains"|"table",
                                       "max_blocked_frac"}, ...],
                        "quality": [{"column","signal","min_fre"|"max_fre"|
                                     "ngram"/"max_dup_ngram_frac",
                                     "max_fail_frac"}, ...],
                        "normalized": [{"column","form",
                                        "max_changed_frac"}, ...]}

        ``dims`` maps ref-check table names to dimension DataFrames.
        Returns one verdict row per check (check, pass, n_violations,
        metric). These run once per table (not per partition) — they
        are cross-partition by nature (global uniqueness, referential
        integrity, cross-partition drift).
        """
        from json_schema_spark.operators.drift import chi2_by_partition, ks_by_partition
        from json_schema_spark.operators.referential import referential_verdict
        from json_schema_spark.operators.unique import uniqueness_verdict

        spec = self.spec if isinstance(self.spec, ConstraintSpec) else ConstraintSpec(self.spec)
        block = spec.dataset
        results: list[tuple] = []

        for key in block.get("unique", []):
            cols = key if isinstance(key, list) else [key]
            row = uniqueness_verdict(df, cols).collect()[0]
            results.append((row["check"], bool(row["pass"]),
                            int(row["n_violating_rows"]),
                            float(row["n_violating_keys"])))

        for ref in block.get("ref", []):
            dim = (dims or {}).get(ref["table"])
            if dim is None:
                raise ValueError(f"dimension table {ref['table']!r} not provided")
            row = referential_verdict(df, dim, ref["column"], ref["key"]).collect()[0]
            results.append((row["check"], bool(row["pass"]),
                            int(row["n_violations"]), float(row["n_violations"])))

        for fd in block.get("fd", []):
            # functional dependency A -> B (operators/referential.py):
            # the consistency constraint between uniqueness (A -> whole
            # row) and free-form columns; ONE partial-aggregable
            # groupBy, verdict vs a tolerated violating-key fraction
            from json_schema_spark.operators.referential import fd_verdict

            row = fd_verdict(df, fd["determinant"], fd["dependent"]) \
                .collect()[0]
            cap = float(fd.get("max_violating_frac", 0.0))
            results.append((row["check"],
                            float(row["violating_key_frac"]) <= cap,
                            int(row["n_violations"]),
                            float(row["violating_key_frac"])))

        for d in block.get("drift", []):
            by = d["by"]
            by_col = F.to_date(F.col(by[5:-1])) if by.startswith("days(") else F.col(by)
            col = d["column"]
            col_expr = F.expr(col) if "(" in col else F.col(col)
            if d.get("test") == "chi2":
                # project the (possibly expression-valued) column first:
                # chi2_by_partition takes a column NAME
                tagged = df.withColumn("__cat", col_expr)
                rows = [r for r in
                        chi2_by_partition(tagged, "__cat", by_col).collect()
                        if r["chi2"] is not None]
                if not rows:
                    # all-null column/partition: nothing to test -> pass
                    results.append((f"drift_chi2({col} by {by})", True, 0, 0.0))
                    continue
                worst = max(rows, key=lambda r: r["chi2"])
                # crude flag: chi2 beyond 5x the median partition
                med = sorted(r["chi2"] for r in rows)[len(rows) // 2]
                drifted = worst["chi2"] > 5 * max(med, 1e-9)
                results.append((f"drift_chi2({col} by {by})", not drifted,
                                int(drifted), float(worst["chi2"])))
            elif d.get("test") == "tdigest":
                # sketch path: rows fold to digests before any shuffle;
                # digests are storable for incremental cross-run drift
                # (operators/tdigest.py)
                from json_schema_spark.operators.tdigest import (
                    digest_by_partition,
                    ks_by_partition_tdigest,
                )

                tagged = df.withColumn("__by", by_col).withColumn("__v", col_expr)
                ks_rows = ks_by_partition_tdigest(
                    digest_by_partition(tagged, "__v", "__by"))
                worst_ks = max((ks for _, _, ks in ks_rows if ks == ks),
                               default=0.0)  # ks==ks drops NaN (no rest)
                results.append((f"drift_tdigest({col} by {by})", worst_ks < 0.2,
                                int(worst_ks >= 0.2), float(worst_ks)))
            else:  # ks: every partition vs rest in ONE job (no driver loop)
                tagged = df.withColumn("__by", by_col).withColumn("__v", col_expr)
                rows = ks_by_partition(tagged, "__v", "__by", n_bins=256).collect()
                worst_ks = max((r["ks"] or 0.0) for r in rows) if rows else 0.0
                results.append((f"drift_ks({col} by {by})", worst_ks < 0.2,
                                int(worst_ks >= 0.2), float(worst_ks)))

        for d in block.get("dedup", []):
            from json_schema_spark.operators.dedup import (
                exact_duplicates,
                fingerprint_duplicates,
            )

            method = d.get("method", "exact")
            if method not in ("exact", "fingerprint", "incremental"):
                raise ValueError(
                    f"dataset dedup method {method!r} not supported "
                    "(exact | fingerprint | incremental)")
            id_col = d.get("id", "doc_id")
            if method == "incremental":
                # cross-snapshot dedup against the persistent ledger
                # (operators/incremental_dedup.py): spec carries the
                # ledger root + this run's snapshot ordinal; redo of a
                # snapshot is byte-idempotent, so a resumed/re-run
                # validation changes no verdict (the runner's own
                # checkpoint contract)
                import os as _os

                from json_schema_spark.operators.incremental_dedup import (
                    create_dedup_ledger,
                    incremental_dedup_snapshot,
                )
                from json_schema_spark.sources.icetable import IceTable

                root = d["ledger"]
                snap = int(d["snapshot"])
                if _os.path.exists(_os.path.join(root, "metadata")):
                    ledger = IceTable(self.spark, root)
                else:
                    # keep_id must take the id column's actual type
                    # (url ids are strings; a bigint ledger column
                    # would NULL them on scan-back)
                    ledger = create_dedup_ledger(
                        self.spark, root,
                        id_type=dict(df.dtypes)[id_col])
                st = incremental_dedup_snapshot(
                    df, ledger, id_col, d["column"], snap,
                    normalized=bool(d.get("normalized", False)),
                ).collect()[0]
                extra = st["n_dup_within"] + st["n_dup_history"]
                frac = (extra / st["n_rows"]) if st["n_rows"] else 0.0
                cap = float(d.get("max_dup_frac", 0.0))
                results.append((
                    f"dedup_incremental({d['column']}@snap{snap})",
                    frac <= cap, int(extra), float(frac),
                ))
                continue
            fn = fingerprint_duplicates if method == "fingerprint" else exact_duplicates
            groups = fn(df, id_col, d["column"])
            # extra copies beyond each group's survivor
            row = groups.agg(
                F.coalesce(F.sum(F.col("n_dups") - 1), F.lit(0)).alias("extra")
            ).collect()[0]
            n_total = df.where(F.col(d["column"]).isNotNull()).count()
            frac = (row["extra"] / n_total) if n_total else 0.0
            cap = float(d.get("max_dup_frac", 0.0))
            results.append((
                f"dedup_{method}({d['column']})", frac <= cap,
                int(row["extra"]), float(frac),
            ))

        for b in block.get("blocklist", []):
            # domain blocklist gate at the registrable-domain level
            # (operators/textstats.domain_blocklist_flag): inline
            # "domains" list or a dims-provided one-column table;
            # verdict in ONE fused aggregate over the broadcast join
            from json_schema_spark.operators.textstats import (
                domain_blocklist_flag,
            )

            url_col = b.get("column", "url")
            if "table" in b:
                blocked = (dims or {}).get(b["table"])
                if blocked is None:
                    raise ValueError(
                        f"blocklist table {b['table']!r} not provided")
                src = b["table"]
            else:
                blocked = self.spark.createDataFrame(
                    [(x,) for x in b["domains"]], "domain string")
                ds = sorted(b["domains"])
                src = ",".join(ds[:2]) + ("…" if len(ds) > 2 else "")
            agg = (
                domain_blocklist_flag(
                    df.where(F.col(url_col).isNotNull()).select(url_col),
                    url_col, blocked)
                .agg(
                    F.coalesce(
                        F.sum(F.col("blocked").cast("long")), F.lit(0)
                    ).alias("n_blocked"),
                    F.count(F.lit(1)).alias("n_rows"),
                )
                .collect()[0]
            )
            frac = (agg["n_blocked"] / agg["n_rows"]) if agg["n_rows"] else 0.0
            cap = float(b.get("max_blocked_frac", 0.0))
            results.append((
                f"blocklist({url_col} vs {src})", frac <= cap,
                int(agg["n_blocked"]), float(frac),
            ))

        for q in block.get("quality", []):
            # per-row text-quality gate: a signal computed row-wise
            # (readability FRE band or within-doc duplicate-n-gram
            # fraction), a threshold, and a tolerated failing
            # fraction; verdict in ONE fused aggregate — the spec-side
            # face of the corpus-quality operator family
            signal = q.get("signal", "readability")
            col = q.get("column", "text")
            id_col = q.get("id", "doc_id")
            cap = float(q.get("max_fail_frac", 0.0))
            if signal == "readability":
                from json_schema_spark.operators.textstats import (
                    readability_profile,
                )

                lo, hi = q.get("min_fre"), q.get("max_fre")
                fail = F.lit(False)
                if lo is not None:
                    fail = fail | (F.col("fre") < F.lit(float(lo)))
                if hi is not None:
                    fail = fail | (F.col("fre") > F.lit(float(hi)))
                agg = (
                    readability_profile(df, id_col, col)
                    .where(F.col("fre").isNotNull())
                    .agg(F.coalesce(F.sum(fail.cast("long")), F.lit(0))
                         .alias("n_fail"),
                         F.count(F.lit(1)).alias("n_rows"))
                    .collect()[0]
                )
            elif signal == "repetition":
                from json_schema_spark.operators.quality import (
                    dup_ngram_frac,
                    tokens_df,
                )

                n = int(q.get("ngram", 2))
                thr = float(q.get("max_dup_ngram_frac", 0.5))
                toks = tokens_df(
                    df.where(F.col(col).isNotNull()), id_col, col)
                fail = dup_ngram_frac(F.col("__toks"), n) > thr
                agg = toks.agg(
                    F.coalesce(F.sum(fail.cast("long")), F.lit(0))
                    .alias("n_fail"),
                    F.count(F.lit(1)).alias("n_rows")).collect()[0]
            else:
                raise ValueError(
                    f"dataset quality signal {signal!r} not supported "
                    "(readability | repetition)")
            frac = (agg["n_fail"] / agg["n_rows"]) if agg["n_rows"] else 0.0
            results.append((f"quality_{signal}({col})", frac <= cap,
                            int(agg["n_fail"]), float(frac)))

        for nrm in block.get("normalized", []):
            # Unicode-normalization invariant: text must already be in
            # the given form (the precondition every hash-keyed
            # operator in this engine silently assumes; §1.1's
            # byte-identity contract is only well-defined modulo this)
            from json_schema_spark.operators.normalize import nfc_audit

            col = nrm.get("column", "text")
            id_col = nrm.get("id", "doc_id")
            form = nrm.get("form", "NFC")
            cap = float(nrm.get("max_changed_frac", 0.0))
            agg = (
                nfc_audit(df, id_col, col, form=form)
                .agg(F.coalesce(F.sum(F.col("changed").cast("long")),
                                F.lit(0)).alias("n_changed"),
                     F.count(F.lit(1)).alias("n_rows"))
                .collect()[0]
            )
            frac = (agg["n_changed"] / agg["n_rows"]) if agg["n_rows"] \
                else 0.0
            results.append((f"normalized_{form}({col})", frac <= cap,
                            int(agg["n_changed"]), float(frac)))

        return self.spark.createDataFrame(
            results, "check string, pass boolean, n_violations long, metric double",
        )

    # -- results ------------------------------------------------------------
    def verdicts(self) -> DataFrame:
        if self._verdict_table is not None:
            return self._verdict_table.scan()
        return self.spark.read.parquet(os.path.join(self.results_dir, "verdicts"))

    def violations(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.results_dir, "violations"))
