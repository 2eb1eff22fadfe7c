"""Run orchestration: per-partition validation passes with
checkpoint/resume, lineage, and metrics."""
