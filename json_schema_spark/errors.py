"""Violation/verdict report rendering.

Mirrors the reference's error presentation: hierarchical messages with
nested "Additionally:" blocks (validation-failed-error printer,
/root/reference/src/validators.lisp:15-22,46-53; sample output
README.rst:70-79) — lifted from one document's error tree to a
per-partition / per-check report. Driver-side only; operates on
collected verdict/violation rows.
"""

from __future__ import annotations

from collections.abc import Iterable


def render_verdict_report(verdict_rows: Iterable, max_examples: int = 3,
                          violation_rows: Iterable = ()) -> str:
    """Text report: one block per failing check, nested example
    violations in the reference's 'Additionally:' style."""
    examples: dict[tuple, list] = {}
    for v in violation_rows:
        key = (str(v["partition"]) if "partition" in v else "", v["column"], v["keyword"])
        bucket = examples.setdefault(key, [])
        if len(bucket) < max_examples:
            bucket.append(v)

    lines: list[str] = []
    n_pass = n_fail = 0
    for r in sorted(verdict_rows, key=lambda r: (str(r["partition"]) if "partition" in r else "", r["check"] if "check" in r else f"{r['column']}/{r['keyword']}")):
        check = r["check"] if "check" in r else f"{r['column']}/{r['keyword']}"
        part = str(r["partition"]) if "partition" in r else ""
        where = f" [partition {part}]" if part else ""
        if r["pass"]:
            n_pass += 1
            continue
        n_fail += 1
        lines.append(
            f"Check {check!r}{where} failed: "
            f"{r['n_violations']} of {r['n_rows']} documents violate it."
        )
        col_kw = tuple(check.split("/", 1)) if "/" in check else (check, "")
        ex = examples.get((part, *col_kw), [])
        if ex:
            lines.append("Additionally:")
            for e in ex:
                doc = next(
                    (e[k] for k in ("url", "doc_id", "id") if k in e.asDict()),
                    "?",
                ) if hasattr(e, "asDict") else e.get("url", "?")
                lines.append(f"  {e['message']} (document {doc!r})")
    header = f"{n_fail} failing / {n_pass} passing checks"
    return header + ("\n\n" + "\n".join(lines) if lines else "")
