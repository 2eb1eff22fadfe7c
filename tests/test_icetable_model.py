"""Model-based random-walk over IceTable: a seeded sequence of
append / overwrite_partitions / compact / expire ops, after each of
which the table must equal a trivial in-memory model — and every
retained snapshot must still time-travel to its recorded model state.

This is the assurance style the commit protocol deserves: the unit
tests pin each op in isolation; this walk pins their COMPOSITIONS
(overwrite after compact, expire after overwrite, …) without
enumerating them by hand.
"""

import random

import pytest

from json_schema_spark.sources.icetable import IceTable

SCHEMA = "doc_id long, payload string, p string"
PARTS = ["a", "b", "c"]


def _rows(rng, n, next_id):
    return [(next_id + i, f"v{rng.randrange(1000)}", rng.choice(PARTS))
            for i in range(n)]


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_icetable_random_walk(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = IceTable.create(spark, str(tmp_path / "t"), SCHEMA, ["p"])

    model: dict[str, list[tuple]] = {p: [] for p in PARTS}  # partition -> rows
    history: dict[int, list[tuple]] = {}  # snapshot id -> flattened model
    next_id = 0

    def flat():
        return sorted(r for rows in model.values() for r in rows)

    def check_current():
        got = sorted((r["doc_id"], r["payload"], r["p"])
                     for r in t.scan().collect())
        assert got == flat()

    for step in range(14):
        op = rng.choice(["append", "append", "overwrite", "compact", "expire"])
        if op == "append":
            rows = _rows(rng, rng.randrange(1, 6), next_id)
            next_id += len(rows)
            snap = t.append(spark.createDataFrame(rows, SCHEMA))
            for r in rows:
                model[r[2]].append(r)
            history[snap] = flat()
        elif op == "overwrite":
            target = rng.sample(PARTS, rng.randrange(1, 3))
            rows = [r for r in _rows(rng, rng.randrange(1, 6), next_id)
                    if r[2] in target]
            next_id += 6
            if not rows:
                continue
            snap = t.overwrite_partitions(spark.createDataFrame(rows, SCHEMA))
            touched = {r[2] for r in rows}
            for p in touched:
                model[p] = [r for r in rows if r[2] == p]
            history[snap] = flat()
        elif op == "compact":
            if t._read_meta()["current_snapshot_id"] is None:
                continue
            snap = t.compact(target_file_bytes=1 << 20)
            history[snap] = flat()
        else:  # expire
            keep = rng.randrange(1, 4)
            snaps = [s["id"] for s in t.snapshots()]
            if len(snaps) <= keep:
                continue
            t.expire_snapshots(keep_last=keep)
            t.remove_orphan_files(older_than_s=0.0)
            for sid in snaps[:-keep]:
                history.pop(sid, None)
        check_current()

    # every retained snapshot still time-travels to its recorded state
    retained = {s["id"] for s in t.snapshots()}
    assert retained  # walk always commits something
    for sid in retained:
        if sid in history:
            got = sorted((r["doc_id"], r["payload"], r["p"])
                         for r in t.scan(snapshot_id=sid).collect())
            assert got == history[sid], sid
