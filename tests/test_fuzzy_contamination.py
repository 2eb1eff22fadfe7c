"""Fuzzy edit-distance decontamination (quality.py:fuzzy_contamination):
hand-computed distances, the ASCII-projection parity rule, the length
band, and the broadcast-hash-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from json_schema_spark.operators.quality import fuzzy_contamination


def _pairs(spark, train_rows, eval_rows, **kw):
    tr = spark.createDataFrame(train_rows, "doc_id INT, text STRING")
    ev = spark.createDataFrame(eval_rows, "doc_id INT, text STRING")
    out = fuzzy_contamination(tr, ev, "doc_id", "text", **kw)
    return {(r["eval_id"], r["train_id"]): r["edit_dist"]
            for r in out.collect()}


def test_hand_distances(spark):
    got = _pairs(
        spark,
        train_rows=[
            (1, "the quick brown fox"),       # dist 0 to eval 100
            (2, "the quick brown fox!"),      # dist 1 (append)
            (3, "a quick brown fox"),         # dist 3 (del t, del h, e->a)
            (4, "the quick brown foxes ran"), # dist 6 -> excluded at d=3
            (5, None),
        ],
        eval_rows=[(100, "the quick brown fox")],
        max_dist=3,
    )
    assert got == {(100, 1): 0, (100, 2): 1, (100, 3): 3}


def test_normalization_lower_ws_ascii(spark):
    # case-folded, whitespace collapsed, non-ASCII stripped: all three
    # mutations normalize to the identical key -> distance 0
    got = _pairs(
        spark,
        train_rows=[(1, "The   Quick\tBrown  Fox")],
        eval_rows=[(100, "thé quick brown fox")],  # é stripped -> "th quick..."
        max_dist=3,
    )
    # key("thé quick brown fox") = "th quick brown fox" -> 1 edit from
    # "the quick brown fox"
    assert got == {(100, 1): 1}


def test_length_band_excludes_far_lengths(spark):
    # same prefix but 10 extra chars: length band (|Δlen| <= 2) must
    # exclude it without ever running levenshtein
    got = _pairs(
        spark,
        train_rows=[(1, "abcdefghij" * 3)],
        eval_rows=[(100, "abcdefghij" * 2)],
        max_dist=2,
    )
    assert got == {}


def test_prefix_cap_bounds_comparison(spark):
    # differences past prefix_len are invisible
    base = "x" * 64
    got = _pairs(
        spark,
        train_rows=[(1, base + "AAAA")],
        eval_rows=[(100, base + "BBBB")],
        max_dist=1,
    )
    assert got == {(100, 1): 0}


def test_blank_and_null_sides_dropped(spark):
    got = _pairs(
        spark,
        train_rows=[(1, "   "), (2, None), (3, "réal")],
        eval_rows=[(100, "éé"), (101, None), (102, "ral")],
        max_dist=2,
    )
    # eval 100 normalizes to '' (all non-ASCII) -> dropped; train 3
    # normalizes to 'ral' -> exact match with eval 102
    assert got == {(102, 3): 0}


def test_plan_is_broadcast_hash_join(spark):
    tr = spark.createDataFrame([(i, "doc %d body" % i) for i in range(50)],
                               "doc_id INT, text STRING")
    ev = spark.createDataFrame([(100, "doc 7 body")], "doc_id INT, text STRING")
    out = fuzzy_contamination(tr, ev, "doc_id", "text", max_dist=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_passjoin_blocking_is_recall_complete(spark):
    """Seeded mutation corpus vs a brute-force Python sweep: the
    segment-pigeonhole blocking must find EVERY pair within d,
    including indels that shift segment boundaries, mutations inside
    every segment slot, and short keys on the band path."""
    import random

    rng = random.Random(1234)
    alpha = "abcdefgh "
    train = []
    for t in range(40):
        n = rng.choice([2, 3, 5, 9, 17, 40, 64, 80])
        train.append((t, "".join(rng.choice(alpha) for _ in range(n))))
    evals = []
    eid = 1000
    for t, s in train[::3]:
        m = list(s)
        for _ in range(rng.randint(1, 5)):   # sometimes past d=3
            op = rng.choice("ids")
            pos = rng.randrange(max(1, len(m)))
            if op == "i":
                m.insert(pos, rng.choice(alpha))
            elif op == "d" and m:
                del m[pos]
            else:
                m[pos] = rng.choice(alpha)
        evals.append((eid, "".join(m)))
        eid += 1

    d, plen = 3, 64
    got = _pairs(spark, train, evals, max_dist=d, prefix_len=plen)

    def key(s):
        import re
        s = re.sub(r"[^\x00-\x7F]", "", s.lower())
        s = re.sub(r"\s+", " ", s).strip()
        return s[:plen]

    want = {}
    for eid_, et in evals:
        ek = key(et)
        if not ek:
            continue
        for tid, tt in train:
            tk = key(tt)
            if not tk:
                continue
            dist = _lev(ek, tk)
            if dist <= d:
                want[(eid_, tid)] = dist
    assert got == want
    assert len(want) > 5  # fixture actually exercises matches
