"""HTML -> text extraction: the north rule's byte-identity invariant
under hostile content, boilerplate actually dropped, and the Spark/
DuckDB pattern-parity seam (same constants drive both sides)."""

from __future__ import annotations

from pyspark.sql import functions as F

from json_schema_spark.operators.html_extract import (
    decode_entities,
    encode_entities,
    extract_text,
    html_extract_report,
    wrap_page,
)

# the strings an extractor corrupts if its entity/tag handling is naive
HOSTILE = [
    "plain words only",
    "",
    "a & b < c > d",
    'quotes " and \' mixed',
    "pre-encoded &lt;tag&gt; and &amp; stay literal",
    "fake closers </p></main></body> inside text",
    "comment opener <!-- not a real comment",
    "<script>alert(1)</script> quoted markup in content",
    "line\nbreaks\n\nand\ttabs",
    "unicode: наука 科学 ciência — ümläut",
    "&amp;amp; double-encoded chain",
    "angle storm <<<>>> &&& '''",
]


def _roundtrip(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    page = wrap_page(
        F.col("text"),
        F.md5(F.concat(F.lit("k:"), F.col("id").cast("string"))),
        F.lit("example0.com"),
    )
    return df.select("id", "text", page.alias("page"),
                     extract_text(page).alias("extracted"))


def test_byte_identity_on_hostile_content(spark):
    rows = _roundtrip(spark, HOSTILE).collect()
    assert len(rows) == len(HOSTILE)
    for r in rows:
        assert r.extracted == r.text, (r.text, r.extracted)


def test_entity_codec_inverse(spark):
    df = spark.createDataFrame([(t,) for t in HOSTILE], "text string")
    out = df.select(
        "text", decode_entities(encode_entities(F.col("text"))).alias("rt"),
        encode_entities(F.col("text")).alias("enc"),
    ).collect()
    for r in out:
        assert r.rt == r.text
        # encoded form is markup-inert: no raw structural chars remain
        assert "<" not in r.enc and ">" not in r.enc


def test_boilerplate_dropped_and_script_lt_survives(spark):
    """The synthetic page's script body contains a raw '<'; a
    tag-strip-only extractor corrupts everything after it. Also: no
    title/nav/footer text may leak into the extraction."""
    row = _roundtrip(spark, ["the only real content"]).collect()[0]
    assert 'if(k<"0")' in row.page  # the trap is actually present
    assert "<script" in row.page and "<nav>" in row.page
    assert row.extracted == "the only real content"
    for leak in ("Home", "About", "Related", "2024", "example0.com"):
        assert leak not in row.extracted


def test_extractor_on_non_synthetic_markup(spark):
    """Extraction semantics on pages we did NOT build: multiple sibling
    blocks removed independently (lazy bodies), attributes tolerated,
    comments spanning lines dropped, <header> not eaten by the <head>
    pattern prefix."""
    html = (
        '<html><head profile="x"><title>T</title></head><body>'
        "<header class='h'>H1</header>keep1 "
        "<script a=1>s1</script><script>s2</script>"
        "<!-- multi\nline\ncomment -->"
        "<div>keep2</div><nav>n1</nav><nav>n2</nav>"
        "<footer>f</footer> keep3</body></html>"
    )
    out = spark.range(1).select(
        extract_text(F.lit(html)).alias("x")).collect()[0].x
    assert out == "keep1 keep2 keep3"


def test_report_all_identical_on_webpages(spark, webpages):
    rep = html_extract_report(
        webpages.withColumn("doc_id", F.xxhash64("url")),
        "doc_id", "text", "lang",
    ).collect()
    assert rep
    for r in rep:
        assert r.n_byte_identical == r.n_docs, r
        assert r.sum_html_chars > r.sum_text_chars
        assert r.markup_ratio > 1.0


def test_metadata_signals(spark):
    """noindex / canonical / title / anchors on pages we build with
    known metadata, plus absence on pages without it."""
    from json_schema_spark.operators.html_extract import (
        anchor_texts, canonical_href, has_noindex, page_title,
        wrap_page_meta,
    )

    df = spark.createDataFrame(
        [(0, "body zero"), (1, "body one")], "id long, text string"
    )
    page = wrap_page_meta(
        F.col("text"), F.lit("k0" * 16), F.lit("example0.com"),
        F.col("id") == 0,
        F.when(F.col("id") == 0, F.lit("https://example0.com/c/k")).otherwise(F.lit("")),
        F.col("id").cast("int") * 3,
    )
    rows = {r.id: r for r in df.select(
        "id",
        has_noindex(page).alias("ni"),
        canonical_href(page).alias("canon"),
        page_title(page).alias("title"),
        F.size(anchor_texts(page)).alias("n_a"),
        extract_text(page).alias("ext"),
        "text",
    ).collect()}
    assert rows[0].ni and not rows[1].ni
    assert rows[0].canon == "https://example0.com/c/k" and rows[1].canon == ""
    assert rows[0].n_a == 2 and rows[1].n_a == 5  # 2 nav + id*3 extra
    assert len(rows[0].title) == 32
    for r in rows.values():
        assert r.ext == r.text  # metadata never breaks the invariant


def test_metadata_report_duckdb_parity(spark, tmp_path):
    """Full value parity of html_metadata_report vs the generated
    DuckDB oracle on a corpus with every metadata combination
    (ids 0..104 cover the 3x5x7 residue lattice)."""
    import duckdb

    from __spark_entry__ import _html_metadata_sql
    from json_schema_spark.operators.html_extract import html_metadata_report

    df = spark.createDataFrame(
        [(i, f"text body {i} & <tag>", "xx" if i % 2 else "en", "s", 10)
         for i in range(105)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    srep = {r.lang: r for r in
            html_metadata_report(df, "doc_id", "text", "lang").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    for d in con.execute(_html_metadata_sql()).fetchall():
        s = srep[d[0]]
        assert (s.n_docs, s.n_noindex, s.n_canonical, s.n_title_ok,
                s.sum_anchors, s.sum_anchor_chars,
                s.sum_content_chars) == tuple(d[1:8])
        assert s.n_title_ok == s.n_docs
        assert abs(s.link_density - d[8]) < 1e-9


def test_link_graph_hand_fixture(spark):
    """Edges and degrees on a 3-page corpus computed by hand; relative
    links and scheme-less hrefs drop; subdomains collapse to eTLD+1;
    duplicate links aggregate into edge weight."""
    from json_schema_spark.operators.html_extract import (
        degree_profile, link_edges, wrap_page_links,
    )

    pages = [
        ("a.com", ["https://b.com/x", "https://www.b.com/y", "/rel",
                   "https://c.co.uk/z"]),
        ("b.com", ["https://a.com/1"]),
        ("c.co.uk", []),
    ]
    df = spark.createDataFrame(
        [(i, d, ls) for i, (d, ls) in enumerate(pages)],
        "id long, dom string, links array<string>",
    )
    page = wrap_page_links(F.lit("body"), F.lit("k" * 32),
                           F.col("dom"), F.col("links"))
    edges = link_edges(df.select("dom", page.alias("p")),
                       F.col("dom"), F.col("p"))
    got = {(r.src_d, r.dst_d): r.n_links for r in edges.collect()}
    # www.b.com collapses into b.com => weight 2 on (a.com, b.com);
    # c.co.uk keeps three labels (co.uk is a multi-label suffix)
    assert got == {("a.com", "b.com"): 2, ("a.com", "c.co.uk"): 1,
                   ("b.com", "a.com"): 1}
    prof = {r.domain: r for r in degree_profile(edges).collect()}
    assert prof["a.com"].out_links == 3 and prof["a.com"].out_domains == 2
    assert prof["a.com"].in_links == 1 and prof["a.com"].in_domains == 1
    assert prof["b.com"].out_links == 1 and prof["b.com"].in_links == 2
    assert prof["c.co.uk"].out_links == 0 and prof["c.co.uk"].in_links == 1


def test_link_graph_conservation(spark, webpages):
    """Flow conservation: sum(out_links) == sum(in_links) == |edges
    weighted|, on the 5k synthetic corpus with lattice links."""
    from json_schema_spark.operators.html_extract import (
        degree_profile, link_edges, wrap_page_links,
    )

    df = webpages.withColumn("doc_id", F.xxhash64("url")) \
                 .where(F.col("text").isNotNull())
    i = F.pmod(F.col("doc_id"), F.lit(1000))
    dom = F.concat(F.lit("d"), F.pmod(i, F.lit(11)).cast("string"),
                   F.lit(".org"))
    links = F.transform(
        F.sequence(F.lit(1), F.pmod(i, F.lit(4)) + 1),
        lambda j: F.concat(F.lit("https://d"),
                           F.pmod(i + j, F.lit(11)).cast("string"),
                           F.lit(".org/p")))
    page = wrap_page_links(F.col("text"), F.md5(i.cast("string")),
                           dom, links)
    prof = degree_profile(
        link_edges(df.select(dom.alias("d"), page.alias("p")),
                   F.col("d"), F.col("p"))).collect()
    assert sum(r.out_links for r in prof) == sum(r.in_links for r in prof) > 0


def test_pagerank_two_node_closed_form(spark):
    """A -> B, B -> A with damping d converges to 0.5/0.5; A -> B only
    (B dangling) has the closed-form fixed point r_B = (1+d)/(2+d) *
    ... verified numerically against a python power iteration."""
    from json_schema_spark.operators.html_extract import pagerank_hosts

    edges = spark.createDataFrame(
        [("a.com", "b.com", 3)], "src_d string, dst_d string, n_links long")
    got = {r.domain: r.pagerank for r in pagerank_hosts(edges, 0.85, 20).collect()}
    # python reference power iteration (same update rule)
    ra, rb, d, n = 0.5, 0.5, 0.85, 2
    for _ in range(20):
        dang = rb  # b has no out-edges
        ra, rb = ((1 - d) / n + d * (dang / n),
                  (1 - d) / n + d * (ra + dang / n))
    assert abs(got["a.com"] - ra) < 1e-6 and abs(got["b.com"] - rb) < 1e-6
    # symmetric 2-cycle: exact 0.5/0.5 fixed point from the uniform start
    cyc = spark.createDataFrame(
        [("a.com", "b.com", 1), ("b.com", "a.com", 9)],
        "src_d string, dst_d string, n_links long")
    got = {r.domain: r.pagerank for r in pagerank_hosts(cyc, 0.85, 5).collect()}
    assert got == {"a.com": 0.5, "b.com": 0.5}


def test_pagerank_mass_conservation(spark):
    """Rank mass sums to 1 on the lattice graph (dangling mass is
    redistributed, not lost), and weighted edges matter: a domain
    receiving heavier in-links outranks symmetric peers."""
    from json_schema_spark.operators.html_extract import pagerank_hosts

    edges = spark.createDataFrame(
        [("a.com", "hub.com", 10), ("b.com", "hub.com", 10),
         ("hub.com", "a.com", 1), ("a.com", "b.com", 1),
         ("c.com", "a.com", 2)],
        "src_d string, dst_d string, n_links long")
    prof = pagerank_hosts(edges, 0.85, 15).collect()
    assert abs(sum(r.pagerank for r in prof) - 1.0) < 1e-4
    got = {r.domain: r.pagerank for r in prof}
    # hub.com drains everything it gets into a.com (its only out-edge),
    # so the two dominate; b.com sees only a 1/11 split of a's rank
    top2 = sorted(got, key=got.get)[-2:]
    assert set(top2) == {"hub.com", "a.com"}
    assert got["b.com"] < got["hub.com"] / 3


def test_oracle_sql_duckdb_parity_on_hostile(spark, tmp_path):
    """Run the generated DuckDB oracle on a parquet corpus whose text
    IS the hostile list — full value parity with the Spark report,
    exercising the Java-vs-RE2 seam beyond the sf corpus."""
    import duckdb

    from __spark_entry__ import _html_extract_sql

    df = spark.createDataFrame(
        [(i, t, "xx", "src0", len(t)) for i, t in enumerate(HOSTILE)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)

    srep = html_extract_report(df, "doc_id", "text", "lang").collect()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    drep = con.execute(_html_extract_sql()).fetchall()
    assert len(srep) == len(drep) == 1
    s, d = srep[0], drep[0]
    assert (s.lang, s.n_docs, s.n_byte_identical, s.sum_html_chars,
            s.sum_text_chars) == tuple(d[:5])
    assert s.n_byte_identical == len(HOSTILE)
    assert abs(s.markup_ratio - d[5]) < 1e-9


# ---------------------------------------------------------------------------
# anchor_text_profile: inbound anchor-text terms per target host
# ---------------------------------------------------------------------------

ANCHOR_PAGES = [
    # two absolute anchors to a.com ('big cat', 'big dog'), one with
    # attributes AFTER the href; chrome/relative anchors must drop
    (1, '<a href="https://a.com/x">big cat</a>'
        '<a href="/rel">never counted</a>'
        '<a href="https://a.com/y" class="z" id="q">big dog</a>'),
    # subdomain collapses to the registrable domain; empty anchor
    # text contributes no terms; case folds
    (2, '<a href="https://news.a.com/z">BIG</a>'
        '<a href="https://b.org/1"></a>'
        '<a href="https://b.org/2">tie-a tie-b</a>'),
]


def test_anchor_text_profile_hand_fixture(spark):
    from json_schema_spark.operators.html_extract import anchor_text_profile

    df = spark.createDataFrame(ANCHOR_PAGES, "id int, page string")
    got = {(r.dst_d, r.term): (r.n_refs, r.rank)
           for r in anchor_text_profile(df, F.col("page"), top_m=10).collect()}
    # a.com: big x3 (incl. subdomain + case fold), cat/dog x1
    assert got[("a.com", "big")] == (3, 1)
    assert got[("a.com", "cat")] == (1, 2)   # tie with dog -> term asc
    assert got[("a.com", "dog")] == (1, 3)
    # b.org: only the two-token anchor contributes
    assert got[("b.org", "tie-a")] == (1, 1)
    assert got[("b.org", "tie-b")] == (1, 2)
    # relative link text never appears anywhere
    assert not any(t in ("never", "counted") for _, t in got)


def test_anchor_text_profile_topm_and_salted(spark):
    from json_schema_spark.operators.html_extract import anchor_text_profile

    df = spark.createDataFrame(ANCHOR_PAGES, "id int, page string")
    plain = sorted(anchor_text_profile(df, F.col("page"), top_m=2).collect())
    salted = sorted(anchor_text_profile(
        df, F.col("page"), top_m=2, salted=True, n_salts=4).collect())
    assert plain == salted
    assert all(r.rank <= 2 for r in plain)
    # the rank-3 a.com term is cut
    assert ("a.com", "dog") not in {(r.dst_d, r.term) for r in plain}


# ---------------------------------------------------------------------------
# cocitation_pairs: related hosts by common linking sources
# ---------------------------------------------------------------------------

def test_cocitation_hand_fixture(spark):
    from json_schema_spark.operators.html_extract import cocitation_pairs

    edges = spark.createDataFrame(
        [("s1", "a", 3), ("s1", "b", 1),          # s1 co-cites (a,b)
         ("s2", "a", 1), ("s2", "b", 2), ("s2", "c", 1),
         ("s3", "a", 9), ("s3", "a", 1)],         # duplicate edge: distinct
        "src_d string, dst_d string, n_links long")
    got = {(r.dst_a, r.dst_b): r.n_common_sources
           for r in cocitation_pairs(edges).collect()}
    # (a,b) co-cited by s1 and s2; (a,c)/(b,c) only by s2; edge
    # WEIGHTS never inflate counts (s3's two a-edges add nothing)
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_cocitation_hub_prune(spark):
    from json_schema_spark.operators.html_extract import cocitation_pairs

    # hub links 50 hosts (a directory); s1 links 2 — with the cap the
    # hub's quadratic pair head disappears and only s1's pair remains
    rows = [("hub", f"h{i}", 1) for i in range(50)] + [
        ("s1", "h0", 1), ("s1", "h1", 1)]
    edges = spark.createDataFrame(rows, "src_d string, dst_d string, n_links long")
    capped = {(r.dst_a, r.dst_b): r.n_common_sources
              for r in cocitation_pairs(edges, max_out_degree=10).collect()}
    assert capped == {("h0", "h1"): 1}
    uncapped = cocitation_pairs(edges).count()
    assert uncapped == 50 * 49 // 2  # the quadratic head the cap removes


def test_anchor_text_salted_plan_uses_window_group_limit(spark):
    from json_schema_spark.operators.html_extract import anchor_text_profile

    df = spark.createDataFrame(ANCHOR_PAGES, "id int, page string")
    out = anchor_text_profile(df, F.col("page"), top_m=2,
                              salted=True, n_salts=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
