"""HTML -> text extraction (boilerplate removal) for Common-Crawl-style
web pages.

The north rule's per-row invariant is "byte-identical extracted text per
url": the text a page carries must survive the extraction pipeline
byte-for-byte. This module implements the extraction as a pure Column
regexp pipeline (whole-stage codegen, zero executor Python, zero
shuffle — a per-row projection that scales embarrassingly to 10^12
rows), plus a deterministic page synthesizer so the invariant is
provable end-to-end: wrap(text) |> extract == text, checked per row
against a DuckDB twin running the same RE2-compatible pipeline.

Extraction semantics (jusText/trafilatura-lite, tag-structural only):
  1. drop <!-- comments -->
  2. drop container blocks whose CONTENT is boilerplate by construction:
     script, style, head (title/meta), nav, header, aside, footer
  3. strip every remaining tag
  4. decode the five core HTML entities (&amp; last, so "&amp;lt;"
     round-trips to the literal text "&lt;" and not "<")

Regex subset note: every pattern is shared verbatim between Spark
(java.util.regex) and DuckDB (RE2) — lazy quantifiers and inline (?s)
only, NO backreferences (RE2 has none), which is why the block list is
expanded per tag instead of <(nav|footer)>.*?</\\1>.

Reference seam: the reference validates documents it is handed
(validators.lisp keyword dispatch); extraction is the upstream stage a
web-scale deployment needs so `text` exists to validate. The invariant
mirrors the reference's do-not-mutate discipline: validation (and now
extraction) must never alter the bytes it reports on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Containers removed WITH their content. Order matters only for
# readability; '<head(?:\s[^>]*)?>' cannot match '<header>' because the
# char after 'head' must be whitespace or '>'.
BOILERPLATE_BLOCKS = ("script", "style", "head", "nav", "header", "aside", "footer")

# encode: '&' FIRST (else already-encoded entities double-encode);
# decode: '&amp;' LAST (else '&amp;lt;' collapses to '<').
_ENCODE = (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
           ('"', "&quot;"), ("'", "&#39;"))
_DECODE = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
           ("&#39;", "'"), ("&amp;", "&"))


def encode_entities(col: Column) -> Column:
    for raw, ent in _ENCODE:
        col = F.replace(col, F.lit(raw), F.lit(ent))
    return col


def decode_entities(col: Column) -> Column:
    for ent, raw in _DECODE:
        col = F.replace(col, F.lit(ent), F.lit(raw))
    return col


def block_pattern(tag: str) -> str:
    """(?s) so block content may span newlines; lazy body so sibling
    blocks of the same tag are removed independently."""
    return rf"(?s)<{tag}(?:\s[^>]*)?>.*?</{tag}>"


def extract_text(html: Column) -> Column:
    """Main-content text of an HTML string column. Pure regexp/replace
    Column pipeline — rides whole-stage codegen."""
    x = F.regexp_replace(html, r"(?s)<!--.*?-->", "")
    for tag in BOILERPLATE_BLOCKS:
        x = F.regexp_replace(x, block_pattern(tag), "")
    x = F.regexp_replace(x, r"<[^>]+>", "")
    return decode_entities(x)


def wrap_page(text: Column, key: Column, domain: Column) -> Column:
    """Deterministic Common-Crawl-style page around `text`: doctype,
    head (title/meta/script/style), nav/header chrome, the content in
    <main><p>, aside + footer boilerplate, an HTML comment. The script
    body deliberately contains a raw '<' so tag-strip-only extractors
    corrupt it — content must come back byte-identical anyway."""
    t = F.md5(F.concat(F.lit("title:"), key))
    return F.concat(
        F.lit('<!DOCTYPE html><html lang="en"><head><title>'), t,
        F.lit('</title><meta charset="utf-8"/>'
              '<script type="text/javascript">var k="'), key,
        F.lit('";if(k<"0"){k="x"}</script>'
              "<style>.m{color:#fff;margin:0}</style></head>"
              "<body><header><h1>"), t,
        F.lit('</h1></header><nav><a href="/">Home</a>'
              '<a href="/about">About</a></nav><!-- warc:'), key,
        F.lit(" --><main><p>"), encode_entities(text),
        F.lit("</p></main><aside>Related: "), t,
        F.lit("</aside><footer>&copy; 2024 "), domain,
        F.lit("</footer></body></html>"),
    )


# --- page metadata signals (crawl-filtering stage) ---------------------
# All patterns stay in the Java∩RE2 subset (no backreferences, inline
# (?s) + lazy bodies only) so the DuckDB oracle runs them verbatim.
TITLE_RE = r"(?s)<title(?:\s[^>]*)?>(.*?)</title>"
ANCHOR_RE = r"(?s)<a(?:\s[^>]*)?>(.*?)</a>"
NOINDEX_RE = r'<meta\s[^>]*name="robots"[^>]*content="[^"]*noindex'
CANONICAL_RE = r'<link\s[^>]*rel="canonical"[^>]*href="([^"]*)"'


def page_title(html: Column) -> Column:
    return decode_entities(F.regexp_extract(html, TITLE_RE, 1))


def has_noindex(html: Column) -> Column:
    """Meta-robots noindex — pages a polite training pipeline drops."""
    return F.regexp_count(html, F.lit(NOINDEX_RE)) > 0


def canonical_href(html: Column) -> Column:
    """rel=canonical target ('' when absent) — the key for canonical-
    aware URL dedup upstream of content dedup."""
    return F.regexp_extract(html, CANONICAL_RE, 1)


def anchor_texts(html: Column) -> Column:
    return F.regexp_extract_all(html, F.lit(ANCHOR_RE), 1)


def wrap_page_meta(text: Column, key: Column, domain: Column,
                   noindex: Column, canonical: Column,
                   extra_anchors: Column) -> Column:
    """wrap_page variant with per-page metadata variation: optional
    meta-robots noindex, optional rel=canonical link, and a variable
    number of extra nav anchors — so the metadata extractors have
    real per-row variance to prove themselves on."""
    t = F.md5(F.concat(F.lit("title:"), key))
    robots = F.when(
        noindex, F.lit('<meta name="robots" content="noindex,nofollow"/>')
    ).otherwise(F.lit(""))
    canon = F.when(
        canonical != "",
        F.concat(F.lit('<link rel="canonical" href="'), canonical, F.lit('"/>')),
    ).otherwise(F.lit(""))
    extra = F.repeat(F.lit('<a href="/p">more links here</a>'), extra_anchors)
    return F.concat(
        F.lit('<!DOCTYPE html><html lang="en"><head><title>'), t,
        F.lit('</title><meta charset="utf-8"/>'), robots, canon,
        F.lit('<script type="text/javascript">var k="'), key,
        F.lit('";if(k<"0"){k="x"}</script>'
              "<style>.m{color:#fff;margin:0}</style></head>"
              "<body><header><h1>"), t,
        F.lit('</h1></header><nav><a href="/">Home</a>'
              '<a href="/about">About</a>'), extra,
        F.lit("</nav><!-- warc:"), key,
        F.lit(" --><main><p>"), encode_entities(text),
        F.lit("</p></main><aside>Related: "), t,
        F.lit("</aside><footer>&copy; 2024 "), domain,
        F.lit("</footer></body></html>"),
    )


def html_metadata_report(df: DataFrame, id_col: str, text_col: str,
                         lang_col: str) -> DataFrame:
    """Crawl-filtering metadata profile per lang: noindex pages,
    canonical-bearing pages, anchor counts, and link density (anchor
    chars / extracted content chars, from exact sums so the ratio is
    order-independent). Deterministic per-row metadata derives from
    the id (noindex: id%7==0, canonical: id%3==0, extra anchors:
    id%5), so the DuckDB twin rebuilds the identical corpus. Same
    scale shape as html_extract_report: one codegen projection + one
    partial-aggregable groupBy."""
    i = F.col(id_col)
    key = F.md5(F.concat(F.lit("k:"), i.cast("string")))
    domain = F.concat(F.lit("example"),
                      F.pmod(i, F.lit(7)).cast("string"), F.lit(".com"))
    canonical = F.when(
        F.pmod(i, F.lit(3)) == 0,
        F.concat(F.lit("https://"), domain, F.lit("/c/"), key),
    ).otherwise(F.lit(""))
    page = wrap_page_meta(
        F.col(text_col), key, domain,
        F.pmod(i, F.lit(7)) == 0, canonical,
        F.pmod(i, F.lit(5)).cast("int"),
    )
    ats = anchor_texts(page)
    rows = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(lang_col).alias("lang"),
            has_noindex(page).cast("bigint").alias("noindex"),
            (canonical_href(page) != "").cast("bigint").alias("canon"),
            (page_title(page) == F.md5(F.concat(F.lit("title:"), key)))
            .cast("bigint").alias("title_ok"),
            F.size(ats).cast("bigint").alias("n_anchors"),
            F.char_length(F.array_join(ats, "")).alias("anchor_chars"),
            F.char_length(extract_text(page)).alias("content_chars"),
        )
    )
    return (
        rows.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("noindex").alias("n_noindex"),
            F.sum("canon").alias("n_canonical"),
            F.sum("title_ok").alias("n_title_ok"),
            F.sum("n_anchors").alias("sum_anchors"),
            F.sum("anchor_chars").alias("sum_anchor_chars"),
            F.sum("content_chars").alias("sum_content_chars"),
        )
        .select(
            "lang", "n_docs", "n_noindex", "n_canonical", "n_title_ok",
            "sum_anchors", "sum_anchor_chars", "sum_content_chars",
            F.round(F.col("sum_anchor_chars").cast("double")
                    / F.col("sum_content_chars"), 6).alias("link_density"),
        )
        .orderBy("lang")
    )


# --- host-level link graph (Common-Crawl web-graph style) ---------------
HREF_RE = r'<a\s[^>]*href="([^"]*)"'


def extract_hrefs(html: Column) -> Column:
    """All anchor href values in document order (relative ones
    included — callers host-map and filter)."""
    return F.regexp_extract_all(html, F.lit(HREF_RE), 1)


def wrap_page_links(text: Column, key: Column, domain: Column,
                    links: Column,
                    anchor_texts: Column | None = None) -> Column:
    """wrap_page variant whose nav carries an arbitrary array of
    absolute outbound links alongside the two relative chrome links —
    the fixture for link-graph extraction. ``anchor_texts`` (aligned
    with ``links``) sets each anchor's visible text; default 'out'."""
    t = F.md5(F.concat(F.lit("title:"), key))
    if anchor_texts is None:
        anchor_texts = F.transform(links, lambda _: F.lit("out"))
    anchors = F.array_join(
        F.zip_with(links, anchor_texts, lambda u, a: F.concat(
            F.lit('<a href="'), u, F.lit('">'), a, F.lit("</a>"))), "")
    return F.concat(
        F.lit('<!DOCTYPE html><html lang="en"><head><title>'), t,
        F.lit('</title><meta charset="utf-8"/>'
              '<script type="text/javascript">var k="'), key,
        F.lit('";if(k<"0"){k="x"}</script>'
              "<style>.m{color:#fff;margin:0}</style></head>"
              "<body><header><h1>"), t,
        F.lit('</h1></header><nav><a href="/">Home</a>'
              '<a href="/about">About</a>'), anchors,
        F.lit("</nav><!-- warc:"), key,
        F.lit(" --><main><p>"), encode_entities(text),
        F.lit("</p></main><aside>Related: "), t,
        F.lit("</aside><footer>&copy; 2024 "), domain,
        F.lit("</footer></body></html>"),
    )


def link_edges(df: DataFrame, src_domain: Column, html: Column) -> DataFrame:
    """(src_domain, dst_domain, n_links) host-level edge table from
    anchor hrefs: explode hrefs, host-map (relative links host to ''
    and are dropped), eTLD+1-collapse, aggregate. The explode is the
    only row-multiplying step and it collapses immediately through a
    partial-aggregable groupBy on two short keys — page bodies never
    shuffle. This is exactly the Common Crawl host-level web-graph
    recipe (edges from WAT anchor metadata, degree-aggregated)."""
    from json_schema_spark.operators.textstats import (
        registrable_domain, url_host,
    )

    href = F.explode(extract_hrefs(html))
    pairs = df.select(src_domain.alias("src_d"), href.alias("href"))
    host = url_host(F.col("href"))
    return (
        pairs.select("src_d", registrable_domain(host).alias("dst_d"),
                     host.alias("h"))
        .where(F.col("h") != "")
        .groupBy("src_d", "dst_d")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def degree_profile(edges: DataFrame) -> DataFrame:
    """Per-domain in/out degree profile over an edge-weight table:
    two partial-aggregable groupBys on domain + one full outer join of
    the aggregate-sized results."""
    out = edges.groupBy(F.col("src_d").alias("domain")).agg(
        F.sum("n_links").alias("out_links"),
        F.count(F.lit(1)).alias("out_domains"))
    inn = edges.groupBy(F.col("dst_d").alias("domain")).agg(
        F.sum("n_links").alias("in_links"),
        F.count(F.lit(1)).alias("in_domains"))
    z = F.lit(0).cast("bigint")
    return (
        out.join(inn, "domain", "full")
        .select(
            "domain",
            F.coalesce("out_links", z).alias("out_links"),
            F.coalesce("out_domains", z).alias("out_domains"),
            F.coalesce("in_links", z).alias("in_links"),
            F.coalesce("in_domains", z).alias("in_domains"),
        )
        .orderBy("domain")
    )


def pagerank_hosts(edges: DataFrame, damping: float = 0.85,
                   iters: int = 10) -> DataFrame:
    """Weighted PageRank over the host-level edge table
    (src_d, dst_d, n_links) — power iteration with uniform dangling-
    mass redistribution (the Common Crawl host-rank recipe).

    Scale shape: the rank table is node-cardinality (aggregate-sized
    next to the corpus); each iteration is one join of edges with the
    current ranks + one partial-aggregable groupBy on dst, and the
    dangling-mass term is ONE scalar aggregate. localCheckpoint per
    iteration truncates the 10-deep lineage exactly like
    dedup.dedup_groups does for label propagation. The out-weight
    table is computed once and reused every iteration.

    Determinism: rank updates are pure double arithmetic from exact
    bigint weights; callers should round reported ranks (the driver
    query rounds to 6dp, matching the oracle)."""
    # materialize the edge table ONCE: every downstream branch (nodes,
    # out-weights, 10 contribution joins, 10 dangling aggregates) would
    # otherwise re-execute the upstream extraction pipeline — measured
    # ~50 rebuilds of the page-regex scan for a 10-iteration run. The
    # edge table is pair-of-domains-cardinality: aggregate-sized.
    # Lazy (r6, guide §2.4): the nodes.count() below materializes it in
    # the same job — and runs the upstream extraction with AQE still ON.
    edges = edges.localCheckpoint(eager=False)
    # nodes and out-weights are iteration-invariant: checkpoint them
    # once (lazily; the count / first dangling job materializes them)
    # instead of re-deriving union+distinct and the groupBy from the
    # edge table inside every iteration's plan (r6, guide §2.4).
    nodes = (edges.select(F.col("src_d").alias("domain"))
             .union(edges.select(F.col("dst_d").alias("domain")))
             .distinct().localCheckpoint(eager=False))
    n = nodes.count()
    out_w = edges.groupBy("src_d").agg(F.sum("n_links").alias("out_w")) \
        .localCheckpoint(eager=False)
    ranks = nodes.select("domain", F.lit(1.0 / n).alias("rank"))
    # AQE scoped OFF for the power iteration (r6, guide §2.4): every
    # table in the loop is aggregate-sized and already materialized or
    # derived from a checkpoint, so adaptive re-planning has nothing to
    # adapt — it only turns each iteration's exchanges into separate
    # materialization jobs (measured: 120 -> ~45 driver-side jobs for a
    # 10-iteration run at sf0.1). Rank arithmetic is unchanged.
    spark = edges.sparkSession
    sp_before = spark.conf.get("spark.sql.shuffle.partitions")
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    # loop shuffle width sized to the NODE table and capped by the
    # session's configured parallelism (scale-adaptive, not a local
    # constant): with AQE off these shuffles are not coalesced, so the
    # width must be the one AQE would have chosen for aggregate-sized
    # rank/contribution tables
    p = max(1, min(int(sp_before), n // 100_000))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(p))
    try:
        for _ in range(iters):
            dangling = (
                ranks.join(out_w, ranks.domain == out_w.src_d, "left_anti")
                .agg(F.sum("rank")).first()[0] or 0.0
            )
            contrib = (
                edges.join(out_w, "src_d")
                .join(ranks.withColumnRenamed("domain", "src_d"), "src_d")
                .groupBy(F.col("dst_d").alias("domain"))
                .agg(F.sum(F.col("rank") * F.col("n_links") / F.col("out_w"))
                     .alias("in_c"))
            )
            ranks = (
                nodes.join(contrib, "domain", "left")
                .select(
                    "domain",
                    (F.lit((1.0 - damping) / n)
                     + F.lit(damping)
                     * (F.coalesce(F.col("in_c"), F.lit(0.0))
                        + F.lit(dangling / n))).alias("rank"),
                )
                # lazy (r6, guide §2.4): the NEXT iteration's dangling-
                # mass aggregate (or the caller's action, for the last
                # round) materializes this checkpoint in the same job —
                # one job per iteration instead of two, identical rank
                # expressions.
                .localCheckpoint(eager=False)
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", sp_before)
    return ranks.select("domain", F.round("rank", 6).alias("pagerank")) \
                .orderBy("domain")


def html_extract_report(df: DataFrame, id_col: str, text_col: str,
                        lang_col: str) -> DataFrame:
    """Wrap every document in a deterministic page, run the extractor,
    and report per-lang: docs, byte-identical count (the invariant),
    exact char sums, and the markup-overhead ratio. One projection +
    one partial-aggregable groupBy — no shuffle of page bodies beyond
    the aggregate."""
    key = F.md5(F.concat(F.lit("k:"), F.col(id_col).cast("string")))
    domain = F.concat(F.lit("example"),
                      F.pmod(F.col(id_col), F.lit(7)).cast("string"),
                      F.lit(".com"))
    page = wrap_page(F.col(text_col), key, domain)
    rows = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(lang_col).alias("lang"),
            F.char_length(page).alias("html_chars"),
            F.char_length(F.col(text_col)).alias("text_chars"),
            (extract_text(page) == F.col(text_col)).alias("ok"),
        )
    )
    return (
        rows.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("ok").cast("bigint")).alias("n_byte_identical"),
            F.sum("html_chars").alias("sum_html_chars"),
            F.sum("text_chars").alias("sum_text_chars"),
        )
        .select(
            "lang", "n_docs", "n_byte_identical",
            "sum_html_chars", "sum_text_chars",
            F.round(F.col("sum_html_chars").cast("double")
                    / F.col("sum_text_chars"), 6).alias("markup_ratio"),
        )
        .orderBy("lang")
    )


def crawl_frontier(
    pages: DataFrame,
    html: Column,
    fetched_urls: DataFrame,
    host_scores: DataFrame,
    k_per_host: int = 10,
    n_salts: int = 8,
) -> DataFrame:
    """Crawl-frontier generation — the step that closes the crawl
    loop over the link-graph family: outbound anchors from fetched
    pages become the candidate URL set, fetched URLs are removed, and
    the remainder is prioritized per host under a politeness cap
    (at most ``k_per_host`` URLs per host per crawl round, ranked by
    in-reference count — the OPIC-style "most-cited first" frontier;
    cf. the Common Crawl / Heritrix frontier recipe).

    ``fetched_urls``: one canonical ``url`` column (the crawl ledger).
    ``host_scores``: (host, host_score) — host-cardinality (bounded),
    re-enters as a BROADCAST; unknown hosts keep score 0.0 so newly
    discovered hosts remain crawlable.

    Returns (url, host, n_refs, host_score, rank_in_domain).

    Scale shape: the href explode collapses immediately through a
    partial-aggregable groupBy(url) — raw anchors never shuffle; the
    fetched-ledger removal is one LEFT ANTI join on the canonical
    url (salted-aggregation-friendly: both sides hash-partition on
    url); the politeness cap reuses ``per_domain_cap``'s SALTED
    two-stage top-k, so a hot host (every crawl has one) is bounded
    to k*n_salts rows before the real per-host window.  At 100 TB
    the frontier table is the small output of the big anti-join —
    exactly the shape a crawl scheduler wants to checkpoint."""
    from .sampling import per_domain_cap
    from .textstats import canonical_url

    discovered = (
        pages.select(F.explode(extract_hrefs(html)).alias("href"))
        .where(F.col("href").rlike(r"^https?://"))
        .select(canonical_url(F.col("href")).alias("url"))
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("n_refs"))
    )
    cand = discovered.join(
        fetched_urls.select("url").distinct(), "url", "left_anti"
    ).withColumn(
        "host", F.regexp_extract("url", r"^https?://([^/?#]*)", 1)
    ).join(
        F.broadcast(host_scores), "host", "left"
    ).select(
        "url", "host", "n_refs",
        F.coalesce("host_score", F.lit(0.0)).alias("host_score"),
    )
    return per_domain_cap(
        cand, "host", k_per_host,
        order_by=[F.desc("n_refs"), F.asc("url")],
        salt_key="url", n_salts=n_salts,
    ).select("url", "host", "n_refs", "host_score", "rank_in_domain")


# --- inbound anchor-text aggregation (web-graph target description) -----
# href AND visible text in one pattern: two capture groups, anchor text
# restricted to tag-free runs ([^<]*) — the synthetic anchors carry
# plain words, and nested-markup anchors are out of scope by contract.
# Java∩RE2 subset (no backreferences, no lookaround).
HREF_TEXT_RE = r'<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'


def anchor_text_profile(
    df: DataFrame,
    html: Column,
    top_m: int = 3,
    salted: bool = False,
    n_salts: int = 16,
) -> DataFrame:
    """Per target host, the most frequent inbound anchor-text terms:
    (dst_d, term, n_refs, rank) with rank <= ``top_m``.

    Why a web corpus pipeline needs this: anchor text is the classic
    external description of a page (what OTHER sites call it) — used
    as a retrieval/quality signal and as training text for the target
    (the WAT-derived anchor corpus recipe). The aggregation is by
    REGISTRABLE target domain, the same key as the link graph.

    Scale shape: hrefs and their texts extract as two aligned
    regexp_extract_all arrays over the SAME pattern (group 1 / group
    2) zipped per match — one codegen projection, page bodies never
    shuffle; the explode collapses immediately through a partial-
    aggregable groupBy on (dst_d, term); relative links host to ''
    and drop BEFORE the shuffle. The per-host top-m window runs the
    salted two-stage top-k under ``salted=True`` (a mega-host like
    wikipedia.org receives a large share of all web anchors — the
    pigeonhole bound caps any one task at top_m * n_salts rows).
    Determinism: rank orders on (n_refs desc, term asc) — total order,
    engine-independent.
    """
    from pyspark.sql import Window

    from json_schema_spark.operators.textstats import (
        registrable_domain, url_host, ws_tokens,
    )

    pairs = df.select(
        F.explode(F.arrays_zip(
            F.regexp_extract_all(html, F.lit(HREF_TEXT_RE), 1),
            F.regexp_extract_all(html, F.lit(HREF_TEXT_RE), 2),
        )).alias("a"))
    host = url_host(F.col("a.0"))
    terms = (
        pairs.select(registrable_domain(host).alias("dst_d"),
                     host.alias("h"),
                     F.explode(ws_tokens(F.lower(F.col("a.1"))))
                     .alias("term"))
        .where(F.col("h") != "")
        .groupBy("dst_d", "term")
        .agg(F.count(F.lit(1)).alias("n_refs"))
    )
    order = [F.desc("n_refs"), F.asc("term")]
    out = terms
    if salted:
        out = out.withColumn(
            "__salt",
            F.pmod(F.conv(F.substring(F.md5(F.col("term")), 1, 15),
                          16, 10).cast("bigint"), F.lit(n_salts)))
        w1 = Window.partitionBy("dst_d", "__salt").orderBy(*order)
        out = (out.withColumn("__r1", F.row_number().over(w1))
               .where(F.col("__r1") <= top_m).drop("__r1", "__salt"))
    w = Window.partitionBy("dst_d").orderBy(*order)
    return (out.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_m)
            .select("dst_d", "term", "n_refs", "rank"))


def cocitation_pairs(
    edges: DataFrame,
    max_out_degree: int | None = None,
) -> DataFrame:
    """Co-citation similarity over the host edge table (src_d, dst_d,
    n_links): pairs of target hosts ranked by how many DISTINCT
    sources link to both — (dst_a, dst_b, n_common_sources) with
    dst_a < dst_b.  The classic related-host signal (Small 1973,
    applied to the web graph): hosts co-cited by many independent
    sources are topically related, feeding domain clustering and
    reputation propagation.

    Scale shape: the self-join is keyed on src_d, and a source with
    out-degree d contributes O(d²) pairs — the quadratic head is a
    MEGA-HUB source (a link directory), not a signal.  With
    ``max_out_degree`` set, hub sources above the cap are pruned
    BEFORE the join (the dedup.py stop-gram rule: the head is
    boilerplate, the tail is signal).  Distinct (src, dst) projection
    first, so edge weights cannot inflate counts; the pair groupBy is
    partial-aggregable; both join sides are the SAME pruned projection
    so the exchange is reused.
    """
    # lazy reuse barrier (r6, guide §7.2): shuffle-exchange reuse
    # across the self-join sides only fires when BOTH sides plan as
    # shuffle exchanges — a broadcast-eligible side rebuilds the whole
    # upstream link-extraction subtree instead (the minhash_candidates
    # lesson). The barrier guarantees one compute either way; edge
    # rows, aggregate-sized.
    e = edges.select("src_d", "dst_d").distinct().localCheckpoint(eager=False)
    if max_out_degree is not None:
        deg = e.groupBy("src_d").agg(F.count(F.lit(1)).alias("__d"))
        e = (e.join(F.broadcast(deg.where(F.col("__d") <= max_out_degree)),
                    "src_d").drop("__d"))
    a = e.select("src_d", F.col("dst_d").alias("dst_a"))
    b = e.select("src_d", F.col("dst_d").alias("dst_b"))
    return (
        a.join(b, "src_d")
        .where(F.col("dst_a") < F.col("dst_b"))
        .groupBy("dst_a", "dst_b")
        .agg(F.count(F.lit(1)).alias("n_common_sources"))
    )
