"""Registrable-domain (eTLD+1) + blocklist gate unit tests
(operators/textstats.py). The RefinedWeb/FineWeb URL-filtering stage:
host extraction must survive userinfo/port/mixed case, the PSL-subset
suffix logic must pick 3 labels exactly when the last two form a known
multi-label suffix, and the blocklist must apply at the registrable
domain, not the raw host."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_schema_spark.operators.textstats import (
    MULTI_LABEL_SUFFIXES,
    domain_blocklist_flag,
    registrable_domain,
    url_host,
)


HOST_CASES = [
    # (url, host)
    ("http://www.example.com/a?b#c", "www.example.com"),
    ("HTTPS://WWW.Example.COM/path", "www.example.com"),       # case
    ("http://example.com:8080/x", "example.com"),              # port
    ("http://user:pw@example.co.uk/x", "example.co.uk"),       # userinfo
    ("http://user:pw@example.co.uk:443/x", "example.co.uk"),   # both
    ("ftp://files.example.org", "files.example.org"),          # no path
    ("example.com/no-scheme", ""),                             # no scheme
    ("http://localhost/x", "localhost"),
    ("http://[2001:db8::1]/x", "2001:db8::1"),                 # IPv6
    ("http://u@[2001:DB8::1]:8443/x", "2001:db8::1"),          # v6+both
    ("http://93.184.216.34:80/x", "93.184.216.34"),            # IPv4
]

DOMAIN_CASES = [
    # (host, eTLD+1)
    ("www.example.com", "example.com"),
    ("example.com", "example.com"),
    ("www.example.co.uk", "example.co.uk"),        # multi-label suffix
    ("a.b.c.example.co.uk", "example.co.uk"),      # deep subdomain
    ("example.co.uk", "example.co.uk"),            # exactly 3 labels
    ("cdn.news.com.au", "news.com.au"),
    ("localhost", "localhost"),                    # single label
    ("co.uk", "co.uk"),                            # bare suffix (n=2 branch)
    ("93.184.216.34", "93.184.216.34"),            # IPv4 passes whole
    ("2001:db8::1", "2001:db8::1"),                # IPv6 passes whole
    # PSL wildcard rule *.ck: every 2nd-level label is a suffix
    ("shop.example.ck", "shop.example.ck"),        # exactly suffix+1
    ("a.shop.example.ck", "shop.example.ck"),      # deeper subdomain
    # PSL exception rule !www.ck: www.ck IS registrable
    ("www.ck", "www.ck"),
    ("sub.www.ck", "www.ck"),
    ("example.ck", "example.ck"),                  # host IS a suffix (n=2)
]


def test_url_host_edges(spark):
    df = spark.createDataFrame([(u,) for u, _ in HOST_CASES], "url string")
    got = [r.h for r in
           df.select(url_host(F.col("url")).alias("h")).collect()]
    assert got == [h for _, h in HOST_CASES]


def test_registrable_domain_edges(spark):
    df = spark.createDataFrame([(h,) for h, _ in DOMAIN_CASES], "host string")
    got = [r.d for r in
           df.select(registrable_domain(F.col("host")).alias("d")).collect()]
    assert got == [d for _, d in DOMAIN_CASES]


def test_suffix_table_is_two_label_lowercase():
    # the compiled IN works on the joined LAST-TWO labels, so every
    # vendored rule must be exactly two lowercase labels
    from json_schema_spark.operators.textstats import (
        WILDCARD_EXCEPTIONS,
        WILDCARD_TLDS,
    )

    for s in MULTI_LABEL_SUFFIXES:
        assert s == s.lower() and s.count(".") == 1 and "'" not in s
    for s in WILDCARD_TLDS:
        assert s == s.lower() and "." not in s  # matched on the LAST label
    for s in WILDCARD_EXCEPTIONS:
        assert s == s.lower() and s.count(".") == 1
        assert s.rsplit(".", 1)[1] in WILDCARD_TLDS


def test_blocklist_flags_at_domain_level(spark):
    rows = [
        (1, "http://www.bad.co.uk/x"),     # subdomain of a blocked domain
        (2, "http://bad.co.uk:80/y"),      # the blocked domain itself
        (3, "http://notbad.co.uk/z"),      # sibling domain — NOT blocked
        (4, "http://bad.com.evil.net/w"),  # 'bad.com' as subdomain — eTLD+1
                                           # is evil.net, NOT blocked
        (5, "http://ok.com/v"),
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    blocked = spark.createDataFrame(
        [("bad.co.uk",), ("BAD.COM",)], "domain string")  # lowered inside
    out = {r.id: (r.reg_domain, r.blocked)
           for r in domain_blocklist_flag(df, "url", blocked).collect()}
    assert out[1] == ("bad.co.uk", True)
    assert out[2] == ("bad.co.uk", True)
    assert out[3] == ("notbad.co.uk", False)
    assert out[4] == ("evil.net", False)
    assert out[5] == ("ok.com", False)


def test_blocklist_join_is_broadcast(spark):
    df = spark.createDataFrame([(1, "http://a.com/x")], "id int, url string")
    blocked = spark.createDataFrame([("a.com",)], "domain string")
    plan = domain_blocklist_flag(
        df, "url", blocked)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- robots.txt parse + REP longest-match verdicts --------------------

def test_parse_robots_scoping_and_hygiene(spark):
    """Agent scoping (other-bot rules excluded), comment/unknown lines
    ignored, empty Disallow dropped, directive names case-insensitive."""
    from json_schema_spark.operators.robots import parse_robots

    txt = (
        "# comment\n"
        "User-agent: other-bot\n"
        "Disallow: /\n"
        "\n"
        "user-AGENT: *\n"
        "DISALLOW: /a/\n"
        "allow: /a/b/\n"
        "Disallow:\n"            # empty = nothing disallowed -> dropped
        "Crawl-delay: 10\n"      # unknown directive -> ignored
    )
    df = spark.createDataFrame([("h1.com", txt)], "host string, robots string")
    rules = {(r["rule_type"], r["prefix"], r["allow"])
             for r in parse_robots(df).collect()}
    assert rules == {("disallow", "/a/", 0), ("allow", "/a/b/", 1)}


def test_robots_verdict_longest_match_and_ties(spark):
    """Longest rule wins; Allow beats Disallow on a length tie; no
    matching rule and no-rules hosts are allowed."""
    from json_schema_spark.operators.robots import robots_verdict

    rules = spark.createDataFrame(
        [("h.com", "disallow", "/a/", 3, 0),
         ("h.com", "allow", "/a/b/", 5, 1),
         ("h.com", "disallow", "/tie", 4, 0),
         ("h.com", "allow", "/tie", 4, 1)],
        "host string, rule_type string, prefix string, "
        "rule_len int, allow int")
    urls = spark.createDataFrame(
        [(1, "h.com", "/a/x"),        # only /a/ matches -> blocked
         (2, "h.com", "/a/b/x"),      # longer allow wins
         (3, "h.com", "/tie-break"),  # equal lengths -> allow wins
         (4, "h.com", "/elsewhere"),  # no match -> allowed, len 0
         (5, "other.com", "/a/x")],   # host without rules -> allowed
        "doc_id long, host string, path string")
    got = {r["doc_id"]: (r["allowed"], r["matched_len"])
           for r in robots_verdict(urls, rules).collect()}
    assert got == {1: (False, 3), 2: (True, 5), 3: (True, 4),
                   4: (True, 0), 5: (True, 0)}


# ---------------------------------------------------------------------------
# bitext_candidates: URL-parallel bitext candidate mining
# ---------------------------------------------------------------------------

def test_bitext_candidates_hand_fixture(spark):
    from json_schema_spark.operators.textstats import bitext_candidates

    rows = [
        (1, "https://a.com/en/art/x"),
        (2, "https://a.com/de/art/x"),     # partner of 1
        (3, "https://a.com/en/art/x"),     # same-lang revisit: 1 wins (min id)
        (4, "https://a.com/fr/art/y"),     # no partner
        (5, "https://b.org/docs/plain"),   # no recognized segment: dropped
        (6, "https://a.com/zz/art/x"),     # unrecognized lang code: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = [tuple(r) for r in bitext_candidates(
        df, "doc_id", "url", langs=["de", "en", "fr"]).collect()]
    assert got == [("https://a.com/_/art/x", "de", 2, "en", 1)]


def test_bitext_candidates_pairs_all_lang_combos(spark):
    from json_schema_spark.operators.textstats import bitext_candidates

    rows = [(i, f"https://s.com/{lang}/p/1")
            for i, lang in enumerate(["de", "en", "fr"])]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {(r.lang_a, r.lang_b) for r in bitext_candidates(
        df, "doc_id", "url", langs=["de", "en", "fr"]).collect()}
    # one unordered pair per language combination, lang_a < lang_b
    assert got == {("de", "en"), ("de", "fr"), ("en", "fr")}


# ---------------------------------------------------------------------------
# lang_confusion: lang_id prediction vs metadata label
# ---------------------------------------------------------------------------

def test_lang_confusion_hand_fixture(spark):
    from json_schema_spark.operators.textstats import lang_confusion

    rows = [
        (1, "the cat is in the house and it is big", "en"),   # -> en
        (2, "der hund ist nicht mit der katze", "de"),        # -> de
        (3, "la", "es"),       # fr/es tie: profile order -> fr
        (4, "qqq zzz www", "en"),                             # -> und
        (5, None, "fr"),                                      # dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {(r.label_lang, r.pred_lang): r
           for r in lang_confusion(df, "text", "lang").collect()}
    assert got[("en", "en")].n_docs == 1
    assert got[("en", "und")].n_docs == 1
    assert got[("en", "en")].share == 0.5 and got[("en", "en")].is_match
    assert got[("de", "de")].n_docs == 1 and got[("de", "de")].share == 1.0
    # tie between fr and es profiles resolves to fr (first in order)
    assert got[("es", "fr")].n_docs == 1
    assert not got[("es", "fr")].is_match
    # NULL text never enters the matrix
    assert not any(lbl == "fr" for lbl, _ in got)


def test_bitext_candidates_plan_has_no_nested_loop(spark):
    from json_schema_spark.operators.textstats import bitext_candidates

    df = spark.createDataFrame(
        [(i, f"https://s.com/{l}/p/{i % 3}") for i, l in
         enumerate(["en", "de", "fr"] * 10)],
        "doc_id long, url string")
    out = bitext_candidates(df, "doc_id", "url", langs=["de", "en", "fr"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the pairing self-join is keyed on the normalized URL — never a
    # nested loop or cartesian over candidates
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
