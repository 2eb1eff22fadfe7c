"""robots.txt crawl-politeness filtering — parse per-host robots.txt
text into (agent-scoped) Allow/Disallow prefix rules, then apply the
longest-match verdict to URLs (Google REP semantics on the literal-
prefix subset: longest matching rule wins, Allow beats Disallow on a
length tie, no matching rule means allowed; `*`/`$` wildcard rules are
out of scope and documented so — the fixture never emits them, and a
deployment that needs them would escalate the match lambda, not the
plan shape).

Spark shape (100 TB posture): robots.txt files are bounded (the REP
caps them at 500 KiB; rule counts in the low thousands), so the
per-host rule sets aggregate into ONE broadcast-sized array table.
URLs take a single broadcast hash join on host — the 10^12-row side
NEVER shuffles — and the longest-match winner is a higher-order
`filter` + `array_max` over the joined rule array: pure codegen, zero
exchanges beyond the broadcast.

Parsing is itself declarative: lines posexplode, the governing
User-agent for each line is a running `last(..., ignorenulls)` window
over line order per host — the sequential-state-over-lines semantics
expressed as a window, not a UDF. Multi-agent group headers (two
consecutive User-agent lines sharing one rule block) are simplified to
last-agent-wins, documented.

Reference seam: like the blocklist and noindex gates
(textstats/html_extract), this is an upstream web-governance stage the
validation engine needs so that `documents` only ever holds pages a
polite crawler may fetch; the reference validates what it is handed
(validators.lisp dispatch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["parse_robots", "robots_verdict"]

_DIRECTIVE_RX = r"^\s*([A-Za-z-]+)\s*:\s*(\S*)"


def parse_robots(
    robots: DataFrame, host_col: str = "host",
    robots_col: str = "robots", agent: str = "*",
) -> DataFrame:
    """(host, robots text) -> one row per Allow/Disallow rule governed
    by ``agent``: (host, rule_type, prefix, rule_len, allow).  Empty
    prefixes (``Disallow:`` = nothing disallowed) drop out, comment
    lines and unknown directives are ignored."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\n"))
        .alias("line_no", "line"),
    )
    directive = F.lower(F.regexp_extract("line", _DIRECTIVE_RX, 1))
    value = F.regexp_extract("line", _DIRECTIVE_RX, 2)
    tagged = lines.select(
        "host", "line_no", directive.alias("d"), value.alias("v"),
        F.when(directive == "user-agent", value).alias("ua"),
    )
    w = (Window.partitionBy("host").orderBy("line_no")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    scoped = tagged.withColumn("scope", F.last("ua", ignorenulls=True).over(w))
    return (
        scoped.where(F.col("d").isin("allow", "disallow")
                     & (F.col("scope") == agent) & (F.col("v") != ""))
        .select(
            "host", F.col("d").alias("rule_type"),
            F.col("v").alias("prefix"),
            F.length("v").alias("rule_len"),
            (F.col("d") == "allow").cast("int").alias("allow"),
        )
    )


def robots_verdict(
    urls: DataFrame, rules: DataFrame, host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Longest-match REP verdict per URL row: input plus
    (matched_len, allowed).  Rules aggregate per host and BROADCAST;
    the URL side takes one hash join and a higher-order
    filter/array_max — zero shuffles of the corpus."""
    host_rules = rules.groupBy("host").agg(
        F.collect_list(
            F.struct("rule_len", "allow", "prefix")).alias("__rules"))
    j = urls.join(F.broadcast(host_rules),
                  urls[host_col] == host_rules["host"], "left") \
            .drop(host_rules["host"])
    p = F.col(path_col)
    matches = F.filter(
        F.coalesce(F.col("__rules"),
                   F.array().cast("array<struct<rule_len:int,allow:int,prefix:string>>")),
        lambda r: F.startswith(p, r["prefix"]),
    )
    # struct max: longest rule first; on a length tie Allow (1) beats
    # Disallow (0) — exactly the REP tie-break
    win = F.array_max(matches)
    return (
        j.withColumn("matched_len",
                     F.coalesce(win["rule_len"], F.lit(0)).cast("long"))
        .withColumn("allowed", win.isNull() | (win["allow"] == 1))
        .drop("__rules")
    )
