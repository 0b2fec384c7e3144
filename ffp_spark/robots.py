"""robots.txt crawl-policy operator (K82): parse + longest-match filter.

The reference corpus consumes already-fetched pages (S1 is the network
half); this is the policy step every crawl pipeline runs before fetch:
parse each host's robots.txt into (host, ua, allow, prefix) rules and
evaluate URLs against them with the public longest-match semantics
(Google's robots spec, RFC 9309): the most specific (longest) matching
path prefix wins; on a length tie, Allow wins; no matching rule means
allowed.

Wildcards are the RFC 9309 §2.2.3 set: ``*`` matches any byte
sequence anywhere in the pattern, a trailing ``$`` anchors the match
at the end of the path.  Patterns compile to anchored Java regexes
INSIDE the plan (escape regex specials, ``*`` -> ``.*``, trailing
``$`` -> ``$``), evaluated with regexp_like against a column pattern —
rule tables are robots-file-sized, so the per-row regex compile is
bounded by the rule count, never the URL stream.  Precedence is the
RFC's: longest PATTERN text wins (wildcard chars count, the public
Google-spec tiebreak), tie goes to Allow.  Wildcard-free rules keep
the cheap startswith fast path.

Everything is JVM-side DataFrame code — including the PARSER: robots
files are line-oriented with stateful "current User-agent group"
semantics, expressed as posexplode(lines) + a per-host running
last(ua, ignorenulls) window ordered by line number.  No Python in
either path.

Simplifications vs the full RFC (documented contract): one User-agent
per group header (stacked UA lines assign rules to the LAST one),
no Crawl-delay handling; Sitemap lines are consumed by
ffp_spark.sitemaps.sitemap_urls_from_robots, not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) -> (host, ua, allow, prefix) rule rows.

    Lines explode with their position; comments/blank lines drop; the
    group's User-agent is the last UA header at or above each rule
    line (running-window last with ignorenulls — the line-oriented
    state machine as a window function).  Rules before any UA header
    are dropped (spec: rules belong to a group).  Empty Disallow
    (allow-all idiom) is kept as an Allow of prefix '' so it can win
    ties per the tie-goes-to-allow rule.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("ln", "raw"),
    ).select(
        "host",
        "ln",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    ).where(F.col("line") != "")
    parts = lines.select(
        "host",
        "ln",
        F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract("line", "^[^:]+:(.*)$", 1)).alias("val"),
    )
    tagged = parts.select(
        "host",
        "ln",
        F.when(F.col("key") == "user-agent", F.lower("val")).alias("ua_line"),
        F.when(F.col("key").isin("allow", "disallow"), F.col("key")).alias("verb"),
        "val",
    )
    w = (
        Window.partitionBy("host")
        .orderBy("ln")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = tagged.withColumn(
        "ua", F.last("ua_line", ignorenulls=True).over(w)
    )
    return (
        grouped.where(F.col("verb").isNotNull() & F.col("ua").isNotNull())
        .select(
            "host",
            "ua",
            (F.col("verb") == "allow").alias("allow"),
            # empty Disallow == allow-everything idiom
            F.when(
                (F.col("verb") == "disallow") & (F.col("val") == ""), F.lit(True)
            ).otherwise(F.col("verb") == "allow").alias("allow_eff"),
            F.col("val").alias("prefix"),
        )
        .select("host", "ua", F.col("allow_eff").alias("allow"), "prefix")
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    user_agent: str,
    url_col: str = "url",
) -> DataFrame:
    """urls + (host, path) + ``allowed`` under ``user_agent``.

    Group selection per RFC: if the host has ANY rule for the exact
    agent, only that group applies; otherwise the '*' group; otherwise
    everything is allowed.  Winner among matching prefixes =
    max(struct(len(prefix), allow)) — longest match first, tie goes
    to Allow.  Plan shape: one host-keyed join URL->rules (rule tables
    are robots-file-sized, broadcastable), one (url)-keyed max-agg —
    no windows over the URL stream.
    """
    ua = user_agent.lower()
    u = urls.select(
        "*",
        F.regexp_extract(url_col, r"^[a-z]+://([^/]+)", 1).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract(url_col, r"^[a-z]+://[^/]+(/.*)$", 1), F.lit("")),
            F.lit("/"),
        ).alias("path"),
    )
    # RFC 9309 wildcard compilation, all JVM expressions: a trailing $
    # anchors, * becomes .*, every other regex special is escaped
    ends_dollar = F.col("prefix").endswith("$")
    core = F.when(
        ends_dollar, F.expr("substring(prefix, 1, length(prefix) - 1)")
    ).otherwise(F.col("prefix"))
    esc = F.regexp_replace(core, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    rx = F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(ends_dollar, F.lit("$")).otherwise(F.lit("")),
    )
    has_wild = F.col("prefix").contains("*") | ends_dollar
    # per host: does an exact-agent group exist?
    has_exact = (
        rules.where(F.col("ua") == ua)
        .select("host")
        .distinct()
        .withColumn("_exact", F.lit(True))
    )
    applicable = (
        rules.where(F.col("ua").isin(ua, "*"))
        .join(has_exact, "host", "left")
        .where(
            ((F.col("_exact").isNotNull()) & (F.col("ua") == ua))
            | ((F.col("_exact").isNull()) & (F.col("ua") == "*"))
        )
        .select(
            "host",
            "allow",
            "prefix",
            has_wild.alias("_wild"),
            rx.alias("_rx"),
        )
    )
    # wildcard rules match through their compiled regex; plain rules
    # keep the startswith fast path (startswith('') is already true,
    # which covers the empty-Disallow idiom)
    cand = u.join(F.broadcast(applicable), "host", "left").where(
        F.col("prefix").isNull()
        | F.when(F.col("_wild"), F.expr("regexp_like(path, _rx)")).otherwise(
            F.col("path").startswith(F.col("prefix"))
        )
    )
    verdict = (
        cand.groupBy(url_col)
        .agg(
            F.max(
                F.when(
                    F.col("prefix").isNotNull(),
                    F.struct(
                        F.length("prefix").alias("l"), F.col("allow").alias("a")
                    ),
                )
            ).alias("win")
        )
        .select(
            url_col,
            F.coalesce(F.col("win.a"), F.lit(True)).alias("allowed"),
        )
    )
    # left join + default: a URL whose every rule row failed the prefix
    # filter never reaches the verdict agg, and no-rule means allowed
    return u.join(verdict, url_col, "left").withColumn(
        "allowed", F.coalesce("allowed", F.lit(True))
    )


def parse_crawl_delays(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) -> (host, ua, delay_ms) from ``Crawl-delay``
    lines — the de-facto politeness knob most large sites publish
    (not in RFC 9309, honored by most commercial crawlers; the
    frontier's wave scheduler consumes it as the per-host pacing
    input).  Same line machinery and running-UA-group window as
    parse_robots; fractional seconds parse (``0.5`` -> 500 ms) via
    try_cast, junk or negative values yield a NULL delay ROW (the
    directive existed; its value was bad — callers decide the
    default), delays before any User-agent header drop."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("ln", "raw"),
    ).select(
        "host",
        "ln",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    ).where(F.col("line") != "")
    parts = lines.select(
        "host",
        "ln",
        F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract("line", "^[^:]+:(.*)$", 1)).alias("val"),
    )
    tagged = parts.select(
        "host",
        "ln",
        F.when(F.col("key") == "user-agent", F.lower("val")).alias("ua_line"),
        (F.col("key") == "crawl-delay").alias("is_delay"),
        "val",
    )
    w = (
        Window.partitionBy("host")
        .orderBy("ln")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = tagged.withColumn(
        "ua", F.last("ua_line", ignorenulls=True).over(w)
    )
    secs = F.expr("try_cast(val AS DOUBLE)")
    delay = F.when(secs >= 0, F.round(secs * 1000).cast("long"))
    return (
        grouped.where(F.col("is_delay") & F.col("ua").isNotNull())
        .select("host", "ua", delay.alias("delay_ms"))
    )
