"""Registered-domain (eTLD+1) extraction: hosts -> public suffix +
registrable domain via Public Suffix List semantics.

Every crawl-scale rollup that says "per site" means the REGISTRABLE
domain, not the host: news.bbc.co.uk and www.bbc.co.uk are one site
(bbc.co.uk), a.blogspot.com and b.blogspot.com are different sites if
the suffix list says so.  The reference has no notion of this (it
parses one feed at a time); at 100 TB of crawl the host->domain
quotient is what per-source caps, politeness budgets, and the public
host-webgraph's domain-level cousin are keyed on.

Algorithm = the published publicsuffix.org lookup contract:

* a NORMAL rule matches a host whose trailing labels equal the rule;
* a WILDCARD rule ``*.base`` matches any host with >= 1 extra label
  ending in ``base`` (public suffix = one label more than ``base``);
* an EXCEPTION rule ``!name`` beats everything it matches and its
  public suffix is ``name`` minus the leftmost label;
* otherwise the prevailing rule is the MATCHING rule with the most
  labels; no match at all falls back to ``*`` (suffix = last label);
* registrable domain = public suffix + one more label, NULL when the
  host IS a public suffix.

Spark shape (designed for the 100 TB tier): rules are a file-sized
table -> one BROADCAST equi-join.  Each distinct host explodes into
at most ``max_rule_labels`` candidate suffixes (a bounded, map-side
Generate — never a cross join), each candidate carries an exact and
a wildcard join key, the prevailing rule is one max(struct) aggregate
keyed on the host, and the suffix/domain slices are codegen array
expressions.  Zero Python rows; the only shuffle is the per-host agg.

The bundled rule set below is a deterministic SUBSET of the real
(public, CC-licensed) list — enough to exercise every rule class;
``host_domains(rules=...)`` accepts the full list verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Subset of the publicsuffix.org list (public data), chosen to cover
# every rule class: plain TLDs, 2-label rules, wildcard + exception
# pairs (the `ck` and `kawasaki.jp` entries are the list's own
# canonical examples).
PSL_SNIPPET: tuple[str, ...] = (
    "com",
    "net",
    "org",
    "edu",
    "gov",
    "io",
    "co",
    "uk",
    "co.uk",
    "org.uk",
    "ac.uk",
    "gov.uk",
    "jp",
    "co.jp",
    "ne.jp",
    "or.jp",
    "*.kawasaki.jp",
    "!city.kawasaki.jp",
    "ck",
    "*.ck",
    "!www.ck",
    "us",
    "de",
    "fr",
    "au",
    "com.au",
    "org.au",
    "br",
    "com.br",
    "github.io",
    "blogspot.com",
)


def parse_psl_rules(rules: tuple[str, ...] = PSL_SNIPPET) -> list[dict]:
    """PSL text rules -> join-table rows.

    Each row: ``kind`` ('exact' for normal/exception rules keyed on
    the full rule text, 'wild' for ``*.base`` keyed on the base),
    ``key`` (the equi-join key a candidate suffix must equal),
    ``rule_labels`` (label count INCLUDING the ``*`` — the PSL's
    prevailing-rule tiebreak), ``ps_labels`` (labels in the public
    suffix this rule yields), ``is_exc``."""
    out: list[dict] = []
    for r in rules:
        r = r.strip().lower()
        if not r or r.startswith("//"):
            continue
        if r.startswith("!"):
            name = r[1:]
            n = name.count(".") + 1
            out.append(
                {
                    "kind": "exact",
                    "key": name,
                    "rule_labels": n,
                    "ps_labels": n - 1,
                    "is_exc": True,
                }
            )
        elif r.startswith("*."):
            base = r[2:]
            n = base.count(".") + 1
            out.append(
                {
                    "kind": "wild",
                    "key": base,
                    "rule_labels": n + 1,
                    "ps_labels": n + 1,
                    "is_exc": False,
                }
            )
        else:
            n = r.count(".") + 1
            out.append(
                {
                    "kind": "exact",
                    "key": r,
                    "rule_labels": n,
                    "ps_labels": n,
                    "is_exc": False,
                }
            )
    return out


def psl_rules_df(spark: SparkSession, rules: tuple[str, ...] = PSL_SNIPPET) -> DataFrame:
    return spark.createDataFrame(
        parse_psl_rules(rules),
        "kind string, key string, rule_labels int, ps_labels int, is_exc boolean",
    )


def host_domains(
    hosts: DataFrame,
    host_col: str = "host",
    rules: tuple[str, ...] = PSL_SNIPPET,
) -> DataFrame:
    """Distinct hosts -> (host, public_suffix, registered_domain).

    One row per distinct input host (callers join the map back on the
    host key — hosts are orders of magnitude fewer than URLs, and the
    map reuses across every per-site rollup in the run).  NULL
    ``registered_domain`` marks a host that IS a public suffix."""
    spark = hosts.sparkSession
    rule_rows = parse_psl_rules(rules)
    max_k = max(r["rule_labels"] for r in rule_rows)
    rules_df = psl_rules_df(spark, rules)

    h = (
        hosts.select(F.lower(F.col(host_col)).alias("host"))
        .where(F.col("host").isNotNull() & (F.col("host") != ""))
        .distinct()
    )
    base = h.select(
        "host",
        F.split("host", r"\.").alias("ls"),
        F.size(F.split("host", r"\.")).alias("n"),
    )
    # Candidate suffixes: the last k labels for k = 1..min(n, max_k).
    # An 'exact' candidate can match normal/exception rules outright;
    # a 'wild' candidate is the BASE of a wildcard rule, so it needs
    # at least one extra label to its left (n > k).
    cand = (
        base.select(
            "host",
            "ls",
            "n",
            F.explode(
                F.sequence(F.lit(1), F.least(F.col("n"), F.lit(max_k)))
            ).alias("k"),
        )
        .withColumn(
            "suffix",
            F.array_join(
                F.slice(F.col("ls"), F.col("n") - F.col("k") + 1, F.col("k")),
                ".",
            ),
        )
        .select(
            "host",
            "k",
            "suffix",
            F.explode(F.array(F.lit("exact"), F.lit("wild"))).alias("kind"),
        )
        .where((F.col("kind") == "exact") | (F.col("n") > F.col("k")))
    )
    matched = cand.join(
        F.broadcast(rules_df),
        on=[
            cand["kind"] == rules_df["kind"],
            cand["suffix"] == rules_df["key"],
        ],
    )
    # Prevailing rule per host: exceptions first, then most labels
    # (struct max is the keep-first idiom — no window, partial-aggs
    # map-side).
    prevailing = matched.groupBy("host").agg(
        F.max(
            F.struct(
                F.col("is_exc").cast("int").alias("exc"),
                F.col("rule_labels").alias("rl"),
                F.col("ps_labels").alias("ps"),
            )
        ).alias("m")
    )
    out = base.join(prevailing, "host", "left").select(
        "host",
        "ls",
        "n",
        F.coalesce(F.col("m.ps"), F.lit(1)).alias("ps"),
    )
    return out.select(
        "host",
        F.array_join(
            F.slice(F.col("ls"), F.col("n") - F.col("ps") + 1, F.col("ps")), "."
        ).alias("public_suffix"),
        F.when(
            F.col("n") > F.col("ps"),
            F.array_join(
                F.slice(
                    F.col("ls"), F.col("n") - F.col("ps"), F.col("ps") + 1
                ),
                ".",
            ),
        ).alias("registered_domain"),
    )


def domain_link_graph(
    host_edges: DataFrame,
    rules: tuple[str, ...] = PSL_SNIPPET,
) -> DataFrame:
    """Host-level edges (src_host, dst_host, weight) -> the
    registrable-domain quotient (src_domain, dst_domain, weight,
    n_host_pairs): the domain-level web graph every per-site policy
    is actually keyed on.  Hosts that ARE a public suffix keep
    themselves as the key (coalesce — a crawl of ``github.io`` root
    pages should not vanish into NULL).

    Plan: ONE distinct-host map (host_domains — bounded candidate
    explode + broadcast rule join) computed from both endpoint
    columns at once, joined back twice on the host key, then a
    (src_domain, dst_domain) re-agg with map-side partials.  The
    domain map is host-distinct — orders of magnitude smaller than
    the edge table it re-keys."""
    # DNS names are case-insensitive and host_domains keys are
    # lowercased — normalize the endpoints ONCE so mixed-case edge
    # hosts can never silently drop out of the inner joins
    host_edges = host_edges.withColumn(
        "src_host", F.lower("src_host")
    ).withColumn("dst_host", F.lower("dst_host"))
    hosts = (
        host_edges.select(F.col("src_host").alias("host"))
        .union(host_edges.select(F.col("dst_host").alias("host")))
    )
    dmap = host_domains(hosts, rules=rules).select(
        "host", F.coalesce("registered_domain", "host").alias("domain")
    )
    e = (
        host_edges.join(
            dmap.select(
                F.col("host").alias("src_host"),
                F.col("domain").alias("src_domain"),
            ),
            "src_host",
        )
        .join(
            dmap.select(
                F.col("host").alias("dst_host"),
                F.col("domain").alias("dst_domain"),
            ),
            "dst_host",
        )
    )
    return e.groupBy("src_domain", "dst_domain").agg(
        F.sum("weight").alias("weight"),
        F.count("*").alias("n_host_pairs"),
    )
