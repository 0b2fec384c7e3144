"""Registered-domain extraction (ffp_spark.domains) — Public Suffix
List semantics pinned against the publicsuffix.org algorithm's own
documented cases (normal / wildcard / exception rules, most-labels
prevailing, implicit * fallback)."""

from __future__ import annotations

from ffp_spark.domains import (
    PSL_SNIPPET,
    domain_link_graph,
    host_domains,
    parse_psl_rules,
)


def _lookup(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return {
        r.host: (r.public_suffix, r.registered_domain)
        for r in host_domains(df).collect()
    }


def test_rule_parsing_classes():
    rows = {r["key"]: r for r in parse_psl_rules(("com", "*.ck", "!www.ck"))}
    assert rows["com"] == {
        "kind": "exact", "key": "com", "rule_labels": 1,
        "ps_labels": 1, "is_exc": False,
    }
    assert rows["ck"]["kind"] == "wild"
    assert rows["ck"]["rule_labels"] == 2  # the * counts as a label
    assert rows["ck"]["ps_labels"] == 2
    assert rows["www.ck"]["is_exc"] and rows["www.ck"]["ps_labels"] == 1


def test_psl_reference_cases(spark):
    # the publicsuffix.org algorithm page's own example families
    got = _lookup(
        spark,
        [
            "example.com",
            "b.example.com",
            "a.b.example.com",
            "example.co.uk",
            "b.example.co.uk",
            "co.uk",
            "uk",
            "www.ck",          # exception beats the *.ck wildcard
            "this.that.ck",    # wildcard: public suffix = that.ck
            "that.ck",         # a wildcard match itself -> no registrable
            "city.kawasaki.jp",
            "test.city.kawasaki.jp",
            "other.kawasaki.jp",
            "example.unknowntld",
        ],
    )
    assert got["example.com"] == ("com", "example.com")
    assert got["b.example.com"] == ("com", "example.com")
    assert got["a.b.example.com"] == ("com", "example.com")
    assert got["example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["b.example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["co.uk"] == ("co.uk", None)
    assert got["uk"] == ("uk", None)
    assert got["www.ck"] == ("ck", "www.ck")
    assert got["this.that.ck"] == ("that.ck", "this.that.ck")
    assert got["that.ck"] == ("that.ck", None)
    # !city.kawasaki.jp: suffix is kawasaki.jp, city.kawasaki.jp registrable
    assert got["city.kawasaki.jp"] == ("kawasaki.jp", "city.kawasaki.jp")
    assert got["test.city.kawasaki.jp"] == ("kawasaki.jp", "city.kawasaki.jp")
    assert got["other.kawasaki.jp"] == ("other.kawasaki.jp", None)
    # implicit * fallback: unknown TLD -> last label is the suffix
    assert got["example.unknowntld"] == ("unknowntld", "example.unknowntld")


def test_case_normalization_and_private_rules(spark):
    got = _lookup(spark, ["WWW.Example.COM", "a.GitHub.IO", "x.blogspot.com"])
    assert got["www.example.com"] == ("com", "example.com")
    # github.io / blogspot.com are rules: each subdomain is its own site
    assert got["a.github.io"] == ("github.io", "a.github.io")
    assert got["x.blogspot.com"] == ("blogspot.com", "x.blogspot.com")


def test_most_labels_prevails_over_shorter(spark):
    # ac.uk (2 labels) must beat uk (1 label) when both match
    got = _lookup(spark, ["dept.uni.ac.uk"])
    assert got["dept.uni.ac.uk"] == ("ac.uk", "uni.ac.uk")


def test_domain_link_graph_quotient_and_suffix_self_key(spark):
    edges = spark.createDataFrame(
        [
            ("a.one.co.uk", "x.site.github.io", 2),
            ("b.one.co.uk", "y.site.github.io", 3),
            ("a.two.co.uk", "github.io", 5),  # bare public suffix target
        ],
        "src_host string, dst_host string, weight long",
    )
    rows = {
        (r.src_domain, r.dst_domain): (r.weight, r.n_host_pairs)
        for r in domain_link_graph(edges).collect()
    }
    assert rows == {
        ("one.co.uk", "site.github.io"): (5, 2),
        ("two.co.uk", "github.io"): (5, 1),  # coalesce-to-self
    }


def test_custom_rules_passthrough(spark):
    df = spark.createDataFrame([("a.b.custom",)], "host string")
    out = host_domains(df, rules=("b.custom",)).collect()[0]
    assert (out.public_suffix, out.registered_domain) == ("b.custom", "a.b.custom")
    assert PSL_SNIPPET  # bundled default stays non-empty


def _psl_lookup_py(host: str, rules):
    """Pure-Python third implementation of the publicsuffix.org
    lookup (string-walk, no lists-of-candidates): independent of both
    the Spark plan and the DuckDB oracle formulation."""
    host = host.lower()
    labels = host.split(".")
    exc_rule = None
    best = None  # (rule_labels, ps_labels)
    for r in rules:
        r = r.lower()
        if r.startswith("!"):
            name = r[1:].split(".")
            if labels[-len(name):] == name:
                exc_rule = (len(name), len(name) - 1)
        elif r.startswith("*."):
            base = r[2:].split(".")
            if len(labels) > len(base) and labels[-len(base):] == base:
                cand = (len(base) + 1, len(base) + 1)
                if best is None or cand[0] > best[0]:
                    best = cand
        else:
            name = r.split(".")
            if labels[-len(name):] == name:
                cand = (len(name), len(name))
                if best is None or cand[0] > best[0]:
                    best = cand
    rule = exc_rule or best or (1, 1)
    ps = rule[1]
    suffix = ".".join(labels[-ps:])
    reg = ".".join(labels[-(ps + 1):]) if len(labels) > ps else None
    return suffix, reg


def test_matches_python_reference_on_generated_matrix(spark):
    """host_domains vs the pure-Python walk over a deterministic
    144-host matrix mixing every TLD in the snippet with 0-3
    subdomain labels and www/case variants."""
    import itertools

    tlds = [
        "com", "co.uk", "uk", "ck", "shop.ck", "www.ck", "kawasaki.jp",
        "city.kawasaki.jp", "x.kawasaki.jp", "github.io", "internal", "jp",
    ]
    subs = ["", "a.", "www.", "B.a.", "deep.b.a.", "WWW.x."]
    stems = ["site", "Example"]
    hosts = [
        f"{s}{stem}.{t}" for s, t, stem in itertools.product(subs, tlds, stems)
    ] + tlds  # bare suffixes too
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r.host: (r.public_suffix, r.registered_domain)
        for r in host_domains(df).collect()
    }
    assert len(got) == len(set(h.lower() for h in hosts))
    for h in hosts:
        assert got[h.lower()] == _psl_lookup_py(h, PSL_SNIPPET), h


def test_domain_link_graph_mixed_case_endpoints(spark):
    # DNS is case-insensitive: mixed-case edge hosts must collapse onto
    # the same (lowercased) domains, never silently drop from the join
    edges = spark.createDataFrame(
        [("A.One.CO.UK", "X.Site.GitHub.IO", 2),
         ("b.one.co.uk", "y.site.github.io", 3)],
        "src_host string, dst_host string, weight long",
    )
    rows = {
        (r.src_domain, r.dst_domain): (r.weight, r.n_host_pairs)
        for r in domain_link_graph(edges).collect()
    }
    assert rows == {("one.co.uk", "site.github.io"): (5, 2)}
