"""robots.txt crawl-policy operator (ffp_spark.robots, K82)."""

from __future__ import annotations

from ffp_spark.robots import parse_robots, robots_allowed


def _rules(spark, host, body):
    return parse_robots(
        spark.createDataFrame([(host, body)], "host string, body string")
    )


def _verdicts(spark, rules, urls, ua="bot"):
    u = spark.createDataFrame([(x,) for x in urls], "url string")
    return {r.url: r.allowed for r in robots_allowed(u, rules, ua).collect()}


def test_longest_match_wins_and_tie_goes_to_allow(spark):
    body = "User-agent: *\nDisallow: /a\nAllow: /a/b\nAllow: /p\nDisallow: /p"
    rules = _rules(spark, "h.example", body)
    got = _verdicts(spark, rules, [
        "https://h.example/a/x",      # /a disallow wins
        "https://h.example/a/b/c",    # longer /a/b allow wins
        "https://h.example/p",        # same-length tie -> allow
        "https://h.example/other",    # no match -> allowed
    ])
    assert got == {
        "https://h.example/a/x": False,
        "https://h.example/a/b/c": True,
        "https://h.example/p": True,
        "https://h.example/other": True,
    }


def test_exact_agent_group_overrides_star(spark):
    body = (
        "# global lockdown\nUser-agent: *\nDisallow: /\n\n"
        "User-agent: goodbot\nDisallow: /secret\n"
    )
    rules = _rules(spark, "h.example", body)
    good = _verdicts(spark, rules, [
        "https://h.example/ok", "https://h.example/secret/x"
    ], ua="GoodBot")  # case-insensitive agent match
    other = _verdicts(spark, rules, ["https://h.example/ok"], ua="evilbot")
    assert good == {
        "https://h.example/ok": True,
        "https://h.example/secret/x": False,
    }
    assert other == {"https://h.example/ok": False}


def test_empty_disallow_is_allow_all_and_headerless_rules_drop(spark):
    # rules before any User-agent header are dropped per spec
    body = "Disallow: /orphan\nUser-agent: *\nDisallow:\n"
    rules = _rules(spark, "h.example", body)
    got = _verdicts(spark, rules, [
        "https://h.example/orphan/x", "https://h.example/any"
    ])
    assert got == {
        "https://h.example/orphan/x": True,
        "https://h.example/any": True,
    }


def test_unknown_host_defaults_to_allowed(spark):
    rules = _rules(spark, "h.example", "User-agent: *\nDisallow: /")
    got = _verdicts(spark, rules, ["https://other.example/x"])
    assert got == {"https://other.example/x": True}
