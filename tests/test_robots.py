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


def test_wildcard_url_matching_google_spec_table(spark):
    """The published Google robots-spec URL-matching example table
    (RFC 9309 §2.2.3 semantics): one Disallow rule per host, so each
    URL's verdict IS the match result."""
    cases = {
        # pattern -> (matching paths, non-matching paths)
        "/fish": (
            ["/fish", "/fish.html", "/fishheads", "/fish/salmon.html",
             "/fish.php?id=anything"],
            ["/Fish.asp", "/catfish", "/?id=fish"],
        ),
        "/fish*": (
            ["/fish", "/fishheads/yummy.html", "/fish.php?id=anything"],
            ["/Fish.asp", "/catfish"],
        ),
        "/fish/": (
            ["/fish/", "/fish/salmon.htm", "/fish/?id=anything"],
            ["/fish", "/fish.html", "/animals/fish/"],
        ),
        "/*.php": (
            ["/index.php", "/filename.php", "/folder/filename.php",
             "/folder/filename.php?parameters", "/folder/any.php.file.html",
             "/filename.php/"],
            ["/", "/windows.PHP"],
        ),
        "/*.php$": (
            ["/filename.php", "/folder/filename.php"],
            ["/filename.php?parameters", "/filename.php/", "/filename.php5",
             "/windows.PHP"],
        ),
        "/fish*.php": (
            ["/fish.php", "/fishheads/catfish.php?parameters"],
            ["/Fish.PHP"],
        ),
    }
    hosts, urls, expected = [], [], {}
    for i, (pat, (hit, miss)) in enumerate(sorted(cases.items())):
        host = f"w{i}.example"
        hosts.append((host, f"User-agent: *\nDisallow: {pat}"))
        for p in hit:
            u = f"https://{host}{p}"
            urls.append(u)
            expected[u] = False  # matched Disallow
        for p in miss:
            u = f"https://{host}{p}"
            urls.append(u)
            expected[u] = True  # unmatched -> allowed
    rules = parse_robots(
        spark.createDataFrame(hosts, "host string, body string")
    )
    got = _verdicts(spark, rules, urls)
    assert got == expected


def test_wildcard_precedence_google_spec_table(spark):
    """The spec's order-of-precedence examples involving wildcards:
    longest pattern text wins (wildcards count), tie goes to Allow."""
    cases = [
        ("User-agent: *\nAllow: /p\nDisallow: /", "/page", True),
        ("User-agent: *\nAllow: /folder\nDisallow: /folder", "/folder/page", True),
        ("User-agent: *\nAllow: /page\nDisallow: /*.htm", "/page.htm", False),
        ("User-agent: *\nAllow: /$\nDisallow: /", "/", True),
        ("User-agent: *\nAllow: /$\nDisallow: /", "/page.htm", False),
    ]
    hosts, urls, expected = [], [], {}
    for i, (body, path, allowed) in enumerate(cases):
        host = f"p{i}.example"
        hosts.append((host, body))
        u = f"https://{host}{path}"
        urls.append(u)
        expected[u] = allowed
    rules = parse_robots(
        spark.createDataFrame(hosts, "host string, body string")
    )
    got = _verdicts(spark, rules, urls)
    assert got == expected


class TestCrawlDelays:
    def test_group_state_fractional_and_junk(self, spark):
        from ffp_spark.robots import parse_crawl_delays

        body = "\n".join(
            [
                "Crawl-delay: 9",  # before any UA header -> dropped
                "User-agent: *",
                "Crawl-delay: 2",
                "# Crawl-delay: 99 (commented)",
                "User-agent: slowbot",
                "Crawl-delay: 0.5",
                "User-agent: junkbot",
                "Crawl-delay: fast",  # junk -> NULL delay ROW survives
                "Crawl-delay: -3",    # negative -> NULL
            ]
        )
        robots = spark.createDataFrame(
            [("h.example", body)], "host string, body string"
        )
        got = [
            (r.ua, r.delay_ms)
            for r in parse_crawl_delays(robots).orderBy("ua", "delay_ms").collect()
        ]
        assert got == [
            ("*", 2000),
            ("junkbot", None),
            ("junkbot", None),
            ("slowbot", 500),
        ]
