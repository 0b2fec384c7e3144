"""Crawl-frontier scheduler (ffp_spark.frontier): politeness waves +
recrawl staleness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ffp_spark.frontier import recrawl_priority, schedule_waves


def test_waves_cap_per_host_and_follow_priority(spark):
    rows = [
        (f"https://hot.example/p{i}", float(i % 10) / 10) for i in range(25)
    ] + [("https://cold.example/only", 0.5)]
    df = spark.createDataFrame(rows, "url string, priority double")
    out = schedule_waves(df, per_host=8).collect()
    by_host: dict[str, list] = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    # politeness: no wave exceeds per_host for any host
    for host, rs in by_host.items():
        waves: dict[int, int] = {}
        for r in rs:
            waves[r.wave] = waves.get(r.wave, 0) + 1
        assert all(n <= 8 for n in waves.values()), (host, waves)
    assert {r.wave for r in by_host["hot.example"]} == {0, 1, 2, 3}
    assert [r.wave for r in by_host["cold.example"]] == [0]
    # priority order: wave 0 of the hot host holds the 8 highest
    # priorities under (priority desc, url asc)
    hot = sorted(
        by_host["hot.example"], key=lambda r: (-r.priority, r.url)
    )
    assert all(r.wave == i // 8 for i, r in enumerate(hot))


def test_waves_reject_nonpositive_per_host(spark):
    df = spark.createDataFrame([("https://a.example/x",)], "url string")
    with pytest.raises(ValueError):
        schedule_waves(df, per_host=0)


def test_waves_plan_has_no_global_exchange(spark):
    # the politeness window partitions by host: a frontier of any size
    # must never cross an Exchange SinglePartition
    df = spark.range(1000).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 50).cast("string"),
            F.lit(".example/p"), F.col("id").cast("string"),
        ).alias("url")
    )
    out = schedule_waves(df, per_host=4)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange SinglePartition" not in final, final[:2000]


def test_recrawl_staleness_ladder(spark):
    df = spark.createDataFrame(
        [
            ("https://a.example/hourly", "2020-01-01T00:00:00Z", "hourly"),
            ("https://a.example/daily", "2020-01-01T00:00:00Z", "daily"),
            ("https://a.example/fresh-daily", "2020-01-02T18:00:00Z", "daily"),
            ("https://a.example/unlabeled", "2020-01-01T00:00:00Z", None),
            ("https://a.example/never-seen", None, "daily"),
        ],
        "url string, lastmod string, changefreq string",
    )
    out = {
        r.url.rsplit("/", 1)[-1]: r.staleness_q
        for r in recrawl_priority(df, as_of="2020-01-03T00:00:00Z").collect()
    }
    assert out["hourly"] == 48_000  # 48h overdue on a 1h ladder
    assert out["daily"] == 2_000  # two nominal days
    assert out["fresh-daily"] == 250  # 6h into a 24h interval
    assert out["unlabeled"] == round(48 / 168 * 1000)  # weekly default
    assert out["never-seen"] == (1 << 31) - 1  # maximally stale


def test_discover_frontier_end_to_end(spark):
    """Sitemaps -> robots -> staleness -> waves as one composed plan."""
    from ffp_spark.frontier import discover_frontier

    ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    def urlset(host, ids, freq):
        entries = "".join(
            f"<url><loc>https://{host}/p/{i}</loc>"
            f"<lastmod>2020-01-0{1 + i % 5}</lastmod>"
            f"<changefreq>{freq}</changefreq></url>"
            for i in ids
        )
        return f"<urlset {ns}>{entries}</urlset>".encode()

    index = (
        f'<sitemapindex {ns}>'
        '<sitemap><loc>https://a.example/sm-1.xml</loc></sitemap>'
        '</sitemapindex>'
    ).encode()
    sitemaps = spark.createDataFrame(
        [
            ("https://a.example/sitemap.xml", index),
            ("https://a.example/sm-1.xml", urlset("a.example", range(10), "daily")),
            ("https://b.example/sitemap.xml", urlset("b.example", range(6), "hourly")),
        ],
        "url string, body binary",
    )
    robots = spark.createDataFrame(
        [
            ("a.example", "User-agent: *\nDisallow: /p/3"),  # blocks /p/3 only
            ("b.example", "User-agent: *\nDisallow:"),
        ],
        "host string, body string",
    )
    out = discover_frontier(
        sitemaps, robots, as_of="2020-01-10T00:00:00Z", per_host=4
    ).collect()
    urls = {r.url for r in out}
    assert "https://a.example/p/3" not in urls  # robots filter applied
    assert len(urls) == 9 + 6
    a_rows = sorted(
        (r for r in out if r.host == "a.example"),
        key=lambda r: (-r.staleness_q, r.url),
    )
    # waves follow the staleness-desc order, 4 per wave per host
    assert [r.wave for r in a_rows] == [i // 4 for i in range(len(a_rows))]
    # index lineage survived the composition
    assert all(
        r.via_index == "https://a.example/sitemap.xml"
        for r in out
        if r.host == "a.example"
    )
    assert all(r.via_index is None for r in out if r.host == "b.example")
    # hourly ladder makes b.example's pages far staler than a's daily
    assert min(r.staleness_q for r in out if r.host == "b.example") > max(
        r.staleness_q for r in out if r.host == "a.example"
    )


class TestCaptureDelta:
    def _delta(self, spark, old_rows, new_rows):
        from ffp_spark.frontier import capture_delta

        schema = "url string, digest string"
        old = spark.createDataFrame(old_rows, schema)
        new = spark.createDataFrame(new_rows, schema)
        return {
            r.key: r.status for r in capture_delta(old, new).collect()
        }

    def test_all_four_statuses(self, spark):
        got = self._delta(
            spark,
            [("u1", "d1"), ("u2", "d2"), ("u3", "d3")],
            [("u2", "d2"), ("u3", "dX"), ("u4", "d4")],
        )
        assert got == {
            "u1": "removed",
            "u2": "unchanged",
            "u3": "changed",
            "u4": "added",
        }

    def test_null_digest_is_presence_not_absence(self, spark):
        """A capture row with a NULL digest is PRESENT: it must never
        classify as added/removed, and NULL-vs-NULL is unchanged."""
        got = self._delta(
            spark,
            [("u1", None), ("u2", None), ("u3", "d3")],
            [("u1", None), ("u2", "now"), ("u3", None)],
        )
        assert got == {
            "u1": "unchanged",
            "u2": "changed",
            "u3": "changed",
        }


class TestResolveRedirects:
    def _resolve(self, spark, rows, max_hops=4):
        from ffp_spark.frontier import resolve_redirects

        caps = spark.createDataFrame(
            rows, "url string, http_status int, location string"
        )
        return {
            r.url: (r.final_url, r.n_hops, r.resolved)
            for r in resolve_redirects(caps, max_hops=max_hops).collect()
        }

    def test_chain_collapses_to_final(self, spark):
        got = self._resolve(
            spark,
            [
                ("a", 301, "b"),
                ("b", 302, "c"),
                ("c", 200, None),
                ("d", 200, None),
            ],
        )
        assert got["a"] == ("c", 2, True)
        assert got["b"] == ("c", 1, True)
        assert got["c"] == ("c", 0, True)
        assert got["d"] == ("d", 0, True)

    def test_loop_hits_hop_budget_unresolved(self, spark):
        got = self._resolve(
            spark, [("a", 301, "b"), ("b", 301, "a")], max_hops=3
        )
        # 3 hops from a: b -> a -> b; still on a redirecting capture
        assert got["a"] == ("b", 3, False)
        assert got["b"] == ("a", 3, False)

    def test_dangling_location_resolves_outside_set(self, spark):
        """A Location pointing outside the capture set ends the chain
        (resolved: the cursor no longer redirects)."""
        got = self._resolve(spark, [("a", 308, "https://gone.example/")])
        assert got["a"] == ("https://gone.example/", 1, True)

    def test_non_redirect_3xx_without_location_stays(self, spark):
        got = self._resolve(spark, [("a", 301, None), ("b", 304, "x"),
                                    ("x", 200, None)])
        # no Location -> not a redirect row; 304 is not a redirect status
        assert got["a"] == ("a", 0, True)
        assert got["b"] == ("b", 0, True)


class TestCaptureRevisits:
    def test_first_by_ts_then_url_is_response(self, spark):
        from ffp_spark.frontier import capture_revisits

        caps = spark.createDataFrame(
            [
                # same digest across two URLs + a recrawl of the first
                ("https://a/", 100, "d1"),
                ("https://mirror/", 100, "d1"),  # ts tie -> url breaks it
                ("https://a/", 200, "d1"),
                # unique digest
                ("https://b/", 150, "d2"),
            ],
            "url string, ts long, digest string",
        )
        got = {
            (r.url, r.ts): (r.kind, r.refers_to_url, r.refers_to_ts)
            for r in capture_revisits(caps).collect()
        }
        assert got == {
            ("https://a/", 100): ("response", None, None),
            ("https://mirror/", 100): ("revisit", "https://a/", 100),
            ("https://a/", 200): ("revisit", "https://a/", 100),
            ("https://b/", 150): ("response", None, None),
        }

    def test_no_window_in_plan(self, spark):
        from ffp_spark.frontier import capture_revisits

        caps = spark.createDataFrame(
            [("https://a/", 1, "d")], "url string, ts long, digest string"
        )
        plan = capture_revisits(caps)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan  # keep-first is an agg, not a window sort


class TestAllocateBudget:
    def test_conservation_and_python_reference(self, spark):
        from ffp_spark.frontier import allocate_budget

        rows = [(f"d{i}", 1 + (i * 7) % 13) for i in range(40)]
        df = spark.createDataFrame(rows, "domain string, score long")
        got = {r.domain: r.alloc for r in allocate_budget(df, 997).collect()}
        assert sum(got.values()) == 997  # exact conservation
        # pure-Python Hamilton reference
        S = sum(s for _, s in rows)
        base = {k: 997 * s // S for k, s in rows}
        left = 997 - sum(base.values())
        order = sorted(rows, key=lambda t: (-((997 * t[1]) % S), t[0]))
        extras = {k for k, _ in order[:left]}
        assert got == {k: base[k] + (k in extras) for k, _ in rows}

    def test_zero_scores_get_nothing_unless_remainder(self, spark):
        from ffp_spark.frontier import allocate_budget

        df = spark.createDataFrame(
            [("a", 3), ("b", 0), ("c", 1)], "domain string, score long"
        )
        got = {r.domain: r.alloc for r in allocate_budget(df, 8).collect()}
        # S=4: a=6, c=2 exactly; zero-score b has rem 0 -> gets 0
        assert got == {"a": 6, "b": 0, "c": 2}

    def test_two_phase_rank_plan(self, spark):
        from ffp_spark.frontier import allocate_budget

        df = spark.createDataFrame(
            [(f"d{i}", i + 1) for i in range(10)], "domain string, score long"
        )
        plan = (
            allocate_budget(df, 100)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the per-row rank window must stay bucket-partitioned; only
        # the bounded bucket-totals window may funnel to one partition
        assert "Window [" in plan
        assert plan.count("row_number()") == 1


class TestPolitenessSchedule:
    def test_group_selection_default_and_pacing(self, spark):
        from ffp_spark.frontier import politeness_schedule

        urls = spark.createDataFrame(
            [(f"https://{h}.example/u/{i}",) for h in ("a", "b", "c")
             for i in range(4)],
            "url string",
        )
        robots = spark.createDataFrame(
            [
                # a: exact group wins over * (2s, not 9s)
                ("a.example", "User-agent: *\nCrawl-delay: 9\n"
                              "User-agent: ffpbot\nCrawl-delay: 2"),
                # b: only * group applies (3s)
                ("b.example", "User-agent: *\nCrawl-delay: 3"),
                # c: no robots row at all -> default
            ],
            "host string, body string",
        )
        sched = politeness_schedule(urls, robots, per_host=2,
                                    default_delay_ms=500)
        got = {
            (r.host, r.wave): (r.delay_ms, r.fetch_offset_ms)
            for r in sched.collect()
        }
        assert got[("a.example", 0)] == (2000, 0)
        assert got[("a.example", 1)] == (2000, 2000)
        assert got[("b.example", 1)] == (3000, 3000)
        assert got[("c.example", 1)] == (500, 500)


class TestSitemapCoverage:
    def test_cell_counts_and_zero_declared(self, spark):
        from ffp_spark.frontier import sitemap_coverage

        declared = spark.createDataFrame(
            [("https://a.example/1",), ("https://a.example/2",),
             ("https://a.example/3",)],
            "url string",
        )
        captured = spark.createDataFrame(
            [("https://a.example/2",), ("https://a.example/3",),
             ("https://a.example/4",), ("https://b.example/x",)],
            "url string",
        )
        got = {
            r.host: (r.n_sitemap, r.n_captured, r.n_both, r.n_missing,
                     r.n_orphan, r.coverage_ppm)
            for r in sitemap_coverage(declared, captured).collect()
        }
        assert got["a.example"] == (3, 3, 2, 1, 1, (1000000 * 2) // 3)
        # b declares nothing: coverage 0, one orphan
        assert got["b.example"] == (0, 1, 0, 0, 1, 0)


class TestCrawlCadence:
    def test_interval_math_and_singletons(self, spark):
        from ffp_spark.frontier import crawl_cadence

        caps = spark.createDataFrame(
            [
                ("https://a.example/1", 1000), ("https://a.example/1", 4000),
                ("https://a.example/1", 9000),
                ("https://a.example/2", 500), ("https://a.example/2", 1500),
                ("https://b.example/x", 42),  # captured once: no interval
            ],
            "url string, ts long",
        )
        got = {
            r.host: (r.n_urls, r.n_captures, r.n_intervals,
                     r.span_ms_total, r.mean_interval_ms)
            for r in crawl_cadence(caps).collect()
        }
        # a: spans 8000 + 1000 over 3 intervals -> mean 3000
        assert got["a.example"] == (2, 5, 3, 9000, 3000)
        assert got["b.example"] == (1, 1, 0, 0, 0)
