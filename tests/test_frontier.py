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
