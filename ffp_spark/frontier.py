"""Crawl-frontier scheduling: politeness waves + recrawl priority.

Completes the discovery tier (robots.py policy, sitemaps.py source,
pipeline.pages_from_warc ingestion): given a frontier of fetchable
URLs, assign each a politeness WAVE so no host sees more than
``per_host`` fetches per wave — the standard crawler scheduler shape
(host-partitioned round-robin).  Expressed as ONE host-keyed window:
rank within host by the caller's order, wave = (rank-1) div per_host.
The window partitions by HOST — at web scale hosts number in the
millions, so the sort parallelizes per host and nothing ever crosses
an Exchange SinglePartition (same discipline as token_budget_mix,
asserted in tests/test_frontier.py).

Recrawl priority follows the sitemap signals the source already
parses (S13): an integer staleness score from <changefreq> and the
page's age at a caller-supplied ``as_of`` instant — NO wall clock
(the repo-wide determinism rule); age arrives as data, never as
``now()``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# public changefreq ladder (sitemaps.org vocabulary) -> nominal hours
# between recrawls; 'always' is clamped to hourly, 'never' to ~decade
CHANGEFREQ_HOURS: dict[str, int] = {
    "always": 1,
    "hourly": 1,
    "daily": 24,
    "weekly": 168,
    "monthly": 720,
    "yearly": 8760,
    "never": 87600,
}
_DEFAULT_FREQ_HOURS = 168  # unlabeled pages recrawl on the weekly ladder


def host_of(url_col: str = "url") -> Column:
    """Host extraction shared with robots_allowed (same regex)."""
    return F.regexp_extract(url_col, r"^[a-z]+://([^/]+)", 1)


def discover_frontier(
    sitemap_docs: DataFrame,
    robots_docs: Optional[DataFrame],
    user_agent: str = "ffpbot",
    as_of: Optional[str] = None,
    per_host: int = 16,
) -> DataFrame:
    """The whole discovery tier as one plan: sitemap documents
    (url, body) -> parsed urlset/sitemapindex -> one-level frontier
    (sitemaps.sitemap_frontier) -> robots policy filter (host-grouped
    rules broadcast, RFC 9309 wildcards) -> recrawl staleness at
    ``as_of`` -> politeness waves ordered by (staleness DESC, url).

    Output columns: url, lastmod, changefreq, priority, via_index,
    host, staleness_q, wave.  Everything JVM-side after the one
    sitemap-parse Arrow hop; the only shuffles are the frontier's
    host-window sort and the robots verdict agg — both host-keyed,
    never global."""
    from .robots import parse_robots, robots_allowed
    from .sitemaps import parse_sitemaps, sitemap_frontier

    fr = sitemap_frontier(parse_sitemaps(sitemap_docs)).where(
        F.col("loc").isNotNull()
    ).withColumnRenamed("loc", "url").drop("sitemap_url")
    if robots_docs is not None:
        rules = parse_robots(robots_docs)
        fr = (
            robots_allowed(fr, rules, user_agent)
            .where(F.col("allowed"))
            .drop("allowed", "path")
        )
    if as_of is not None:
        fr = recrawl_priority(fr, as_of=as_of)
        order = [F.desc("staleness_q"), F.asc("url")]
    else:
        order = None
    host_col = "host" if "host" in fr.columns else None
    return schedule_waves(fr, per_host=per_host, host_col=host_col, order=order)


def schedule_waves(
    frontier: DataFrame,
    per_host: int,
    url_col: str = "url",
    host_col: Optional[str] = None,
    order: Optional[Sequence[Column]] = None,
) -> DataFrame:
    """Frontier rows + (host, wave): wave k holds each host's fetches
    number k*per_host .. (k+1)*per_host-1 under the given order —
    dispatching one wave at a time caps per-host concurrency at
    ``per_host`` regardless of how skewed the frontier is toward hot
    hosts (the politeness guarantee).  Default order: priority DESC
    when the column exists (sitemap signal), then url — total and
    deterministic."""
    if per_host <= 0:
        raise ValueError("per_host must be positive")
    out = frontier
    if host_col is None:
        out = out.withColumn("host", host_of(url_col))
        host_col = "host"
    if order is None:
        order = (
            [F.desc_nulls_last("priority")] if "priority" in out.columns else []
        ) + [F.asc(url_col)]
    w = Window.partitionBy(host_col).orderBy(*order)
    return out.withColumn(
        "wave",
        ((F.row_number().over(w) - F.lit(1)) / F.lit(per_host)).cast("long"),
    )


def recrawl_priority(
    frontier: DataFrame,
    as_of: str,
    lastmod_col: str = "lastmod",
    changefreq_col: str = "changefreq",
) -> DataFrame:
    """Frontier rows + ``staleness_q``: age at ``as_of`` (an ISO
    instant passed as DATA — never a wall clock) over the changefreq
    ladder, in integer milli-units: round(age_ms / (3600 * freq_h)) ==
    round(1000 * age_hours / freq_hours).  1000 means "exactly one
    nominal interval overdue"; pages with no lastmod are maximally
    stale (they sort first).  Integer operands, ONE double division +
    round — exact cross-engine while age_ms < 2^53 (epoch-ms BIGINTs,
    the repo's event-time contract)."""
    freq_map = F.create_map(
        *[x for k, v in sorted(CHANGEFREQ_HOURS.items()) for x in (F.lit(k), F.lit(v))]
    )
    freq_h = F.coalesce(
        freq_map[F.lower(F.col(changefreq_col))], F.lit(_DEFAULT_FREQ_HOURS)
    )
    age_ms = F.unix_millis(F.to_timestamp(F.lit(as_of))) - F.unix_millis(
        F.to_timestamp(F.col(lastmod_col))
    )
    score = F.round(age_ms / (F.lit(3600) * freq_h)).cast("long")
    return frontier.withColumn(
        "staleness_q",
        F.when(F.col(lastmod_col).isNull(), F.lit((1 << 31) - 1)).otherwise(
            F.greatest(score, F.lit(0))
        ),
    )


def capture_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Two crawl captures -> per-URL change classification: the CDX
    diff every recrawl cycle computes to decide what to refetch,
    what to tombstone, and what to skip.  Output = (key, status,
    old_digest, new_digest) with status in {'added', 'removed',
    'changed', 'unchanged'}.

    Plan: ONE full outer join on the key (both sides shuffle on the
    same column, so at 100 TB the two captures co-partition; with
    bucketed capture tables the exchange disappears entirely) + a
    codegen CASE — no windows, no driver state.  Presence is tracked
    by explicit markers (a row captured with a NULL digest is still
    PRESENT — it must not read as added/removed); digests compare
    null-safely (NULL vs NULL is unchanged, NULL vs non-NULL is
    changed)."""
    o = old.select(
        F.col(key_col).alias("key"),
        F.col(digest_col).alias("old_digest"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key_col).alias("key"),
        F.col(digest_col).alias("new_digest"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, "key", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("old_digest").eqNullSafe(F.col("new_digest")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("key", status.alias("status"), "old_digest", "new_digest")


def politeness_schedule(
    urls: DataFrame,
    robots: DataFrame,
    user_agent: str = "ffpbot",
    per_host: int = 16,
    default_delay_ms: int = 1000,
    url_col: str = "url",
) -> DataFrame:
    """Waves + per-host Crawl-delay pacing -> a deterministic fetch
    schedule: wave k of a host may start no earlier than k * delay
    after wave 0 (each wave holds ``per_host`` fetches), so
    ``fetch_offset_ms`` = wave * effective delay is the politeness
    floor on when a URL may be fetched, and its per-host max is the
    host's crawl MAKESPAN — the number capacity planning actually
    needs.  Composes robots.parse_crawl_delays (group selection:
    exact agent if the host published one, else '*'; multiple or
    junk-valued directives resolve CONSERVATIVELY to the largest
    valid delay, absent/NULL to ``default_delay_ms``) with
    schedule_waves.  Plan: the delay table is host-distinct and
    robots-file-derived (small) — one host-keyed join onto the
    frontier; the wave window stays host-partitioned."""
    from .robots import parse_crawl_delays

    ua = user_agent.lower()
    delays = parse_crawl_delays(robots)
    has_exact = (
        delays.where(F.col("ua") == ua)
        .select("host")
        .distinct()
        .withColumn("_e", F.lit(True))
    )
    chosen = (
        delays.where(F.col("ua").isin(ua, "*"))
        .join(has_exact, "host", "left")
        .where(
            ((F.col("_e").isNotNull()) & (F.col("ua") == ua))
            | ((F.col("_e").isNull()) & (F.col("ua") == "*"))
        )
        .groupBy("host")
        .agg(F.max("delay_ms").alias("delay_ms"))
    )
    waved = schedule_waves(urls, per_host=per_host, url_col=url_col)
    out = waved.join(F.broadcast(chosen), "host", "left").withColumn(
        "delay_ms",
        F.coalesce("delay_ms", F.lit(int(default_delay_ms)).cast("long")),
    )
    return out.withColumn(
        "fetch_offset_ms", F.col("wave") * F.col("delay_ms")
    )


def allocate_budget(
    scores: DataFrame,
    total_budget: int,
    key_col: str = "domain",
    score_col: str = "score",
    n_buckets: int = 4096,
) -> DataFrame:
    """Proportional crawl-budget allocation by largest remainder
    (Hamilton's method): each key gets floor(budget * score / S)
    fetches, and the leftover (< #keys) goes to the largest
    fractional remainders, ties broken by key — the crawl-planning
    step that turns domain importance scores (PageRank mass, quota
    policy) into integer per-domain fetch budgets that sum EXACTLY
    to the total.  Pure integer arithmetic throughout — exact
    cross-engine.

    Scale shape: totals come from single-row aggregates crossJoined
    back (never a driver collect); the remainder ranking is the
    two-phase distributed rank (packing.py idiom) — remainders
    bucket by value range, only the <= ``n_buckets+1`` bucket
    TOTALS cross a single-partition window, and the per-row rank is
    a bucket-partitioned window.  A naive global row_number here
    would funnel every domain through one task.

    Requires NON-NEGATIVE scores with sum(score) > 0 (integral div
    truncates toward zero, so negative scores would break the floor
    semantics; ANSI division fails loudly on a zero sum) and
    budget * max(score) < 2^63."""
    budget = F.lit(int(total_budget)).cast("long")
    s = scores.select(
        F.col(key_col).alias("key"), F.col(score_col).cast("long").alias("score")
    )
    tot = s.agg(F.sum("score").alias("_S"))
    j = s.crossJoin(F.broadcast(tot))
    j = j.select(
        "key",
        "score",
        "_S",
        F.expr("(CAST({b} AS BIGINT) * score) div _S".format(b=int(total_budget))).alias(
            "base"
        ),
        ((budget * F.col("score")) % F.col("_S")).alias("rem"),
    )
    left = j.agg((budget - F.sum("base")).alias("_left"))
    j = j.crossJoin(F.broadcast(left))
    # two-phase rank of (rem DESC, key ASC): value-range buckets,
    # bucket totals through the (bounded) single-partition window
    j = j.withColumn(
        "_bkt", F.expr(f"rem div (_S div {int(n_buckets)} + 1)")
    )
    per_bucket = j.groupBy("_bkt").agg(F.count("*").alias("_bn"))
    w_b = Window.orderBy(F.desc("_bkt")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "_bkt", F.coalesce(F.sum("_bn").over(w_b), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("_bkt").orderBy(F.desc("rem"), F.asc("key"))
    ranked = j.join(F.broadcast(offsets), "_bkt").withColumn(
        "_rank", F.col("_off") + F.row_number().over(w_in)
    )
    return ranked.select(
        F.col("key").alias(key_col),
        F.col("score").alias(score_col),
        (
            F.col("base")
            + (F.col("_rank") <= F.col("_left")).cast("long")
        ).alias("alloc"),
    )


def capture_revisits(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Digest-keyed capture dedup with WARC *revisit* semantics: the
    first capture of each payload digest (by timestamp, then URL — a
    total, deterministic order) stays a full ``response``; every
    later capture of the SAME payload — a recrawl that got identical
    bytes, or a mirror under a different URL — becomes a ``revisit``
    that points at the original (the WARC-Refers-To contract big
    crawl archives use to store a hash instead of the body; at
    CommonCrawl scale this is most of the dedup savings).

    Output: input key columns + (kind, refers_to_url, refers_to_ts);
    refers_to_* are NULL on the responses themselves.

    Plan: keep-first = ONE digest-keyed min(struct(ts, url)) aggregate
    (map-side partials collapse before the shuffle) joined back on the
    digest — the paragraph_dedup idiom, never a corpus-wide window
    sort.

    Contract: (url, ts) is unique per capture set (the CDX key
    property real capture indexes guarantee); exact-duplicate rows
    would each match the group minimum and both read as responses."""
    c = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        F.col(digest_col).alias("digest"),
    )
    originals = c.groupBy("digest").agg(
        F.min(F.struct(F.col("ts"), F.col("url"))).alias("_o")
    )
    j = c.join(originals, "digest")
    is_first = (F.col("ts") == F.col("_o.ts")) & (F.col("url") == F.col("_o.url"))
    return j.select(
        "url",
        "ts",
        "digest",
        F.when(is_first, F.lit("response")).otherwise(F.lit("revisit")).alias(
            "kind"
        ),
        F.when(~is_first, F.col("_o.url")).alias("refers_to_url"),
        F.when(~is_first, F.col("_o.ts")).alias("refers_to_ts"),
    )


_REDIRECT_STATUSES = (301, 302, 303, 307, 308)


def resolve_redirects(
    captures: DataFrame,
    max_hops: int = 4,
    url_col: str = "url",
    status_col: str = "http_status",
    location_col: str = "location",
) -> DataFrame:
    """Collapse 3xx redirect chains in an at-rest capture set: the
    batch analogue of a live fetcher's follow_redirects (the
    reference's fetch path follows redirects before parsing; a crawl
    archive instead stores each 3xx hop as its own capture, and KG
    construction must land every chain on its final URL — otherwise
    one logical page splits into N subject entities).

    Output: (url, final_url, n_hops, resolved).  ``resolved`` is False
    only when ``max_hops`` joins still end on a redirecting capture —
    a longer chain or a redirect LOOP (a->b->a never terminates; the
    hop bound is the loop guard, same contract as the S3c meta-refresh
    chain resolver in pipeline.py).

    Plan shape: the redirect map (url -> location, only 3xx rows with
    a Location) is built once and cached; each hop is ONE equi-join on
    the current cursor — ``max_hops`` is a fixed constant, so the
    barrier count is scale-independent while per-hop data stays
    E-sized.  Rows stop participating (and stop paying joins) once
    their cursor leaves the redirect map."""
    if max_hops <= 0:
        raise ValueError("max_hops must be positive")
    redirects = (
        captures.where(
            F.col(status_col).isin(*_REDIRECT_STATUSES)
            & F.col(location_col).isNotNull()
        )
        .select(F.col(url_col).alias("_cur"), F.col(location_col).alias("_nxt"))
        .localCheckpoint(eager=True)
    )
    state = captures.select(
        F.col(url_col).alias("url"),
        F.col(url_col).alias("_cur"),
        F.lit(0).cast("int").alias("n_hops"),
    )
    for _ in range(max_hops):
        state = state.join(redirects, "_cur", "left").select(
            "url",
            F.coalesce("_nxt", "_cur").alias("_cur"),
            (F.col("n_hops") + F.col("_nxt").isNotNull().cast("int")).alias(
                "n_hops"
            ),
        )
    still = redirects.select(F.col("_cur").alias("_loop"))
    out = state.join(
        still, state["_cur"] == still["_loop"], "left"
    ).select(
        "url",
        F.col("_cur").alias("final_url"),
        "n_hops",
        F.col("_loop").isNull().alias("resolved"),
    )
    return out


def sitemap_coverage(
    sitemap_urls: DataFrame,
    captured_urls: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Per-host sitemap-vs-crawl coverage: how much of what the site
    DECLARES (sitemap) the crawl actually captured, and how much of
    the capture the site never declared (orphans) — the completeness
    metric crawl operations track per site.

    Output per host: n_sitemap, n_captured, n_both, n_missing
    (declared, never captured), n_orphan (captured, never declared),
    coverage_ppm = 10^6 * n_both div n_sitemap (0 when the host
    declares nothing).  Plan: ONE full outer join on the url key
    (both sides co-partition; bucketed tables drop the exchange —
    the capture_delta shape) + one host-keyed agg with map-side
    partials; integer ppm, exact cross-engine."""
    s = sitemap_urls.select(F.col(url_col).alias("url")).distinct().withColumn(
        "_s", F.lit(True)
    )
    c = captured_urls.select(F.col(url_col).alias("url")).distinct().withColumn(
        "_c", F.lit(True)
    )
    j = s.join(c, "url", "full_outer").select(
        host_of("url").alias("host"), "_s", "_c"
    )
    agg = j.groupBy("host").agg(
        F.sum(F.col("_s").isNotNull().cast("long")).alias("n_sitemap"),
        F.sum(F.col("_c").isNotNull().cast("long")).alias("n_captured"),
        F.sum((F.col("_s").isNotNull() & F.col("_c").isNotNull()).cast("long")).alias(
            "n_both"
        ),
        F.sum((F.col("_s").isNotNull() & F.col("_c").isNull()).cast("long")).alias(
            "n_missing"
        ),
        F.sum((F.col("_s").isNull() & F.col("_c").isNotNull()).cast("long")).alias(
            "n_orphan"
        ),
    )
    return agg.withColumn(
        "coverage_ppm",
        F.when(F.col("n_sitemap") > 0,
               F.expr("(1000000 * n_both) div n_sitemap")).otherwise(F.lit(0)),
    )


def crawl_cadence(
    captures: DataFrame, url_col: str = "url", ts_col: str = "ts"
) -> DataFrame:
    """Per-host recrawl cadence from a capture index: how often each
    site's URLs actually get refetched — the observed counterpart of
    the declared <changefreq> ladder (recrawl_priority consumes the
    declaration; this measures reality, and the gap between the two
    is the scheduling error a crawl planner tunes against).

    Per host: n_urls, n_captures, n_intervals (= captures - urls),
    span_ms_total (sum over URLs of last-first capture time) and
    mean_interval_ms = span_ms_total div n_intervals (0 when no URL
    was captured twice).  Exact integer arithmetic throughout.

    Plan: one url-keyed agg (count/min/max collapse map-side), one
    host-keyed rollup — no windows, no sorts; epoch-ms BIGINTs per
    the repo's event-time contract."""
    per_url = captures.groupBy(F.col(url_col).alias("url")).agg(
        F.count("*").alias("n_caps"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    )
    agg = per_url.select(
        host_of("url").alias("host"),
        "n_caps",
        (F.col("last_ts") - F.col("first_ts")).alias("span_ms"),
    ).groupBy("host").agg(
        F.count("*").alias("n_urls"),
        F.sum("n_caps").alias("n_captures"),
        (F.sum("n_caps") - F.count("*")).alias("n_intervals"),
        F.sum("span_ms").alias("span_ms_total"),
    )
    return agg.withColumn(
        "mean_interval_ms",
        F.when(F.col("n_intervals") > 0,
               F.expr("span_ms_total div n_intervals")).otherwise(F.lit(0)),
    )
