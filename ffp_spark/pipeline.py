"""End-to-end KG-construction pipeline (north_rule):

    pages -> [explicit url-hash partitioning] -> parse (Arrow UDF)
          -> triples -> entity linking (MinHash-LSH) -> connected
          components -> canonicalized nodes/edges -> snapshot commit
          with per-partition lineage.

Scale design notes (100 TB / 1000 executors):
* partitioning is an explicit, *deterministic* function of url
  (pmod(xxhash64(url), n_parts)) — the same page always lands in the
  same part_id, which is what makes lineage-based resume (K9) sound;
* the parse stage is the only Python hop; everything after is JVM
  DataFrame ops (AQE handles skew-join splitting; hot-domain dimension
  joins go through linking.salted_broadcast_join);
* per-stage caching is limited to the parsed DF which is consumed by
  both the triple and linking branches.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .cc import connected_components
from .linking import bucket_star_edges, extract_mentions, with_signatures
from .metrics import error_histogram
from .schemas import PRED_AUTHOR
from .snapshots import (
    read_snapshot,
    remaining_pages,
    snapshots_of,
    write_snapshot,
)
from .triples import emit_triples
from .udfs import parse_pages

DEFAULT_PARTS = 64


def pages_from_warc(
    spark: SparkSession,
    path: str,
    robots: Optional[DataFrame] = None,
    user_agent: str = "ffpbot",
    default_warc_ts: Optional[str] = None,
    ok_statuses: tuple[int, ...] = (200,),
) -> DataFrame:
    """Ingestion pre-stage: .warc(.gz) archives -> PAGES-shaped rows,
    ready for :func:`run_snapshot`.

    read_warc (file-parallel, bounded-memory record split) ->
    split_http (status line / headers / body separation +
    Content-Encoding decode) -> keep ``response`` records whose status
    is in ``ok_statuses`` -> PAGES columns: url = WARC-Target-URI,
    warc_ts = WARC-Date (ISO-8601; falls back to ``default_warc_ts``),
    html = decoded body, lang from the Content-Language header when
    present.  Malformed records arrived as rec_type='error' rows
    upstream and are dropped here by the response filter — ingestion
    errors never become pages.

    With a ``robots`` DataFrame of (host, body) robots.txt files, URLs
    the host's policy disallows for ``user_agent`` are filtered out
    BEFORE the parse stage (rule tables are robots-file-sized and
    broadcast inside robots_allowed — no extra shuffle on the page
    stream beyond the verdict agg).
    """
    from .robots import parse_robots, robots_allowed
    from .sources import read_warc, split_http

    http = split_http(read_warc(spark, path))
    lang = F.expr(
        "filter(http_headers, h -> h.name = 'content-language')[0].value"
    )
    pages = (
        http.where(
            (F.col("rec_type") == "response")
            & F.col("http_status").isin(list(ok_statuses))
            & F.col("target_uri").isNotNull()
        )
        .select(
            F.col("target_uri").alias("url"),
            F.coalesce(
                F.to_timestamp("warc_date"),
                F.to_timestamp(F.lit(default_warc_ts)),
            ).alias("warc_ts"),
            F.col("body").alias("html"),
            F.lit(None).cast("string").alias("text"),
            lang.alias("lang"),
        )
    )
    if robots is not None:
        rules = parse_robots(robots)
        pages = (
            robots_allowed(pages, rules, user_agent)
            .where(F.col("allowed"))
            .drop("allowed", "host", "path")
        )
    return pages


def add_part_id(pages: DataFrame, n_parts: int = DEFAULT_PARTS) -> DataFrame:
    """Deterministic url-hash partition id (K11)."""
    return pages.withColumn(
        "part_id", F.pmod(F.xxhash64("url"), F.lit(n_parts)).cast("int")
    )


def warm_collation(spark: SparkSession) -> None:
    """Force ICU case-mapping data to load on ONE task before any wide
    stage calls lower()/upper().

    Spark 4.1's CollationSupport lazily initializes ICU's case-map
    tables on the first non-ASCII lower(); with 32 executor threads
    hitting that first-touch simultaneously the class-init lock convoys
    (measured on this box: 50-80 s for a distinct over 25k strings that
    takes 0.6 s warm — thread dump shows all 32 threads in
    CollationSupport$Lower.execBinaryICU).  A single-partition warmup
    initializes the JVM once (~1 s) and the wide stages run at full
    speed.  On a multi-executor cluster this must run once per executor
    JVM — schedule one tiny task per executor; in local mode one task
    covers the only JVM."""
    if getattr(spark, "_ffp_collation_warm", False):
        return
    from pyspark.sql import functions as F

    spark.range(1, numPartitions=1).select(
        F.lower(F.lit("Ωmega Łódź İstanbul ДЕЖ")).alias("x"),
        F.upper(F.lit("straße ǳ")).alias("y"),
    ).collect()
    spark._ffp_collation_warm = True


def warm_python_workers(spark: SparkSession) -> None:
    """Spawn one Python worker per local core and pay the parser-stack
    import ONCE at session build, before any timed work.

    The first mapInArrow stage otherwise forks the worker pool and
    imports lxml/ET/regex tables inside whatever query happens to run
    first (the 'first parse in a process pays compile + import' gotcha
    from the repo guide, multiplied by every concurrent worker).  Same
    session-initialization class as warm_collation; touches no input
    data.  On a multi-executor cluster schedule one task per executor
    core; in local mode one numPartitions=cores job covers the pool."""
    if getattr(spark, "_ffp_workers_warm", False):
        return

    def _warm(batches):
        import ffp_spark.udfs  # noqa: F401
        from ffp_spark.feedparse import parse_feed

        # one tiny literal parse per worker: first parse in a process
        # pays lazy regex/ET compiles beyond the module imports
        parse_feed(
            b'<?xml version="1.0"?><rss version="2.0"><channel>'
            b"<title>w</title><item><title>w</title></item></channel></rss>"
        )
        for b in batches:
            yield b

    p = spark.sparkContext.defaultParallelism
    spark.range(p, numPartitions=p).mapInArrow(_warm, "id long").count()
    spark._ffp_workers_warm = True


def build_session(app: str, master: Optional[str] = None, shuffle_partitions: int = 64) -> SparkSession:
    import os

    b = SparkSession.builder.appName(app)
    if master:
        b = b.master(master)
    spark = (
        b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE (round 7): spark.sql.adaptive.coalescePartitions.
        # parallelismFirst=false (size-only AQE coalescing, guide §9) was
        # measured across the full suite and REGRESSED it 130s -> 187s:
        # compute-heavy small shuffles (HyperBall register merges, the
        # interpreted HOF scoring stages) collapse to one partition and
        # serialize.  Partition-count reduction is applied surgically
        # per operator from observed input sizes (graph._iter_parts)
        # instead.
        # measured on the binary-payload parse path at 32 cores: arrow
        # batches of 256 rows keep the JVM writer / Python parser pipeline
        # overlapped (2x faster than 1024); parquet columnar batches of
        # 512 avoid WritableColumnVector doubling-realloc thrash on ~KB
        # binary cells (10x faster than the 4096 default)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        .config("spark.driver.memory", os.environ.get("FFP_DRIVER_MEM", "12g"))
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    warm_collation(spark)
    warm_python_workers(spark)
    return spark


def _parse_targets(pages: DataFrame, targets: DataFrame) -> DataFrame:
    """Parse the corpus pages whose url appears in ``targets``.

    With AQE on, an empty broadcast build side collapses the semi-join
    to an empty relation — the common no-redirects case never scans
    PAGES.  dropDuplicates on url: a target appearing twice in the
    corpus (re-crawl) must not fan out the redirecting row's output."""
    target_pages = pages.join(F.broadcast(targets), "url", "left_semi").dropDuplicates(
        ["url"]
    )
    return parse_pages(target_pages).select(
        F.col("url").alias("target_url"),
        F.col("feed_type").alias("t_feed_type"),
        F.col("feed").alias("t_feed"),
        F.col("entries").alias("t_entries"),
        F.col("error").alias("t_error"),
        F.col("error_class").alias("t_error_class"),
        F.lit(True).alias("t_hit"),
    )


def resolve_meta_refresh(
    parsed: DataFrame,
    pages: DataFrame,
    cache_registry: Optional[list] = None,
    max_hops: int = 3,
) -> DataFrame:
    """Resolve meta-refresh redirects against the at-rest PAGES table.

    Offline analogue of the reference's redirect retry
    (/root/reference/src/fastfeedparser/main.py:877-893): a row whose
    ``error_class='meta_refresh'`` carries its target in
    ``error='meta_refresh:<url>'``.  The targets (distinct, typically a
    tiny fraction of the corpus) are semi-joined against PAGES, the
    matching target pages are parsed ONCE, and each redirecting row is
    rewritten with its target's parse result — keyed by the ORIGINAL
    url, exactly like the reference returning the redirected parse for
    the requested url.  Targets missing from the corpus keep their
    meta_refresh error row.

    Scale: the only full scan is the semi-join probe of PAGES (no
    shuffle of the big side — the distinct target set is broadcast);
    the re-parse touches only matched target pages.
    """
    redirects = parsed.filter(F.col("error_class") == "meta_refresh").select(
        F.col("url").alias("orig_url"),
        F.col("warc_ts").alias("orig_ts"),
        F.col("lang").alias("orig_lang"),
        F.col("error").alias("orig_error"),
        F.expr("substring(error, 14)").alias("target_url"),
    )
    targets = redirects.select(F.col("target_url").alias("url")).distinct()
    parsed_targets = _parse_targets(pages, targets).cache()
    if cache_registry is not None:
        cache_registry.append(parsed_targets)

    # follow redirect CHAINS inside the (tiny) target set: a target that
    # itself meta-refreshes is rewritten by ITS target's parse, like the
    # reference's recursive retry — bounded by max_hops, so cycles
    # (A -> B -> A) terminate with the error row intact.  The hop layers
    # are built LAZILY and unconditionally: an emptiness probe here would
    # be an action at plan-construction time (it forced the whole parse
    # before the stage timers), while an empty next-target set costs
    # nothing at execution — AQE collapses the empty-build-side joins.
    for _ in range(max_hops - 1):
        t_red = parsed_targets.filter(
            F.col("t_error_class") == "meta_refresh"
        ).select("target_url", F.expr("substring(t_error, 14)").alias("next_url"))
        next_targets = t_red.select(F.col("next_url").alias("url")).distinct()
        nxt = _parse_targets(pages, next_targets).select(
            F.col("target_url").alias("next_url"),
            F.col("t_feed_type").alias("n_feed_type"),
            F.col("t_feed").alias("n_feed"),
            F.col("t_entries").alias("n_entries"),
            F.col("t_error").alias("n_error"),
            F.col("t_error_class").alias("n_error_class"),
            F.col("t_hit").alias("n_hit"),
        )
        rewritten = t_red.join(F.broadcast(nxt), "next_url", "left").select(
            "target_url",
            F.when(F.col("n_hit"), F.col("n_feed_type")).alias("t_feed_type"),
            F.when(F.col("n_hit"), F.col("n_feed")).alias("t_feed"),
            F.when(F.col("n_hit"), F.col("n_entries")).alias("t_entries"),
            F.when(F.col("n_hit"), F.col("n_error"))
            .otherwise(F.concat(F.lit("meta_refresh:"), F.col("next_url")))
            .alias("t_error"),
            F.when(F.col("n_hit"), F.col("n_error_class"))
            .otherwise(F.lit("meta_refresh"))
            .alias("t_error_class"),
            F.lit(True).alias("t_hit"),
        )
        parsed_targets = (
            parsed_targets.filter(
                F.col("t_error_class").isNull()
                | (F.col("t_error_class") != "meta_refresh")
            )
            .unionByName(rewritten.select(*parsed_targets.columns))
            .cache()
        )
        if cache_registry is not None:
            cache_registry.append(parsed_targets)
    resolved = (
        redirects.join(F.broadcast(parsed_targets), "target_url", "left")
        .select(
            F.col("orig_url").alias("url"),
            F.col("orig_ts").alias("warc_ts"),
            F.col("orig_lang").alias("lang"),
            F.when(F.col("t_hit"), F.col("t_feed_type")).alias("feed_type"),
            F.when(F.col("t_hit"), F.col("t_feed")).alias("feed"),
            F.when(F.col("t_hit"), F.col("t_entries")).alias("entries"),
            F.when(F.col("t_hit"), F.col("t_error"))
            .otherwise(F.col("orig_error"))
            .alias("error"),
            F.when(F.col("t_hit"), F.col("t_error_class"))
            .otherwise(F.lit("meta_refresh"))
            .alias("error_class"),
        )
    )
    kept = parsed.filter(
        F.col("error_class").isNull() | (F.col("error_class") != "meta_refresh")
    )
    return kept.select(*parsed.columns).unionByName(resolved.select(*parsed.columns))


def link_and_canonicalize(parsed: DataFrame, min_jaccard: float = 0.5) -> DataFrame:
    """Mentions -> (norm, canonical norm) mapping via LSH + CC.

    Clustering runs over *distinct normalized surfaces* (far smaller than
    the mention set: the groupBy is the dedup), then mentions re-join the
    mapping; canonical id = lexicographic min surface in the component.

    Returns an eagerly-materialized CACHED mapping (tiny: one row per
    distinct surface) — callers join it repeatedly and must not replay
    the LSH machinery; call ``.unpersist()`` when done."""
    warm_collation(parsed.sparkSession)  # before the wide lower() stage
    mentions = extract_mentions(parsed)
    distinct_surfaces = mentions.select("norm").where(
        F.col("norm").isNotNull() & (F.col("norm") != "")
    ).distinct().withColumn("mention_id", F.col("norm"))
    # cache the signatures AND materialize them eagerly: the band
    # self-join consumes them on BOTH sides (probe + representatives),
    # and a lazily-populated cache races — both sides of the single
    # star-edge job compute the UDF + distinct + upstream parsed scans
    # concurrently before either can publish cache blocks (measured 2x
    # the entire linking wall).  One count() job up front costs the
    # signature pass once and every later consumer reads blocks.
    signed = with_signatures(distinct_surfaces).cache()
    signed.count()
    try:
        # star edges, not all pairs: hot-domain surfaces share buckets and
        # all-pairs is O(bucket^2) — connectivity through the bucket
        # representative is all CC needs
        scored = bucket_star_edges(signed, min_jaccard=min_jaccard)
        edges = scored.select(F.col("norm_a").alias("src"), F.col("norm_b").alias("dst"))
        components = connected_components(edges)
        mapping = signed.select("norm").join(
            components.withColumnRenamed("node_id", "norm"), "norm", "left"
        )
        out = mapping.withColumn(
            "canonical_norm", F.coalesce("component_id", "norm")
        ).select("norm", "canonical_norm")
        out = out.cache()
        out.count()  # materialize while the signature cache is alive
        return out
    finally:
        signed.unpersist()


def materialize_graph(
    parsed: DataFrame, canon: DataFrame, snapshot_id: int, n_parts: int
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(triples, nodes, edges) with canonicalized author entities."""
    triples = (
        emit_triples(parsed)
        .withColumn("snapshot_id", F.lit(snapshot_id))
        .withColumn("part_id", F.pmod(F.xxhash64("src_url"), F.lit(n_parts)).cast("int"))
    )

    from .linking import salted_broadcast_join

    mentions = extract_mentions(parsed)
    # canonical dictionary join (K5): the canon mapping is the small side
    # and author surfaces are Zipf-skewed (a few prolific authors own a
    # large share of mentions) — replicate+salt the broadcast so one hot
    # norm fans out across n_salts probe streams instead of one task
    author_mentions = salted_broadcast_join(
        mentions.filter(F.col("kind") == "author"), canon, "norm", n_salts=8
    )
    author_nodes = (
        author_mentions.groupBy(
            F.coalesce("canonical_norm", "norm").alias("canonical_norm")
        )
        .agg(F.min("surface").alias("label"))
        .select(
            F.concat(F.lit("author:"), "canonical_norm").alias("node_id"),
            F.lit("author").alias("kind"),
            F.concat(F.lit("author:"), "canonical_norm").alias("canonical_id"),
            F.col("label"),
        )
    )
    entry_nodes = (
        parsed.filter(F.col("error").isNull())
        .select(F.explode("entries").alias("e"))
        .select(
            F.col("e.id").alias("node_id"),
            F.lit("item").alias("kind"),
            F.col("e.id").alias("canonical_id"),
            F.col("e.title").alias("label"),
        )
        .where(F.col("node_id").isNotNull())
        .dropDuplicates(["node_id"])
    )
    feed_nodes = (
        parsed.filter(F.col("error").isNull())
        .select(
            F.coalesce(F.col("feed.id"), F.col("feed.link")).alias("node_id"),
            F.lit("feed").alias("kind"),
            F.coalesce(F.col("feed.id"), F.col("feed.link")).alias("canonical_id"),
            F.col("feed.title").alias("label"),
        )
        .where(F.col("node_id").isNotNull())
        .dropDuplicates(["node_id"])
    )
    nodes = author_nodes.unionByName(entry_nodes).unionByName(feed_nodes)

    # structural edges from non-author triples; author edges re-pointed at
    # the canonical author node
    structural = triples.filter(F.col("pred") != PRED_AUTHOR).select(
        F.col("subj").alias("src"),
        F.col("obj").alias("dst"),
        "pred",
        F.lit(1.0).alias("weight"),
    )
    author_edges = (
        author_mentions.select(
            F.col("subject_id").alias("src"),
            F.concat(F.lit("author:"), F.coalesce("canonical_norm", "norm")).alias("dst"),
            F.lit(PRED_AUTHOR).alias("pred"),
            F.lit(1.0).alias("weight"),
        )
        .where(F.col("src").isNotNull())
        .dropDuplicates(["src", "dst", "pred"])
    )
    edges = structural.unionByName(author_edges)
    return triples, nodes, edges


def run_snapshot(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    snapshot_id: int,
    n_parts: int = DEFAULT_PARTS,
    resume: bool = True,
    n_buckets: int = 16,
    incremental_from: Optional[int] = None,
    resolve_redirects: bool = True,
    stage_timings: Optional[dict[str, float]] = None,
) -> dict[str, Any]:
    """Process one snapshot of the PAGES table into committed KG tables.

    Resumable: if a lineage table exists for this snapshot_id, partitions
    marked done are anti-joined away before any work happens.
    Incremental: with ``incremental_from=<parent snapshot id>``, urls the
    parent already saw are anti-joined away and the parent's triples are
    merged into this snapshot's committed tables (append-only logical
    snapshot over a physical delta, Iceberg-style).
    Pass ``stage_timings={}`` to collect per-stage wall seconds
    (parse / link_cc / agg / write) for round-over-round attribution."""
    from datetime import datetime, timezone

    # lineage schema carries the run's wall-clock bracket; captured here
    # (run start), finished_ts at commit time.  Naive UTC to match the
    # session timezone convention.
    started_ts = datetime.now(timezone.utc).replace(tzinfo=None)
    pages = add_part_id(pages, n_parts)
    # redirect targets resolve against the FULL corpus, not the
    # incremental delta: a page redirecting to a url the parent snapshot
    # already saw must still resolve (incremental and full runs agree)
    pages_full = pages

    prior_lineage: Optional[DataFrame] = None
    prior_seen: Optional[DataFrame] = None
    if resume and snapshots_of(out_root, "lineage"):
        all_lineage = read_snapshot(spark, out_root, "lineage")
        prior_lineage = all_lineage.filter(F.col("snapshot_id") == snapshot_id)
    if incremental_from is not None:
        # K9 incremental: only urls never seen by the parent snapshot
        prior_seen = read_snapshot(spark, out_root, "pages_seen", incremental_from)
        pages = pages.join(prior_seen.select("url"), "url", "left_anti")
    todo = remaining_pages(pages, prior_lineage)

    # explicit url-hash partitioning before the Python stage (K11)
    todo = todo.repartition(n_parts, "part_id")
    # cache the RAW parse (the expensive Python stage) — the redirect
    # resolution union re-reads this cache, never re-runs the parse
    raw = parse_pages(todo)
    raw.cache()
    caches: list = [raw]
    parsed = (
        resolve_meta_refresh(raw, pages_full, cache_registry=caches)
        if resolve_redirects
        else raw
    )
    parsed = parsed.withColumn(
        "part_id", F.pmod(F.xxhash64("url"), F.lit(n_parts)).cast("int")
    )
    if stage_timings is not None:
        import time

        t0 = time.perf_counter()
        raw.count()  # materializes the cache: this IS the parse stage
        stage_timings["parse_sec"] = round(time.perf_counter() - t0, 3)
    try:
        return _run_snapshot_body(
            spark, pages, parsed, out_root, snapshot_id, n_parts, n_buckets,
            prior_lineage, prior_seen, incremental_from, stage_timings,
            started_ts=started_ts,
        )
    finally:
        for df in caches:
            df.unpersist()


def _run_snapshot_body(
    spark: SparkSession,
    pages: DataFrame,
    parsed: DataFrame,
    out_root: str,
    snapshot_id: int,
    n_parts: int,
    n_buckets: int,
    prior_lineage: Optional[DataFrame],
    prior_seen: Optional[DataFrame],
    incremental_from: Optional[int],
    stage_timings: Optional[dict[str, float]] = None,
    started_ts=None,
) -> dict[str, Any]:
    import time

    t0 = time.perf_counter()
    # materialize the redirect-resolved PARSED table ONCE (round 7):
    # every downstream job — the ~10 linking/CC jobs, the lineage
    # aggregate, the error histogram, and the triples/nodes/edges
    # commits — scans ``parsed``, and Spark re-evaluates the resolve
    # union (raw-cache scan + redirect-layer joins) per job; one eager
    # checkpoint turns those into RDD scans.  The raw parse cache stays
    # the parse stage's artifact; this adds one V-sized local write.
    parsed = parsed.localCheckpoint(eager=True)
    # link_and_canonicalize runs its CC jobs eagerly and returns a
    # cached mapping (the broadcast dimension of the salted author join,
    # consumed by three write jobs); unpersisted after the commits
    canon = link_and_canonicalize(parsed)
    try:
        return _commit_snapshot(
            spark, pages, parsed, canon, out_root, snapshot_id, n_parts,
            n_buckets, prior_lineage, prior_seen, incremental_from,
            stage_timings, t0, started_ts,
        )
    finally:
        canon.unpersist()


def _commit_snapshot(
    spark: SparkSession,
    pages: DataFrame,
    parsed: DataFrame,
    canon: DataFrame,
    out_root: str,
    snapshot_id: int,
    n_parts: int,
    n_buckets: int,
    prior_lineage: Optional[DataFrame],
    prior_seen: Optional[DataFrame],
    incremental_from: Optional[int],
    stage_timings: Optional[dict[str, float]],
    t0: float,
    started_ts=None,
) -> dict[str, Any]:
    import time

    triples, nodes, edges = materialize_graph(parsed, canon, snapshot_id, n_parts)
    if stage_timings is not None:
        stage_timings["link_cc_sec"] = round(time.perf_counter() - t0, 3)

    lineage_new = (
        parsed.groupBy("part_id")
        .agg(
            F.count("*").alias("n_pages"),
            F.count(F.when(F.col("error").isNull(), 1)).alias("n_parsed"),
            F.count(F.when(F.col("error").isNotNull(), 1)).alias("n_errors"),
            F.sum(F.coalesce(F.size("entries"), F.lit(0))).alias("n_entries"),
        )
        .join(
            triples.groupBy("part_id").agg(F.count("*").alias("n_triples")),
            "part_id",
            "left",
        )
        .withColumn("n_triples", F.coalesce("n_triples", F.lit(0)))
        .withColumn("snapshot_id", F.lit(snapshot_id))
        .withColumn("status", F.lit("done"))
    )

    bucket = F.pmod(F.xxhash64("node_id"), F.lit(n_buckets)).cast("int")

    # page count from the (cached) parsed lineage aggregate — not a
    # separate todo.count() job over the raw pages source.  The two
    # stats jobs are independent of the data-table commits, so they run
    # CONCURRENTLY with them in the commit pool below (guide §2.6) —
    # only the lineage write (which embeds the stats) must wait.
    def _collect_stats() -> dict[str, Any]:
        t0 = time.perf_counter()
        n_pages_run = (
            lineage_new.agg(F.sum("n_pages").alias("p")).collect()[0].p or 0
        )
        out = {
            "n_pages": int(n_pages_run),
            "errors": {
                r.error_class: r["count"] for r in error_histogram(parsed).collect()
            },
        }
        if stage_timings is not None:
            stage_timings["agg_sec"] = round(time.perf_counter() - t0, 3)
        return out

    # incremental merge: the parent snapshot's committed graph is carried
    # forward; this run only parsed the delta
    if incremental_from is not None and incremental_from in snapshots_of(out_root, "triples"):
        parent_triples = read_snapshot(spark, out_root, "triples", incremental_from)
        triples = triples.unionByName(parent_triples.select(*triples.columns))
        parent_nodes = read_snapshot(spark, out_root, "nodes", incremental_from).drop("bucket")
        nodes = nodes.unionByName(parent_nodes.select(*nodes.columns)).dropDuplicates(["node_id"])
        parent_edges = read_snapshot(spark, out_root, "edges", incremental_from).drop("bucket")
        edges = edges.unionByName(parent_edges.select(*edges.columns)).dropDuplicates(["src", "dst", "pred"])

    # resume merge: a re-commit of the same snapshot keeps work already
    # done by the interrupted run.  Ownership is by PARTITION: previously
    # committed triples are kept only for parts the committed lineage
    # marks done; this run re-parsed every other part.  The two sets are
    # disjoint by construction, so the union cannot double-count — even
    # if a prior run crashed after committing triples but before lineage
    # (then no parts are "done", the stale triples contribute nothing,
    # and this run's full re-parse wins).
    if prior_lineage is not None and snapshot_id in snapshots_of(out_root, "triples"):
        done_parts = (
            prior_lineage.filter(F.col("status") == "done").select("part_id").distinct()
        )
        prev_triples = read_snapshot(spark, out_root, "triples", snapshot_id).join(
            done_parts, "part_id", "left_semi"
        )
        triples = triples.unionByName(prev_triples.select(*triples.columns))
        # nodes/edges are not part-keyed; idempotent by dropDuplicates
        prev_nodes = read_snapshot(spark, out_root, "nodes", snapshot_id).drop("bucket")
        nodes = nodes.unionByName(prev_nodes.select(*nodes.columns)).dropDuplicates(
            ["node_id"]
        )
        prev_edges = read_snapshot(spark, out_root, "edges", snapshot_id).drop("bucket")
        edges = edges.unionByName(prev_edges.select(*edges.columns)).dropDuplicates(
            ["src", "dst", "pred"]
        )

    nodes_b = nodes.withColumn("bucket", bucket)
    edges_b = edges.withColumn(
        "bucket", F.pmod(F.xxhash64("src"), F.lit(n_buckets)).cast("int")
    )

    # commit protocol: data tables first, lineage LAST — the lineage
    # commit is the marker that this snapshot's work is complete.  A
    # crash anywhere earlier leaves lineage without "done" rows, so a
    # re-run re-derives everything idempotently (see resume merge above).
    # The four data tables commit CONCURRENTLY (independent dirs and
    # jobs; Spark schedules multi-threaded jobs fine) — overlapping the
    # writes hides per-job latency; ordering only matters for lineage.
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.perf_counter()
    # fresh runs read the seen-url set off the MATERIALIZED parsed table
    # (row-identical: parse emits one row per input page, errors
    # included, and part_id is the same deterministic url hash) instead
    # of re-scanning the pages SOURCE — for generated/WARC sources that
    # re-scan re-runs the whole Python ingest at commit time.  Resumed
    # runs keep the source scan: parsed covers only the re-done parts.
    seen_src = parsed if prior_lineage is None else pages
    seen = seen_src.select("url", "part_id")
    if prior_seen is not None:
        seen = seen.unionByName(prior_seen.select("url", "part_id")).dropDuplicates(["url"])
    from .snapshots import write_snapshot_bucketed

    with ThreadPoolExecutor(max_workers=5) as pool:
        f_stats = pool.submit(_collect_stats)
        f_triples = pool.submit(
            write_snapshot, triples, out_root, "triples", snapshot_id,
            partition_by=["part_id"],
        )
        # nodes/edges commit THROUGH the catalog-bucketed writer (K11):
        # the serving join key (node_id == src) reads co-located buckets
        # with zero exchange by default — at 100 TB the repeated
        # node/edge joins are the dominant shuffle this removes
        f_nodes = pool.submit(
            write_snapshot_bucketed, nodes_b, out_root, "nodes", snapshot_id,
            bucket_col="node_id", n_buckets=n_buckets,
        )
        f_edges = pool.submit(
            write_snapshot_bucketed, edges_b, out_root, "edges", snapshot_id,
            bucket_col="src", n_buckets=n_buckets,
        )
        f_seen = pool.submit(write_snapshot, seen, out_root, "pages_seen", snapshot_id)
        m_triples = f_triples.result()
        m_nodes = f_nodes.result()
        m_edges = f_edges.result()
        f_seen.result()
        stats = f_stats.result()
    # lineage rows carry the run's wall-clock bracket (SURVEY §1.2
    # schema): started_ts = run_snapshot entry, finished_ts = after the
    # data-table commits, i.e. when this snapshot's work was durable.
    # Commit metadata is the one place wall clock is allowed (datagen
    # and linking stay deterministic); prior rows keep their own stamps.
    from datetime import datetime, timezone

    finished_ts = datetime.now(timezone.utc).replace(tzinfo=None)
    lineage = lineage_new.withColumn(
        "started_ts", F.lit(started_ts)
    ).withColumn("finished_ts", F.lit(finished_ts))
    if prior_lineage is not None:
        prior = prior_lineage
        for c in ("started_ts", "finished_ts"):  # pre-schema tables
            if c not in prior.columns:
                prior = prior.withColumn(c, F.lit(None).cast("timestamp"))
        lineage = lineage.unionByName(prior.select(*lineage.columns))
    m_lineage = write_snapshot(lineage, out_root, "lineage", snapshot_id, extra=stats)
    if stage_timings is not None:
        stage_timings["write_sec"] = round(time.perf_counter() - t0, 3)
    return {
        "snapshot_id": snapshot_id,
        "pages": stats["n_pages"],
        "triples": m_triples["row_count"],
        "nodes": m_nodes["row_count"],
        "edges": m_edges["row_count"],
        "lineage_rows": m_lineage["row_count"],
        "errors": stats["errors"],
    }
