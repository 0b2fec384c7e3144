"""Structured Streaming ingest: PAGES files -> parsed -> triples.

The reference is a batch parser (a crawl fetches, then parses); at
100 TB the natural deployment is a continuously-landing pages
directory.  This module re-expresses the parse/triple pipeline as an
incremental Structured Streaming job:

    spark.readStream (parquet, file-source backpressure via
    maxFilesPerTrigger) -> mapInArrow parse (same kernel as batch,
    K1) -> emit_triples (same single-explode plan, K2) ->
    watermarked windowed counts or append sink.

Design notes for scale:
* the parse stage is stateless, so it needs no state store — each
  micro-batch is embarrassingly parallel, same as batch;
* watermarks bound the windowed-aggregation state by `warc_ts` (crawl
  time), so late-arriving WARC segments older than the watermark are
  dropped deterministically instead of growing state forever;
* exactly-once to files comes from the checkpointLocation WAL + the
  file sink's transactional manifest — the batch layer's snapshot
  manifests remain the serving view.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .schemas import PAGES_SCHEMA
from .triples import emit_triples
from .udfs import parse_pages


def stream_pages(
    spark: SparkSession,
    pages_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """File-source stream over a landing directory of PAGES parquet.

    ``maxFilesPerTrigger`` is the backpressure knob: it bounds each
    micro-batch to a fixed file count so executor memory is sized by
    configuration, not by how much data landed since the last trigger."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.parquet(pages_dir)


def stream_triples(pages_stream: DataFrame) -> DataFrame:
    """Streaming PAGES -> TRIPLES: identical kernels to the batch path
    (mapInArrow parse + single-explode emission), no state store."""
    return emit_triples(parse_pages(pages_stream))


def windowed_pred_counts(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Triple counts per (event-time window, predicate) with a
    watermark on crawl time: state for windows older than the
    watermark is evicted, bounding memory on unbounded streams."""
    parsed = parse_pages(pages_stream)
    ok = parsed.filter(F.col("error").isNull() & F.col("entries").isNotNull())
    entries = ok.select("url", "warc_ts", F.explode("entries").alias("entry"))
    return (
        entries.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_entries"),
            F.count(F.col("entry.published")).alias("n_published"),
            F.count(F.col("entry.author")).alias("n_authored"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_entries",
            "n_published",
            "n_authored",
        )
    )


def stream_dedup_pages(
    pages_stream: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful streaming dedup: first-seen url wins ACROSS micro-batches.

    Uses ``dropDuplicatesWithinWatermark``: the state store keeps one
    entry per url and GENUINELY evicts it once the watermark passes the
    first occurrence's event time + delay.  Plain
    ``dropDuplicates(["url"])`` would never evict here — Spark's
    streaming dedup only applies the watermark predicate when the
    event-time column is among the dedup keys — so url state would grow
    forever on an unbounded crawl and re-crawls outside the horizon
    would stay suppressed.  With the within-watermark variant a page
    re-crawled after the horizon re-enters the corpus, which is the
    training-pipeline semantics we document (dedup *within* the
    horizon, not forever)."""
    return pages_stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def feed_session_stats(
    pages_stream: DataFrame,
    session_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-feed running session stats (pages seen, entries emitted, first/
    last crawl ts) that ACCUMULATE across micro-batches.

    This is the escape hatch for stateful logic Spark's built-ins can't
    express (running per-key aggregates on an append stream).  State is
    one small tuple per feed url.  Pass ``session_timeout_ms`` to evict
    idle feeds: when a key's processing-time timeout fires, update()
    emits one FINAL stats row and removes the state, so idle-key memory
    is actually freed and the key is never re-emitted until new data
    arrives for it (a fresh session).  Leave None for bounded
    availableNow drains: an armed processing-time timeout makes Spark
    keep scheduling timeout batches, so such drains must be stopped
    explicitly (awaitTermination(timeout) + stop) rather than awaited."""
    import pandas as pd  # noqa: F401  (worker-side import)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    parsed = parse_pages(pages_stream).select(
        "url",
        "warc_ts",
        F.coalesce(F.size("entries"), F.lit(0)).alias("n_entries"),
        F.when(F.col("error").isNull(), 0).otherwise(1).alias("n_errors"),
    )

    out_schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("n_pages", LongType(), False),
            StructField("n_entries", LongType(), False),
            StructField("n_errors", LongType(), False),
            StructField("first_ts", TimestampType(), True),
            StructField("last_ts", TimestampType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_pages", LongType(), False),
            StructField("n_entries", LongType(), False),
            StructField("n_errors", LongType(), False),
            StructField("first_ts", TimestampType(), True),
            StructField("last_ts", TimestampType(), True),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (url,) = key
        if state.hasTimedOut:
            # idle-feed eviction: emit the final accumulated row once,
            # then FREE the state — no re-arm, no duplicate re-emission
            # on later timeout intervals.
            n_pages, n_entries, n_errors, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "url": url,
                        "n_pages": n_pages,
                        "n_entries": n_entries,
                        "n_errors": n_errors,
                        "first_ts": first_ts,
                        "last_ts": last_ts,
                    }
                ]
            )
            return
        n_pages = n_entries = n_errors = 0
        first_ts = last_ts = None
        if state.exists:
            n_pages, n_entries, n_errors, first_ts, last_ts = state.get
        for pdf in pdfs:
            n_pages += len(pdf)
            n_entries += int(pdf["n_entries"].sum())
            n_errors += int(pdf["n_errors"].sum())
            ts = pdf["warc_ts"].dropna()
            if len(ts):
                lo, hi = ts.min(), ts.max()
                first_ts = lo if first_ts is None or lo < first_ts else first_ts
                last_ts = hi if last_ts is None or hi > last_ts else last_ts
        state.update((n_pages, n_entries, n_errors, first_ts, last_ts))
        if session_timeout_ms is not None:
            state.setTimeoutDuration(session_timeout_ms)
        yield pd.DataFrame(
            [
                {
                    "url": url,
                    "n_pages": n_pages,
                    "n_entries": n_entries,
                    "n_errors": n_errors,
                    "first_ts": first_ts,
                    "last_ts": last_ts,
                }
            ]
        )

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if session_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return parsed.groupBy("url").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout_conf,
    )


FETCH_META_SCHEMA = "url string, fetch_ts timestamp, http_status int, latency_ms long"


def stream_join_fetch_meta(
    pages_stream: DataFrame,
    meta_stream: DataFrame,
    watermark: str = "2 hours",
    join_horizon: str = "1 hour",
) -> DataFrame:
    """Watermarked STREAM-STREAM inner join: landing pages enriched
    with the crawler's fetch metadata (status, latency) arriving on a
    second stream.

    Spark buffers both sides in the state store; eviction needs BOTH a
    watermark on each side's event time AND a time-range join
    condition (|fetch_ts - warc_ts| <= join_horizon) so the planner
    can prove when a buffered row can never match again — without the
    range predicate the state grows forever on unbounded streams.
    Returns pages columns + http_status/latency_ms."""
    p = pages_stream.withWatermark("warc_ts", watermark)
    m = meta_stream.withWatermark("fetch_ts", watermark).select(
        F.col("url").alias("m_url"), "fetch_ts", "http_status", "latency_ms"
    )
    cond = (
        (p["url"] == m["m_url"])
        & (m["fetch_ts"] >= F.expr(f"warc_ts - interval {join_horizon}"))
        & (m["fetch_ts"] <= F.expr(f"warc_ts + interval {join_horizon}"))
    )
    return p.join(m, cond, "inner").drop("m_url")


def run_stream_join_to_table(
    spark: SparkSession,
    pages_dir: str,
    meta_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: Optional[int] = None,
    watermark: str = "2 hours",
) -> None:
    """Drain a pages landing dir JOINED with a fetch-metadata landing
    dir (stream-stream, availableNow) into a parquet table exactly
    once: (url, warc_ts, http_status, latency_ms).

    ``watermark`` must cover the corpus's event-time span when the
    caller needs EVERY pair joined (a lagging side whose buffered rows
    age past the watermark is dropped mid-drain — callers with a value
    oracle derive the watermark from the span; ADVICE r4)."""
    pages = stream_pages(spark, pages_dir, max_files_per_trigger=max_files_per_trigger)
    meta_reader = spark.readStream.schema(FETCH_META_SCHEMA)
    if max_files_per_trigger is not None:
        meta_reader = meta_reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    meta = meta_reader.parquet(meta_dir)
    joined = stream_join_fetch_meta(pages, meta, watermark=watermark).select(
        "url", "warc_ts", "http_status", "latency_ms"
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_to_table(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> None:
    """Drain everything currently in ``pages_dir`` into a parquet
    triples table exactly once (availableNow trigger), with restart
    safety from the checkpoint WAL.  Returns after the drain."""
    triples = stream_triples(
        stream_pages(spark, pages_dir, max_files_per_trigger=max_files_per_trigger)
    )
    q = (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_host_fetch_counts(
    captures_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    url_col: str = "url",
    ts_col: str = "capture_ts",
) -> DataFrame:
    """Streaming crawl-rate monitor: a live capture feed -> per
    (event-time window, host) fetch counts — what a crawl controller
    watches to enforce politeness budgets IN FLIGHT (the streaming
    counterpart of frontier.politeness_schedule's static plan).
    Watermarked windowed aggregation; host extraction is the same
    codegen regex as the batch tier (frontier.host_of)."""
    from .frontier import host_of

    w = captures_stream.withWatermark(ts_col, watermark)
    return (
        w.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            host_of(url_col).alias("host"),
        )
        .agg(F.count("*").alias("n_fetches"))
        .select(
            F.col("w.start").alias("window_start"),
            "host",
            "n_fetches",
        )
    )
