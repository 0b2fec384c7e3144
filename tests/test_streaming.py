"""Structured Streaming ingest: streaming parse/triples must agree with
the batch path, survive restarts exactly-once, and bound state via
watermarks."""

import pytest
from pyspark.sql import functions as F

from ffp_spark.datagen import synth_pages
from ffp_spark.streaming import (
    run_stream_to_table,
    stream_pages,
    stream_triples,
    windowed_pred_counts,
)
from ffp_spark.triples import emit_triples
from ffp_spark.udfs import parse_pages


@pytest.fixture()
def landing(spark, tmp_path):
    d = tmp_path / "landing"
    # two separate file drops — the stream sees them as distinct inputs
    synth_pages(spark, 60, seed=11).coalesce(2).write.mode("append").parquet(str(d))
    synth_pages(spark, 40, seed=12).coalesce(2).write.mode("append").parquet(str(d))
    return str(d)


def test_stream_triples_match_batch(spark, tmp_path, landing):
    out = tmp_path / "triples_out"
    ckpt = tmp_path / "ckpt"
    run_stream_to_table(spark, landing, str(out), str(ckpt))
    streamed = spark.read.parquet(str(out))
    batch = emit_triples(parse_pages(spark.read.parquet(landing)))
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()


def test_stream_restart_is_exactly_once(spark, tmp_path, landing):
    out = tmp_path / "triples_out"
    ckpt = tmp_path / "ckpt"
    run_stream_to_table(spark, landing, str(out), str(ckpt))
    n1 = spark.read.parquet(str(out)).count()
    # restart with the same checkpoint: nothing new landed -> no new rows
    run_stream_to_table(spark, landing, str(out), str(ckpt))
    assert spark.read.parquet(str(out)).count() == n1
    # new files land -> only the delta is appended
    synth_pages(spark, 20, seed=13).coalesce(1).write.mode("append").parquet(landing)
    run_stream_to_table(spark, landing, str(out), str(ckpt))
    batch = emit_triples(parse_pages(spark.read.parquet(landing)))
    assert spark.read.parquet(str(out)).count() == batch.count()


def test_windowed_counts_have_watermark_and_match_batch(spark, tmp_path, landing):
    stream = windowed_pred_counts(stream_pages(spark, landing), window="1 hour")
    # the streaming plan carries an event-time watermark (bounded state)
    assert "watermark" in stream._jdf.queryExecution().analyzed().toString().lower()
    q = (
        stream.writeStream.format("memory")
        .queryName("wpc")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.window_start: (r.n_entries, r.n_published, r.n_authored)
        for r in spark.sql("SELECT * FROM wpc").collect()
    }
    parsed = parse_pages(spark.read.parquet(landing))
    ok = parsed.filter(F.col("error").isNull() & F.col("entries").isNotNull())
    entries = ok.select("warc_ts", F.explode("entries").alias("entry"))
    want = {
        r.ws: (r.n, r.np, r.na)
        for r in entries.groupBy(
            F.window("warc_ts", "1 hour").getField("start").alias("ws")
        )
        .agg(
            F.count("*").alias("n"),
            F.count("entry.published").alias("np"),
            F.count("entry.author").alias("na"),
        )
        .collect()
    }
    assert got == want


def test_stream_dedup_is_stateful_across_batches(spark, tmp_path):
    from ffp_spark.streaming import stream_dedup_pages

    d = tmp_path / "dedup_landing"
    # the same 30 urls land twice (two files = at least two stream inputs)
    synth_pages(spark, 30, seed=21).coalesce(1).write.mode("append").parquet(str(d))
    synth_pages(spark, 30, seed=21).coalesce(1).write.mode("append").parquet(str(d))
    synth_pages(spark, 50, seed=21).coalesce(1).write.mode("append").parquet(str(d))

    from ffp_spark.streaming import stream_pages

    # one file per trigger forces the dedup state to carry across batches
    deduped = stream_dedup_pages(stream_pages(spark, str(d), max_files_per_trigger=1))
    out = tmp_path / "dedup_out"
    q = (
        deduped.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(str(out))
    assert got.count() == 50  # 30 dups suppressed across micro-batches
    assert got.select("url").distinct().count() == 50


def test_stream_dedup_state_evicts_past_watermark(spark, tmp_path):
    """A url re-crawled AFTER the watermark horizon must re-enter the
    corpus (state evicted), not stay suppressed forever."""
    from ffp_spark.streaming import stream_dedup_pages, stream_pages

    d = tmp_path / "evict_landing"
    t0 = "2024-01-01 00:00:00"

    def land(n, seed, ts, prefix=""):
        df = synth_pages(spark, n, seed=seed).withColumn(
            "warc_ts", F.lit(ts).cast("timestamp")
        )
        if prefix:
            df = df.withColumn("url", F.concat(F.lit(prefix), F.col("url")))
        df.coalesce(1).write.mode("append").parquet(str(d))

    land(30, 21, t0)  # batch 1: 30 urls at T0
    # batch 2: one unrelated url (disjoint by prefix) 10h later ->
    # watermark advances to T0+8h for the NEXT batch
    land(1, 99, "2024-01-01 10:00:00", prefix="advancer-")
    # batch 3: another advancer; during/after this batch the T0 state
    # (expiry T0+2h) is evicted under the T0+8h watermark — state
    # cleanup runs a batch behind the watermark update
    land(1, 98, "2024-01-01 10:00:00", prefix="advancer2-")
    # batch 4: the SAME 30 urls again at T0+9h — outside the 2h horizon,
    # so they must be re-admitted
    land(30, 21, "2024-01-01 09:00:00")

    deduped = stream_dedup_pages(
        stream_pages(spark, str(d), max_files_per_trigger=1), watermark="2 hours"
    )
    out = tmp_path / "evict_out"
    q = (
        deduped.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(str(out))
    # 30 (first crawl) + 2 (advancers) + 30 (re-crawl past the horizon)
    assert got.count() == 62


def test_feed_session_stats_timeout_evicts_state(spark, tmp_path):
    """On a processing-time timeout the operator must emit ONE final row
    and free the state — never re-arm and re-emit idle keys forever."""
    from ffp_spark.streaming import feed_session_stats, stream_pages

    d = tmp_path / "timeout_landing"

    # three files with DISJOINT url sets (explicit prefix — synth domains
    # can collide across seeds); one file per trigger => keys from file 1
    # are idle during batches 2 and 3
    def land(tag, seed):
        (
            synth_pages(spark, 5, seed=seed)
            .withColumn("url", F.concat(F.lit(tag), F.col("url")))
            .coalesce(1)
            .write.mode("append")
            .parquet(str(d))
        )

    land("b1-", 41)
    land("b2-", 42)
    land("b3-", 43)

    stats = feed_session_stats(
        stream_pages(spark, str(d), max_files_per_trigger=1), session_timeout_ms=1
    )
    q = (
        stats.writeStream.format("memory")
        .queryName("sess_evict")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )

    def emissions():
        out = {}
        for r in spark.sql("SELECT url FROM sess_evict").collect():
            out[r.url] = out.get(r.url, 0) + 1
        return out

    # a query with an armed ProcessingTimeTimeout keeps scheduling
    # timeout batches, so availableNow never self-terminates: poll until
    # every key got its data emission + exactly one timeout final, then
    # let a few more timeout batches run to prove nothing re-emits
    deadline = 120
    while deadline > 0:
        got = emissions()
        if len(got) == 15 and all(n >= 2 for n in got.values()):
            break
        q.awaitTermination(2)
        deadline -= 2
    settle_from = (q.lastProgress or {}).get("batchId", 0)
    while ((q.lastProgress or {}).get("batchId", 0)) < settle_from + 3 and deadline > 0:
        q.awaitTermination(2)
        deadline -= 2
    got = emissions()
    q.stop()
    # one data emission + EXACTLY one timeout final per key; with the
    # old re-arm bug every later timeout batch re-emitted all idle keys
    assert len(got) == 15, got
    assert all(n == 2 for n in got.values()), got
    # state store actually freed after the finals
    assert (q.lastProgress["stateOperators"][0]["numRowsTotal"]) == 0


def test_feed_session_stats_accumulate_across_batches(spark, tmp_path):
    from ffp_spark.streaming import feed_session_stats, stream_pages

    d = tmp_path / "sess_landing"
    # the same 20 urls land in TWO separate files; one file per trigger
    # forces the custom state to carry across micro-batches
    synth_pages(spark, 20, seed=31).coalesce(1).write.mode("append").parquet(str(d))
    synth_pages(spark, 20, seed=31).coalesce(1).write.mode("append").parquet(str(d))

    stats = feed_session_stats(stream_pages(spark, str(d), max_files_per_trigger=1))
    q = (
        stats.writeStream.format("memory")
        .queryName("sess")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per (batch, key); the LAST emission per
    # url carries the accumulated totals
    rows = spark.sql("SELECT * FROM sess").collect()
    final = {}
    for r in rows:
        final[r.url] = max(final.get(r.url, 0), r.n_pages)
    assert len(final) == 20
    assert all(n == 2 for n in final.values()), final  # both batches counted


def test_stream_stream_join_matches_batch_and_respects_horizon(spark, tmp_path):
    """Watermarked stream-stream join: (a) cross-micro-batch matches land
    (pages and meta drain at different paces), (b) rows outside the
    |fetch_ts - warc_ts| <= 1h horizon never match, (c) the joined table
    equals the batch join of the same inputs."""
    from ffp_spark.streaming import run_stream_join_to_table

    pages_dir, meta_dir = str(tmp_path / "p"), str(tmp_path / "m")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    pages = synth_pages(spark, 50, seed=21)
    pages.coalesce(4).write.mode("overwrite").parquet(pages_dir)
    # in-horizon meta for even-hash urls, out-of-horizon (+3h) for odd —
    # the range predicate must drop the odd half
    in_h = (F.abs(F.xxhash64("url")) % 2 == 0)
    meta = pages.select(
        "url",
        F.when(in_h, F.col("warc_ts") + F.expr("interval 10 minutes"))
         .otherwise(F.col("warc_ts") + F.expr("interval 3 hours")).alias("fetch_ts"),
        F.lit(200).cast("int").alias("http_status"),
        F.lit(5).cast("long").alias("latency_ms"),
    )
    meta.coalesce(4).write.mode("overwrite").parquet(meta_dir)

    run_stream_join_to_table(spark, pages_dir, meta_dir, out, ckpt,
                             max_files_per_trigger=1)
    joined = spark.read.parquet(out)
    expected = pages.where(in_h).count()
    assert joined.count() == expected
    assert expected > 0
    # batch equivalence on the url set
    got_urls = {r.url for r in joined.select("url").collect()}
    exp_urls = {r.url for r in pages.where(in_h).select("url").collect()}
    assert got_urls == exp_urls
