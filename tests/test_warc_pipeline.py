"""End-to-end ingestion tier: .warc.gz -> HTTP split -> robots filter
-> PAGES -> run_snapshot committed tables (round-6 wiring of the S8
connector + K82 policy into the pipeline).

The strong check is EQUIVALENCE: the KG built from the WARC path must
emit exactly the triples of the KG built directly from the same PAGES
rows (restricted to robots-allowed URLs) — the ingestion tier adds and
loses nothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffp_spark.datagen import synth_pages
from ffp_spark.pipeline import pages_from_warc, run_snapshot
from ffp_spark.snapshots import read_snapshot
from ffp_spark.sources import warc_file_bytes


def _host(url: str) -> str:
    return url.split("/")[2]


def test_pages_from_warc_matches_direct_pages(spark, tmp_path):
    src = sorted(synth_pages(spark, 60, seed=11).collect(), key=lambda r: r.url)
    recs = []
    for r in src:
        head = (
            b"HTTP/1.1 200 OK\r\nContent-Type: application/xml\r\n"
            b"Content-Language: en\r\n\r\n"
        )
        date = r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        recs.append(("response", r.url, head + bytes(r.html), date))
    # non-page records the ingestion filter must drop
    recs.append(("request", src[0].url, b"GET / HTTP/1.1\r\n\r\n"))
    recs.append(("response", "https://gone.example/x", b"HTTP/1.1 404 NF\r\n\r\nno"))
    recs.append(("metadata", None, b"crawler notes"))
    for s in (0, 1):
        (tmp_path / f"w{s}.warc.gz").write_bytes(
            warc_file_bytes(
                [rec for i, rec in enumerate(recs) if i % 2 == s], gz=True
            )
        )

    hosts = sorted({_host(r.url) for r in src})
    blocked = set(hosts[::2])
    robots = spark.createDataFrame(
        [
            (h, "User-agent: *\nDisallow: /" if h in blocked else
             "User-agent: *\nDisallow:")
            for h in hosts
        ],
        "host string, body string",
    )
    warc_pages = pages_from_warc(
        spark, str(tmp_path / "w*.warc.gz"), robots=robots
    )
    got = {r.url: r for r in warc_pages.collect()}
    exp = [r for r in src if _host(r.url) not in blocked]
    assert set(got) == {r.url for r in exp}
    for r in exp:
        g = got[r.url]
        assert bytes(g.html) == bytes(r.html)  # body survives byte-exactly
        assert g.warc_ts == r.warc_ts  # WARC-Date round-trips
        assert g.lang == "en"  # Content-Language header

    # same KG from both ingestion paths
    rep = run_snapshot(
        spark, warc_pages, str(tmp_path / "kg_warc"), snapshot_id=1, n_parts=8
    )
    assert rep["pages"] == len(exp) and rep["triples"] > 0
    direct = spark.createDataFrame(exp, warc_pages.schema)
    run_snapshot(spark, direct, str(tmp_path / "kg_direct"), snapshot_id=1, n_parts=8)

    def triple_set(root):
        return {
            (r.subj, r.pred, r.obj)
            for r in read_snapshot(spark, root, "triples")
            .select("subj", "pred", "obj")
            .collect()
        }

    assert triple_set(tmp_path / "kg_warc") == triple_set(tmp_path / "kg_direct")
    # lineage rows committed for the WARC-ingested run
    lineage = read_snapshot(spark, tmp_path / "kg_warc", "lineage")
    assert lineage.filter("status = 'done'").count() > 0
    assert (
        lineage.agg(F.sum("n_pages").alias("s")).collect()[0].s == len(exp)
    )
