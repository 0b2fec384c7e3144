"""Scale stress for the round-6 web tier: registered-domain
extraction, anchor-text indexing, and revisit dedup run only at
driver eval scale (500 synthesized rows) — this harness proves the
plan shapes hold at 10M rows:

* host_domains: the PSL rule join stays BROADCAST (file-sized rule
  table — a sort-merge join here would shuffle 10M x candidate rows
  against 31 rules), the candidate explode is a map-side Generate
  (bounded fan-out <= max_rule_labels x 2), and the prevailing-rule
  agg keeps map-side partials;
* anchor_text_index: the (target, anchor) collapse keeps partial
  aggregation BEFORE the shuffle (hot targets reduce map-side under
  a skewed target distribution — the adversarial case), and the
  top-k window partitions by target: NO Exchange SinglePartition
  anywhere in the final plan;
* capture_revisits: keep-first stays a min(struct) agg + join-back —
  NO Window operator (a window formulation would sort every digest
  group; the agg reduces map-side).

Corpus: deterministic JVM-side synthesis (xxhash64-derived, ZERO RNG,
no driver data).  Host label counts and anchor/target choices are
skewed so hot keys exist.

Usage:  python bench/webtier_stress.py [n_rows] [cpus]
Prints one JSON line per operator with wall seconds + plan facts and
asserts the plan shapes.  Pin with taskset; never run two Spark jobs
concurrently.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def make_hosts(spark, n: int):
    """~n distinct hosts across every PSL rule class: plain com,
    co.uk, the ck wildcard, kawasaki.jp wildcard+exception, unknown
    TLDs, 1-4 subdomain labels (xxhash-skewed so deep hosts are
    rare, like real crawls)."""
    h = F.abs(F.xxhash64(F.col("id")))
    depth = (h % F.lit(16)).cast("int")  # 0-15 -> mostly shallow
    sub = F.when(depth < 8, F.lit("")).otherwise(
        F.concat(F.lit("s"), (h % 1000).cast("string"), F.lit("."))
    )
    sub2 = F.when(depth % 4 == 0, F.concat(F.lit("www."), sub)).otherwise(sub)
    stem = F.concat(F.lit("site"), (h % (n // 2 + 1)).cast("string"))
    tld = F.element_at(
        F.array(
            F.lit("com"), F.lit("com"), F.lit("com"), F.lit("co.uk"),
            F.lit("org"), F.lit("github.io"), F.lit("ck"), F.lit("shop.ck"),
            F.lit("city.kawasaki.jp"), F.lit("internal"),
        ),
        ((h % 10) + 1).cast("int"),
    )
    return spark.range(n).select(
        F.concat(sub2, stem, F.lit("."), tld).alias("host")
    )


def make_links(spark, n: int):
    """n anchor links: ~n/200 targets with a quadratically skewed
    distribution (hot pages get most links), 8 anchor variants per
    target + one corpus-wide noise anchor on even ids."""
    h = F.abs(F.xxhash64(F.col("id")))
    # quadratic skew: low target ids dominate
    tgt = ((h % 4096) * (h % 4096) / F.lit(4096 * 200)).cast("long")
    anchor = F.when(
        F.col("id") % 2 == 0, F.lit("Click here")
    ).otherwise(F.concat(F.lit("Brand "), (h % 8).cast("string")))
    return spark.range(n).select(
        F.concat(F.lit("https://p"), (F.col("id") % (n // 4 + 1)).cast("string"),
                 F.lit(".example/")).alias("url"),
        F.concat(F.lit("https://t"), tgt, F.lit(".example/")).alias("href"),
        anchor.alias("anchor"),
        F.lit(False).alias("nofollow"),
    )


def make_captures(spark, n: int):
    """n captures over n/4 urls with n/50 digests (heavy mirror/
    recrawl duplication — the regime revisit dedup exists for)."""
    h = F.abs(F.xxhash64(F.col("id")))
    return spark.range(n).select(
        F.concat(F.lit("https://c"), (h % (n // 4 + 1)).cast("string"),
                 F.lit(".example/p")).alias("url"),
        (F.lit(1500000000000) + F.col("id")).alias("ts"),
        F.concat(F.lit("sha1:"), (h % (n // 50 + 1)).cast("string")).alias(
            "digest"
        ),
    )


def timed(df, agg=True):
    t0 = time.perf_counter()
    if agg:
        row = df.groupBy().agg(
            F.count("*").alias("n"),
            F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))).alias(
                "fp"
            ),
        ).collect()[0]
        n, fp = row.n, row.fp
    else:
        n, fp = df.count(), None
    wall = round(time.perf_counter() - t0, 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return wall, n, fp, plan


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from ffp_spark.domains import host_domains
    from ffp_spark.frontier import allocate_budget, capture_revisits
    from ffp_spark.pipeline import build_session
    from ffp_spark.weblinks import anchor_text_index

    spark = build_session(
        "webtier-stress", master=f"local[{cpus}]",
        shuffle_partitions=max(32, cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = []

    hosts = make_hosts(spark, n).localCheckpoint(eager=True)
    hd = host_domains(hosts)
    wall, rows, fp, plan = timed(hd)
    rec = {
        "query": "host_domains", "n_rows": n, "cpus": cpus,
        "wall_sec": wall, "n_out": rows, "fingerprint": fp,
        "broadcast_join": "BroadcastHashJoin" in plan
        or "BroadcastNestedLoop" in plan,
        "single_partition": "Exchange SinglePartition" in plan,
        "partial_agg": "partial" in plan.lower(),
    }
    out.append(rec)
    print(json.dumps(rec), flush=True)
    assert rec["broadcast_join"], "PSL rule join must broadcast"
    assert not rec["single_partition"], plan
    hosts.unpersist()

    links = make_links(spark, n).localCheckpoint(eager=True)
    ai = anchor_text_index(links, k=3)
    wall, rows, fp, plan = timed(ai)
    rec = {
        "query": "anchor_text_index", "n_rows": n, "cpus": cpus,
        "wall_sec": wall, "n_out": rows, "fingerprint": fp,
        "single_partition": "Exchange SinglePartition" in plan,
        "partial_agg": "partial" in plan.lower(),
    }
    out.append(rec)
    print(json.dumps(rec), flush=True)
    assert not rec["single_partition"], plan
    assert rec["partial_agg"], plan
    links.unpersist()

    caps = make_captures(spark, n).localCheckpoint(eager=True)
    rv = capture_revisits(caps)
    wall, rows, fp, plan = timed(rv)
    rec = {
        "query": "capture_revisits", "n_rows": n, "cpus": cpus,
        "wall_sec": wall, "n_out": rows, "fingerprint": fp,
        "window": "Window" in plan,
        "partial_agg": "partial" in plan.lower(),
    }
    out.append(rec)
    print(json.dumps(rec), flush=True)
    assert not rec["window"], "keep-first must stay an agg, not a window"

    scores = (
        spark.range(n)
        .select(
            F.concat(F.lit("d"), F.col("id")).alias("domain"),
            (F.abs(F.xxhash64(F.col("id"))) % 10000).alias("score"),
        )
        .localCheckpoint(eager=True)
    )
    ab = allocate_budget(scores, 1_000_000_000)
    t0 = time.perf_counter()
    row = ab.groupBy().agg(
        F.sum("alloc").alias("total"), F.count("*").alias("n")
    ).collect()[0]
    wall = round(time.perf_counter() - t0, 2)
    plan = ab._jdf.queryExecution().executedPlan().toString()
    rec = {
        "query": "allocate_budget", "n_rows": n, "cpus": cpus,
        "wall_sec": wall, "n_out": row.n, "alloc_total": row.total,
        "conserved": row.total == 1_000_000_000,
        # SinglePartition exchanges exist (single-ROW total aggregates
        # + the <= n_buckets+1 bucket-totals window, duplicated by
        # uncached plan subtrees) — none carries the domain stream;
        # the assertable fact is that the per-row rank window is
        # BUCKET-partitioned, never global
        "n_single_partition": plan.count("Exchange SinglePartition"),
        "rank_window_bucketed": "windowspecdefinition(_bkt" in plan,
        "partial_agg": "partial" in plan.lower(),
    }
    out.append(rec)
    print(json.dumps(rec), flush=True)
    assert rec["conserved"], rec
    assert rec["rank_window_bucketed"], plan

    # related-hosts wedge join under hub skew: 5 hub nodes absorb ~10%
    # of 10M edges (~200k degree each) — uncapped they contribute
    # ~2e11 wedge pairs; the max_hub_degree cap is what makes the
    # operator survivable, so THAT configuration is what we stress
    from ffp_spark.graph import neighborhood_jaccard

    h = F.abs(F.xxhash64(F.col("id")))
    nn = n // 10 + 1
    g = spark.range(n).select(
        F.concat(F.lit("n"), (h % nn).cast("string")).alias("src"),
        F.when(
            h % 10 == 0, F.concat(F.lit("hub"), (h % 5).cast("string"))
        ).otherwise(
            F.concat(F.lit("n"), ((h / 7).cast("long") % nn).cast("string"))
        ).alias("dst"),
    ).localCheckpoint(eager=True)
    nj = neighborhood_jaccard(g, k=3, max_hub_degree=64)
    wall, rows, fp, plan = timed(nj)
    rec = {
        "query": "neighborhood_jaccard", "n_rows": n, "cpus": cpus,
        "wall_sec": wall, "n_out": rows, "fingerprint": fp,
        "partial_agg": "partial" in plan.lower(),
        "single_partition": "Exchange SinglePartition" in plan,
    }
    out.append(rec)
    print(json.dumps(rec), flush=True)
    assert not rec["single_partition"], plan
    g.unpersist()

    print(json.dumps({"ok": True, "results": len(out)}))
    spark.stop()


if __name__ == "__main__":
    main()
