"""Headline benchmark (driver contract).

Runs the flagship KG pipeline plus representative relational /
training-data queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., extras...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from ffp_spark.pipeline import build_session
    from ffp_spark.datagen import synth_pages
    from ffp_spark.docfeeds import documents_as_pages, load_documents
    from ffp_spark.triples import emit_triples
    from ffp_spark.udfs import parse_pages
    import __spark_entry__ as entry_mod

    spark = build_session(
        "ffp-bench", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # flagship: docs -> feeds -> Arrow parse -> triples (counted)
    t0 = time.perf_counter()
    docs = load_documents(spark, sf_dir)
    pages = documents_as_pages(docs)
    n_triples = emit_triples(parse_pages(pages)).count()
    dt = time.perf_counter() - t0
    timings["kg_docfeeds_triples"] = round(dt, 3)
    n_docs = docs.count()
    extras["docs_per_sec"] = round(n_docs / dt, 1)
    extras["triples_per_sec"] = round(n_triples / dt, 1)

    # synthetic multi-entry corpus (heavier parse, skewed domains)
    n_synth = max(500, int(float(sf) * 30000)) if sf.replace(".", "").isdigit() else 3000
    t0 = time.perf_counter()
    synth_triples = emit_triples(parse_pages(synth_pages(spark, n_synth, seed=42))).count()
    dt = time.perf_counter() - t0
    timings["kg_synth_triples"] = round(dt, 3)
    extras["synth_pages"] = n_synth
    extras["synth_triples_per_sec"] = round(synth_triples / dt, 1)

    # full pipeline: parse -> triples -> linking -> CC -> snapshot commit
    import shutil
    import tempfile

    from ffp_spark.pipeline import run_snapshot

    snap_dir = tempfile.mkdtemp(prefix="ffp_bench_snap_")
    try:
        stage: dict[str, float] = {}
        t0 = time.perf_counter()
        report_snap = run_snapshot(
            spark, synth_pages(spark, n_synth, seed=43), snap_dir,
            snapshot_id=1, n_parts=max(16, cpus), stage_timings=stage,
        )
        dt = time.perf_counter() - t0
        timings["kg_full_snapshot"] = round(dt, 3)
        extras["snapshot_pages_per_sec"] = round(n_synth / dt, 1)
        extras["snapshot_nodes"] = report_snap["nodes"]
        extras["snapshot_edges"] = report_snap["edges"]
        # per-stage attribution (parse / link_cc / agg / write) so
        # round-over-round regressions point at a stage, not the total
        extras["snapshot_stages"] = stage

        # serving-path graph analytics over the committed snapshot
        from ffp_spark.graph import analyze_snapshot

        t0 = time.perf_counter()
        reports = analyze_snapshot(spark, snap_dir, pr_iters=5, top_k=20)
        n_hist = len(reports["degree_histogram"].collect())
        top = reports["top_pagerank"].collect()
        tri = reports["triangles"].collect()[0]
        timings["kg_snapshot_analytics"] = round(time.perf_counter() - t0, 3)
        extras["snapshot_degree_levels"] = n_hist
        extras["snapshot_top_pr_q"] = int(top[0].pr_q)
        extras["snapshot_triangles"] = int(tri.n_triangles)
    finally:
        shutil.rmtree(snap_dir, ignore_errors=True)

    # representative registered queries (same code path the driver checks)
    queries = entry_mod.queries()
    for name in (
        "agg_pricing",
        "dim_join_rollup",
        "window_top_event",
        "explode_tokens",
        "dedup_exact",
        "ngram_jaccard_pairs",
        "knn_bruteforce",
        "minhash_lsh_candidates",
        # round-3 additions (7 queries: kg_graph_degrees, graph_pagerank,
        # graph_triangles, link_cc_components, pii_scrub, asof_join_events,
        # bm25_topk) — totals are NOT line-comparable to BENCH_r02;
        # per-query rows are
        "kg_graph_degrees",
        "graph_pagerank",
        "graph_triangles",
        "link_cc_components",
        "pii_scrub",
        "asof_join_events",
        "bm25_topk",
        # round-4 additions (4 queries: graph_hits, semdedup_discards,
        # decontaminate_ngram_overlap, entity_resolution) — totals are
        # NOT line-comparable to BENCH_r03; per-query rows are
        "graph_hits",
        "semdedup_discards",
        "decontaminate_ngram_overlap",
        "entity_resolution",
        # round-5 additions (3 queries: sequence_packing,
        # shard_export_manifest, bpe_merge_table) — totals are NOT
        # line-comparable to BENCH_r04; per-query rows are
        "sequence_packing",
        "shard_export_manifest",
        "bpe_merge_table",
        "bigram_lm_surprisal",
        "boilerplate_chunks",
        "graph_link_prediction",
        "neardup_canonical",
        "graph_neighborhood_hll",
        "graph_harmonic_centrality",
        "graph_effective_diameter",
        # round-5 continuation (3 queries: graph_ktruss, graph_scc,
        # paragraph_dedup) — totals NOT line-comparable to earlier
        # BENCH_r05 runs; per-query rows are.  kmeans_clusters is
        # excluded: the embeddings table is fixed at 500 rows, so its
        # scale evidence lives in bench/kmeans_stress.py instead
        "graph_ktruss",
        "graph_scc",
        "paragraph_dedup",
        # round-6 additions (5 queries: the web tier — WARC->CDX,
        # anchor soup -> host PageRank, WET text, PSL domains, revisit
        # dedup) — totals NOT line-comparable to BENCH_r05; per-query
        # rows are
        "warc_cdx_index",
        "host_pagerank",
        "wet_text_stats",
        "registered_domains",
        "warc_revisit_dedup",
    ):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    report = {
        "metric": "kg_pipeline_and_query_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "n_triples": n_triples,
        **extras,
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
