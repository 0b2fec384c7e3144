"""Scale stress for the curation-tier SQL queries (VERDICT r4 item 7):
decontaminate_ngram_overlap, duplicate_text_spans and lm_quality_score
run only at driver eval scale (~5k docs) — this harness proves the
gram-explode + broadcast plan shapes hold at 10M synthetic documents:

* the benchmark-gram / surprisal-table joins stay BROADCAST (asserted
  from the executed plan — AQE converts at runtime from actual sizes,
  so the assertion is about real bytes, not estimates);
* the gram/token aggregations keep map-side partial aggregation
  (HashAggregate below the Exchange), so hot grams under the skewed
  word distribution reduce before they shuffle — no skew collapse;
* wall time at two parallelism levels for the heaviest query.

Corpus: deterministic JVM-side docs (xxhash64-derived words, ZERO RNG,
no driver data).  Word ids are quadratically skewed over a 64-word
vocabulary, so a handful of grams are corpus-hot — the adversarial
case for the explode+agg shape.  Vocabulary 64 keeps the benchmark
gram set bounded (<= 64^3 grams), mirroring real decontamination where
the eval set is tiny next to the corpus.

Usage:  python bench/curation_stress.py [n_docs] [cpus]
Prints one JSON line per query with wall seconds + plan facts.
Pin with taskset; never run two Spark jobs concurrently.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def make_documents(spark, n: int, min_words: int = 24, spread: int = 16):
    """doc i: words w<k> with k = (h*h) div 1024 over h = xxhash64(i, j)
    mod 1024, mapped into a 64-word vocabulary — quadratic skew: low
    word ids dominate, so some 3-grams are corpus-hot."""
    n_words = F.lit(min_words) + (F.abs(F.xxhash64(F.col("id"))) % spread).cast("int")
    word = lambda j: F.concat(  # noqa: E731
        F.lit("w"),
        (((F.abs(F.xxhash64(F.col("id"), j)) % 1024)
          * (F.abs(F.xxhash64(F.col("id"), j)) % 1024)) / F.lit(16384))
        .cast("long"),
    )
    text = F.concat_ws(
        " ",
        F.transform(F.sequence(F.lit(0), n_words - 1), lambda j: word(j)),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.concat(F.lit("src"), (F.col("id") % 5)).alias("source"),
        F.lit("en").alias("lang"),
    ).withColumn("n_chars", F.length("text"))


def run_one(spark, name: str, sql: str) -> dict:
    df = spark.sql(sql)
    t0 = time.perf_counter()
    rows = df.collect()
    wall = round(time.perf_counter() - t0, 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "query": name,
        "wall_sec": wall,
        "n_rows": len(rows),
        "broadcast_join": "BroadcastHashJoin" in plan,
        "sort_merge_join": "SortMergeJoin" in plan,
        # map-side partial agg: a partial-mode HashAggregate exists
        "partial_agg": ("partial_" in plan) or ("partial" in plan.lower()),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    section = sys.argv[3] if len(sys.argv) > 3 else "all"  # all | r4 | publish

    import __spark_entry__ as em
    from ffp_spark.pipeline import build_session

    spark = build_session(
        "curation-stress", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # materialize once so each query times its own plan, not corpus
    # generation (and all three see the identical physical input)
    docs = make_documents(spark, n).localCheckpoint(eager=True)
    docs.createOrReplaceTempView("documents")

    out = []
    for name in () if section == "publish" else (
        "decontaminate_ngram_overlap",
        "duplicate_text_spans",
        "lm_quality_score",
    ):
        sql = em._SPARK_DIALECT.get(name, em._SQL_QUERIES[name])
        r = run_one(spark, name, sql)
        r.update({"n_docs": n, "cpus": cpus})
        out.append(r)
        print(json.dumps(r), flush=True)

    if section == "publish":
        _run_publish(spark, em, docs, out, n, cpus)
        spark.stop()
        return

    # paragraph keep-first dedup (K73) — a DataFrame query, not shared
    # SQL: the claim under stress is the PLAN, min(struct) agg +
    # join-back with NO corpus-wide window sort
    from ffp_spark.textops import paragraph_dedup_stats

    pd_df = paragraph_dedup_stats(docs, width=2).orderBy("source")
    t0 = time.perf_counter()
    pd_rows = pd_df.collect()
    pd_rec = {
        "query": "paragraph_dedup",
        "wall_sec": round(time.perf_counter() - t0, 2),
        "n_rows": len(pd_rows),
        "n_docs": n,
        "cpus": cpus,
        "kept_total": sum(int(r.n_kept) for r in pd_rows),
        "paras_total": sum(int(r.n_paras) for r in pd_rows),
    }
    pd_plan = pd_df._jdf.queryExecution().executedPlan().toString()
    pd_rec["partial_agg"] = "partial" in pd_plan.lower()
    pd_rec["window_sort"] = "Window" in pd_plan
    out.append(pd_rec)
    print(json.dumps(pd_rec), flush=True)

    # shape assertions — fail loudly so a silent plan regression can't
    # masquerade as a slow box
    dec = out[0]
    assert dec["broadcast_join"] and not dec["sort_merge_join"], dec
    assert all(r["partial_agg"] for r in out), out
    assert not pd_rec["window_sort"], pd_rec  # keep-first is agg+join, not a window

    if section != "r4":
        _run_publish(spark, em, docs, out, n, cpus)
    spark.stop()


def _run_publish(spark, em, docs, out, n, cpus):
    # ---- round-6 publish-tier section (VERDICT r5 item 6): the four
    # curate->publish operators that only ran at driver eval scale ----
    from ffp_spark.packing import pack_sequences
    from ffp_spark.shards import shard_manifest, with_shard
    from ffp_spark.textops import bpe_token_counts, bpe_train

    def _final_plan(df) -> str:
        # AQE's toString appends an "== Initial Plan ==" section that
        # duplicates exchanges — count nodes in the FINAL plan only
        s = df._jdf.queryExecution().executedPlan().toString()
        return s.split("== Initial Plan ==")[0]

    # sequence packing: the scale claim is the TWO-PHASE prefix sum —
    # only the bucket-level table (n/4096 rows) ever crosses an
    # Exchange SinglePartition; the corpus stream never does.  AQE must
    # not collapse that shape.
    pk = pack_sequences(docs, seq_len=2048)
    t0 = time.perf_counter()
    pk_rows = pk.collect()  # one manifest row per sequence
    pk_wall = round(time.perf_counter() - t0, 2)
    pk_plan = _final_plan(pk)
    tok_total = docs.select(
        F.sum(F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")))
    ).collect()[0][0]
    tok = sum(int(r.n_tokens) for r in pk_rows)
    full = sum(1 for r in pk_rows if int(r.n_tokens) == 2048)
    pk_rec = {
        "query": "sequence_packing", "n_docs": n, "cpus": cpus,
        "wall_sec": pk_wall, "n_seqs": len(pk_rows), "tokens": tok,
        "single_partition_exchanges": pk_plan.count("Exchange SinglePartition"),
    }
    out.append(pk_rec)
    print(json.dumps(pk_rec), flush=True)
    assert tok == int(tok_total), (tok, tok_total)
    assert full >= len(pk_rows) - 1, pk_rec
    assert pk_rec["single_partition_exchanges"] == 1, pk_plan[:4000]

    # shard manifest: md5-mod placement + associative checksums must
    # stay a pure partial-agg'd groupBy — no window, no global sort
    sm = shard_manifest(with_shard(docs, n_shards=256))
    t0 = time.perf_counter()
    sm_rows = sm.collect()
    sm_plan = _final_plan(sm)
    sm_rec = {
        "query": "shard_manifest", "n_docs": n, "cpus": cpus,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "n_shards": len(sm_rows),
        "rows_total": sum(int(r.n_rows) for r in sm_rows),
        "partial_agg": "partial" in sm_plan.lower(),
        "window": "Window" in sm_plan,
    }
    out.append(sm_rec)
    print(json.dumps(sm_rec), flush=True)
    assert sm_rec["rows_total"] == n and sm_rec["partial_agg"], sm_rec
    assert not sm_rec["window"], sm_rec

    # learned-BPE apply: train is O(merges) tiny barriers over the
    # word-TYPE table (64 types here); the APPLY is the corpus-scale
    # stage and its (word -> n_tokens) map must BROADCAST into the
    # ~n*28-word stream, with a map-side partial per-doc reduce
    merges, seqs = bpe_train(docs, n_merges=10)
    bt = bpe_token_counts(docs, seqs).groupBy().agg(
        F.count("*").alias("n_docs"),
        F.sum("n_subword_tokens").alias("subtok"),
    )
    t0 = time.perf_counter()
    bt_row = bt.collect()[0]
    bt_plan = _final_plan(bt)
    bt_rec = {
        "query": "bpe_apply", "n_docs": n, "cpus": cpus,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "n_merges": len(merges),
        "docs_scored": int(bt_row.n_docs),
        "subword_tokens": int(bt_row.subtok),
        "broadcast_join": "BroadcastHashJoin" in bt_plan,
        "partial_agg": "partial" in bt_plan.lower(),
    }
    out.append(bt_rec)
    print(json.dumps(bt_rec), flush=True)
    assert bt_rec["docs_scored"] == n, bt_rec
    assert bt_rec["broadcast_join"] and bt_rec["partial_agg"], bt_rec

    # token-budget mixing: the greedy prefix window must stay
    # PARTITIONED BY source — a global window (Exchange
    # SinglePartition) here would serialize the whole corpus
    tb_sql = em._SPARK_DIALECT["token_budget_mix"]
    tb = spark.sql(tb_sql)
    t0 = time.perf_counter()
    tb_rows = tb.collect()
    tb_plan = _final_plan(tb)
    tb_rec = {
        "query": "token_budget_mix", "n_docs": n, "cpus": cpus,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "n_sources": len(tb_rows),
        "docs_total": sum(int(r.n_docs_total) for r in tb_rows),
        "single_partition_exchanges": tb_plan.count("Exchange SinglePartition"),
    }
    out.append(tb_rec)
    print(json.dumps(tb_rec), flush=True)
    assert tb_rec["docs_total"] == n, tb_rec
    assert tb_rec["single_partition_exchanges"] == 0, tb_plan[:4000]


if __name__ == "__main__":
    main()
