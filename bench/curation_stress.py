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
    for name in (
        "decontaminate_ngram_overlap",
        "duplicate_text_spans",
        "lm_quality_score",
    ):
        sql = em._SPARK_DIALECT.get(name, em._SQL_QUERIES[name])
        r = run_one(spark, name, sql)
        r.update({"n_docs": n, "cpus": cpus})
        out.append(r)
        print(json.dumps(r), flush=True)

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
    spark.stop()


if __name__ == "__main__":
    main()
