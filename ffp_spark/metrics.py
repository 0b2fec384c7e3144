"""Lineage + quality metrics (operator K10).

* per-partition lineage rows: counts per (snapshot_id, part_id) for
  pages/parsed/errors/entries/triples,
* error-class histogram (reference S11's error taxonomy as a groupBy),
* triple-level precision/recall vs a golden triple set via exact-match
  join on (subj, pred, obj, src_url) — the BASELINE.json north metric
  (P >= 0.95 and R >= 0.95).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def partition_lineage(parsed: DataFrame, snapshot_id: int) -> DataFrame:
    """Counts per explicit part_id (url-hash partition), map-side combined."""
    return (
        parsed.groupBy("part_id")
        .agg(
            F.count("*").alias("n_pages"),
            F.count(F.when(F.col("error").isNull(), 1)).alias("n_parsed"),
            F.count(F.when(F.col("error").isNotNull(), 1)).alias("n_errors"),
            F.sum(F.coalesce(F.size("entries"), F.lit(0))).alias("n_entries"),
        )
        .withColumn("snapshot_id", F.lit(snapshot_id))
        .withColumn("status", F.lit("done"))
    )


def error_histogram(parsed: DataFrame) -> DataFrame:
    return (
        parsed.filter(F.col("error_class").isNotNull())
        .groupBy("error_class")
        .count()
        .orderBy(F.desc("count"))
    )


def precision_recall(
    ours: DataFrame, golden: DataFrame, keys: tuple[str, ...] = ("subj", "pred", "obj", "src_url")
) -> dict[str, float]:
    """Exact-match triple P/R.  Both sides deduplicated on the key; the
    intersection is a broadcast-friendly inner join at fixture scale and
    a plain shuffled join at corpus scale (AQE picks the strategy)."""
    ours_d = ours.select(*keys).distinct()
    golden_d = golden.select(*keys).distinct()
    n_ours = ours_d.count()
    n_gold = golden_d.count()
    n_hit = ours_d.join(golden_d, on=list(keys), how="inner").count()
    precision = n_hit / n_ours if n_ours else 0.0
    recall = n_hit / n_gold if n_gold else 0.0
    return {
        "n_ours": n_ours,
        "n_golden": n_gold,
        "n_intersect": n_hit,
        "precision": precision,
        "recall": recall,
    }
