"""spark-submit entry point for the KG-construction pipeline.

    spark-submit --master local[32] \
        --py-files ffp_spark.zip \
        ffp_spark/job.py \
        --pages /path/to/pages_parquet \
        --out   /path/to/kg_tables \
        --snapshot-id 1 \
        [--n-parts 64] [--incremental-from 0] [--no-resume]

On a real cluster the same invocation takes --master yarn/k8s and the
same --py-files zip; everything else is identical (north rule K12).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="ffp-spark KG pipeline")
    p.add_argument("--pages", required=True, help="PAGES parquet path")
    p.add_argument("--out", required=True, help="output table root")
    p.add_argument("--snapshot-id", type=int, required=True)
    p.add_argument("--n-parts", type=int, default=64)
    p.add_argument("--incremental-from", type=int, default=None)
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from ffp_spark.pipeline import run_snapshot

    spark = SparkSession.builder.appName("ffp-kg-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    report = run_snapshot(
        spark,
        spark.read.parquet(args.pages),
        args.out,
        snapshot_id=args.snapshot_id,
        n_parts=args.n_parts,
        resume=not args.no_resume,
        incremental_from=args.incremental_from,
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
