"""Volume stress for the temporal joins (round-4 evidence).

The as-of and range joins are value-oracled and plan-tested at driver
eval scale (~0.9 s); this harness proves the SHAPES hold at volume:

* asof_join_backward: 10M point rows against 1M quote rows over 10k
  keys — the union-window form must stay ONE shuffle + sort with no
  row multiplication (wall grows ~linearly in rows, never in
  points x quotes per key; a naive per-key nested loop would be
  ~1000 x 100 = 100k pair-rows per key here).
* interval_join: 10M points against 200k intervals (avg length ~ one
  bucket width) — the time-bucket equi-join must keep fan-out at
  ~2 rows per interval and never fall into BroadcastNestedLoop.

Deterministic inputs built JVM-side from spark.range + xxhash64 (no
driver data, no RNG).  Usage:
    python bench/temporal_stress.py [n_points] [n_quotes] [cpus]
Prints one JSON line.  Pin with taskset for scaling claims.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_quotes = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n_keys = 10_000
    horizon_ms = 86_400_000  # one day of activity

    from ffp_spark.asof import asof_join_backward
    from ffp_spark.pipeline import build_session
    from ffp_spark.rangejoin import interval_join

    spark = build_session(
        "temporal-stress", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "temporal_stress", "unit": "sec", "cpus": cpus}

    points = spark.range(n_points).select(
        (F.abs(F.xxhash64("id", F.lit(1))) % n_keys).alias("k"),
        (F.abs(F.xxhash64("id", F.lit(2))) % horizon_ms).alias("ts"),
        F.col("id").alias("point_id"),
    )
    quotes = spark.range(n_quotes).select(
        (F.abs(F.xxhash64("id", F.lit(3))) % n_keys).alias("k"),
        (F.abs(F.xxhash64("id", F.lit(4))) % horizon_ms).alias("qts"),
        (F.abs(F.xxhash64("id", F.lit(5))) % 100_000).alias("px"),
    )

    t0 = time.perf_counter()
    joined = asof_join_backward(points, quotes, "k", "ts", "qts", ["px"])
    agg = joined.agg(
        F.count("*").alias("n"),
        F.sum(F.coalesce(F.col("asof.px"), F.lit(0))).alias("px_sum"),
        F.count(F.col("asof.px")).alias("n_matched"),
    ).collect()[0]
    out["asof_sec"] = round(time.perf_counter() - t0, 2)
    out["asof_rows"] = int(agg.n)  # MUST equal n_points: no multiplication
    out["asof_matched"] = int(agg.n_matched)
    out["asof_px_sum"] = int(agg.px_sum)

    # intervals: 200k spans of ~1-2 bucket widths over the same horizon
    n_iv = 200_000
    bucket_ms = 600_000  # 10 min
    intervals = spark.range(n_iv).select(
        (F.abs(F.xxhash64("id", F.lit(6))) % n_keys).alias("k"),
        (F.abs(F.xxhash64("id", F.lit(7))) % horizon_ms).alias("start_ms"),
        F.col("id").alias("interval_id"),
    ).withColumn(
        "end_ms",
        F.col("start_ms") + bucket_ms // 2
        + F.abs(F.xxhash64("interval_id", F.lit(8))) % bucket_ms,
    )
    t0 = time.perf_counter()
    rj = interval_join(points, intervals, key="k", ts="ts",
                       start="start_ms", end="end_ms", bucket_width=bucket_ms)
    ragg = rj.agg(
        F.count("*").alias("n"), F.sum("point_id").alias("pid_sum")
    ).collect()[0]
    out["range_sec"] = round(time.perf_counter() - t0, 2)
    out["range_rows"] = int(ragg.n)
    out["range_pid_sum"] = int(ragg.pid_sum) if ragg.pid_sum is not None else 0
    out["n_points"] = n_points
    out["n_quotes"] = n_quotes
    out["n_intervals"] = n_iv

    # plan guards: the properties the numbers claim
    asof_plan = joined._jdf.queryExecution().executedPlan().toString()
    range_plan = rj._jdf.queryExecution().executedPlan().toString()
    out["asof_plan_ok"] = "NestedLoop" not in asof_plan and "Cartesian" not in asof_plan
    out["range_plan_ok"] = "NestedLoop" not in range_plan and "Cartesian" not in range_plan

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
