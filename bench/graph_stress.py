"""Scale stress for the graph operators (round 3 evidence).

Deterministic synthetic edge lists built JVM-side from F.sequence +
xxhash64 (no driver-side data, no wall clock / unseeded randomness):

* pagerank: 10M-edge two-tier graph (10% of edges land on a 1k-node
  hot set over 1M nodes — hub skew like a web graph), 5 iterations.
* triangle_count: 2M-edge graph over 100k nodes (avg degree 40, hot
  set included) — exercises the degree-ordered orientation under skew.

Usage:  python bench/graph_stress.py [n_edges_pr] [n_edges_tri] [cpus]
Prints one JSON line with walls and result fingerprints.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def make_edges(spark, n_edges: int, n_nodes: int, hot_nodes: int, hot_pct: int):
    """Deterministic skewed edge list: edge i = (h(i) mod V, dst) where
    dst lands in a small hot set for hot_pct% of edges."""
    base = spark.range(n_edges)
    h1 = F.abs(F.xxhash64(F.col("id"), F.lit(1)))
    h2 = F.abs(F.xxhash64(F.col("id"), F.lit(2)))
    hot = F.abs(F.xxhash64(F.col("id"), F.lit(3)))
    dst = F.when(h2 % 100 < hot_pct, hot % hot_nodes).otherwise(h2 % n_nodes)
    return base.select(
        F.concat(F.lit("n"), (h1 % n_nodes).cast("string")).alias("src"),
        F.concat(F.lit("n"), dst.cast("string")).alias("dst"),
    ).where(F.col("src") != F.col("dst"))


def main() -> None:
    n_pr = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_tri = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from ffp_spark.graph import pagerank, triangle_count
    from ffp_spark.pipeline import build_session

    spark = build_session(
        "graph-stress", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "graph_stress", "unit": "sec", "cpus": cpus}

    e_pr = make_edges(spark, n_pr, n_nodes=1_000_000, hot_nodes=1_000, hot_pct=10)
    t0 = time.perf_counter()
    scores = pagerank(e_pr, iters=5)
    top = scores.orderBy(F.desc("pr_q"), "node").limit(5).collect()
    out["pagerank_sec"] = round(time.perf_counter() - t0, 2)
    out["pagerank_edges"] = n_pr
    out["pagerank_top_q"] = int(top[0].pr_q)
    out["pagerank_mass"] = int(scores.agg(F.sum("pr_q")).collect()[0][0])

    e_tri = make_edges(spark, n_tri, n_nodes=100_000, hot_nodes=1_000, hot_pct=10)
    t0 = time.perf_counter()
    row = triangle_count(e_tri).collect()[0]
    out["triangles_sec"] = round(time.perf_counter() - t0, 2)
    out["triangles_edges_in"] = n_tri
    out["n_triangles"] = int(row.n_triangles)
    out["tri_nodes"] = int(row.n_nodes)
    out["tri_edges"] = int(row.n_edges)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
