"""Scale stress for quantized k-means (cluster.kmeans_assignments):
is assignment really a zero-shuffle codegen map, and does the update
stay a map-side-combinable (cid, dim) aggregation?

Deterministic synthetic embeddings (same xxhash64 generator as
semdedup_stress — no driver data, no RNG): N vectors, dim 64, k
centroids, 2 Lloyd iterations.  Per iteration the only shuffle is the
k*dim-row centroid aggregation; everything else is whole-stage
codegen over literal centroid arrays.

Usage:  python bench/kmeans_stress.py [n_vectors] [k] [cpus]
Prints one JSON line: wall, per-cluster sizes (fingerprint — identical
at any parallelism by the integer contract), integer inertia.  Pin
with taskset -c 0-(cpus-1) for scaling claims.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from semdedup_stress import make_embeddings  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from ffp_spark.cluster import kmeans_assignments
    from ffp_spark.pipeline import build_session

    spark = build_session(
        "kmeans-stress", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = make_embeddings(spark, n).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    out = kmeans_assignments(emb, k=k, iters=2)
    summary = (
        out.groupBy("cid")
        .agg(F.count("*").alias("sz"), F.sum("cost").alias("inertia"))
        .orderBy("cid")
        .collect()
    )
    wall = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "metric": "kmeans_stress",
                "unit": "sec",
                "cpus": cpus,
                "n_vectors": n,
                "k": k,
                "wall_sec": wall,
                "sizes": [int(r.sz) for r in summary],
                "inertia_fingerprint": sum(int(r.inertia) for r in summary),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
