"""Scale stress for SemDeDup (ann.semdedup): does cluster-then-dedup
really bound the pair cost by cell sizes?

Deterministic synthetic embeddings built JVM-side (xxhash64-derived
coordinates, no driver data, no RNG): N vectors, dim 64, n_cells
chosen so cells stay a few hundred wide — the knob the 100 TB design
turns.  Pair count is ~N/cells per cell, never N^2.

Usage:  python bench/semdedup_stress.py [n_vectors] [n_cells] [cpus]
Prints one JSON line: wall, discard count (fingerprint — identical at
any parallelism), pairs-bounded evidence.  Pin with taskset.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def make_embeddings(spark, n: int, dim: int = 64):
    """vec i, coord d = ((xxhash64(i, d) mod 2001) - 1000) / 1000 —
    deterministic, roughly uniform in [-1, 1]."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: ((F.abs(F.xxhash64(F.col("id"), d)) % 2001 - 1000) / 1000.0).cast(
                "float"
            ),
        ).alias("embedding"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from ffp_spark.ann import semdedup
    from ffp_spark.pipeline import build_session

    spark = build_session(
        "semdedup-stress", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = make_embeddings(spark, n).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    # uniform synthetic vectors have low pairwise cosine; threshold low
    # enough that the discard set is non-empty (the fingerprint)
    out = semdedup(emb, n_cells=n_cells, threshold=0.55)
    n_discard = out.count()
    wall = round(time.perf_counter() - t0, 2)

    # pair-count bound evidence: within-cell pairs vs corpus all-pairs.
    # Recomputed from the same deterministic assignment (cheap relative
    # to the dedup run); the bound is the structural claim the 100 TB
    # design rests on — cluster-then-dedup must keep it ~N^2/cells.
    from ffp_spark.ann import ivf_assign, ivf_centroids

    backend = "arrow" if n_cells > 64 else "auto"
    cents = ivf_centroids(emb, n_cells=n_cells, backend=backend)
    cell_sizes = (
        ivf_assign(emb, cents, backend=backend)
        .groupBy("cell").count().select("count").collect()
    )
    pairs_within = sum(int(r["count"]) * (int(r["count"]) - 1) // 2 for r in cell_sizes)
    pairs_all = n * (n - 1) // 2
    assert pairs_within * 4 < pairs_all, (
        f"pair bound violated: {pairs_within} within-cell vs {pairs_all} all-pairs"
    )
    print(
        json.dumps(
            {
                "metric": "semdedup_stress",
                "unit": "sec",
                "cpus": cpus,
                "n_vectors": n,
                "n_cells": n_cells,
                "wall_sec": wall,
                "n_discarded": int(n_discard),
                "pairs_within_cells": int(pairs_within),
                "pairs_all_pairs": int(pairs_all),
                "pair_reduction_x": round(pairs_all / max(1, pairs_within), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
