"""One dual-scale measurement at a given core count (operator K12).

Usage: python bench/scale_worker.py <cpus> <corpus_dir> [runs]
Reads a pre-generated PAGES parquet corpus (see gen_corpus.py), runs the
parse -> triples job, prints one JSON line with best-of-N wall time and
throughput.  Run under ``taskset -c 0-<cpus-1>`` so the JVM *and* the
Python workers are held to the advertised core budget — local[k] alone
only caps task slots, not total CPU.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    cpus = int(sys.argv[1])
    corpus = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from ffp_spark.pipeline import build_session
    from ffp_spark.triples import emit_triples
    from ffp_spark.udfs import parse_pages

    spark = build_session(
        f"ffp-scale-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(corpus)
    n_pages = pages.count()

    # warm the JVM + Python worker pool to steady state
    emit_triples(parse_pages(pages.limit(3000))).count()

    best = float("inf")
    n_triples = 0
    for _ in range(runs):
        t0 = time.perf_counter()
        n_triples = emit_triples(parse_pages(pages)).count()
        best = min(best, time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_pages": n_pages,
                "n_triples": n_triples,
                "wall_sec": round(best, 3),
                "pages_per_sec": round(n_pages / best, 1),
                "triples_per_sec": round(n_triples / best, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
