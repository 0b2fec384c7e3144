"""Generate the deterministic bench corpus once (unpinned, all cores).

Usage: python bench/gen_corpus.py <n_pages> <out_dir> [seed] [n_files]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_pages = int(sys.argv[1])
    out_dir = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    n_files = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    from ffp_spark.pipeline import build_session
    from ffp_spark.datagen import synth_pages

    spark = build_session("ffp-gen-corpus", master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")
    synth_pages(spark, n_pages, seed=seed).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(out_dir)
    print(f"wrote {n_pages} pages to {out_dir} in {n_files} files")
    spark.stop()


if __name__ == "__main__":
    main()
