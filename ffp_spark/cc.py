"""Connected components with pure DataFrame ops (operator K7).

GraphFrames is unavailable in this sandbox and GraphX has no Python API
in Spark 4, so this is the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) on DataFrames: O(log n) rounds, each round two shuffles, with
per-round (local)checkpoints to truncate lineage.

Node ids are strings; component representative = lexicographic min.
Convergence detection: (count, sum(xxhash64(src,dst))) fingerprint of
the edge set — deterministic for a given dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    nbrs = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    mins = nbrs.groupBy("u").agg(F.min("v").alias("m"))
    mins = mins.withColumn("m", F.least("m", "u"))
    out = (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )
    return out.dropDuplicates(["src", "dst"])


def _small_star(edges: DataFrame) -> DataFrame:
    """Point each edge large->small, connect all small neighbors (and u)
    to the smallest."""
    directed = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    relinked = (
        directed.join(mins, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .unionByName(mins.select(F.col("u").alias("src"), F.col("m").alias("dst")))
    )
    return relinked.where(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h)


def connected_components(
    edges: DataFrame, max_iter: int = 20, checkpoint: bool = True
) -> DataFrame:
    """Edge list (src, dst) -> (node_id, component_id).

    component_id is the lexicographically smallest node id in the
    component.  Isolated nodes don't appear (callers union them back)."""
    cur = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    cur = cur.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).dropDuplicates(["src", "dst"])
    scoped_p = None
    if checkpoint:
        # materialize the input ONCE: each star round references its
        # input several times (the union + two consumers of nbrs), and
        # Spark does not dedupe common subtrees — without this the whole
        # upstream edge-building pipeline executes ~4x inside round 0
        # (measured 150s -> 32s for CC at 100k pages).  The edge count
        # rides the same job and sizes the star rounds' shuffles
        # (graph._iter_parts, guide §2.2) — star-round work is a few
        # narrow columns of trivial per-row cost, so partitioning it by
        # bytes instead of one-per-core removes the tiny-task overhead
        # that dominates each round at small scale without costing
        # parallelism at web scale.
        obs0 = Observation()
        cur = cur.observe(obs0, F.count(F.lit(1)).alias("n")).localCheckpoint(
            eager=True
        )
        from .graph import _iter_parts

        scoped_p = _iter_parts(
            int(obs0.get["n"]),
            edges.sparkSession.sparkContext.defaultParallelism,
        )

    spark = edges.sparkSession
    old_p = spark.conf.get("spark.sql.shuffle.partitions")
    if scoped_p is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(scoped_p))
    try:
        prev_fp = None
        for _ in range(max_iter):
            cur = _small_star(_large_star(cur))
            if checkpoint:
                # fold the convergence fingerprint into the checkpoint
                # materialization via an observed metric — one job per
                # round instead of two (checkpoint + separate agg scan)
                obs = Observation()
                cur = cur.observe(
                    obs,
                    F.count(F.lit(1)).alias("n"),
                    F.coalesce(
                        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)
                    ).alias("h"),
                )
                cur = cur.localCheckpoint(eager=True)
                fp = (int(obs.get["n"]), int(obs.get["h"]))
            else:
                fp = _fingerprint(cur)
            if fp == prev_fp:
                break
            prev_fp = fp
    finally:
        if scoped_p is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_p)

    # After convergence the edge set is a star forest: dst is the root.
    members = cur.select(F.col("src").alias("node_id"), F.col("dst").alias("component_id"))
    roots = cur.select(F.col("dst").alias("node_id")).distinct().withColumn(
        "component_id", F.col("node_id")
    )
    return members.unionByName(roots).dropDuplicates(["node_id"])
