"""Distributed k-means (Lloyd) with an exact integer contract (K72).

The reference corpus clusters embedding columns for corpus curation
(SemDeDup's k-means stage, IVF coarse quantizers); this is the
standalone operator: fixed-iteration Lloyd over an ``array<float>``
column, deterministic init (the k lowest-id vectors), and EVERY
number the algorithm touches quantized to integer micro-units so the
result is bitwise reproducible across engines:

- vectors enter as xq_i = round(x_i * 1e6) + OFFSET (BIGINT, the
  offset keeps every value non-negative so integral division below
  never hits the Spark-truncates / DuckDB-floors divergence on
  negatives);
- a centroid is the element-wise integral mean (sum div n) of its
  members — quantized ONCE per iteration, then all arithmetic stays
  in integers;
- assignment cost is sum_i (xq_i - cq_i)^2 (<= 64 dims * (4e6)^2 ~
  1e15, safely inside BIGINT), ties broken by lowest centroid id.

Scale shape: assignment is a zero-shuffle map stage — the k quantized
centroids are collected to the driver (k * dim BIGINTs) and inlined as
array literals, the argmin is array_min over (cost, cid) structs
computed per row inside whole-stage codegen.  The update step is one
posexplode + (cid, dim)-keyed sum — map-side combinable, k*dim result
rows.  No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 10**6
OFFSET = 2 * 10**6  # bound: |x_i| <= 2.0 after quantization


def quantize_vectors(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, xq: array<bigint>) — micro-unit quantization, offset to
    non-negative.  The float->double cast is exact (widening)."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: (F.round(x * SCALE, 0)).cast("long") + F.lit(OFFSET),
        ).alias("xq"),
    )


def _assign(quantized: DataFrame, centroids: list[tuple[int, list[int]]]) -> DataFrame:
    """(vec_id, xq, cid, cost) — nearest centroid by squared L2 over the
    integer components; centroids inlined as literals (no shuffle)."""
    scored = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("xq"),
                        F.array(*[F.lit(v) for v in vec]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                ).alias("cost"),
                F.lit(cid).cast("int").alias("cid"),
            )
            for cid, vec in centroids
        ]
    )
    # materialize the argmin struct once — Catalyst does not CSE the
    # array_min across two projections of its fields
    return quantized.select(
        "vec_id", "xq", F.array_min(scored).alias("_best")
    ).select(
        "vec_id",
        "xq",
        F.col("_best.cid").alias("cid"),
        F.col("_best.cost").alias("cost"),
    )


def _update(assigned: DataFrame) -> list[tuple[int, list[int]]]:
    """Element-wise integral mean per cluster: sum div n on each
    dimension (all values non-negative by the OFFSET contract)."""
    sums = (
        assigned.select("cid", F.posexplode("xq").alias("i", "v"))
        .groupBy("cid", "i")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .select("cid", "i", F.expr("s div n").alias("c"))
        .collect()
    )
    by_cid: dict[int, dict[int, int]] = {}
    for r in sums:
        by_cid.setdefault(r.cid, {})[r.i] = r.c
    return [
        (cid, [dims[i] for i in range(len(dims))])
        for cid, dims in sorted(by_cid.items())
    ]


def kmeans_assignments(
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final (vec_id, cid, cost) after ``iters`` Lloyd iterations from
    the deterministic init (centroids = the k lowest-id vectors).

    Iteration i: assign to the current centroids, then replace each
    centroid with its cluster's integral mean.  The RETURNED frame is
    the assignment against the LAST updated centroids (i.e. iters
    assign/update pairs, then one final assign) — the object the
    unrolled eval-scale oracle reproduces round for round.  A cluster
    that loses all members keeps its previous centroid (deterministic,
    and the oracle replays the same rule via a left join + coalesce).
    """
    q = quantize_vectors(embeddings, id_col, vec_col).localCheckpoint(eager=True)
    init = (
        q.orderBy("vec_id")
        .limit(k)
        .collect()
    )
    centroids = [(i, list(r.xq)) for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = _assign(q, centroids)
        updated = dict(
            (cid, vec) for cid, vec in _update(assigned)
        )
        centroids = [
            (cid, updated.get(cid, vec)) for cid, vec in centroids
        ]
    return _assign(q, centroids).select("vec_id", "cid", "cost")
