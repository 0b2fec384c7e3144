"""Similarity search over embedding columns (array<float>).

Three tiers, all JVM-side expressions (zip_with/aggregate — no Python
in the scoring path):

* ``cosine_topk`` — exact brute force; the baseline and the per-bucket
  kernel for the approximate tiers.
* ``hyperplane_buckets`` — random-hyperplane LSH (sign bits -> bucket);
  probe only the query's bucket.
* ``ivf_assign`` / ``ivf_topk`` — IVF: deterministic seed centroids,
  one Lloyd refinement (element-wise mean via posexplode + groupBy —
  still JVM-side), nprobe nearest cells searched exactly.

Scale path: assignment is a broadcast join against the (tiny) centroid
table; the search anti-prunes all but nprobe cells, so the exact kernel
touches ~nprobe/k of the corpus.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, StructField, StructType


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _as_double(col):
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def _lit_vec(vec: Sequence[float]):
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_topk(
    emb: DataFrame, query: Sequence[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: one narrow projection + orderBy/limit (Spark
    plans TakeOrderedAndProject — no full sort materialization)."""
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.linalg.norm(q)) or 1.0
    v = _as_double(vec_col)
    sim = _dot(v, _lit_vec(q)) / (F.sqrt(_dot(v, v)) * F.lit(qn))
    return (
        emb.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def hyperplane_buckets(
    emb: DataFrame, n_planes: int = 8, dim: int = 64, seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (deterministic planes)."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    v = _as_double(vec_col)
    bucket = F.aggregate(
        F.array(*[
            F.when(_dot(v, _lit_vec(p)) > 0, F.lit(1)).otherwise(F.lit(0))
            for p in planes
        ]),
        F.lit(0),
        lambda acc, b: acc * 2 + b,
    )
    return emb.withColumn("bucket", bucket)


def _bucket_of(query: Sequence[float], n_planes: int = 8, seed: int = 7) -> int:
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, len(query))
    q = np.asarray(query, dtype=np.float64)
    bits = (planes @ q > 0).astype(int)
    out = 0
    for b in bits:
        out = out * 2 + int(b)
    return out


def lsh_topk(
    emb: DataFrame, query: Sequence[float], k: int = 10,
    n_planes: int = 8, seed: int = 7,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: exact kernel over the query's bucket only."""
    bucketed = hyperplane_buckets(emb, n_planes=n_planes, dim=len(query), seed=seed, vec_col=vec_col)
    target = _bucket_of(query, n_planes=n_planes, seed=seed)
    return cosine_topk(
        bucketed.filter(F.col("bucket") == target), query, k=k,
        id_col=id_col, vec_col=vec_col,
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def ivf_centroids(
    emb: DataFrame, n_cells: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
    backend: str = "auto",
) -> DataFrame:
    """Deterministic seeds (first n_cells ids) + one Lloyd refinement.
    The refinement is posexplode -> groupBy(cell, dim) avg -> re-collect:
    pure DataFrame ops, shuffles rows*dim scalars once.

    The per-dimension means are quantized to integer micro-units
    (round(avg*1e6) as BIGINT / 1e6): the quantized value absorbs
    float-summation-order noise across partitions AND engines, so cell
    assignment against the refined centroids is cross-engine exact —
    the driver's DuckDB oracle replays this entire build."""
    seeds = (
        emb.orderBy(id_col).limit(n_cells)
        .select(
            F.row_number().over(__import__("pyspark").sql.Window.orderBy(id_col)).alias("cell"),
            _as_double(vec_col).alias("centroid"),
        )
        .withColumn("cell", F.col("cell") - 1)
    )
    assigned = ivf_assign(emb, seeds, id_col=id_col, vec_col=vec_col, backend=backend)
    refined = (
        assigned.select("cell", F.posexplode(_as_double(vec_col)).alias("dim", "x"))
        .groupBy("cell", "dim")
        .agg((F.round(F.avg("x") * 1e6, 0).cast("long") / F.lit(1e6)).alias("mu"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mu"))).alias("pairs"))
        .select("cell", F.transform("pairs", lambda p: p["mu"]).alias("centroid"))
    )
    return refined


#: above this many cells the literal-expression assignment would grow a
#: driver-side Janino compile linearly with n_cells — auto-dispatch to the
#: broadcast+Arrow path instead (see ``_ivf_assign_arrow``).
MAX_LITERAL_CELLS = 64


def ivf_assign(
    emb: DataFrame, centroids: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    backend: str = "auto",
) -> DataFrame:
    """Assign each vector to its best cell WITHOUT joining or shuffling
    the corpus.  Two physical strategies, same result bit-for-bit:

    * ``literal`` (default for <= MAX_LITERAL_CELLS cells): the (tiny)
      centroid table is collected and inlined as literal arrays — ONE
      projection, NO join, NO exchange, NO row multiplication (the
      original crossJoin+groupBy shape shuffled the full vector corpus
      once per index build; tests/test_plans.py pins the exchange-free
      plan).
    * ``arrow`` (auto above MAX_LITERAL_CELLS): the centroid matrix
      ships as a Spark broadcast variable into a ``mapInArrow`` stage
      and the argmax runs as a vectorized numpy fold — still no join,
      no exchange, and the codegen expression no longer grows with
      n_cells (the 100 TB cell counts are thousands+).  The fold
      replays ``F.aggregate``'s left-to-right accumulation order
      dimension by dimension, so assignments are IEEE-bit-identical to
      the literal plan (tests/test_ann_textops.py asserts equality).

    Similarity is dot(v, c)/|c|: |v| is constant across cells so dropping
    it cannot change the argmax.  Ties break to the LARGER cell id via
    struct max — deterministic and replayable in SQL (row_number ordered
    by s DESC, cell DESC)."""
    rows = sorted(
        centroids.select("cell", "centroid").collect(), key=lambda r: int(r.cell)
    )
    if backend == "arrow" or (backend == "auto" and len(rows) > MAX_LITERAL_CELLS):
        return _ivf_assign_arrow(emb, rows, id_col=id_col, vec_col=vec_col)
    v = _as_double(vec_col)
    scored = F.array(
        *[
            F.struct(
                (_dot(v, _lit_vec(r.centroid))
                 / F.sqrt(_dot(_lit_vec(r.centroid), _lit_vec(r.centroid)))).alias("s"),
                F.lit(int(r.cell)).alias("cell"),
            )
            for r in rows
        ]
    )
    return emb.select(
        F.col(id_col), F.col(vec_col), F.array_max(scored)["cell"].alias("cell")
    )


def _fold_dots(X: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
    """(n, dim) x (k, dim) -> (n, k) dot products accumulated dimension
    by dimension, left to right — the EXACT operation sequence of
    ``F.aggregate(zip_with(v, c, *), 0.0, s + v)`` per (row, cell), so
    results are bit-identical to the JVM expression (a BLAS matmul would
    use pairwise/SIMD summation and drift in the last ulp, which can
    flip an argmax between two near-tied cells)."""
    out = np.zeros((X.shape[0], C.shape[0]), dtype=np.float64)
    for d in range(X.shape[1]):
        out += np.multiply.outer(X[:, d], C[:, d])
    return out


def _ivf_assign_arrow(emb, rows, id_col: str, vec_col: str) -> DataFrame:
    """Broadcast-centroid assignment (the scale fallback named in
    ``ivf_assign``): centroids go out once per executor as a broadcast
    variable; each Arrow batch computes all cell scores with
    ``_fold_dots`` and picks the argmax with ties to the larger cell
    id.  Handles non-contiguous cell ids (empty cells dropped by the
    Lloyd step)."""
    import pyarrow as pa

    cells = np.array([int(r.cell) for r in rows], dtype=np.int64)  # ascending
    C = np.array([list(map(float, r.centroid)) for r in rows], dtype=np.float64)
    ncrm = np.zeros(C.shape[0], dtype=np.float64)
    for d in range(C.shape[1]):
        ncrm += C[:, d] * C[:, d]
    ncrm = np.sqrt(ncrm)

    src = emb.select(id_col, vec_col)
    sc = src.sparkSession.sparkContext
    bc = sc.broadcast((cells, C, ncrm))
    out_schema = StructType(
        list(src.schema.fields) + [StructField("cell", IntegerType(), False)]
    )

    def assign(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        cells_, C_, ncrm_ = bc.value
        k = C_.shape[0]
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            emb_arr = batch.column(1)
            flat = np.asarray(emb_arr.flatten(), dtype=np.float64)
            X = flat.reshape(n, -1)
            score = _fold_dots(X, C_) / ncrm_
            # argmax with ties to the LARGER cell id: scan the reversed
            # (descending-cell) axis, np.argmax keeps the first max.
            idx = (k - 1) - np.argmax(score[:, ::-1], axis=1)
            cell = pa.array(cells_[idx].astype(np.int32), type=pa.int32())
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), emb_arr, cell],
                schema=pa.schema(
                    [batch.schema.field(0), batch.schema.field(1),
                     pa.field("cell", pa.int32(), nullable=False)]
                ),
            )

    return src.mapInArrow(assign, out_schema)


def ivf_topk(
    emb: DataFrame, query: Sequence[float], k: int = 10, n_cells: int = 8,
    nprobe: int = 2, id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: DataFrame | None = None, assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF search: nprobe nearest cells to the query, exact kernel inside."""
    if centroids is None:
        centroids = ivf_centroids(emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col)
    if assigned is None:
        assigned = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    q = _lit_vec(query)
    c = F.col("centroid")
    cell_sim = _dot(c, q) / (F.sqrt(_dot(c, c)))
    # deterministic probe order: similarity desc, then cell id (the same
    # tiebreak the SQL oracle uses)
    probe_cells = [
        r.cell
        for r in centroids.select("cell", cell_sim.alias("s"))
        .orderBy(F.desc("s"), "cell").limit(nprobe).collect()
    ]
    return cosine_topk(
        assigned.filter(F.col("cell").isin(probe_cells)), query, k=k,
        id_col=id_col, vec_col=vec_col,
    )


def _semdedup_pairs_arrow(
    asg: DataFrame, threshold: float, id_col: str, block: int = 512,
) -> DataFrame:
    """Within-cell pair cosine via grouped Arrow/pandas (the scale path
    for SemDeDup pair scoring — the SQL formulation runs each pair's
    dot product through interpreted higher-order functions, no codegen).

    Each cell's gram matrix is accumulated dimension by dimension with
    ``_fold_dots`` in row blocks (memory capped at block x |cell|
    doubles), so every pair cosine replays the JVM expression's
    accumulation order exactly: output is bit-identical to the SQL
    self-join path (asserted in tests/test_ann_textops.py).  Emits one
    row per surviving pair: (cell, b, cos) with id(a) < id(b)."""
    import pandas as pd

    thr = float(threshold)

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"cell": pd.Series(dtype="int32"),
                                 "b": pd.Series(dtype="int64"),
                                 "cos": pd.Series(dtype="float64")})
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        cell = int(pdf["cell"].iloc[0])
        out_b, out_cos = [], []
        for lo in range(0, m, block):
            hi = min(lo + block, m)
            cos = _fold_dots(X[lo:hi], X) / np.multiply.outer(nrm[lo:hi], nrm)
            keep = (ids[np.newaxis, :] > ids[lo:hi, np.newaxis]) & (cos >= thr)
            bi, bj = np.nonzero(keep)
            out_b.append(ids[bj])
            out_cos.append(cos[bi, bj])
        b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
        c = np.concatenate(out_cos) if out_cos else np.empty(0, dtype=np.float64)
        return pd.DataFrame({"cell": np.full(len(b), cell, dtype=np.int32),
                             "b": b, "cos": c})

    return asg.groupBy("cell").applyInPandas(score, "cell int, b long, cos double")


def semdedup(
    emb: DataFrame, n_cells: int = 8, threshold: float = 0.40,
    id_col: str = "vec_id", vec_col: str = "embedding",
    backend: str = "auto",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540): cluster the embedding space, then compare pairs
    ONLY within a cluster — the standard way to make embedding-level
    near-dedup tractable (within-cell pairs, never corpus all-pairs;
    at larger corpora raise n_cells so cells stay bounded).

    Clustering is the IVF build (deterministic seeds + one quantized
    Lloyd step — cross-engine exact cell assignment); a vector is
    DISCARDED when some lower-id vector in its cell has cosine >=
    threshold (lowest id is the kept representative — deterministic,
    no RNG).  Returns discarded rows: (id_col, cell, n_lower,
    best_sim).

    ``backend``: "sql" scores pairs with a JVM self-join; "arrow"
    routes assignment through the broadcast-centroid mapInArrow path
    and pair cosines through ``_semdedup_pairs_arrow``.  Both produce
    bit-identical discards (tests/test_ann_textops.py asserts
    equality); the pair count stays bounded by within-cell sizes
    either way (never corpus all-pairs).  "auto" picks arrow at EVERY
    cell count since round 7: the JVM self-join runs each pair's
    64-dim dot product through interpreted higher-order functions
    (no codegen) and measured ~3x slower than the numpy gram-matrix
    fold even at eval scale (guide §4.2 — hand whole batches to
    vectorized native code).
    """
    if backend == "auto":
        backend = "arrow"
    asgn_backend = "arrow" if backend == "arrow" else "auto"
    cents = ivf_centroids(
        emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col, backend=asgn_backend,
    )
    # both sides of the pair scoring consume the assignment — materialize
    # once, WITH the norm precomputed per ROW: inside the pair loop only
    # one dot product remains (computing both norms per PAIR would
    # triple the dominant per-pair cost)
    v = _as_double(vec_col)
    asg = (
        ivf_assign(emb, cents, id_col=id_col, vec_col=vec_col, backend=asgn_backend)
        .select(id_col, "cell", v.alias("v"), F.sqrt(_dot(v, v)).alias("nrm"))
        .localCheckpoint(eager=True)
    )
    if backend == "arrow":
        pairs = _semdedup_pairs_arrow(asg, threshold, id_col)
    else:
        x = asg.select(
            F.col(id_col).alias("a"), F.col("v").alias("va"), F.col("nrm").alias("na"), "cell"
        )
        y = asg.select(
            F.col(id_col).alias("b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"), "cell"
        )
        cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        pairs = (
            x.join(y, "cell")
            .where(F.col("a") < F.col("b"))
            .select("cell", "b", cos.alias("cos"))
            .where(F.col("cos") >= F.lit(float(threshold)))
        )
    return pairs.groupBy(F.col("b").alias(id_col), "cell").agg(
        F.count("*").alias("n_lower"),
        F.round(F.max("cos"), 4).alias("best_sim"),
    )


def int8_quantize(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension symmetric int8 quantization of the L2-NORMALIZED
    corpus (K76) — the storage format production vector stores ship
    (4x smaller than float32, integer SIMD dot products): nv = v/|v|,
    scale_d = max_corpus |nv_d|, q_d = round((nv_d/scale_d)*127).

    Fully structural cross-engine exactness: normalization and the
    per-dim scale division are single IEEE ops on identical doubles
    (exactly-rounded, engine-independent), everything after is integer.
    The 64 scales are one posexplode + per-dim max (map-side
    combinable), collected and inlined as a literal array so the
    quantization itself is a zero-shuffle codegen map.

    Returns (id, q: array<bigint> in [-127, 127]).
    """
    v = _as_double(vec_col)
    normed = (
        emb.select(
            F.col(id_col).alias("vec_id"),
            v.alias("v"),
            F.sqrt(_dot(v, v)).alias("nrm"),  # hoisted: transform lambdas re-evaluate per element
        )
        .select(
            "vec_id",
            F.transform("v", lambda x: x / F.col("nrm")).alias("nv"),
        )
        .localCheckpoint(eager=True)
    )
    scales = (
        normed.select(F.posexplode("nv").alias("i", "x"))
        .groupBy("i")
        .agg(F.max(F.abs("x")).alias("s"))
        .orderBy("i")
        .collect()
    )
    s_lit = F.array(*[F.lit(float(r.s)) for r in scales])
    return normed.select(
        "vec_id",
        F.zip_with(
            "nv", s_lit, lambda x, s: F.round((x / s) * 127, 0).cast("long")
        ).alias("q"),
    )


def int8_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by INTEGER dot product over the int8-quantized corpus
    (scales computed over the full table including the query row, the
    query then excluded from candidates).  Exact integer ordering with
    id tiebreak — the recall vs the float cosine top-k is what
    ann_int8_recall oracles."""
    q = int8_quantize(emb, id_col, vec_col).localCheckpoint(eager=True)
    qrow = q.where(F.col("vec_id") == query_id).collect()[0]
    q_lit = F.array(*[F.lit(int(x)) for x in qrow.q])
    dot_q = F.aggregate(
        F.zip_with("q", q_lit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        q.where(F.col("vec_id") != query_id)
        .select("vec_id", dot_q.alias("dot_q"))
        .orderBy(F.desc("dot_q"), "vec_id")
        .limit(k)
    )
