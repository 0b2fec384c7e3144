"""As-of (point-in-time) join — a custom operator Spark lacks.

For each left row, attach the latest right row with ``right_ts <=
left_ts`` for the same key (backward — the PIT-correctness join used
for feature lookups and slowly-changing dimensions), or the earliest
right row at-or-after it (forward; same machinery over a descending
timestamp order).

Spark has no ASOF JOIN (DuckDB/Pandas do), and the naive
``left JOIN right ON key AND r.ts <= l.ts`` + max_by explodes
quadratically per key.  This is the scalable union-window form:

1. tag both sides and union them on (key, ts) — one narrow shuffle;
2. one window per key ordered by (ts, side, tiebreak):
   ``last(payload, ignorenulls=True)`` over rows unbounded-preceding
   carries the most recent right payload forward;
3. keep left rows.

Cost: ONE shuffle + ONE sort over |L|+|R| rows — same asymptotics as a
sort-merge join, no row multiplication, skew handled by AQE like any
wide transform.  Right rows sort before left rows at equal ts, so a
right row exactly at ``left_ts`` matches (<= semantics, like DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``).

Determinism: callers must make (key, right_ts) unique on the right side
(dedup with max_by first) — the same requirement DuckDB's ASOF has for
a deterministic answer.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Left rows + ``asof.<payload_col>`` struct fields from the latest
    right row at-or-before the left timestamp (null if none)."""
    return _asof_join(left, right, key, left_ts, right_ts, payload_cols, forward=False)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Earliest right row at-or-AFTER the left timestamp (null if none)
    — the same union-window walk over a descending timestamp order."""
    return _asof_join(left, right, key, left_ts, right_ts, payload_cols, forward=True)


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    forward: bool,
) -> DataFrame:
    if "asof" in left.columns:
        raise ValueError("left side already has a column named 'asof'")
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("_asof_payload")
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload,
        *[F.lit(None).cast(t.dataType).alias(f"_l_{t.name}") for t in left.schema],
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
        *[F.col(t.name).alias(f"_l_{t.name}") for t in left.schema],
    )
    order = (
        [F.col("_ts").desc(), F.col("_side").asc()]
        if forward
        else [F.col("_ts").asc(), F.col("_side").asc()]
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        r.unionByName(l)
        .withColumn("asof", F.last("_asof_payload", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    return joined.select(
        *[F.col(f"_l_{t.name}").alias(t.name) for t in left.schema], "asof"
    )
