"""Bucketed interval (range) join — points-in-interval without the
nested-loop trap.

``points JOIN intervals ON key AND start <= ts AND ts < end`` has no
equi-key, so Catalyst falls back to BroadcastNestedLoopJoin (or a
cartesian per key) — O(|P| x |I|) per key, hopeless at web scale.

The scalable form quantizes time into fixed-width buckets:

1. each interval is exploded to the buckets it covers (fan-out =
   ceil(len/bucket_width) + 1, bounded and chosen by the caller);
2. points map to exactly one bucket — a plain equi-join on
   (key, bucket) does the candidate matching with one shuffle;
3. a cheap residual predicate ``start <= ts < end`` refines.

Cost: one shuffle of points + intervals x fan-out, hash join, no row
explosion beyond the bucket fan-out.  This is the standard time-bucket
range-join used by Flink/Kafka-Streams window joins; Databricks' range
join "hint" does the same quantization inside the optimizer.

Intervals use [start, end) semantics; callers pick ``bucket_width``
near the typical interval length (fan-out ~2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join: point rows + the interval rows containing them.

    ``ts``/``start``/``end`` MUST be integral columns (epoch
    seconds/ms/ns as BIGINT — cast upstream): bucketing uses SQL ``div``,
    which Spark defines only for integral operands, so a DOUBLE column
    fails analysis by design rather than silently losing exactness past
    2^53 (ADVICE r4 — the visible API contract).  Returns points columns
    + intervals columns (callers project).  A point in k overlapping
    intervals yields k rows.
    """
    bw = int(bucket_width)
    if bw <= 0:
        raise ValueError("bucket_width must be positive")
    # integral `div` on both sides: double division + cast('long') loses
    # exactness past 2^53 (epoch-nanos would misbucket and silently drop
    # true matches before the residual filter)
    p = points.withColumn("_b", F.expr(f"`{ts}` div {bw}"))
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"`{start}` div {bw}"),
                # end is exclusive, but a partial last bucket still
                # holds candidates: ceil((end-1)/bw) == floor((end-1)/bw)
                F.expr(f"greatest(`{end}` - 1, `{start}`) div {bw}"),
            )
        ),
    )
    joined = p.join(i, [key, "_b"]).where(
        (F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end))
    )
    return joined.drop("_b")
