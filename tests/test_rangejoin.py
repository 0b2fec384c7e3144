"""Bucketed interval join (ffp_spark.rangejoin) vs a naive reference:
random overlapping intervals, [start, end) boundary points, bucket
widths smaller/larger than interval lengths, and the no-nested-loop
plan property."""

from __future__ import annotations

import random

import pytest

from ffp_spark.rangejoin import interval_join


def _naive(points, intervals):
    out = []
    for k, t, pid in points:
        for ik, s, e, iid in intervals:
            if ik == k and s <= t < e:
                out.append((pid, iid))
    return sorted(out)


@pytest.mark.parametrize("bw", [7, 50, 1000])
def test_interval_join_matches_naive(spark, bw):
    rng = random.Random(bw)
    points = [(f"k{rng.randrange(4)}", rng.randrange(400), i) for i in range(150)]
    intervals = []
    for i in range(40):
        s = rng.randrange(380)
        intervals.append((f"k{rng.randrange(4)}", s, s + rng.randrange(1, 90), i))
    p = spark.createDataFrame(points, "key string, t long, pid long")
    iv = spark.createDataFrame(intervals, "key string, s long, e long, iid long")
    got = interval_join(p, iv, key="key", ts="t", start="s", end="e", bucket_width=bw)
    assert sorted((r.pid, r.iid) for r in got.collect()) == _naive(points, intervals)


def test_interval_join_boundaries(spark):
    p = spark.createDataFrame(
        [("a", 9, 0), ("a", 10, 1), ("a", 19, 2), ("a", 20, 3)],
        "key string, t long, pid long",
    )
    iv = spark.createDataFrame([("a", 10, 20, 7)], "key string, s long, e long, iid long")
    got = sorted(r.pid for r in
                 interval_join(p, iv, "key", "t", "s", "e", bucket_width=4).collect())
    assert got == [1, 2]  # [start, end): 10 in, 20 out


def test_interval_join_plan_is_hash_join(spark):
    p = spark.createDataFrame([("a", 5, 0)], "key string, t long, pid long")
    iv = spark.createDataFrame([("a", 0, 10, 1)], "key string, s long, e long, iid long")
    plan = interval_join(p, iv, "key", "t", "s", "e", 4)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan