"""As-of join (ffp_spark.asof): union-window point-in-time join.

Checks exact semantics against a naive per-key reference (latest right
row at-or-before each left ts), the <= tie rule, null behavior for
unmatched rows, and the no-join plan shape (ONE window, no join node —
the whole point of the union-window form)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ffp_spark.asof import asof_join_backward


def _naive(left, right):
    out = []
    for k, lt, lid in left:
        best = None
        for rk, rt, rv in right:
            if rk == k and rt <= lt and (best is None or rt > best[0]):
                best = (rt, rv)
        out.append((k, lt, lid, None if best is None else best[1]))
    return sorted(out)


def test_asof_matches_naive_reference(spark):
    rng = random.Random(11)
    left = [(f"k{rng.randrange(5)}", rng.randrange(1000), i) for i in range(200)]
    # unique (key, ts) on the right — the determinism precondition
    right = list({(f"k{rng.randrange(5)}", rng.randrange(1000)): None for _ in range(80)})
    right = [(k, t, i * 10) for i, (k, t) in enumerate(sorted(right))]
    ldf = spark.createDataFrame(left, "key string, ts long, lid long")
    rdf = spark.createDataFrame(right, "key string, ts long, rv long")
    got = asof_join_backward(ldf, rdf, key="key", left_ts="ts", right_ts="ts",
                             payload_cols=["rv"])
    rows = sorted((r.key, r.ts, r.lid, None if r.asof is None else r.asof.rv)
                  for r in got.collect())
    assert rows == _naive(left, right)


def test_asof_tie_at_equal_ts_matches(spark):
    ldf = spark.createDataFrame([("a", 100, 1)], "key string, ts long, lid long")
    rdf = spark.createDataFrame([("a", 100, 7), ("a", 99, 5)], "key string, ts long, rv long")
    row = asof_join_backward(ldf, rdf, "key", "ts", "ts", ["rv"]).collect()[0]
    assert row.asof.rv == 7  # <= semantics: right row AT left_ts wins


def test_asof_unmatched_left_rows_get_null(spark):
    ldf = spark.createDataFrame([("a", 10, 1), ("b", 50, 2)], "key string, ts long, lid long")
    rdf = spark.createDataFrame([("a", 20, 3)], "key string, ts long, rv long")
    got = {r.lid: r.asof for r in asof_join_backward(ldf, rdf, "key", "ts", "ts", ["rv"]).collect()}
    assert got[1] is None and got[2] is None


def _naive_forward(left, right):
    out = []
    for k, lt, lid in left:
        best = None
        for rk, rt, rv in right:
            if rk == k and rt >= lt and (best is None or rt < best[0]):
                best = (rt, rv)
        out.append((k, lt, lid, None if best is None else best[1]))
    return sorted(out)


def test_asof_forward_matches_naive_reference(spark):
    from ffp_spark.asof import asof_join_forward

    rng = random.Random(31)
    left = [(f"k{rng.randrange(4)}", rng.randrange(500), i) for i in range(150)]
    right = list({(f"k{rng.randrange(4)}", rng.randrange(500)): None for _ in range(60)})
    right = [(k, t, i * 10) for i, (k, t) in enumerate(sorted(right))]
    ldf = spark.createDataFrame(left, "key string, ts long, lid long")
    rdf = spark.createDataFrame(right, "key string, ts long, rv long")
    got = asof_join_forward(ldf, rdf, key="key", left_ts="ts", right_ts="ts",
                            payload_cols=["rv"])
    rows = sorted((r.key, r.ts, r.lid, None if r.asof is None else r.asof.rv)
                  for r in got.collect())
    assert rows == _naive_forward(left, right)


def test_asof_plan_is_window_not_join(spark):
    ldf = spark.createDataFrame([("a", 10, 1)], "key string, ts long, lid long")
    rdf = spark.createDataFrame([("a", 5, 3)], "key string, ts long, rv long")
    plan = asof_join_backward(ldf, rdf, "key", "ts", "ts", ["rv"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1  # one shuffle on the key, nothing else
