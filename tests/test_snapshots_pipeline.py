"""Snapshot commit/read/resume semantics + end-to-end pipeline run."""

import json

import pytest
from pyspark.sql import functions as F

from ffp_spark.datagen import synth_pages
from ffp_spark.pipeline import add_part_id, run_snapshot
from ffp_spark.snapshots import (
    current_snapshot_id,
    read_manifest,
    read_snapshot,
    remaining_pages,
    snapshots_of,
    write_snapshot,
)


class TestSnapshots:
    def test_commit_read_roundtrip(self, spark, tmp_path):
        df = spark.range(100).withColumn("k", F.col("id") % 7)
        m = write_snapshot(df, tmp_path, "t", snapshot_id=1)
        assert m["row_count"] == 100
        back = read_snapshot(spark, tmp_path, "t")
        assert back.count() == 100
        assert current_snapshot_id(tmp_path, "t") == 1

    def test_snapshot_evolution_and_time_travel(self, spark, tmp_path):
        write_snapshot(spark.range(10), tmp_path, "t", snapshot_id=1)
        write_snapshot(spark.range(25), tmp_path, "t", snapshot_id=2)
        assert snapshots_of(tmp_path, "t") == [1, 2]
        assert read_snapshot(spark, tmp_path, "t").count() == 25
        assert read_snapshot(spark, tmp_path, "t", snapshot_id=1).count() == 10
        m2 = read_manifest(tmp_path, "t", 2)
        assert m2["parent_snapshot_id"] == 1

    def test_no_partial_snapshot_visible(self, spark, tmp_path):
        # CURRENT pointer only moves after data+manifest are in place
        write_snapshot(spark.range(5), tmp_path, "t", snapshot_id=7)
        tdir = tmp_path / "t"
        assert not list(tdir.glob("_tmp-*"))
        assert (tdir / "CURRENT").read_text().strip() == "7"

    def test_commit_is_single_scan(self, spark, tmp_path):
        # row count comes from df.observe during the write — exactly one
        # Spark job per committed table, no post-write re-read
        sc = spark.sparkContext
        df = spark.range(1000).withColumn("k", F.col("id") % 3)
        sc.setJobGroup("ws-one-scan", "write_snapshot single-scan check")
        try:
            m = write_snapshot(df, tmp_path, "one", snapshot_id=1)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        assert m["row_count"] == 1000
        jobs = sc.statusTracker().getJobIdsForGroup("ws-one-scan")
        assert len(jobs) == 1

    def test_commit_empty_dataframe(self, spark, tmp_path):
        df = spark.range(5).filter("id < 0").withColumn("k", F.col("id") % 3)
        m = write_snapshot(df, tmp_path, "empty", snapshot_id=1)
        assert m["row_count"] == 0
        assert read_snapshot(spark, tmp_path, "empty").count() == 0

    def test_remaining_pages_anti_join(self, spark):
        pages = add_part_id(synth_pages(spark, 100), n_parts=8)
        lineage = spark.createDataFrame(
            [(0, "done"), (1, "done"), (2, "failed")], "part_id int, status string"
        )
        left = remaining_pages(pages, lineage)
        parts = {r.part_id for r in left.select("part_id").distinct().collect()}
        assert 0 not in parts and 1 not in parts and 2 in parts


class TestPipeline:
    def test_run_snapshot_end_to_end(self, spark, tmp_path):
        pages = synth_pages(spark, 120, seed=3)
        report = run_snapshot(spark, pages, str(tmp_path), snapshot_id=1, n_parts=8)
        assert report["pages"] == 120
        assert report["triples"] > 0
        assert report["nodes"] > 0
        assert report["edges"] > 0
        triples = read_snapshot(spark, tmp_path, "triples")
        preds = {r.pred for r in triples.select("pred").distinct().collect()}
        assert preds == {"publishedAt", "author", "partOfFeed", "hasEntry"}
        lineage = read_snapshot(spark, tmp_path, "lineage")
        assert lineage.filter("status = 'done'").count() == report["lineage_rows"]
        # lineage totals reconcile with the page count
        assert (
            lineage.agg(F.sum("n_pages").alias("s")).collect()[0].s == 120
        )
        # SURVEY §1.2 schema: every lineage row carries the run's
        # wall-clock bracket (started at run entry, finished at commit)
        stamps = lineage.select("started_ts", "finished_ts").collect()
        assert stamps and all(
            r.started_ts is not None
            and r.finished_ts is not None
            and r.started_ts <= r.finished_ts
            for r in stamps
        )

    def test_committed_nodes_edges_join_without_exchange(self, spark, tmp_path):
        """The production commit path writes nodes/edges through the
        catalog-bucketed writer: the serving join (node_id == src) must
        read co-located buckets with ZERO exchange."""
        from ffp_spark.snapshots import read_snapshot_bucketed

        pages = synth_pages(spark, 80, seed=5)
        run_snapshot(spark, pages, str(tmp_path), snapshot_id=1, n_parts=8)
        nodes = read_snapshot_bucketed(spark, tmp_path, "nodes")
        edges = read_snapshot_bucketed(spark, tmp_path, "edges")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = nodes.join(edges, nodes.node_id == edges.src)
            assert joined.count() > 0
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # plain directory reads still serve the same rows (non-catalog
        # consumers and resume merges are unaffected by the bucketed commit)
        assert read_snapshot(spark, tmp_path, "nodes").count() == nodes.count()
        assert read_snapshot(spark, tmp_path, "edges").count() == edges.count()

    def test_resume_skips_done_partitions_and_converges(self, spark, tmp_path):
        pages = synth_pages(spark, 120, seed=3)
        full = run_snapshot(spark, pages, str(tmp_path), snapshot_id=1, n_parts=8)
        # a second run with the same snapshot_id finds all parts done
        again = run_snapshot(spark, pages, str(tmp_path), snapshot_id=1, n_parts=8)
        assert again["pages"] == 0
        # lineage still carries the full history
        lineage = read_snapshot(spark, tmp_path, "lineage")
        assert (
            lineage.agg(F.sum("n_pages").alias("s")).collect()[0].s
            == full["pages"]
        )

    def test_resume_after_crash_before_lineage_commit(self, spark, tmp_path, monkeypatch):
        """A crash between the data commits and the lineage commit must not
        double triples on re-run (the part-ownership merge: with no 'done'
        lineage rows, the stale committed triples contribute nothing)."""
        import ffp_spark.pipeline as P
        from ffp_spark.snapshots import write_snapshot as real_ws

        # snapshot 1 commits fully, so a lineage TABLE exists — the trap
        # that made the old `prior_lineage is not None` gate fire
        run_snapshot(spark, synth_pages(spark, 60, seed=3), str(tmp_path), snapshot_id=1, n_parts=8)
        ref = run_snapshot(
            spark, synth_pages(spark, 120, seed=4), str(tmp_path / "ref"), snapshot_id=2, n_parts=8
        )

        class Boom(RuntimeError):
            pass

        def crashing_ws(df, root, table, snapshot_id, **kw):
            if table == "lineage" and snapshot_id == 2:
                raise Boom("simulated crash before lineage commit")
            return real_ws(df, root, table, snapshot_id, **kw)

        monkeypatch.setattr(P, "write_snapshot", crashing_ws)
        with pytest.raises(Boom):
            run_snapshot(spark, synth_pages(spark, 120, seed=4), str(tmp_path), snapshot_id=2, n_parts=8)
        # snapshot-2 triples are committed, lineage is not
        assert 2 in snapshots_of(tmp_path, "triples")
        assert 2 not in snapshots_of(tmp_path, "lineage")

        monkeypatch.setattr(P, "write_snapshot", real_ws)
        rep = run_snapshot(spark, synth_pages(spark, 120, seed=4), str(tmp_path), snapshot_id=2, n_parts=8)
        assert rep["triples"] == ref["triples"]  # not doubled
        t = read_snapshot(spark, tmp_path, "triples", snapshot_id=2)
        assert t.count() == ref["triples"]

    def test_incremental_snapshot_processes_only_new_urls(self, spark, tmp_path):
        from ffp_spark.snapshots import read_manifest

        base = synth_pages(spark, 100, seed=9)
        grown = synth_pages(spark, 150, seed=9)  # superset: same first 100
        r1 = run_snapshot(spark, base, str(tmp_path), snapshot_id=1, n_parts=8)
        r2 = run_snapshot(
            spark, grown, str(tmp_path), snapshot_id=2, n_parts=8, incremental_from=1
        )
        assert r2["pages"] == 50  # only the delta parsed
        # snapshot 2 is the full logical graph: its triples cover both runs
        full = run_snapshot(
            spark, grown, str(tmp_path / "full"), snapshot_id=2, n_parts=8
        )
        t_inc = read_snapshot(spark, tmp_path, "triples", snapshot_id=2)
        t_full = read_snapshot(spark, tmp_path / "full", "triples", snapshot_id=2)
        inc_set = {(r.subj, r.pred, r.obj, r.src_url) for r in t_inc.collect()}
        full_set = {(r.subj, r.pred, r.obj, r.src_url) for r in t_full.collect()}
        assert inc_set == full_set
        # time travel: snapshot 1 still readable underneath
        assert read_snapshot(spark, tmp_path, "triples", snapshot_id=1).count() == r1["triples"]

    def test_deterministic_triples_across_runs(self, spark, tmp_path):
        pages = synth_pages(spark, 80, seed=5)
        run_snapshot(spark, pages, str(tmp_path / "a"), snapshot_id=1, n_parts=4)
        run_snapshot(spark, pages, str(tmp_path / "b"), snapshot_id=1, n_parts=4)
        ta = read_snapshot(spark, tmp_path / "a", "triples")
        tb = read_snapshot(spark, tmp_path / "b", "triples")
        assert ta.exceptAll(tb).isEmpty() and tb.exceptAll(ta).isEmpty()


def test_compact_changelog_latest_wins_and_tombstones(spark):
    from ffp_spark.snapshots import compact_changelog

    log = spark.createDataFrame(
        [
            # entity 1: insert -> update (update wins)
            # entity 2: update -> delete (dead, last attrs kept)
            # entity 3: insert AFTER the tombstone (resurrected)
            # entity 4: same ts, higher event_id wins (total order)
            (1, 100, 0, "insert", 10.0),
            (1, 200, 1, "update", 20.0),
            (2, 100, 2, "update", 5.0),
            (2, 300, 3, "delete", 0.0),
            (3, 100, 4, "delete", 0.0),
            (3, 150, 5, "insert", 7.0),
            (4, 100, 6, "update", 1.0),
            (4, 100, 7, "update", 2.0),
        ],
        "user_id long, ts long, event_id long, event_type string, value double",
    )
    got = {
        r.user_id: (r.event_type, r.value, r.alive)
        for r in compact_changelog(
            log,
            key_cols=["user_id"],
            order_cols=["ts", "event_id"],
            op_col="event_type",
            tombstone_ops=("delete",),
        ).collect()
    }
    assert got == {
        1: ("update", 20.0, True),
        2: ("delete", 0.0, False),
        3: ("insert", 7.0, True),
        4: ("update", 2.0, True),
    }


def test_changelog_history_intervals_chain_per_key(spark):
    from ffp_spark.snapshots import changelog_history

    log = spark.createDataFrame(
        [
            (1, 100, 0, "insert"), (1, 250, 1, "update"), (1, 400, 2, "update"),
            (2, 130, 3, "insert"),
        ],
        "user_id long, ts long, event_id long, event_type string",
    )
    got = {
        (r.user_id, r.ts): (r.valid_from, r.valid_to)
        for r in changelog_history(
            log, key_cols=["user_id"], ts_col="ts", order_cols=["ts", "event_id"]
        ).collect()
    }
    # intervals chain: each version closes at the key's next event;
    # exactly one open version per key
    assert got == {
        (1, 100): (100, 250),
        (1, 250): (250, 400),
        (1, 400): (400, None),
        (2, 130): (130, None),
    }
