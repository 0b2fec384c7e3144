"""Entity linking + connected components, validated against plain-Python
oracles (FIXTURES.md §4)."""

import pytest
from pyspark.sql import functions as F

from ffp_spark.cc import connected_components
from ffp_spark.datagen import AUTHOR_CLUSTERS, author_cluster_oracle, synth_pages
from ffp_spark.linking import (
    best_candidate,
    candidate_pairs,
    minhash_udf,
    salted_broadcast_join,
    with_signatures,
)
from ffp_spark.udfs import parse_pages


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


class TestConnectedComponents:
    def test_matches_union_find_oracle(self, spark):
        edges = [
            ("a", "b"), ("b", "c"), ("d", "e"),
            ("f", "g"), ("g", "h"), ("h", "a"),  # merges f-g-h into a-b-c
            ("x", "y"),
            ("lonepair", "lonepair2"),
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r.node_id: r.component_id
            for r in connected_components(df).collect()
        }
        want = _union_find(edges)
        assert got == want

    def test_long_chain_converges(self, spark):
        n = 64
        chain = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
        df = spark.createDataFrame(chain, "src string, dst string")
        got = connected_components(df, max_iter=10)
        comps = got.select("component_id").distinct().collect()
        assert len(comps) == 1
        assert comps[0].component_id == "n000"

    def test_deterministic(self, spark):
        edges = [("b", "a"), ("c", "b"), ("z", "q"), ("m", "z")]
        df = spark.createDataFrame(edges, "src string, dst string")
        a = sorted(map(tuple, connected_components(df).collect()))
        b = sorted(map(tuple, connected_components(df).collect()))
        assert a == b


class TestMinHashLSH:
    def test_signature_deterministic_and_similarity_ordering(self, spark):
        df = spark.createDataFrame(
            [("1", "david bau"), ("2", "david b"), ("3", "completely different")],
            "mention_id string, norm string",
        )
        signed = with_signatures(df).collect()
        sigs = {r.mention_id: list(r.sig) for r in signed}
        assert len(sigs["1"]) == 64
        # re-run: identical signatures (fixed-seed permutations)
        signed2 = with_signatures(df).collect()
        assert sigs == {r.mention_id: list(r.sig) for r in signed2}
        # similar strings agree on more positions than dissimilar ones
        agree_12 = sum(x == y for x, y in zip(sigs["1"], sigs["2"]))
        agree_13 = sum(x == y for x, y in zip(sigs["1"], sigs["3"]))
        assert agree_12 > agree_13

    def test_candidates_catch_known_near_dups(self, spark):
        surfaces = [(s.lower().replace(".", ""),) for s in author_cluster_oracle()]
        df = (
            spark.createDataFrame(surfaces, "norm string")
            .distinct()
            .withColumn("mention_id", F.col("norm"))
        )
        scored = candidate_pairs(with_signatures(df), min_jaccard=0.4)
        pairs = {(r.a, r.b) for r in scored.collect()}
        # within-cluster full-name variants should be blocked together
        assert any("david" in a and "david" in b for a, b in pairs)
        # no cross-cluster pairing of clearly different names
        assert not any(
            ("wei chen" in (a, b)) and ("emma brown" in (a, b)) for a, b in pairs
        )

    def test_best_candidate_is_max_by(self, spark):
        df = spark.createDataFrame(
            [("a", "b", "x", "y", 0.6), ("a", "c", "x", "z", 0.9)],
            "a string, b string, norm_a string, norm_b string, score double",
        )
        got = best_candidate(df).collect()
        assert len(got) == 1 and got[0].best_match == "c" and got[0].best_score == 0.9


class TestSaltedBroadcastJoin:
    def test_same_result_as_plain_join(self, spark):
        big = spark.range(0, 1000).select(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string")).alias("key"),
            F.col("id").alias("v"),
        )
        small = spark.createDataFrame(
            [(f"k{i}", f"label{i}") for i in range(7)], "key string, label string"
        )
        plain = big.join(small, "key").groupBy("label").count()
        salted = salted_broadcast_join(big, small, "key", n_salts=4, how="inner")
        got = salted.groupBy("label").count()
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, got.collect()))

    def test_plan_contains_broadcast(self, spark):
        big = spark.range(0, 100).select(F.lit("k").alias("key"), "id")
        small = spark.createDataFrame([("k", "v")], "key string, label string")
        plan = salted_broadcast_join(big, small, "key")._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan


class TestEndToEndLinking:
    def test_author_clusters_recovered_from_synth_corpus(self, spark):
        from ffp_spark.pipeline import link_and_canonicalize

        parsed = parse_pages(synth_pages(spark, 150, seed=11))
        canon = link_and_canonicalize(parsed, min_jaccard=0.35).collect()
        mapping = {r.norm: r.canonical_norm for r in canon}
        oracle = author_cluster_oracle()
        # linkable variants of the same cluster map to one canonical id
        from collections import defaultdict

        by_cluster = defaultdict(set)
        for surface, cluster in oracle.items():
            norm = " ".join(
                "".join(c if c.isalnum() else " " for c in surface.lower()).split()
            )
            if norm in mapping:
                by_cluster[cluster].add(mapping[norm])
        recovered = sum(1 for canons in by_cluster.values() if len(canons) == 1)
        assert recovered >= len(by_cluster) * 0.7, dict(by_cluster)
        # no cross-cluster merges: canonical ids are disjoint across clusters
        seen: dict[str, str] = {}
        for cluster, canons in by_cluster.items():
            for c in canons:
                assert seen.setdefault(c, cluster) == cluster, (c, cluster, seen[c])


class TestClusteringMetric:
    def test_pairwise_prf_exact_match(self, spark):
        from ffp_spark.metrics import clustering_pairwise_prf

        gold = spark.createDataFrame(
            [("a", "c1"), ("b", "c1"), ("c", "c2"), ("d", "c2"), ("e", "c3")],
            "item string, cluster string",
        )
        res = clustering_pairwise_prf(gold, gold)
        assert res["precision"] == res["recall"] == res["f1"] == 1.0

    def test_pairwise_prf_over_merge_hurts_precision(self, spark):
        from ffp_spark.metrics import clustering_pairwise_prf

        gold = spark.createDataFrame(
            [("a", "c1"), ("b", "c1"), ("c", "c2"), ("d", "c2")],
            "item string, cluster string",
        )
        merged = spark.createDataFrame(
            [("a", "x"), ("b", "x"), ("c", "x"), ("d", "x")],
            "item string, cluster string",
        )
        res = clustering_pairwise_prf(merged, gold)
        assert res["recall"] == 1.0
        assert abs(res["precision"] - 2 / 6) < 1e-9

    def test_linking_clusters_scored_against_oracle(self, spark):
        """End to end: synth corpus -> canonicalization -> pairwise F1 vs
        the generator's known author clusters (linkable variants)."""
        from ffp_spark.datagen import author_cluster_oracle, synth_pages
        from ffp_spark.metrics import clustering_pairwise_prf
        from ffp_spark.pipeline import link_and_canonicalize
        from ffp_spark.udfs import parse_pages

        parsed = parse_pages(synth_pages(spark, 150, seed=11))
        canon = link_and_canonicalize(parsed, min_jaccard=0.35)

        def norm(s):
            return " ".join("".join(c if c.isalnum() else " " for c in s.lower()).split())

        oracle_rows = [(norm(s), c) for s, c in author_cluster_oracle().items()]
        golden = spark.createDataFrame(
            sorted(set(oracle_rows)), "item string, cluster string"
        )
        predicted = canon.join(
            golden.select("item"), canon.norm == golden.item
        ).select(F.col("norm").alias("item"), F.col("canonical_norm").alias("cluster"))
        res = clustering_pairwise_prf(predicted, golden)
        assert res["f1"] >= 0.6, res


class TestNeardupCanonical:
    def test_canonical_pick_is_longest_then_smallest_id(self, spark, tmp_path):
        """The neardup_canonical query keeps exactly one doc per
        duplicate cluster: longest text, ties by smallest id."""
        import __spark_entry__ as em

        filler = " ".join(f"tok{i}" for i in range(30))
        rows = [
            # cluster A: 3 near-identical docs, doc 21 one word longer
            (20, filler + " alpha", "s1"),
            (21, filler + " alpha beta", "s1"),
            (22, filler + " alpha", "s1"),
            # cluster B: identical pair, equal length -> smallest id 30
            (30, "wholly different " + " ".join(f"b{i}" for i in range(25)), "s2"),
            (31, "wholly different " + " ".join(f"b{i}" for i in range(25)), "s2"),
            # singletons: never emitted
            (40, " ".join(f"c{i}" for i in range(40)), "s3"),
            (41, " ".join(f"d{i}" for i in range(40)), "s3"),
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        got = {
            r.component_id: (r.size, r.canonical_id, r.n_discarded)
            for r in em._q_neardup_canonical(spark, str(tmp_path)).collect()
        }
        assert got == {"20": (3, "21", 2), "30": (2, "30", 1)}


class TestMinhashEstimateError:
    def test_exact_jaccard_and_error_columns(self, spark, tmp_path):
        """minhash_estimate_error ships the exact word-3-gram Jaccard
        in ppm beside the signature estimate; an identical pair must
        have jac_ppm = 1e6, est_ppm = 1e6, err_ppm = 0, and a partial
        overlap must match the hand-computed shingle-set Jaccard."""
        import __spark_entry__ as em

        filler = " ".join(f"tok{i}" for i in range(30))
        rows = [
            (50, filler, "s1"),            # identical pair: 28 shingles
            (51, filler, "s1"),
            (60, filler + " omega", "s2"),  # superset: 29 shingles,
            # inter with 50 = 28, union = 29
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        got = {
            (r.a, r.b): (r.est_ppm, r.jac_ppm, r.err_ppm)
            for r in em._q_minhash_estimate_error(spark, str(tmp_path)).collect()
        }
        assert got[("50", "51")] == (1000000, 1000000, 0)
        exact = (1000000 * 28) // 29
        for pair in (("50", "60"), ("51", "60")):
            est, jac, err = got[pair]
            assert jac == exact
            assert err == est - jac
            # a 28/29 overlap should estimate high on 64 hashes
            assert est >= 800000


class TestSimhashEstimateError:
    def test_hamming_beside_exact_jaccard(self, spark, tmp_path):
        """simhash_estimate_error pairs the Hamming proxy with the
        exact shingle Jaccard: an identical pair is (hamming 0,
        jac_ppm 1e6); a one-word-suffix variant keeps hamming small
        while jac_ppm equals the hand-computed shingle ratio."""
        import __spark_entry__ as em

        filler = " ".join(f"tok{i}" for i in range(40))
        rows = [
            (70, filler, "s1"),
            (71, filler, "s1"),  # identical: ham 0, jac 1e6
            # doubled text: every per-bit vote sum exactly doubles, so
            # the SimHash is IDENTICAL (ham 0 by construction), while
            # the two seam trigrams (tok38 tok39 tok0 / tok39 tok0
            # tok1) grow the shingle set 38 -> 40: inter 38, union 40
            (80, filler + " " + filler, "s2"),
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        got = {
            (r.a, r.b): (r.hamming, r.jac_ppm)
            for r in em._q_simhash_estimate_error(spark, str(tmp_path)).collect()
        }
        assert got[(70, 71)] == (0, 1000000)
        exact = (1000000 * 38) // 40  # = 950000
        assert got[(70, 80)] == (0, exact)
        assert got[(71, 80)] == (0, exact)
