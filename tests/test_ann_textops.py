"""ANN tiers (brute force / LSH / IVF) and distributed text ops."""

import pytest
from pyspark.sql import functions as F

from ffp_spark.ann import cosine_topk, ivf_centroids, ivf_topk, lsh_topk
from ffp_spark.textops import (
    predict_lang,
    quality_features,
    rolling_fingerprint,
    simhash,
    simhash_near_dups,
    train_lang_model,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in emb.filter("vec_id = 0").collect()[0].embedding]


class TestANN:
    def test_bruteforce_self_similarity(self, spark, emb, qvec):
        top = cosine_topk(emb, qvec, k=3).collect()
        assert top[0].vec_id == 0 and abs(top[0].cos_sim - 1.0) < 1e-9

    def test_ivf_recall_vs_bruteforce(self, spark, emb, qvec):
        exact = {r.vec_id for r in cosine_topk(emb.filter("vec_id <> 0"), qvec, k=10).collect()}
        approx = {r.vec_id for r in ivf_topk(emb.filter("vec_id <> 0"), qvec, k=10, n_cells=8, nprobe=4).collect()}
        recall = len(exact & approx) / 10
        assert recall >= 0.5, (recall, exact, approx)

    def test_lsh_returns_subset_of_corpus(self, spark, emb, qvec):
        got = lsh_topk(emb, qvec, k=10).collect()
        assert 0 < len(got) <= 10
        # the query itself lands in its own bucket -> must be found
        assert got[0].vec_id == 0

    def test_ivf_centroids_deterministic(self, spark, emb):
        a = ivf_centroids(emb, n_cells=4).collect()
        b = ivf_centroids(emb, n_cells=4).collect()
        assert sorted(r.cell for r in a) == sorted(r.cell for r in b) == [0, 1, 2, 3]
        ca = {r.cell: list(r.centroid) for r in a}
        cb = {r.cell: list(r.centroid) for r in b}
        assert ca == cb


class TestTextOps:
    def test_lang_id_beats_chance_on_own_corpus(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        model = train_lang_model(docs)
        pred = predict_lang(docs, model)
        joined = docs.select("doc_id", "lang").join(pred, "doc_id")
        acc_row = joined.agg(
            F.avg((F.col("lang") == F.col("predicted_lang")).cast("double")).alias("acc")
        ).collect()[0]
        # synthetic docs share a vocabulary across langs, so the ceiling
        # is low — but the classifier must beat the 1/5 chance rate
        assert acc_row.acc > 0.2, acc_row.acc

    def test_predict_lang_matches_per_character_scoring(self, spark):
        # the count-weighted scoring must equal the old one-row-per-
        # character formulation: score = sum over characters of w
        from ffp_spark.textops import char_bigrams

        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50).cache()
        model = train_lang_model(docs)
        fast = predict_lang(docs, model)
        grams = char_bigrams(docs.select("doc_id", "text"))
        slow = (
            grams.join(F.broadcast(model), "bigram")
            .groupBy("doc_id", "model_lang")
            .agg(F.sum("w").alias("score"))
            .groupBy("doc_id")
            .agg(
                F.max_by("model_lang", F.struct("score", "model_lang")).alias(
                    "predicted_lang"
                )
            )
        )
        diff = fast.join(slow.withColumnRenamed("predicted_lang", "p2"), "doc_id").filter(
            "predicted_lang <> p2"
        )
        assert diff.count() == 0
        docs.unpersist()

    def test_quality_features_ranges(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        feats = quality_features(docs)
        row = feats.agg(
            F.min("stopword_ratio").alias("mn_s"),
            F.max("stopword_ratio").alias("mx_s"),
            F.min("punct_ratio").alias("mn_p"),
            F.max("punct_ratio").alias("mx_p"),
        ).collect()[0]
        assert 0.0 <= row.mn_s <= row.mx_s <= 1.0
        assert 0.0 <= row.mn_p <= row.mx_p <= 1.0

    def test_fingerprint_stable_under_whitespace(self, spark):
        docs = spark.createDataFrame(
            [(1, "Hello   world  test"), (2, "hello world test"), (3, "different")],
            "doc_id int, text string",
        )
        rows = {r.doc_id: r.fingerprint for r in rolling_fingerprint(docs).collect()}
        assert rows[1] == rows[2]
        assert rows[1] != rows[3]


class TestSimHash:
    def _mutated_corpus(self, spark):
        # 10 base docs of 60 tokens; each gets a near-dup with 2 tokens
        # swapped (tiny bit flips) and the far set shares no vocabulary
        base = [
            (i, " ".join(f"w{i}t{j}" for j in range(60))) for i in range(10)
        ]
        near = [
            (100 + i, " ".join(
                (f"MUT{j}" if j in (5, 40) else f"w{i}t{j}") for j in range(60)
            ))
            for i in range(10)
        ]
        far = [(200 + i, " ".join(f"zz{i}q{j}" for j in range(60))) for i in range(5)]
        return spark.createDataFrame(base + near + far, "doc_id int, text string")

    def test_simhash_is_64_bit_and_deterministic(self, spark):
        docs = self._mutated_corpus(spark)
        a = {r.doc_id: r.simhash for r in simhash(docs).collect()}
        b = {r.doc_id: r.simhash for r in simhash(docs).collect()}
        assert a == b
        # codes use the full width: some doc sets a bit above 2^32
        assert any(abs(v) > (1 << 32) for v in a.values())

    def test_near_dups_recovers_mutated_pairs(self, spark):
        # 2/60 token swaps -> expected Hamming ~5 of 64; 16 narrow bands
        # keep the retrieval exact (pigeonhole) up to Hamming 15
        docs = self._mutated_corpus(spark)
        pairs = {
            (r.a, r.b)
            for r in simhash_near_dups(docs, max_hamming=10, n_bands=16).collect()
        }
        for i in range(10):
            assert (i, 100 + i) in pairs, f"near-dup pair ({i},{100+i}) missed"
        # unrelated docs don't pair up
        assert not any(a >= 200 or b >= 200 for a, b in pairs)

    def test_band_join_equals_bruteforce_hamming(self, spark):
        # pigeonhole exactness: band-bucket retrieval at max_hamming=3 and
        # 4 bands finds EXACTLY the brute-force pair set
        docs = self._mutated_corpus(spark)
        got = {(r.a, r.b, r.hamming) for r in simhash_near_dups(docs, max_hamming=3).collect()}
        sh = simhash(docs).select("doc_id", "simhash")
        a, b = sh.alias("a"), sh.alias("b")
        brute = (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("a"),
                F.col("b.doc_id").alias("b"),
                F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
            )
            .filter("hamming <= 3")
        )
        want = {(r.a, r.b, r.hamming) for r in brute.collect()}
        assert got == want

    def test_simhash_plan_has_no_explode(self, spark):
        docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
        plan = simhash(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Generate" not in plan, plan  # no explode in the code path


class TestSemDedup:
    def test_semdedup_discards_near_copies_keeps_representatives(self, spark):
        from ffp_spark.ann import semdedup

        # 8 far-apart seed directions (ids 0-7 become the 8 IVF seeds);
        # ids 8/9 are near-copies of seeds 2 and 5 (same cell, cos ~1);
        # id 10 shares cell 1's neighborhood but stays below threshold
        dim = 16

        def basis(i, eps=0.0):
            v = [0.0] * dim
            v[i] = 1.0
            if eps:
                v[(i + 1) % dim] = eps
            return v

        rows = [(i, basis(i)) for i in range(8)]
        rows += [(8, basis(2, eps=0.05)), (9, basis(5, eps=0.03))]
        mixed = [0.0] * dim
        mixed[1], mixed[9] = 1.0, 2.0  # nearest to cell 1 but cos ~0.45 < 0.6
        rows += [(10, mixed)]
        emb = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )
        got = {r.vec_id: (r.cell, r.n_lower) for r in semdedup(emb, n_cells=8, threshold=0.6).collect()}
        assert set(got) == {8, 9}
        assert got[8] == (2, 1) and got[9] == (5, 1)

    def test_semdedup_empty_when_threshold_above_max_sim(self, spark, emb):
        from ffp_spark.ann import semdedup

        assert semdedup(emb.filter("vec_id <> 0"), n_cells=8, threshold=0.999).count() == 0


class TestArrowBackend:
    """The broadcast-centroid mapInArrow assignment and the grouped-Arrow
    pair scoring are the 100 TB plans (no n_cells-sized Janino expression,
    no interpreted per-pair higher-order functions) — and they must be
    BIT-identical to the literal/SQL plans so the auto-dispatch threshold
    can never change an oracle answer.  `_fold_dots` replays F.aggregate's
    left-to-right accumulation order to guarantee that."""

    def test_arrow_assignment_bit_identical_to_literal(self, spark, emb):
        from ffp_spark.ann import ivf_assign, ivf_centroids

        e = emb.filter("vec_id <> 0")
        cents = ivf_centroids(e, n_cells=8)
        lit = {r.vec_id: r.cell for r in ivf_assign(e, cents, backend="literal").collect()}
        arw = {r.vec_id: r.cell for r in ivf_assign(e, cents, backend="arrow").collect()}
        assert lit == arw and len(lit) == e.count()

    def test_auto_dispatch_crosses_threshold_consistently(self, spark, emb):
        # above MAX_LITERAL_CELLS the auto path IS the arrow path, and it
        # still matches a forced-literal run at the same cell count
        from ffp_spark.ann import MAX_LITERAL_CELLS, ivf_assign, ivf_centroids

        e = emb.filter("vec_id <> 0")
        n = MAX_LITERAL_CELLS + 8
        cents = ivf_centroids(e, n_cells=n, backend="arrow")
        auto = ivf_assign(e, cents)  # dispatches to arrow (n > threshold)
        assert "MapInArrow" in auto._jdf.queryExecution().executedPlan().toString()
        lit = {r.vec_id: r.cell for r in ivf_assign(e, cents, backend="literal").collect()}
        assert {r.vec_id: r.cell for r in auto.collect()} == lit

    def test_arrow_assignment_plan_no_join_no_exchange(self, spark, emb):
        from ffp_spark.ann import ivf_assign, ivf_centroids

        e = emb.filter("vec_id <> 0")
        cents = ivf_centroids(e, n_cells=8)
        plan = ivf_assign(e, cents, backend="arrow")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Join" not in plan, plan

    def test_semdedup_arrow_backend_bit_identical_to_sql(self, spark, emb):
        from ffp_spark.ann import semdedup

        e = emb.filter("vec_id <> 0")
        sql = {(r.vec_id, r.cell, r.n_lower, r.best_sim)
               for r in semdedup(e, n_cells=8, threshold=0.40, backend="sql").collect()}
        arw = {(r.vec_id, r.cell, r.n_lower, r.best_sim)
               for r in semdedup(e, n_cells=8, threshold=0.40, backend="arrow").collect()}
        assert sql == arw and len(sql) > 0

    def test_arrow_pair_scoring_blocks_match_unblocked(self, spark, emb):
        # block size smaller than the cell population exercises the
        # row-block gram accumulation seams
        from ffp_spark.ann import _dot, _as_double, _semdedup_pairs_arrow, ivf_assign, ivf_centroids
        from pyspark.sql import functions as F

        e = emb.filter("vec_id <> 0")
        cents = ivf_centroids(e, n_cells=4)
        v = _as_double("embedding")
        asg = ivf_assign(e, cents).select(
            "vec_id", "cell", v.alias("v"), F.sqrt(_dot(v, v)).alias("nrm")
        ).cache()
        big = {(r.cell, r.b, r.cos) for r in _semdedup_pairs_arrow(asg, 0.35, "vec_id", block=512).collect()}
        tiny = {(r.cell, r.b, r.cos) for r in _semdedup_pairs_arrow(asg, 0.35, "vec_id", block=7).collect()}
        asg.unpersist()
        assert big == tiny and len(big) > 0


class TestKMeans:
    """cluster.kmeans_assignments vs a pure-Python replay of the same
    quantized Lloyd contract (micro-unit vectors, integral-mean
    centroids, integer squared-L2 costs, lowest-cid ties)."""

    @staticmethod
    def _ref(vectors, k, iters):
        def q(v):
            import math
            return [int(math.floor(x * 1_000_000 + 0.5)) + 2_000_000 for x in v]

        xq = {i: q(v) for i, v in enumerate(vectors)}
        cents = {c: list(xq[c]) for c in range(k)}

        def assign():
            out = {}
            for i, v in xq.items():
                best = min(
                    (sum((a - b) * (a - b) for a, b in zip(v, cents[c])), c)
                    for c in range(k)
                )
                out[i] = best  # (cost, cid)
            return out

        for _ in range(iters):
            a = assign()
            members = {}
            for i, (_, c) in a.items():
                members.setdefault(c, []).append(xq[i])
            for c in range(k):
                if c in members:
                    n = len(members[c])
                    cents[c] = [
                        sum(col) // n for col in zip(*members[c])
                    ]
        return assign(), cents

    def test_matches_python_reference(self, spark):
        import random

        from ffp_spark.cluster import kmeans_assignments

        rng = random.Random(42)
        vecs = [[rng.uniform(-0.5, 0.5) for _ in range(6)] for _ in range(40)]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        want, _ = self._ref(vecs, k=3, iters=2)
        got = {
            r.vec_id: (r.cost, r.cid)
            for r in kmeans_assignments(df, k=3, iters=2).collect()
        }
        assert got == want

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        from ffp_spark.cluster import kmeans_assignments

        # centroid 2 (vec_id 2, far at 0.9) captures only itself; after
        # iteration 1 every point sits nearer centroids 0/1, cluster 2
        # keeps its centroid and stays a singleton — the carry-forward
        # rule both engines pin
        vecs = [[0.0, 0.0], [0.1, 0.1], [0.9, 0.9], [0.05, 0.0], [0.0, 0.05]]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        want, _ = self._ref(vecs, k=3, iters=2)
        got = {
            r.vec_id: (r.cost, r.cid)
            for r in kmeans_assignments(df, k=3, iters=2).collect()
        }
        assert got == want
        assert sorted(c for _, c in got.values()) == [0, 0, 0, 1, 2]


class TestInt8Quantization:
    def test_quantize_bounds_and_numpy_replay(self, spark, emb):
        import numpy as np

        from ffp_spark.ann import int8_quantize, int8_topk

        rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        V = np.array([r.embedding for r in rows], dtype=np.float64)
        ids = np.array([r.vec_id for r in rows])
        nv = V / np.sqrt((V * V).sum(axis=1, keepdims=True))
        s = np.abs(nv).max(axis=0)
        q = np.floor(np.abs(nv / s) * 127 + 0.5) * np.sign(nv)  # half away from zero
        got = {r.vec_id: list(r.q) for r in int8_quantize(
            spark.read.parquet(f"{SF}/embeddings.parquet")).collect()}
        want = {int(i): [int(x) for x in row] for i, row in zip(ids, q)}
        assert got == want
        flat = np.array([v for row in got.values() for v in row])
        assert flat.min() >= -127 and flat.max() <= 127
        assert (np.abs(flat) == 127).sum() >= 64  # every dim's max attains 127

        # integer-dot top-10 replay
        qm = {i: np.array(v, dtype=np.int64) for i, v in want.items()}
        q0 = qm[0]
        dots = sorted(
            ((int(qm[i] @ q0), -i) for i in qm if i != 0), reverse=True
        )[:10]
        want_top = [(-mi, d) for d, mi in dots]
        got_top = [(r.vec_id, r.dot_q) for r in int8_topk(
            spark.read.parquet(f"{SF}/embeddings.parquet"), query_id=0, k=10
        ).collect()]
        assert got_top == want_top


class TestSetSimJoin:
    def test_matches_bruteforce_and_prefix_loses_nothing(self, spark):
        import random

        from ffp_spark.textops import setsim_join_half

        rng = random.Random(21)
        # 30 docs over a 12-token universe, set sizes 3..8 — dense
        # enough that many pairs clear Jaccard >= 1/2
        rows = []
        for d in range(30):
            ts = rng.sample([f"t{i}" for i in range(12)], rng.randrange(3, 9))
            rows.extend((d, t) for t in ts)
        toks = spark.createDataFrame(rows, "doc_id long, tok string")
        sets = {}
        for d, t in rows:
            sets.setdefault(d, set()).add(t)
        want = set()
        for a in sets:
            for b in sets:
                if a < b:
                    i = len(sets[a] & sets[b])
                    ua, ub = len(sets[a]), len(sets[b])
                    if 3 * i >= ua + ub:
                        want.add(
                            (a, b, i, ua, ub, (1_000_000 * i) // (ua + ub - i))
                        )
        got = {
            (r.a, r.b, r.inter, r.ua, r.ub, r.jac_ppm)
            for r in setsim_join_half(toks).collect()
        }
        assert got == want and len(got) > 0

    def test_disjoint_and_identical_sets(self, spark):
        from ffp_spark.textops import setsim_join_half

        toks = spark.createDataFrame(
            [(0, "x"), (0, "y"), (1, "x"), (1, "y"),   # identical pair
             (2, "p"), (2, "q"), (3, "r"), (3, "s")],  # disjoint pair
            "doc_id long, tok string",
        )
        got = [(r.a, r.b, r.jac_ppm) for r in setsim_join_half(toks).collect()]
        assert got == [(0, 1, 1_000_000)]

    def test_prefix_filter_lossless_property(self, spark):
        """Property: for ANY set family, prefix filtering loses no
        qualifying pair (the Bayardo/Chaudhuri theorem the operator
        rests on) — hypothesis drives the set shapes."""
        from hypothesis import HealthCheck, given, settings, strategies as st

        from ffp_spark.textops import setsim_join_half

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=[HealthCheck.too_slow],
        )
        @given(
            st.lists(
                st.sets(st.integers(0, 9), min_size=1, max_size=6),
                min_size=2,
                max_size=12,
            )
        )
        def check(fam):
            rows = [
                (d, f"t{t}") for d, s in enumerate(fam) for t in s
            ]
            toks = spark.createDataFrame(rows, "doc_id long, tok string")
            got = {
                (r.a, r.b, r.inter)
                for r in setsim_join_half(toks).collect()
            }
            want = set()
            for a in range(len(fam)):
                for b in range(a + 1, len(fam)):
                    i = len(fam[a] & fam[b])
                    if 3 * i >= len(fam[a]) + len(fam[b]):
                        want.add((a, b, i))
            assert got == want

        check()
