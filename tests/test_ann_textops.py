"""ANN tiers (brute force / LSH / IVF) and distributed text ops."""

import pytest
from pyspark.sql import functions as F

from ffp_spark.ann import cosine_topk, ivf_centroids, ivf_topk, lsh_topk
from ffp_spark.textops import (
    predict_lang,
    quality_features,
    rolling_fingerprint,
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
